"""Plan linter: mechanical scale-risk audit of a DataFrame's physical plan.

The engine's queries are written to hold specific plan shapes at 100 TB
(broadcast only below threshold, no cartesian products, windows always
partitioned, filters reaching the scan).  ``tests/test_plans.py`` pins
those shapes for the declared queries; this module packages the same
checks as a runtime guardrail for *user* queries — a deployment gate
("refuse to schedule anything with a nested-loop join over two fact
tables") rather than a test-only assertion.

Checks are string-level over ``executedPlan`` — deliberately: the
formatted plan is a stable public surface (the same one humans read in
``.explain()``), needs no private Catalyst APIs, and is what the plan
regression tests already match against.

Reference parity note: the reference delegates all execution planning to
Postgres and ships no analogue; this is engine infrastructure the Spark
form needs because layout/strategy mistakes that cost milliseconds on a
60 k-row table cost cluster-days at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanFinding:
    code: str
    severity: str          # "error" | "warn"
    detail: str


@dataclass
class PlanAudit:
    findings: list[PlanFinding] = field(default_factory=list)

    @property
    def errors(self) -> list[PlanFinding]:
        return [f for f in self.findings if f.severity == "error"]

    @property
    def ok(self) -> bool:
        return not self.errors

    def codes(self) -> set[str]:
        return {f.code for f in self.findings}


def _plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_BOUNDED_SIDE_ROWS = 1000  # build side provably at most this many rows


def _iter_tree(node):
    """Depth-first walk of a Catalyst TreeNode (physical or logical)."""
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        if n.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            stack.append(n.initialPlan())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _theta_join_is_bounded(phys_node) -> bool:
    """True iff THIS physical theta join's own logical Join has a side
    Catalyst proves tiny (``maxRows`` defined and small — scalar
    aggregates report Some(1), explicit limits their bound): the
    standard scalar-attach / bounded-probe pattern, not a scale risk.

    Boundedness is read off the node's ``logicalLink`` so an unrelated
    bounded equi join elsewhere in the plan can never launder a genuine
    all-pairs join past the gate (the r2 form compared global counts and
    had exactly that false negative)."""
    ll = phys_node.logicalLink()
    if not ll.isDefined():
        return False  # no provenance -> conservative: treat as unbounded
    logical = ll.get()
    if logical.getClass().getSimpleName() != "Join":
        return False
    for side in (logical.left(), logical.right()):
        mr = side.maxRows()
        if mr.isDefined() and int(mr.get()) <= _BOUNDED_SIDE_ROWS:
            return True
    return False


# operators that bound a window's input when found in its OWN subtree
_WINDOW_BOUNDERS = {
    "WindowGroupLimitExec",      # rank-filter pushdown
    "TakeOrderedAndProjectExec",  # explicit / optimizer-derived top-k
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
}


def audit_plan(df: DataFrame) -> PlanAudit:
    """Lint one DataFrame's physical plan for scale-hostile shapes.

    error-level (would not survive a 100 TB input):

    * ``cartesian-product``  — CartesianProduct: all-pairs blowup.
    * ``nested-loop-join``   — BroadcastNestedLoopJoin: per-row scan of
      the broadcast side; quadratic unless one side is tiny AND the
      predicate is selective.  (LSH/banding is this engine's answer —
      see operators/similarity.py.)  Downgraded to warn-level
      ``bounded-theta-join`` when Catalyst proves a side of every
      non-equi join <= 1000 rows (scalar-aggregate attach, explicit
      limit) — the standard corpus-total / bounded-probe pattern.
    * ``global-window``      — an unpartitioned window whose input is
      NOT bounded first: single task holds the whole input.  Exempt
      when that window's OWN subtree bounds its input — a
      ``WindowGroupLimit`` (rank-filter pushdown), a
      ``TakeOrderedAndProject`` (explicit or optimizer-derived top-k,
      e.g. text_zipf_slope), or a limit below it; a top-k elsewhere in
      the plan does not exempt an unrelated window.

    warn-level (legitimate in bounded positions, worth eyes):

    * ``global-sort``        — a Sort above an Exchange rangepartitioning
      with no limit fused in: full-data range shuffle.
    * ``python-row-udf``     — BatchEvalPython: row-at-a-time Python on
      the path; ArrowEvalPython / mapInPandas do not trigger this.
    """
    plan = _plan_str(df)
    out = PlanAudit()

    phys = df._jdf.queryExecution().sparkPlan()
    for node in _iter_tree(phys):
        cname = node.getClass().getSimpleName()
        if cname in ("BroadcastNestedLoopJoinExec", "CartesianProductExec"):
            if _theta_join_is_bounded(node):
                out.findings.append(PlanFinding(
                    "bounded-theta-join", "warn",
                    "non-equi join with a side Catalyst proves <= "
                    f"{_BOUNDED_SIDE_ROWS} rows (scalar attach / bounded "
                    "probe) — safe at any fact scale"))
            else:
                code = ("cartesian-product"
                        if cname == "CartesianProductExec"
                        else "nested-loop-join")
                out.findings.append(PlanFinding(
                    code, "error",
                    "unbounded all-pairs join: scans one side per row of "
                    "the other; rewrite with an equality key (salting, "
                    "banding, interval bucketing) or bound a side"))
        elif (cname in ("WindowExec", "WindowInPandasExec")
              and node.partitionSpec().isEmpty()):
            bounded = any(
                c.getClass().getSimpleName() in _WINDOW_BOUNDERS
                for c in _iter_tree(node))
            if not bounded:
                out.findings.append(PlanFinding(
                    "global-window", "error",
                    "unpartitioned window without a group limit below "
                    "it: the whole input lands in one task; partition "
                    "the window or bound its input with a top-k first"))

    if ("Sort [" in plan and "rangepartitioning" in plan
            and "TakeOrderedAndProject" not in plan):
        out.findings.append(PlanFinding(
            "global-sort", "warn",
            "global sort (range shuffle) without a fused limit; fine "
            "for bounded outputs, reconsider above fact-table inputs"))
    if "BatchEvalPython" in plan:
        out.findings.append(PlanFinding(
            "python-row-udf", "warn",
            "row-at-a-time Python UDF on the path; prefer built-ins or "
            "an Arrow-batched pandas UDF"))
    return out


def assert_scale_safe(df: DataFrame) -> None:
    """Raise ValueError listing every error-level finding (gate form)."""
    audit = audit_plan(df)
    if not audit.ok:
        msgs = "; ".join(f"{f.code}: {f.detail}" for f in audit.errors)
        raise ValueError(f"plan fails scale audit: {msgs}")

def summarize_plan(df: DataFrame, *, execute: bool = False) -> dict:
    """Plan metrics for dashboards/CI trend lines: how many exchanges
    (shuffles), broadcasts, scans, and codegen spans a query compiles
    to, plus whether any filter reached a scan.  Counting the formatted
    plan keeps it dependency-free; pair with `audit_plan` (pass/fail)
    when a number is more useful than a verdict — e.g. alerting when a
    release doubles a pipeline's shuffle count.

    Under AQE the pre-execution plan is the INITIAL one: re-plans,
    runtime broadcasts, and codegen annotation only exist after the
    query runs.  ``execute=True`` materializes the frame through the
    noop sink first and then reads the final adaptive plan — use it
    when the numbers must reflect what actually executed."""
    import re

    if execute:
        # collect() runs THIS Dataset's QueryExecution, so the adaptive
        # plan object mutates to its final form in place (a write/noop
        # sink would execute a different wrapper plan); diagnostics run
        # on samples/aggregates, so driver-side rows are acceptable
        df.collect()
    plan = _plan_str(df)
    return {
        "exchanges": plan.count("Exchange "),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": plan.count("FileScan"),
        # toString renders each whole-stage-codegen span as a "*(id)"
        # operator prefix; distinct ids = distinct fused spans
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "has_pushed_filters": "PushedFilters: [" in plan
                              and "PushedFilters: []" not in plan,
        "adaptive": "AdaptiveSparkPlan" in plan,
    }
