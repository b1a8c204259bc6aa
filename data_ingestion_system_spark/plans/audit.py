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


def _count_bounded_theta_joins(df: DataFrame) -> int:
    """Count logical joins where Catalyst can PROVE one side tiny
    (``maxRows`` defined and small — scalar aggregates report Some(1),
    explicit limits report their bound).  A BroadcastNestedLoopJoin
    whose build side is such a relation is the standard scalar-attach /
    bounded-probe pattern, not a scale risk."""
    n = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Join":
            for side in (node.left(), node.right()):
                mr = side.maxRows()
                if mr.isDefined() and int(mr.get()) <= _BOUNDED_SIDE_ROWS:
                    n += 1
                    break
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return n


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
      when the plan bounds the window's input — a ``WindowGroupLimit``
      (rank-filter pushdown) or a ``TakeOrderedAndProject`` (explicit
      or optimizer-derived top-k, e.g. text_zipf_slope) below it.

    warn-level (legitimate in bounded positions, worth eyes):

    * ``global-sort``        — a Sort above an Exchange rangepartitioning
      with no limit fused in: full-data range shuffle.
    * ``python-row-udf``     — BatchEvalPython: row-at-a-time Python on
      the path; ArrowEvalPython / mapInPandas do not trigger this.
    """
    plan = _plan_str(df)
    out = PlanAudit()

    n_theta = (plan.count("CartesianProduct")
               + plan.count("BroadcastNestedLoopJoin"))
    if n_theta:
        if n_theta <= _count_bounded_theta_joins(df):
            out.findings.append(PlanFinding(
                "bounded-theta-join", "warn",
                "non-equi join(s) present but every one has a side "
                "Catalyst proves <= "
                f"{_BOUNDED_SIDE_ROWS} rows (scalar attach / bounded "
                "probe) — safe at any fact scale"))
        else:
            code = ("cartesian-product" if "CartesianProduct" in plan
                    else "nested-loop-join")
            out.findings.append(PlanFinding(
                code, "error",
                "unbounded all-pairs join: scans one side per row of "
                "the other; rewrite with an equality key (salting, "
                "banding, interval bucketing) or bound a side"))

    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    has_group_limit = ("WindowGroupLimit" in plan
                       or "TakeOrderedAndProject" in plan)
    for ln in window_lines:
        # partitioned windows render windowspecdefinition(<part cols>,
        # <order> ...); the unpartitioned form starts straight at the
        # ORDER BY spec, so a partition column list is absent before the
        # first ASC/DESC token
        spec = ln.split("windowspecdefinition(", 1)[-1]
        head = spec.split(",", 1)[0]
        unpartitioned = (" ASC" in head or " DESC" in head)
        if unpartitioned and not has_group_limit:
            out.findings.append(PlanFinding(
                "global-window", "error",
                "unpartitioned window without a group limit: the whole "
                "input lands in one task; partition the window or bound "
                "its input with a top-k first"))
            break

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
