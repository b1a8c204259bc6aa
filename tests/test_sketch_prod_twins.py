"""Production sketch twins: estimate-only plans, accuracy pinned here.

`approx_distinct_prod_estimates` / `hll_sketch_prod_estimates` are the
declared 100 TB plans — no exact count-distinct legs, so the shuffle
carries only sketch registers.  Since r5 the REGISTERED queries
`agg_approx_distinct_prod` / `agg_hll_sketch_prod` wrap those untouched
subtrees with a separate exact aggregation and emit oracle-pinnable
``within_bounds`` booleans (VERDICT r4 #5), so the driver hash-checks
them like every other query.  This file pins what the oracle cannot:

* the production subtrees' physical plans contain NO Expand stage and
  NO exact-distinct aggregate (the give-away of a count_distinct leg
  sneaking back in);
* the raw estimates land within published error of an exact distinct
  computed independently here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.queries_relational import (
    agg_approx_distinct_prod,
    agg_hll_sketch_prod,
    approx_distinct_prod_estimates,
    hll_sketch_prod_estimates,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_approx_distinct_prod_estimates_within_bounds(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    got = {r["l_returnflag"]: r
           for r in approx_distinct_prod_estimates(cat).collect()}
    exact = {r["l_returnflag"]: r
             for r in cat.lineitem
             .groupBy("l_returnflag")
             .agg(F.count_distinct("l_partkey").alias("p"),
                  F.count_distinct("l_suppkey").alias("s")).collect()}
    assert set(got) == set(exact)
    for flag, r in got.items():
        assert abs(r["approx_parts"] - exact[flag]["p"]) \
            <= 3 * 0.05 * exact[flag]["p"]
        assert abs(r["approx_supps"] - exact[flag]["s"]) \
            <= 3 * 0.05 * exact[flag]["s"]


def test_hll_sketch_prod_estimates_within_bounds(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    got = {r["event_type"]: r["approx_users"]
           for r in hll_sketch_prod_estimates(cat).collect()}
    ev = cat.events
    exact = {r["event_type"]: r["u"]
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("u")).collect()}
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= 0.03 * exact[k], (k, est, exact[k])


@pytest.mark.parametrize("frag_fn", [approx_distinct_prod_estimates,
                                     hll_sketch_prod_estimates])
def test_prod_plan_has_no_exact_distinct_stage(spark, sf_dir, frag_fn):
    """The whole point of the production plan: no Expand
    (multi-count_distinct lowering) and no distinct-keyed exact
    aggregate — the shuffle payload is sketch registers only."""
    plan = _plan(frag_fn(Catalog(spark, sf_dir)))
    assert "Expand" not in plan, plan
    assert "count(distinct" not in plan.lower(), plan


@pytest.mark.parametrize("wrapper_fn,bool_cols", [
    (agg_approx_distinct_prod, ("parts_ok", "supps_ok")),
    (agg_hll_sketch_prod, ("within_bounds",)),
])
def test_registered_wrappers_pin_bounds_true(spark, sf_dir,
                                             wrapper_fn, bool_cols):
    """The driver-facing wrappers must emit all-TRUE bounds booleans —
    the same rows the DuckDB oracle pins."""
    rows = wrapper_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in bool_cols:
            assert r[c] is True, (r, c)


def test_verification_twins_do_carry_the_exact_legs(spark, sf_dir):
    """Contrast pin: the r1-era verification twin mixes sketch and exact
    legs in ONE groupBy, paying the Expand lowering on the whole
    aggregate — if this ever stops holding, the twin pairing's
    rationale is stale."""
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_approx_distinct,
    )
    plan = _plan(agg_approx_distinct(spark, sf_dir))
    assert "Expand" in plan or "count(distinct" in plan.lower()
