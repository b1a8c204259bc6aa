"""Production sketch twins: estimate-only plans, accuracy pinned here.

`agg_approx_distinct_prod` / `agg_hll_sketch_prod` drop the exact
count-distinct legs their driver-graded verification twins carry, so
the declared 100 TB plan shuffles only sketch registers.  Because no
cross-engine oracle can hash engine-specific estimates, THIS file is
their accuracy + plan-shape evidence:

* every estimate lands within published error of an exact distinct
  computed independently here;
* the physical plan contains NO Expand stage and NO exact-distinct
  aggregate (the give-away of a count_distinct leg sneaking back in).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.queries_relational import (
    agg_approx_distinct_prod,
    agg_hll_sketch_prod,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_approx_distinct_prod_within_bounds(spark, sf_dir):
    got = {r["l_returnflag"]: r
           for r in agg_approx_distinct_prod(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: r
             for r in Catalog(spark, sf_dir).lineitem
             .groupBy("l_returnflag")
             .agg(F.count_distinct("l_partkey").alias("p"),
                  F.count_distinct("l_suppkey").alias("s")).collect()}
    assert set(got) == set(exact)
    for flag, r in got.items():
        assert abs(r["approx_parts"] - exact[flag]["p"]) \
            <= 3 * 0.05 * exact[flag]["p"]
        assert abs(r["approx_supps"] - exact[flag]["s"]) \
            <= 3 * 0.05 * exact[flag]["s"]


def test_hll_sketch_prod_within_bounds(spark, sf_dir):
    got = {r["event_type"]: r["approx_users"]
           for r in agg_hll_sketch_prod(spark, sf_dir).collect()}
    ev = Catalog(spark, sf_dir).events
    exact = {r["event_type"]: r["u"]
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("u")).collect()}
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= 0.03 * exact[k], (k, est, exact[k])


@pytest.mark.parametrize("prod_fn", [agg_approx_distinct_prod,
                                     agg_hll_sketch_prod])
def test_prod_plan_has_no_exact_distinct_stage(spark, sf_dir, prod_fn):
    """The whole point of the twin: no Expand (multi-count_distinct
    lowering) and no distinct-keyed exact aggregate in the plan — the
    shuffle payload is sketch registers only."""
    plan = _plan(prod_fn(spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "count(distinct" not in plan.lower(), plan


def test_verification_twins_do_carry_the_exact_legs(spark, sf_dir):
    """Contrast pin: the driver-graded twins DO pay the exact-distinct
    cost (that is what buys the cross-engine bounds check) — if this
    ever stops holding, the twin pairing's rationale is stale."""
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_approx_distinct,
    )
    plan = _plan(agg_approx_distinct(spark, sf_dir))
    assert "Expand" in plan or "count(distinct" in plan.lower()
