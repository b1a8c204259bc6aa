"""Plan linter: flags scale-hostile shapes, passes the engine's own
declared queries (which are written to avoid them)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.plans.audit import (
    assert_scale_safe,
    audit_plan,
)


@pytest.fixture(scope="module")
def pair(spark):
    # big enough that maxRows exceeds the linter's bounded-side proof
    a = spark.range(5000).withColumnRenamed("id", "x")
    b = spark.range(5000).withColumnRenamed("id", "y")
    return a, b


def test_flags_cartesian(pair):
    a, b = pair
    # small side broadcasts (BroadcastNestedLoopJoin); with broadcast
    # suppressed it renders CartesianProduct -- both are error-level
    audit = audit_plan(a.crossJoin(b))
    assert audit.codes() & {"cartesian-product", "nested-loop-join"}
    assert not audit.ok
    audit2 = audit_plan(a.hint("shuffle_replicate_nl").crossJoin(b))
    assert "cartesian-product" in audit2.codes()


def test_flags_nested_loop_theta_join(pair):
    a, b = pair
    audit = audit_plan(a.join(b, a.x < b.y))
    assert "nested-loop-join" in audit.codes()


def test_flags_unpartitioned_window(spark):
    df = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id")))
    # rank with no limit: global window, single task
    audit = audit_plan(df.filter(F.col("r") > 1))
    assert "global-window" in audit.codes()
    with pytest.raises(ValueError, match="global-window"):
        assert_scale_safe(df.filter(F.col("r") > 1))


def test_top_k_group_limit_is_exempt(spark):
    # rank <= k: WindowGroupLimit bounds the state -> no error
    df = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))).filter("r <= 5")
    assert audit_plan(df).ok


def test_scalar_attach_crossjoin_downgraded(spark):
    # corpus-total pattern: crossJoin with a 1-row aggregate is the
    # documented safe shape -- warn (bounded-theta-join), never error
    big = spark.range(5000).withColumnRenamed("id", "x")
    tot = big.agg(F.sum("x").alias("t"))
    audit = audit_plan(big.crossJoin(F.broadcast(tot)))
    assert audit.ok
    assert "bounded-theta-join" in audit.codes()


def test_unrelated_bounded_join_cannot_launder_cartesian(spark):
    """ADVICE r2: boundedness must attach to the SPECIFIC theta join.
    One unbounded all-pairs join plus an unrelated bounded-side equi
    join in the same plan must still be an error."""
    a = spark.range(5000).withColumnRenamed("id", "x")
    b = spark.range(5000).withColumnRenamed("id", "y")
    dim = spark.range(2000).limit(100).withColumnRenamed("id", "x")
    laundered = a.join(F.broadcast(dim), "x").crossJoin(b)
    audit = audit_plan(laundered)
    assert not audit.ok
    assert audit.codes() & {"cartesian-product", "nested-loop-join"}


def test_unrelated_topk_cannot_exempt_global_window(spark):
    """ADVICE r2: the group-limit exemption is scoped to each window's
    own subtree — a top-k elsewhere in the plan must not exempt an
    unrelated unbounded global window."""
    ranked = spark.range(1000).withColumn(
        "r", F.row_number().over(Window.orderBy("id")))
    topk = spark.range(1000).orderBy(F.col("id").desc()).limit(5)
    composed = ranked.join(topk.withColumnRenamed("id", "tid"),
                           ranked.id == F.col("tid"), "left")
    audit = audit_plan(composed)
    assert "global-window" in audit.codes()


def test_flags_row_python_udf(spark):
    plus = F.udf(lambda v: v + 1, "bigint")
    audit = audit_plan(spark.range(10).select(plus("id").alias("v")))
    assert "python-row-udf" in audit.codes()
    assert audit.ok  # warn-level only


def test_partitioned_window_passes(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 5).withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    assert audit_plan(df).ok


def test_declared_queries_scale_safe(spark, sf_dir):
    """Every declared query passes the error-level gate — the linter
    encodes the engine's own design rules, so its queries must clear
    it. (Brute-force cosine uses a broadcasted equality-free scorer,
    not a cartesian plan; the LSH families are banded equi-joins.)"""
    import __spark_entry__ as entrymod

    # ZERO exceptions: r2's sole allowlist entry (agg_equidepth_histogram's
    # global ntile) was replaced by a distributed exact ranking in r3, so
    # every declared query clears the gate outright.
    failures = {}
    for name, fn in entrymod.queries().items():
        audit = audit_plan(fn(spark, sf_dir))
        codes = {f.code for f in audit.errors}
        if codes:
            failures[name] = sorted(codes)
    assert not failures, f"declared queries failing plan audit: {failures}"


def test_guarded_sql_refuses_cartesian_at_submit_time(spark, sf_dir):
    """The runtime gate the linter exists for: a user's all-pairs SQL is
    refused when SUBMITTED (ValueError, no job launched); a sane query
    on the same views returns a DataFrame."""
    from data_ingestion_system_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    cat.register_views(("orders", "customer"))
    with pytest.raises(ValueError, match="cartesian|nested-loop"):
        cat.guarded_sql(
            "SELECT * FROM orders o JOIN customer c "
            "ON o.o_totalprice > c.c_acctbal")
    ok = cat.guarded_sql(
        "SELECT c_mktsegment, count(*) AS n FROM customer "
        "GROUP BY c_mktsegment")
    assert ok.count() > 0

    # DataFrame-API twin
    with pytest.raises(ValueError, match="global-window"):
        cat.guarded_query(cat.orders.withColumn(
            "r", F.row_number().over(Window.orderBy("o_orderkey"))))
    assert cat.guarded_query(cat.orders.limit(5)).count() == 5


def test_summarize_plan_counts(spark, sf_dir):
    from data_ingestion_system_spark.catalog import Catalog
    from data_ingestion_system_spark.plans.audit import summarize_plan

    cat = Catalog(spark, sf_dir)
    # filtered scan: pushed filters, no shuffle
    s = summarize_plan(cat.events.filter(F.col("user_id") == 7))
    assert s["scans"] == 1 and s["has_pushed_filters"]
    assert s["exchanges"] - s["broadcasts"] == 0   # no data shuffle
    # groupBy: exactly one (possibly AQE-wrapped) shuffle exchange;
    # codegen spans only exist in the FINAL adaptive plan -> execute
    g = summarize_plan(cat.events.groupBy("event_type").count(),
                       execute=True)
    assert g["exchanges"] - g["broadcasts"] >= 1
    assert g["codegen_spans"] >= 1
