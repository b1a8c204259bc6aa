"""Accuracy / equivalence pins for the approximate and sketch-based
aggregates (whose binary state the DuckDB oracle can't reproduce) plus
targeted checks on the newest relational queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark import registry

QUERIES = registry.queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimates land within 3×rsd of the exact distinct counts."""
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["approx_supps"])
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in Catalog(spark, sf_dir).lineitem.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s")).collect()
    }
    assert set(approx) == set(exact)
    for flag, (ap, asup) in approx.items():
        ep, esup = exact[flag]
        assert abs(ap - ep) <= max(3, 0.15 * ep)
        assert abs(asup - esup) <= max(3, 0.15 * esup)


def test_hll_sketch_merge_equals_direct(spark, sf_dir):
    """Union of per-event_type sketches must estimate the SAME value as a
    single sketch built over the whole column (mergeability is the whole
    point: daily sketches → monthly rollup without rescanning), and both
    must sit within 2% of the exact distinct count."""
    rows = {r["event_type"]: r["approx_users"]
            for r in QUERIES["agg_hll_sketch"](spark, sf_dir).collect()}
    merged = rows.pop("__all__")
    cat = Catalog(spark, sf_dir)
    direct = cat.events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(14))).alias("e")
    ).collect()[0]["e"]
    assert merged == direct  # sketch union is lossless wrt the direct sketch
    exact = cat.events.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(2, 0.02 * exact)
    # per-group estimates are close to per-group exact counts too
    exact_per = {r["event_type"]: r["n"]
                 for r in cat.events.groupBy("event_type").agg(
                     F.countDistinct("user_id").alias("n")).collect()}
    for et, est in rows.items():
        assert abs(est - exact_per[et]) <= max(2, 0.02 * exact_per[et])


def test_tfidf_topk_shape(spark, sf_dir):
    """Every document yields ≤3 ranked terms, ranks are 1..3, and the
    scores within a doc are non-increasing by rank."""
    rows = QUERIES["text_tfidf_topk"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = Catalog(spark, sf_dir).documents.count()
    assert len(by_doc) == n_docs
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)


def test_volume_shipping_directional(spark, sf_dir):
    """Q7 shape returns both shipping directions and only the two target
    nations, with strictly positive revenue."""
    rows = QUERIES["agg_volume_shipping"](spark, sf_dir).collect()
    assert rows, "expected at least one nation-pair/year row"
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_3", "NATION_13"}
        assert r["revenue"] > 0
        assert 1996 <= r["l_year"] <= 1997
