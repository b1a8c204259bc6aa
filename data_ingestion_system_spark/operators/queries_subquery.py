"""Declared queries: subquery decorrelation, grouping sets, unpivot and
lateral-view shapes — §2.12 gap-closers beyond what queries_relational.py
covers.

The reference generates only flat conjunctive-filter SQL
(src/services/audit.services.ts:109-163); everything here is new scope a
real analytics engine needs.  Scale posture per query below: subqueries are
decorrelated into aggregate-then-join (never per-row recomputation),
dimension legs broadcast, and every limit is a tie-broken deterministic
top-k (TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.registry import register


@register("agg_grouping_sets", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (vs the rollup/cube queries' fixed lattices):
    one Expand + one hash-agg shuffle, same cost profile as a plain groupBy
    times the number of sets."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem
        .groupingSets(
            [[F.col("l_returnflag")], [F.col("l_linestatus")]],
            F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("n"),
        )
    )


@register("agg_ship_priority", """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def agg_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped join + agg + top-k: customer is broadcast into the
    orders scan (dim leg, no shuffle), the fact-fact join shuffles on
    orderkey, and the final ordering is a deterministic tie-broken top-10
    (TakeOrderedAndProject — no global sort at any scale)."""
    cat = Catalog(spark, sf_dir)
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.orders.filter(F.col("o_orderdate") < cutoff)
    li = cat.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register("agg_small_qty_revenue", """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""")
def agg_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated scalar subquery, decorrelated the
    scale-correct way: restrict lineitem to the (broadcast) brand parts
    first, compute the per-part avg ONCE from that restricted fact slice
    (identical values — the correlation key is the group key), then join
    agg-to-fact on l_partkey.  Never recomputes the subquery per row and
    never windows over the full fact table."""
    cat = Catalog(spark, sf_dir)
    parts = cat.part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    li = cat.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    limits = li.groupBy(F.col("l_partkey").alias("k_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit"))
    return (
        li.join(limits, F.col("l_partkey") == F.col("k_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register("join_in_agg_subquery", """
SELECT c.c_name, o.o_orderkey, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
""")
def join_in_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped IN-over-aggregate subquery.  The HAVING aggregate
    already carries the answer, so the semi-join collapses into
    agg -> filter -> join: sum(l_quantity) per orderkey (one map-side-
    combined shuffle on the already-partitioned join key), keep the >300
    heavy hitters (tiny), join orders on orderkey, broadcast customer."""
    cat = Catalog(spark, sf_dir)
    heavy = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        cat.orders.join(heavy, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@register("join_notin_nullaware", """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 400000)
""")
def join_notin_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — SQL's null-aware anti join (three-valued: one NULL
    in the subquery empties the result).  Expressed through the SQL API so
    Catalyst plans its NullAwareAntiJoin (broadcast-only by design — the
    filtered subquery side must be small; at scale, prefer NOT EXISTS when
    the column is provably non-null, which plans a shuffleable anti join
    like the join_anti query)."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("customer", "orders"))
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 400000)
    """)


@register("agg_disjunctive_revenue", """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def agg_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-ANDs join predicate.  The disjunction mixes
    columns from both sides, so it can only be evaluated post-join — but
    each side's *implied* envelope (brand IN the three values ∧ size ≤ 35;
    quantity in [1,30]) is conjunctive and is applied before the join, so
    it reaches the parquet scans as PushedFilters.  Part shrinks to three
    brands (broadcast); lineitem prunes row groups on quantity.  At 100 TB
    that envelope derivation is the difference between scanning 3/25ths of
    part and scanning all of it."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 35))
    li = cat.lineitem.filter(F.col("l_quantity").between(1, 30))
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand) & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm("Brand#12", 15, 1, 11)
                | arm("Brand#23", 25, 10, 20)
                | arm("Brand#3", 35, 20, 30))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


_IDLE_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")


@register("agg_idle_customers", f"""
WITH pool AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
  WHERE c_mktsegment IN {_IDLE_SEGMENTS!r}
)
SELECT c_mktsegment AS segment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM pool
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM pool WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
""")
def agg_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: well-funded customers in chosen segments with no
    large order.  Decorrelated scale-safe: the scalar avg is one 1-row
    aggregate broadcast into the filter (never recomputed per row), and
    NOT EXISTS is a left-anti join that shuffles both sides on custkey —
    works at any orders size, unlike NOT IN's broadcast-only null-aware
    plan (see join_notin_nullaware)."""
    cat = Catalog(spark, sf_dir)
    pool = cat.customer.filter(F.col("c_mktsegment").isin(*_IDLE_SEGMENTS)) \
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal"))
    return (
        pool.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(cat.orders.filter(F.col("o_totalprice") > 300000)
              .select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


@register("join_top_supplier", """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""")
def join_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped max-over-view (ties kept): quarterly revenue per
    supplier, return the top supplier(s).  The revenue view is computed
    once (one map-side-combined shuffle on l_suppkey); its 1-row max is
    broadcast back as a filter — no window over the full view, no second
    scan of lineitem.  Revenue is rounded to 2 decimals *before* both the
    max and the equality so the tie comparison is on identical doubles in
    both engines."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1998-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-04-01").cast("timestamp_ntz")
    rev = (
        cat.lineitem
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("best_rev"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .join(F.broadcast(cat.supplier),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register("agg_returned_customers", """
SELECT c.c_custkey, c.c_name,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
                AS BIGINT)) / 100.0 AS revenue,
       c.c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def agg_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: customers who returned the most revenue in a
    quarter.  Both fact filters reach their scans (quarter on orders,
    returnflag on lineitem), the fact-fact join shuffles on orderkey,
    customer broadcasts into the grouped result, and the top-20 is a
    tie-broken TakeOrderedAndProject.

    Revenue sums EXACT INTEGER CENTS (per-item round, bigint sum, one
    final divide) instead of rounding a double sum: double summation is
    order-dependent across partitions, and a total landing on a .xx5
    boundary rounds differently run to run — integer cents make the
    aggregate bit-stable under any partitioning (and any engine)."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("bigint")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg((F.sum(cents) / 100.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register("agg_order_count_dist", """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey) t
GROUP BY c_count
""")
def agg_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped distribution-of-group-sizes: orders per customer
    (zero-order customers preserved by the left join — count(o_orderkey)
    skips NULLs), then the distribution of those counts.  First agg
    shuffles on custkey (the join's own key, so AQE reuses the
    partitioning); the second agg's input is one row per customer and its
    key space is tiny."""
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat.customer.join(
            cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register("agg_unpivot_orders", """
SELECT o_orderstatus, 'sum_price' AS metric,
       round(sum(o_totalprice), 2) AS val
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT o_orderstatus, 'n_orders' AS metric,
       CAST(count(*) AS DOUBLE) AS val
FROM orders GROUP BY o_orderstatus
""")
def agg_unpivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide metrics -> long rows): one grouped aggregation,
    then a zero-shuffle Expand over the metric columns — vs the oracle's
    two-scan UNION ALL formulation."""
    cat = Catalog(spark, sf_dir)
    wide = cat.orders.groupBy("o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count("*").cast("double").alias("n_orders"),
    )
    return wide.unpivot("o_orderstatus", ["sum_price", "n_orders"], "metric", "val")


@register("text_word_topk", """
SELECT word, count(*) AS freq
FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents) t
WHERE word <> ''
GROUP BY word
ORDER BY freq DESC, word
LIMIT 20
""")
def text_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide word frequency via explode (lateral view / UDTF shape —
    §2.12 gap): generator runs inside whole-stage codegen, partial counts
    combine map-side before the one shuffle on word, top-20 is a tie-broken
    TakeOrderedAndProject.  At 100 TB the same plan holds; skewed stopwords
    are absorbed by the map-side partial aggregation."""
    cat = Catalog(spark, sf_dir)
    words = cat.documents.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(20)
    )


@register("join_lateral_latest", """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey LIMIT 1) o ON true
""")
def join_lateral_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (each customer's most recent order) —
    the per-row-subquery API surface the reference's per-row S3 lookup
    (O-17, ``src/services/audit.services.ts:210-242``) would use in SQL
    form.  Spark decorrelates the LIMIT-1 lateral into a per-key
    aggregation/window over one shuffle of orders rather than running
    the subquery per customer row — same plan family as
    window_topk_per_group, reached from the SQL-lateral surface."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("customer", "orders"))
    return spark.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 1) o
    """)


@register("join_waiting_suppliers", """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""")
def join_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers SOLELY responsible for a returned line
    in multi-supplier finished orders — a correlated EXISTS and a
    correlated NOT EXISTS against the same fact table.  (Q21's
    receipt>commit lateness predicate maps to the returnflag the fixture
    has; the join topology is Q21's.)  Spark plans both correlations as
    LeftSemi/LeftAnti joins on orderkey against a pre-filtered lineitem —
    three same-key shuffles that AQE co-partitions, no per-row subquery
    execution; supplier broadcasts and the top-20 is a tie-broken
    TakeOrderedAndProject."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("supplier", "lineitem", "orders"))
    return spark.sql("""
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s.s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20
    """)
