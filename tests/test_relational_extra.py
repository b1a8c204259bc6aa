"""Accuracy / equivalence pins for the approximate and sketch-based
aggregates (whose binary state the DuckDB oracle can't reproduce) plus
targeted checks on the newest relational queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark import registry

QUERIES = registry.queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The declared query's within-bounds booleans hold: HLL++ estimates
    land within 3×rsd of the exact distinct counts (the same predicate
    the bounds-style oracle pins driver-side — this keeps a local pin
    that fails with a readable row if the sketch ever drifts)."""
    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["parts_ok"] and r["supps_ok"], r
        assert r["exact_parts"] > 0 and r["exact_supps"] > 0


def test_hll_sketch_merge_equals_direct(spark, sf_dir):
    """Union of per-event_type sketches must estimate the SAME value as a
    single sketch built over the whole column (mergeability is the whole
    point: daily sketches → monthly rollup without rescanning); the
    declared query's within_bounds booleans pin 3σ accuracy vs exact."""
    rows = {r["event_type"]: (r["exact_users"], r["within_bounds"])
            for r in QUERIES["agg_hll_sketch"](spark, sf_dir).collect()}
    for et, (exact, ok) in rows.items():
        assert ok, (et, exact)
    cat = Catalog(spark, sf_dir)
    # mergeability pinned directly: union-of-group-sketches == one sketch
    merged = cat.events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
          ).collect()[0]["e"]
    direct = cat.events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(14))).alias("e")
    ).collect()[0]["e"]
    assert merged == direct  # sketch union is lossless wrt the direct sketch


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


def test_align_interpolate_edge_semantics(spark):
    """COGROUPED_MAP interpolation: exact-hit returns the grid value,
    out-of-range clamps to the boundary, duplicate grid timestamps
    average, and a user present in only one relation emits nothing."""
    from datetime import datetime

    from data_ingestion_system_spark.functions.grouped import (
        align_interpolate,
    )

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    a = spark.createDataFrame(
        [
            (1, t("2024-01-01T00:00:00"), 10.0),
            (1, t("2024-01-01T00:00:00"), 30.0),   # dup ts -> mean 20
            (1, t("2024-01-01T04:00:00"), 40.0),
            (3, t("2024-01-01T00:00:00"), 5.0),    # user 3: no b rows
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    b = spark.createDataFrame(
        [
            (1, t("2023-12-31T12:00:00")),  # before grid -> clamp 20
            (1, t("2024-01-01T00:00:00")),  # exact hit   -> 20
            (1, t("2024-01-01T01:00:00")),  # quarter way -> 25
            (1, t("2024-01-01T23:00:00")),  # after grid  -> clamp 40
            (2, t("2024-01-01T00:00:00")),  # user 2: no a rows
        ],
        "user_id long, ts timestamp_ntz",
    )
    rows = {(r["user_id"], r["ts"]): r["v_interp"]
            for r in align_interpolate(a, b).collect()}
    assert rows == {
        (1, t("2023-12-31T12:00:00")): 20.0,
        (1, t("2024-01-01T00:00:00")): 20.0,
        (1, t("2024-01-01T01:00:00")): 25.0,
        (1, t("2024-01-01T23:00:00")): 40.0,
    }


def test_pagerank_star_graph_known_values(spark, tmp_path):
    """PageRank on a hand-built star: hub connected to 3 spokes.  With
    symmetric edges and d=0.85 the hub must outrank every spoke, the
    3 spokes tie exactly (graph symmetry), and each iteration
    preserves total mass = 1 (up to fp)."""
    import shutil

    from data_ingestion_system_spark.operators.queries_relational import (
        graph_pagerank,
    )

    # orders: one customer (hub) per order; lineitem: supplier spokes
    orders = spark.createDataFrame(
        [(i, 1) for i in range(1, 4)], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 11), (2, 12), (3, 13)], "l_orderkey long, l_suppkey long")
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    orders.write.parquet(f"{sf}/orders.parquet")
    lineitem.write.parquet(f"{sf}/lineitem.parquet")
    rows = graph_pagerank(spark, sf).collect()
    pr = {r["node"]: r["pagerank"] for r in rows}
    assert set(pr) == {"c1", "s11", "s12", "s13"}
    assert pr["s11"] == pr["s12"] == pr["s13"]
    assert pr["c1"] > pr["s11"]
    assert abs(sum(pr.values()) - 1.0) < 1e-4   # mass conservation
    shutil.rmtree(sf, ignore_errors=True)


def test_boilerplate_ngrams_planted_span(spark, tmp_path):
    """Plant one 6-token span into several otherwise-unique docs: every
    planted doc reports its shared 5-grams as boilerplate, the unique
    docs report zero."""
    from data_ingestion_system_spark.operators.queries_text import (
        text_boilerplate_ngrams,
    )

    span = "alpha beta gamma delta epsilon zeta"
    docs = [(i, f"u{i}a u{i}b u{i}c {span} u{i}d u{i}e") for i in range(4)]
    docs += [(9, "only unique tokens here nothing shared at all ok")]
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(f"{sf}/documents.parquet")
    rows = {r["doc_id"]: r for r in
            text_boilerplate_ngrams(spark, sf).collect()}
    # planted docs: 11 tokens -> 7 grams; the 2 fully-shared grams are
    # the span's interior windows ("alpha..epsilon", "beta..zeta")
    for i in range(4):
        assert rows[i]["n_grams"] == 7
        assert rows[i]["n_boiler"] == 2
    assert rows[9]["n_boiler"] == 0


def test_seasonal_decompose_identity_and_constancy(spark, sf_dir):
    """Decomposition invariants: y = trend + seasonal + residual holds
    at output precision (each term quantized at 4 dp, so the identity
    holds within 2e-4), and the seasonal component is CONSTANT within
    every (event_type, hour-of-day) cell — it is that cell's mean
    detrended value by definition."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["window_seasonal_decompose"](
        spark, sf_dir).collect()
    assert rows
    cells = {}
    for r in rows:
        assert abs(r.y - (r.trend + r.seasonal + r.residual)) < 2e-4, r
        key = (r.event_type, r.h.hour)
        cells.setdefault(key, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in cells.values())


def test_label_propagation_two_planted_communities(spark, tmp_path):
    """LPA on a hand-built graph of two disjoint customer-supplier
    cliques: after 3 rounds every node in a clique carries one label,
    the two communities never merge (no cross edges), and sizes are
    exact.  Also pins the k-NN sparsifier: a customer with more than 3
    suppliers keeps only the 3 strongest edges."""
    import shutil

    from data_ingestion_system_spark.operators.queries_relational import (
        graph_label_propagation,
    )

    # community A: customers 1,2 <-> suppliers 11,12 (2 orders each so
    # the edges beat the tie-break deterministically); community B:
    # customers 3,4 <-> suppliers 13,14.  customer 5 has FIVE suppliers
    # in B with distinct weights; only its top-3 edges must survive.
    rows, ok = [], 1
    def order(ck, sks, copies=1):
        nonlocal ok
        for _ in range(copies):
            for sk in sks:
                rows.append((ok, ck, sk))
                ok += 1
    order(1, [11, 12], 2)
    order(2, [11, 12], 2)
    order(3, [13, 14], 2)
    order(4, [13, 14], 2)
    # weights: s13 x4, s14 x3, s15 x2, s16 x1, s17 x1 -> top-3 = 13,14,15
    order(5, [13], 4); order(5, [14], 3); order(5, [15], 2)
    order(5, [16], 1); order(5, [17], 1)
    orders = spark.createDataFrame(
        [(o, c) for o, c, _ in rows], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(o, s) for o, _, s in rows], "l_orderkey long, l_suppkey long")
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    orders.write.parquet(f"{sf}/orders.parquet")
    lineitem.write.parquet(f"{sf}/lineitem.parquet")

    got = {r["community"]: r["n_members"]
           for r in graph_label_propagation(spark, sf).collect()}
    # every node lands somewhere: 4+5 community members + customer 5's
    # kept suppliers; pruned suppliers s16/s17 keep no edge and vanish
    assert sum(got.values()) == 10  # c1,c2,s11,s12 + c3,c4,c5,s13,s14,s15
    assert len(got) == 2
    assert sorted(got.values()) == [4, 6]
    shutil.rmtree(sf, ignore_errors=True)


def _write_events(spark, tmp_path, rows):
    import shutil  # noqa: F401

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir(exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


def test_rolling_distinct_users_hand_windows(spark, tmp_path):
    """Trailing-7-day distinct users on a hand fixture: a user active
    6 days before a day still counts for it; 7+ days before does not;
    duplicate events one day count once."""
    import datetime as dt

    from data_ingestion_system_spark.operators.queries_relational import (
        agg_rolling_distinct_users,
    )

    t = lambda d, h=0: dt.datetime(2024, 3, d, h)  # noqa: E731
    sf = _write_events(spark, tmp_path, [
        (1, t(1), 10, "click", 1.0),
        (2, t(1, 5), 10, "click", 1.0),   # same user+day: counts once
        (3, t(5), 20, "click", 1.0),
        (4, t(7), 30, "click", 1.0),      # day 1 still in [1..7]
        (5, t(12), 40, "click", 1.0),     # day 5 out ([6..12]), 7 in
    ])
    got = {str(r.day): r.n_users_7d
           for r in agg_rolling_distinct_users(spark, sf).collect()}
    assert got == {
        "2024-03-01": 1,          # {10}
        "2024-03-05": 2,          # {10 (day 1 in [Feb 28..5]), 20}
        "2024-03-07": 3,          # {10, 20, 30} — day 1 still in [1..7]
        "2024-03-12": 2,          # [6..12]: day 5 aged out -> {30, 40}
    }, got


def test_session_gap_sweep_knee(spark, tmp_path):
    """One user with 20- and 45-minute gaps: 15-min gap -> 3 sessions,
    30-min -> 2, 60-min -> 1; events_per_session = 3 / n_sessions."""
    import datetime as dt

    from data_ingestion_system_spark.operators.queries_relational import (
        agg_session_gap_sweep,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    m = lambda mins: base + dt.timedelta(minutes=mins)  # noqa: E731
    sf = _write_events(spark, tmp_path, [
        (1, m(0), 1, "click", 1.0),
        (2, m(20), 1, "click", 1.0),
        (3, m(65), 1, "click", 1.0),
    ])
    rows = {r.gap_minutes: (r.n_sessions, r.events_per_session)
            for r in agg_session_gap_sweep(spark, sf).collect()}
    assert rows[15][0] == 3 and rows[30][0] == 2 and rows[60][0] == 1
    assert rows[30][1] == 1.5 and rows[60][1] == 3.0


def test_activity_streaks_hand_runs(spark, tmp_path):
    """Gaps-and-islands on planted runs: days 1-3 + 5 + 7-8 make three
    streaks, longest 3, six active days; duplicate events within a
    day count once."""
    import datetime as dt

    from data_ingestion_system_spark.operators.queries_relational import (
        window_activity_streaks,
    )

    t = lambda d: dt.datetime(2024, 3, d, 9)  # noqa: E731
    sf = _write_events(spark, tmp_path, [
        (1, t(1), 1, "click", 1.0),
        (2, t(1), 1, "view", 1.0),     # same day: one active day
        (3, t(2), 1, "click", 1.0),
        (4, t(3), 1, "click", 1.0),
        (5, t(5), 1, "click", 1.0),
        (6, t(7), 1, "click", 1.0),
        (7, t(8), 1, "click", 1.0),
    ])
    rows = window_activity_streaks(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_streaks, r.longest_streak, r.active_days) == (3, 3, 6)
