"""Behavioral pins for the retrieval-quality and experimentation queries
(sim_mmr_rerank, sim_matryoshka_recall, agg_welch_ttest, agg_cuped,
text_perplexity_buckets, text_rrf_fusion) — properties the DuckDB parity
check can't express: diversity, variance reduction, bucket balance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog

SF = "/root/testdata/sf0.001"


def test_mmr_never_beats_topk_relevance_but_diversifies(spark):
    """MMR's picks are a subset of the candidate list, rank-1 equals the
    plain top-1, every later pick sacrifices relevance only when
    diversity pays: mmr score <= lambda * rel for ranks >= 2."""
    from data_ingestion_system_spark.operators.queries_similarity import (
        _MMR_K_SEL, _MMR_LAMBDA, sim_mmr_rerank)

    rows = sim_mmr_rerank(spark, SF).collect()
    assert [r.mmr_rank for r in rows] == list(range(1, _MMR_K_SEL + 1))
    assert len({r.vec_id for r in rows}) == _MMR_K_SEL
    assert rows[0].mmr == rows[0].rel  # no diversity term at rank 1
    for r in rows[1:]:
        # sims among near-orthogonal fixtures may be negative, so mmr can
        # exceed lambda*rel only by the (bounded) |mu*sim| term
        assert r.mmr <= _MMR_LAMBDA * r.rel + 0.3 + 1e-9
        assert r.rel <= rows[0].rel  # rank 1 is the max-relevance pick


def test_matryoshka_recall_bounds_and_shape(spark):
    from data_ingestion_system_spark.operators.queries_similarity import (
        K, N_QUERIES, sim_matryoshka_recall)

    rows = sim_matryoshka_recall(spark, SF).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_hit <= K
        assert abs(r.recall_at_k - r.n_hit / K) < 1e-9


def test_welch_ttest_replays_in_python(spark):
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_welch_ttest)

    row = agg_welch_ttest(spark, SF).collect()[0]
    vals = {}
    for arm in ("purchase", "click"):
        xs = [r.value for r in Catalog(spark, SF).events
              .filter(F.col("event_type") == arm).select("value").collect()]
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        vals[arm] = (n, m, v)
    (n1, m1, v1), (n2, m2, v2) = vals["purchase"], vals["click"]
    se2 = v1 / n1 + v2 / n2
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.mean_diff - (m1 - m2)) < 1e-3
    assert abs(row.t_stat - (m1 - m2) / math.sqrt(se2)) < 1e-3
    dof = se2 ** 2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert abs(row.dof - dof) < 1e-2


def test_cuped_reduces_variance_and_preserves_global_mean(spark):
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_cuped)

    rows = agg_cuped(spark, SF).collect()
    assert {r.arm for r in rows} == {0, 1}
    for r in rows:
        # pooled theta minimizes POOLED variance; per-arm it must still
        # be a genuine reduction on this data, and never an explosion
        assert r.var_ratio <= 1.05
    # the adjustment is mean-zero over ALL users (xbar is the global
    # mean), so the user-weighted global mean is preserved exactly
    tot_raw = sum(r.mean_raw * r.n_users for r in rows)
    tot_adj = sum(r.mean_cuped * r.n_users for r in rows)
    assert abs(tot_raw - tot_adj) / abs(tot_raw) < 1e-2


def test_perplexity_buckets_are_balanced_and_ordered(spark):
    from data_ingestion_system_spark.operators.queries_text import (
        text_perplexity_buckets)

    rows = text_perplexity_buckets(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r.bucket == b) for b in (1, 2, 3)}
        # exact ntile fill rule: bucket sizes differ by at most one
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # buckets are contiguous in the score: every bucket-1 score <=
        # every bucket-2 score <= every bucket-3 score (ties split by id)
        for lo, hi in ((1, 2), (2, 3)):
            if sizes[lo] and sizes[hi]:
                assert (max(r.nll for r in rs if r.bucket == lo)
                        <= min(r.nll for r in rs if r.bucket == hi)
                        + 1e-12), lang


def test_rrf_fusion_rank_math(spark):
    from data_ingestion_system_spark.operators.queries_text import (
        _RRF_K, text_rrf_fusion)

    rows = text_rrf_fusion(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        want = 0.0
        if r.rank_bm25 is not None:
            want += 1.0 / (_RRF_K + r.rank_bm25)
        if r.rank_quality is not None:
            want += 1.0 / (_RRF_K + r.rank_quality)
        assert abs(r.rrf - want) < 1e-6
        assert r.rank_bm25 is not None or r.rank_quality is not None
    # output is sorted by fused score, tie-broken by doc_id
    key = [( -r.rrf, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_mann_whitney_replays_in_python(spark):
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_mann_whitney)

    row = agg_mann_whitney(spark, SF).collect()[0]
    ev = (Catalog(spark, SF).events
          .filter(F.col("event_type").isin("purchase", "click"))
          .select("event_id", "event_type", "value").collect())
    ranked = sorted(ev, key=lambda r: (r.value, r.event_id))
    r1 = sum(i + 1 for i, r in enumerate(ranked)
             if r.event_type == "purchase")
    n1 = sum(1 for r in ev if r.event_type == "purchase")
    n2 = len(ev) - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu, sig = n1 * n2 / 2.0, math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.u1 - u1) < 1e-6
    assert abs(row.z - (u1 - mu) / sig) < 1e-3


def test_benford_digit_extraction_is_decade_exact(spark):
    """The decade-corrected first-digit arithmetic is exact on the IEEE
    traps (exact powers of ten, where floor(log10(1000)) = 2 is one off)
    and on sub-1 magnitudes; fractions sum to 1."""
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_benford_digits)

    rows = agg_benford_digits(spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_frac for r in rows) - 1.0) < 1e-3

    # unit-level: replay the digit expression on adversarial literals
    import pandas as pd
    from pyspark.sql import functions as F2
    vals = [1.0, 9.999, 10.0, 100.0, 1000.0, 0.001, 0.09999, 123.456,
            999.9999, 1e-6, 5e8]
    df = spark.createDataFrame(pd.DataFrame({"value": vals}))
    e = F2.floor(F2.log10("value"))
    d_raw = F2.floor(F2.col("value") / F2.pow(F2.lit(10.0), e))
    digit = (F2.when(d_raw >= 10, F2.floor(d_raw / 10))
             .when(d_raw < 1,
                   F2.floor(F2.col("value") / F2.pow(F2.lit(10.0), e - 1)))
             .otherwise(d_raw)).cast("long")
    got = [r[0] for r in df.select(digit).collect()]
    want = [int(str(abs(v)).lstrip("0.").lstrip("0")[0]) if "e" not in
            f"{v}" else int(f"{v:e}"[0]) for v in vals]
    assert got == want, (got, want)


def test_ks_test_replays_in_python(spark):
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_ks_test)

    row = agg_ks_test(spark, SF).collect()[0]
    ev = (Catalog(spark, SF).events
          .filter(F.col("event_type").isin("purchase", "click"))
          .select("event_id", "event_type", "value").collect())
    merged = sorted(ev, key=lambda r: (r.value, r.event_id))
    n1 = sum(1 for r in ev if r.event_type == "purchase")
    n2 = len(ev) - n1
    c1 = 0
    best = (-1.0, None)
    for i, r in enumerate(merged, 1):
        c1 += r.event_type == "purchase"
        diff = abs(c1 / n1 - (i - c1) / n2)
        if diff > best[0] + 1e-15:
            best = (diff, r.value)
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.ks_stat - best[0]) < 1e-6
    assert abs(row.ks_at - best[1]) < 1e-3


def test_lorenz_gini_replays_in_python(spark):
    from data_ingestion_system_spark.operators.queries_relational import (
        agg_lorenz_gini)

    row = agg_lorenz_gini(spark, SF).collect()[0]
    ux = (Catalog(spark, SF).events
          .filter(F.col("event_type") == "purchase")
          .groupBy("user_id").agg(F.sum("value").alias("x")).collect())
    xs = [r.x for r in sorted(ux, key=lambda r: (r.x, r.user_id))]
    n, sx = len(xs), sum(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sx) \
        - (n + 1.0) / n
    assert row.n == n
    assert abs(row.total_value - sx) < 1e-2
    assert abs(row.gini - gini) < 1e-5
    assert 0.0 <= row.gini < 1.0
