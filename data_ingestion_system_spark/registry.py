"""Single source of truth for the engine's declared queries.

Each entry: name -> (query_fn, oracle_sql | None) where

* ``query_fn(spark, sf_dir) -> DataFrame`` runs the operator Spark-side;
* ``oracle_sql`` is the equivalent ANSI SQL DuckDB runs on the same
  parquet tables (views named region/nation/.../embeddings) — ``None``
  for ops that are not SQL-expressible (the driver then records a weaker
  rows-only check).

Naming discipline: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
hashing values.

Query names map to SURVEY.md §2 operator ids (cited per function).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: declare a query + its DuckDB oracle."""

    def wrap(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_LOADED = False

# r4 rotation (VERDICT r3 "Next round" #1): CORRECTNESS_r03 landed green
# for the whole r3 window, so cumulative driver-verified coverage is
# 141/172.  Exactly THIRTY-ONE queries have never had a driver row — the
# thirty added after the r3 window froze plus diag_profile_events (the
# documented r3 sacrifice).  This round's window: those 31 first (in
# registration order), then 19 fills taken from the OLDEST-graded set
# (CORRECTNESS_r01's leading keys, untouched since r1) as regression
# re-grades.  Green r4 rows for the front 31 → 172/172 cumulative.
#
# Freeze-then-add discipline (VERDICT #2): this window is FROZEN as of
# r4 turn 1.  Queries added during r4 MUST register behind slot 50 —
# _load_all() puts non-priority names after the window, so a new
# @register anywhere lands behind automatically; never edit
# _R4_PRIORITY after the round's first commit.
_R4_PRIORITY: tuple[str, ...] = (
    # --- 31 never-driver-graded (registration order) ---
    # similarity / embedding analytics (7)
    "sim_ann_recall", "emb_cluster_quality", "emb_covariance",
    "emb_pca_power", "sim_mmr_rerank", "sim_matryoshka_recall",
    "sim_range_search",
    # text r3-tail (8)
    "text_dsir_weights", "text_bigram_nll", "text_gopher_rules",
    "text_top2gram_chars", "text_perplexity_buckets", "text_bm25_topk",
    "text_rrf_fusion", "text_feature_hashing",
    # dedup r3-tail + graph (6)
    "dedup_semantic", "dedup_source_overlap", "dedup_minhash_estimate",
    "dedup_duplicate_passages", "dedup_canonical_pick", "graph_triangles",
    # the r3 sacrifice (1)
    "diag_profile_events",
    # experimentation / order statistics (9)
    "agg_quantile_sketch", "agg_welch_ttest", "agg_cuped",
    "agg_mann_whitney", "agg_benford_digits", "agg_ks_test",
    "window_scd2_intervals", "agg_lorenz_gini", "agg_funnel_window",
    # --- 19 oldest-graded fills (CORRECTNESS_r01 leading keys) ---
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_cluster_components", "dedup_levenshtein",
    "dedup_contamination", "dedup_embedding_cosine", "ingest_keys",
    "ingest_project_cast", "ingest_expectations", "agg_corr_stats",
    "ingest_variant_payload", "multimodal_meta", "multimodal_features",
    "multimodal_frame_sample", "multimodal_near_dup",
    "agg_pricing_summary", "agg_revenue_by_nation",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent), then
    reorder so the driver's 50-entry grading window covers _R4_PRIORITY."""
    global _LOADED, _REGISTRY
    if _LOADED:
        return
    from data_ingestion_system_spark.operators import (  # noqa: F401
        queries_search,
        queries_similarity,
        queries_ingest,
        queries_multimodal,
        queries_subquery,
        queries_text,
        queries_dedup,
        queries_relational,
    )
    # explicit priority first (in listed order), everything else after in
    # registration order; ordering intent pinned by
    # tests/test_registry_order.py.
    rest = {n: v for n, v in _REGISTRY.items() if n not in set(_R4_PRIORITY)}
    _REGISTRY = {
        **{n: _REGISTRY[n] for n in _R4_PRIORITY if n in _REGISTRY},
        **rest,
    }
    _LOADED = True
