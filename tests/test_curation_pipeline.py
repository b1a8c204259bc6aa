"""End-to-end LLM corpus-curation story (the north-star counterpart of
test_integration's reference story): raw documents -> exact dedup ->
MinHash-LSH near-dup cluster collapse -> quality gate -> deterministic
per-language sampling -> hash-sharded training export.  Every stage is
an operator this engine ships; the test asserts the curated corpus'
invariants rather than intermediate mechanics."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.dedup import (
    connected_components,
    exact_dedup_survivors,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    verify_candidates,
    word_shingles,
)
from data_ingestion_system_spark.operators.text import (
    hash_uniform,
    quality_score,
)
from data_ingestion_system_spark.sources.writers import write_sharded

NEAR_DUP_J = 0.7
QUALITY_MIN = 0.5


def test_corpus_curation_end_to_end(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang")
    n_raw = docs.count()

    # 1. exact dedup (byte-identical docs collapse to min id)
    survivors = exact_dedup_survivors(docs, "doc_id", "text")
    exact = docs.join(survivors.select("doc_id"), "doc_id")
    n_exact = exact.count()
    assert 0 < n_exact <= n_raw

    # 2. near-dup collapse: LSH candidates -> exact verify -> connected
    # components -> keep each cluster's min id
    sh = word_shingles(exact, "doc_id", "text")
    sig = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sig)
    dup_pairs = (verify_candidates(sh, cand)
                 .filter(F.col("jaccard") >= NEAR_DUP_J))
    clusters = connected_components(dup_pairs)   # (node, cluster_id)
    drop = (clusters.groupBy("cluster_id")
            .agg(F.min("node").alias("keep"))
            .join(clusters, "cluster_id")
            .filter(F.col("node") != F.col("keep"))
            .select(F.col("node").alias("doc_id")))
    deduped = exact.join(drop, "doc_id", "left_anti")
    n_dedup = deduped.count()
    assert n_dedup <= n_exact

    # invariant: NO verified near-dup pair survives in the curated set
    sh2 = word_shingles(deduped, "doc_id", "text")
    leftover = (verify_candidates(
        sh2, lsh_candidate_pairs(minhash_signatures(sh2)))
        .filter(F.col("jaccard") >= NEAR_DUP_J))
    assert leftover.count() == 0

    # 3. quality gate (codegen'd composite score)
    curated = deduped.filter(quality_score(F.col("text")) >= QUALITY_MIN)
    n_q = curated.count()
    assert 0 < n_q <= n_dedup

    # 4. deterministic per-language downsample (keep 'en' fully,
    # halve the rest) — reruns must pick the SAME docs
    keep = (F.col("lang") == "en") | (hash_uniform(F.col("doc_id")) < 0.5)
    sampled = curated.filter(keep)
    again = curated.filter(keep)
    assert (sampled.count() == again.count()
            and sampled.join(again, "doc_id", "left_anti").count() == 0)

    # 5. hash-sharded export: deterministic shard per doc, all rows out
    out = str(tmp_path / "export")
    write_sharded(sampled.select("doc_id", "text"), out,
                  shard_key="doc_id", n_shards=8, fmt="parquet")
    shard_dirs = glob.glob(f"{out}/shard=*")
    assert spark.read.parquet(out).count() == sampled.count()
    assert 0 < len(shard_dirs) <= 8
    # one data file per shard (one task owns each)
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/part-*")) == 1
