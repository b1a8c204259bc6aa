"""Embedding quantization round-trip + sharded export."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.embeddings import (
    dequantize_int8,
    quantize_int8,
)
from data_ingestion_system_spark.sources.writers import write_sharded


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings.select("vec_id", "embedding").limit(100)
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}

    q = quantize_int8(emb)
    qrows = {r.vec_id: r for r in q.collect()}
    assert all(-127 <= v <= 127 for r in qrows.values() for v in r.q)

    back = {r.vec_id: np.array(r.embedding)
            for r in dequantize_int8(q).collect()}
    for vid, x in orig.items():
        err = np.abs(back[vid] - x).max()
        assert err <= qrows[vid].scale / 2 + 1e-9, (vid, err)
        # int8 keeps cosine structure: direction barely moves
        cos = x @ back[vid] / (np.linalg.norm(x) * np.linalg.norm(back[vid]))
        assert cos > 0.9999


def test_write_sharded_stable_and_even(spark, sf_dir, tmp_path):
    cat = Catalog(spark, sf_dir)
    docs = cat.documents.select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_sharded(docs, out, shard_key="doc_id", n_shards=8)

    shards = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shards) == 8
    back = spark.read.json(out)
    assert back.count() == docs.count()
    # key-stability: re-export maps every doc to the same shard
    out2 = str(tmp_path / "shards2")
    write_sharded(docs, out2, shard_key="doc_id", n_shards=8)
    a = {r.doc_id: r.shard for r in spark.read.json(out).collect()}
    b = {r.doc_id: r.shard for r in spark.read.json(out2).collect()}
    assert a == b
    # no shard dominates (hash balance, loose bound)
    sizes = [v for _, v in
             spark.read.json(out).groupBy("shard").count().collect()]
    assert max(sizes) < 3 * min(sizes)

def test_moments_match_numpy(spark, sf_dir):
    """Distributed (n, mean, cov) must equal the single-node numpy
    computation on the collected corpus."""
    import numpy as np

    from data_ingestion_system_spark.catalog import Catalog
    from data_ingestion_system_spark.operators.embeddings import (
        embedding_moments,
    )

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings.select("vec_id", "embedding")
    n, mean, cov = embedding_moments(emb)
    local = np.vstack([r.embedding for r in emb.collect()]).astype(np.float64)
    assert n == local.shape[0]
    np.testing.assert_allclose(mean, local.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(local, rowvar=False, bias=True), atol=1e-10)


def test_whitened_covariance_is_identity(spark, sf_dir):
    """ZCA-whitened embeddings must have ~identity covariance (the
    definition of whitening), verified through the distributed path."""
    import numpy as np

    from data_ingestion_system_spark.catalog import Catalog
    from data_ingestion_system_spark.operators.embeddings import (
        embedding_moments,
        pca_whitener,
        whiten,
    )

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings.select("vec_id", "embedding")
    mean, w = pca_whitener(emb)
    assert np.allclose(w, w.T, atol=1e-10)        # ZCA transform is symmetric
    white = whiten(emb, mean, w)
    _, wmean, wcov = embedding_moments(white, col="white")
    d = len(wmean)
    np.testing.assert_allclose(wmean, np.zeros(d), atol=1e-8)
    np.testing.assert_allclose(wcov, np.eye(d), atol=1e-3)  # eps-regularized


def test_pca_power_matches_numpy(spark, sf_dir):
    """emb_pca_power vs a direct in-memory numpy replay: same moment
    definition (population covariance), same un-normalized C^8 v0
    iterate, same final normalize-and-project."""
    from data_ingestion_system_spark.operators.queries_similarity import (
        emb_pca_power,
    )

    cat = Catalog(spark, sf_dir)
    pdf = cat.embeddings.select("vec_id", "embedding").toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mean = mat.mean(axis=0)
    cov = (mat.T @ mat) / len(mat) - np.outer(mean, mean)
    v = np.ones(mat.shape[1])
    for _ in range(8):
        v = cov @ v
    v = v / np.linalg.norm(v)
    want = dict(zip(pdf["vec_id"], (mat - mean) @ v))
    rows = emb_pca_power(spark, sf_dir).collect()
    assert len(rows) == len(pdf)
    for r in rows:
        assert abs(r.pc1 - want[r.vec_id]) < 1e-3, r.vec_id
    # PC1 must capture at least as much variance as any raw axis
    scores = np.array([r.pc1 for r in rows])
    assert scores.var() >= mat.var(axis=0).max() - 1e-6
