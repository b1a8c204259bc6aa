"""Declared queries: multimodal columns over a media table derived from
`documents` (content = utf-8 bytes of `text` — a deterministic blob per
row, so the binary plumbing is exercised on driver-checkable data).

`multimodal_meta` is fully oracle-checked (byte lengths / frame counts are
engine-portable integer arithmetic).  The mapInPandas feature/frame ops
carry the driver's rows-only check; their exact values are pinned by
tests/test_multimodal.py against straight numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.multimodal import (
    FRAME_BYTES,
    frame_sample,
    media_features,
)
from data_ingestion_system_spark.registry import register


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> typed media rows: blob = utf-8 bytes, kind by id."""
    cat = Catalog(spark, sf_dir)
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return cat.documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


@register("multimodal_meta", f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       strlen(text) AS byte_len,
       CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
FROM documents
""")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection of the media table: blob byte length and
    fake-codec frame count (ceil(len/256)) — the JVM-side half of the
    multimodal pipeline (no Python touches the bytes here)."""
    media = _media_from_documents(spark, sf_dir)
    blen = F.octet_length("content").cast("bigint")
    return media.select(
        "media_id", "kind",
        blen.alias("byte_len"),
        F.ceil(blen / F.lit(float(FRAME_BYTES))).cast("bigint").alias("n_frames"),
    )


@register("multimodal_features")  # mapInPandas fake-decode: rows-only check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas (16-dim
    block-mean features; deterministic fake codec)."""
    return media_features(_media_from_documents(spark, sf_dir))


@register("multimodal_frame_sample")  # mapInPandas fake-codec: rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 4th 256-byte window per blob, one output row
    per sampled frame (row-exploding mapInPandas)."""
    return frame_sample(_media_from_documents(spark, sf_dir), every_n=4)


@register("multimodal_near_dup")  # mapInPandas features: rows-only check
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal dedup: decode -> 16-dim features (Arrow
    mapInPandas) -> SRP-LSH candidate pairs within media kind -> exact
    centered-cosine verify (>= 0.999).

    Two deliberate choices:

    * features are **centered** (per-vector mean removed) before any
      similarity math — raw byte-block means all live in the positive
      orthant, where cosine saturates near 1 for unrelated blobs;
      centered cosine is profile-shape correlation, which actually
      separates duplicates from noise;
    * candidates come from the multi-table SRP-LSH used by similarity
      search, NOT an all-pairs join: within-kind all-pairs is quadratic
      per kind AND the kind key has only 3 values (3 busy partitions on
      any cluster).  At a 0.999 threshold the per-table collision
      probability for a true near-dup is ~0.9, so 8 tables give
      ~1 - 1e-8 recall; byte-identical media share every bucket.

    Planted-duplicate recovery is pinned in tests/test_multimodal.py.
    """
    from data_ingestion_system_spark.operators.multimodal import near_dup_pairs

    feats = media_features(_media_from_documents(spark, sf_dir))
    return near_dup_pairs(feats, threshold=0.999)
