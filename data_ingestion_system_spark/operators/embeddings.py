"""Embedding storage ops: int8 quantization (north-star adjacent).

At 100 TB an fp32 embedding column dominates storage and shuffle width;
symmetric per-vector int8 quantization cuts it 4x with bounded error.
Arrow-vectorized both ways (one numpy pass per batch); the scale rides
with the vector so dequantization is self-contained.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

QUANT_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("scale", T.DoubleType()),
    T.StructField("q", T.ArrayType(T.IntegerType())),  # int8 values in [-127,127]
])

DEQUANT_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def quantize_int8(df: DataFrame) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, scale, q): symmetric per-vector
    int8; scale = max|x| / 127, q = round(x / scale)."""

    def qbatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            scale = np.maximum(np.abs(mat).max(axis=1), 1e-12) / 127.0
            q = np.rint(mat / scale[:, None]).astype(np.int32)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "scale": scale,
                "q": [row.tolist() for row in q],
            })

    return df.mapInPandas(qbatch, QUANT_SCHEMA)


def dequantize_int8(df: DataFrame) -> DataFrame:
    """(vec_id, scale, q) -> (vec_id, embedding: double[]); error per
    element is bounded by scale/2."""

    def dbatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            q = np.vstack(pdf["q"].to_numpy()).astype(np.float64)
            emb = q * pdf["scale"].to_numpy()[:, None]
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "embedding": [row.tolist() for row in emb],
            })

    return df.mapInPandas(dbatch, DEQUANT_SCHEMA)
