"""Vector column expressions (embedding similarity, north-star ops).

Cosine is computed in **double** precision with a strict left-to-right
fold over the elements — the same order and width DuckDB uses for
``list_dot_product`` on ``DOUBLE[]`` — so oracle comparisons are
bit-exact, not merely close.  Inputs are ``array<float>``; the cast to
``array<double>`` happens before any arithmetic (summing float32 would
accumulate engine-specific error).

All JVM-side (`F.zip_with` / `F.aggregate`): at 100 TB this is one
codegen'd pass per row, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
