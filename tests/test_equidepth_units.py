"""Unit pins for round-3's distributed exact algorithms.

1. The equi-depth histogram's rank→bucket arithmetic must reproduce
   ntile(10) semantics for awkward sizes (N < 10, N % 10 == 0, primes):
   the oracle only exercises the fixture's N, so the fill rule (first
   N%10 buckets get one extra row) is pinned here across sizes by
   comparing against Spark's own single-partition ntile on small data
   (where the global window is harmless).
2. The Arrow cosine kernel must agree with direct numpy cosine on a
   random block, and its left-fold order must be the exact left-to-right
   fold (not a BLAS reassociation).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.mark.parametrize("n", [3, 9, 10, 11, 37, 100, 101])
def test_distributed_bucket_matches_ntile(spark, n):
    rng = np.random.RandomState(n)
    vals = rng.uniform(0, 1000, n).round(6).tolist()
    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(vals)], "value double, event_id long")

    # ground truth: Spark's own ntile on one partition (fine at test n)
    w = Window.orderBy("value", "event_id")
    truth = {r["event_id"]: r["b"] for r in
             df.select("event_id", F.ntile(10).over(w).alias("b")).collect()}

    # the distributed arithmetic from agg_equidepth_histogram, inlined
    # with a deliberately silly partition count to stress the offsets
    nparts = 4
    probs = [i / nparts for i in range(1, nparts)]
    bounds = df.agg(F.percentile_approx("value", probs, 10_000)
                    .alias("b")).collect()[0]["b"]
    pid = F.when(F.col("value").isNull(), F.lit(0))
    for i, cut in enumerate(bounds):
        pid = pid.when(F.col("value") < F.lit(float(cut)), F.lit(i))
    pid = pid.otherwise(F.lit(len(bounds)))
    staged = df.withColumn("pid", pid)
    counts = {r["pid"]: r["n"] for r in
              staged.groupBy("pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = [], 0
    for p in range(len(bounds) + 1):
        offsets.append(acc)
        acc += counts.get(p, 0)
    off = F.element_at(F.array(*[F.lit(o) for o in offsets]),
                       F.col("pid") + 1)
    wp = Window.partitionBy("pid").orderBy("value", "event_id")
    rank = (F.row_number().over(wp) + off)
    base, rem = divmod(n, 10)
    head = rem * (base + 1)
    r0 = rank - 1
    if base == 0:
        bucket = rank
    else:
        bucket = (F.when(rank <= head, F.floor(r0 / (base + 1)) + 1)
                  .otherwise(rem + F.floor((r0 - head) / base) + 1))
    got = {r["event_id"]: r["b"] for r in
           staged.select("event_id",
                         bucket.cast("int").alias("b")).collect()}
    assert got == truth


def test_cosine_kernel_matches_numpy_and_fold_order():
    import pandas as pd

    from data_ingestion_system_spark.operators.queries_dedup import (
        COSINE_NEAR_DUP,
        _cosine_block_pairs,
    )

    rng = np.random.RandomState(7)
    n, d = 40, 64
    base = rng.normal(size=d)
    # half the vectors correlated with `base` so pairs cross threshold
    M = np.where(rng.rand(n, 1) < 0.5,
                 base + 0.1 * rng.normal(size=(n, d)),
                 rng.normal(size=(n, d))).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [row for row in M]})
    out = _cosine_block_pairs(None, pdf)

    M64 = M.astype(np.float64)
    expected = {}
    for i in range(n):
        for j in range(i + 1, n):
            # exact left-to-right fold, term by term — DuckDB's order
            dot = 0.0
            na = 0.0
            nb = 0.0
            for k in range(d):
                dot += M64[i, k] * M64[j, k]
            for k in range(d):
                na += M64[i, k] * M64[i, k]
                nb += M64[j, k] * M64[j, k]
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            if cos >= COSINE_NEAR_DUP:
                expected[(i, j)] = cos
    got = {(int(r.id_a), int(r.id_b)): r.cos_raw for r in out.itertuples()}
    assert set(got) == set(expected)
    assert expected, "fixture produced no near pairs; test is vacuous"
    for key, cos in expected.items():
        assert got[key] == cos  # BIT-identical, not approx

    # degenerate blocks
    empty = _cosine_block_pairs(None, pdf.iloc[:0])
    assert len(empty) == 0
    single = _cosine_block_pairs(None, pdf.iloc[:1])
    assert len(single) == 0
