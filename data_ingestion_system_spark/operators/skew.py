"""Skew-aware join: explicit key salting.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but it only fires for sort-merge joins and after a
stage materializes.  Explicit salting is the deterministic fallback for
the pathological case — a handful of hot keys owning a large fraction of
a 100 TB fact table (exactly the duplicate-transaction_id shape the
reference's correlation path tolerates):

* the skewed (probe) side gets a random salt in [0, salt) appended to its
  key — hot keys spread over `salt` partitions;
* the build side is replicated `salt` times (explode over the salt
  range), so every (key, salt) partition finds its match.

Cost: build side shuffles salt x its size — cheap when the build side is
the smaller one; correctness is join-type independent for inner joins and
preserved for left joins from the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """probe ⋈ build on `key`, with probe-side salting and build-side
    replication.  `how` may be 'inner' or 'left' (probe side preserved).

    The salt is derived from a hash of the probe row's whole tuple rather
    than rand() so the plan stays deterministic (re-runs and task retries
    produce identical partitioning — rand() breaks retry idempotence)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    probe_salted = probe.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)),
    )
    build_replicated = build.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    out = probe_salted.join(build_replicated, [key, SALT_COL], how)
    return out.drop(SALT_COL)
