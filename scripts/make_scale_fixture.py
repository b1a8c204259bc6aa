#!/usr/bin/env python
"""Synthesize an sf1-scale fixture from the sf0.1 tables (10x rows).

The driver ships sf0.001/0.01/0.1 only; the scale-up spot-bench
(VERDICT r3 #4) needs one decade more to turn design-for-scale claims
into measured trends.  This replicates each table FACTOR times with
per-copy transformations chosen so workload COMPLEXITY scales the way
a real corpus does — linearly in rows, with cluster/block sizes held
constant:

* fact keys (custkey, orderkey, partkey, suppkey, user_id, event_id,
  doc_id, vec_id) shift by copy*OFFSET — referential integrity holds
  within every copy; nation/region dims stay as-is (25/5 rows, like
  reality).
* ``documents.text``: every token in copy i>0 gets an ``x{i}`` suffix —
  token sets are DISJOINT across copies (no artificial 10-member
  exact-dup clusters, which would grow dedup pair counts
  quadratically) while within-copy shingle/Jaccard structure is
  preserved exactly: 10x the clusters, same cluster sizes.
* ``embeddings.label`` shifts per copy (new IVF blocks, same block
  size — the way clusters multiply when a corpus grows) and each
  copy's vectors are sign-flipped by a fixed per-copy pattern, so
  cross-copy cosines scatter around 0 instead of being exact dups.

Timestamps/distributions are copied untouched (10x density over the
same time range — what one decade of organic growth looks like).

Output schemas byte-match the originals (pyarrow cast to the source
schema), so Catalog's scan paths behave identically.

Usage: python scripts/make_scale_fixture.py [OUT_DIR] [FACTOR]
       (defaults: /tmp/spark_graft_sf1 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# key shift per copy — when scaling an ALREADY-SCALED fixture (second
# decade), raise these above the source's max key so copies stay
# disjoint (e.g. OFFSET=1e9, LABEL_OFFSET=1e7 for sf1 -> sf10)
OFFSET = int(os.environ.get("SPARK_GRAFT_KEY_OFFSET", 10_000_000))
LABEL_OFFSET = int(os.environ.get("SPARK_GRAFT_LABEL_OFFSET", 100_000))

# table -> columns that get the key offset
KEY_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _suffix_tokens(texts: pa.Array, tag: str) -> pa.Array:
    out = [" ".join(tok + tag for tok in (t or "").split())
           for t in texts.to_pylist()]
    return pa.array(out, type=pa.string())


def _copy(table: str, src: pa.Table, i: int) -> pa.Table:
    t = src
    if i > 0:
        for col in KEY_COLS[table]:
            idx = t.schema.get_field_index(col)
            shifted = pa.compute.add(t.column(col), i * OFFSET)
            t = t.set_column(idx, t.schema.field(col),
                             shifted.cast(t.schema.field(col).type))
        if table == "documents":
            idx = t.schema.get_field_index("text")
            text = _suffix_tokens(t.column("text").combine_chunks(),
                                  f"x{i}")
            t = t.set_column(idx, t.schema.field("text"), text)
            nidx = t.schema.get_field_index("n_chars")
            n_chars = pa.compute.utf8_length(t.column("text"))
            t = t.set_column(nidx, t.schema.field("n_chars"),
                             n_chars.cast(pa.int64()))
        if table == "embeddings":
            lidx = t.schema.get_field_index("label")
            t = t.set_column(
                lidx, t.schema.field("label"),
                pa.compute.add(t.column("label"), i * LABEL_OFFSET)
                .cast(t.schema.field("label").type))
            eidx = t.schema.get_field_index("embedding")
            emb = t.column("embedding").combine_chunks()
            mat = np.stack(emb.to_numpy(zero_copy_only=False))
            rng = np.random.RandomState(1000 + i)
            signs = rng.choice([-1.0, 1.0],
                               size=mat.shape[1]).astype(np.float32)
            flipped = (mat * signs).astype(np.float32)
            arr = pa.array(list(flipped), type=t.schema.field(
                "embedding").type)
            t = t.set_column(eidx, t.schema.field("embedding"), arr)
    return t


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for table in KEY_COLS:
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        copies = 1 if table in ("region", "nation") else factor
        parts = [_copy(table, src, i) for i in range(copies)]
        out = pa.concat_tables(parts).cast(src.schema)
        pq.write_table(out, os.path.join(out_dir, f"{table}.parquet"))
        print(f"{table}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
