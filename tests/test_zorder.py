"""Z-order layout: every output file must have a bounded min-max range in
BOTH clustering columns, where a single-column sort leaves the second
dimension spanning the full domain (unprunable).

The judging metric is per-dimension average bbox width — a balanced
split always has ~1/n_files *area* per file regardless of shape, so area
can't distinguish layouts; what data skipping sees is the per-column
min/max width a predicate must overlap."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.sources.writers import write_zordered

COLS = ("l_partkey", "l_suppkey")
N_FILES = 16


def _file_bboxes(path: str, cols=COLS):
    """Per-file (min, max) of each col from parquet row-group stats."""
    boxes = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        boxes.append({c: (lo[c], hi[c]) for c in cols})
    return boxes


def _avg_width(boxes, spans, col):
    return sum((b[col][1] - b[col][0] + 1) / spans[col] for b in boxes) / len(boxes)


def _spans(li):
    spans = {}
    for c in COLS:
        lo, hi = li.agg(F.min(c), F.max(c)).first()
        spans[c] = hi - lo + 1
    return spans


def test_zorder_bounds_every_dimension(spark, sf_dir, tmp_path):
    li = Catalog(spark, sf_dir).lineitem.select(*COLS, "l_quantity")
    spans = _spans(li)

    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(li, zpath, list(COLS), n_files=N_FILES)
    # strawman: same file count, sorted by the FIRST column only
    (li.repartitionByRange(N_FILES, F.col(COLS[0]))
       .sortWithinPartitions(COLS[0])
       .write.parquet(lpath))

    zboxes, lboxes = _file_bboxes(zpath), _file_bboxes(lpath)
    assert len(zboxes) == N_FILES

    # single-column sort: second dimension spans ~the full domain
    assert _avg_width(lboxes, spans, COLS[1]) > 0.9
    # z-order: EVERY dimension bounded well below the domain
    for c in COLS:
        assert _avg_width(zboxes, spans, c) < 0.5, c

    # correctness: layout is a permutation, not a transformation
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.groupBy().sum("l_quantity").first()[0] == \
        li.groupBy().sum("l_quantity").first()[0]


def test_zorder_second_column_predicate_skips_files(spark, sf_dir, tmp_path):
    """A predicate on the NON-leading column alone must overlap only a
    minority of z-ordered files' stats — the case single-column sort can
    never prune."""
    li = Catalog(spark, sf_dir).lineitem.select(*COLS)
    zpath = str(tmp_path / "z")
    write_zordered(li, zpath, list(COLS), n_files=N_FILES)
    boxes = _file_bboxes(zpath)
    values = [r[0] for r in
              li.select(COLS[1]).distinct().orderBy(COLS[1]).collect()]
    hits = sum(
        sum(1 for b in boxes if b[COLS[1]][0] <= v <= b[COLS[1]][1])
        for v in values
    )
    avg_hit_frac = hits / (len(values) * len(boxes))
    assert avg_hit_frac < 0.6, avg_hit_frac
