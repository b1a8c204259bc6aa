"""Incremental MinHash index: ingest-time dedup without corpus rescans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.operators.dedup_index import (
    append_index,
    probe_index,
    write_index,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "text")


def _perturb(text: str) -> str:
    """Light edit: drop the 3rd token — Jaccard stays near 1."""
    w = text.split()
    return " ".join(w[:2] + w[3:])


def test_probe_finds_planted_neardup_and_passes_fresh(
        spark, sf_dir, corpus, tmp_path):
    idx = str(tmp_path / "minhash_index")
    write_index(corpus, idx)

    donor = corpus.filter(F.length("text") > 200).first()
    batch = spark.createDataFrame(
        [
            (1_000_001, _perturb(donor["text"])),           # near-dup
            (1_000_002, "entirely novel tokens qq ww ee rr tt yy uu "
                        "ii oo pp aa ss dd ff gg hh jj kk ll zz xx "
                        "cc vv bb nn mm q1 w2 e3 r4 t5 y6 u7 i8 o9"),
        ],
        "doc_id long, text string",
    )
    hits = probe_index(spark, idx, batch, corpus, threshold=0.5).collect()
    pairs = {(r["batch_id"], r["corpus_id"]): r["jaccard"] for r in hits}
    assert (1_000_001, donor["doc_id"]) in pairs
    assert pairs[(1_000_001, donor["doc_id"])] > 0.8
    assert not any(b == 1_000_002 for b, _ in pairs)


def test_append_makes_previous_batch_visible(spark, sf_dir, corpus,
                                             tmp_path):
    idx = str(tmp_path / "minhash_index")
    write_index(corpus, idx)
    day1 = spark.createDataFrame(
        [(2_000_001, "alpha beta gamma delta epsilon zeta eta theta "
                     "iota kappa lam mu nu xi omicron pi rho sigma "
                     "tau upsilon phi chi psi omega one two three")],
        "doc_id long, text string",
    )
    # day 1 is clean against the corpus -> accept it into the index
    assert probe_index(spark, idx, day1, corpus).count() == 0
    append_index(day1, idx)

    # day 2 re-submits (a light edit of) day 1's doc: the probe must
    # catch it against the APPENDED signatures, with day-1 text coming
    # from the union'd corpus view, not a rescan
    day2 = spark.createDataFrame(
        [(3_000_001, _perturb("alpha beta gamma delta epsilon zeta eta "
                              "theta iota kappa lam mu nu xi omicron pi "
                              "rho sigma tau upsilon phi chi psi omega "
                              "one two three"))],
        "doc_id long, text string",
    )
    hits = probe_index(spark, idx, day2,
                       corpus.unionByName(day1), threshold=0.5).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in hits} == {
        (3_000_001, 2_000_001)}


def test_index_is_signature_sized(spark, sf_dir, corpus, tmp_path):
    """The index stores bands x docs fixed-width rows — no text."""
    idx = str(tmp_path / "minhash_index")
    write_index(corpus, idx)
    df = spark.read.parquet(idx)
    assert set(df.columns) == {"band", "bh", "doc_id"}
    n_docs = corpus.count()
    assert df.count() == 8 * n_docs          # BANDS rows per doc


def test_probe_exclude_mb_skips_own_partial_write(spark, tmp_path):
    """Replay semantics: an index write stamped with micro-batch id N is
    invisible to a probe excluding N (its own partial write on replay),
    visible to every other probe; un-stamped (batch-API) rows survive
    any exclusion (null-safe comparison)."""
    doc = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi")
    idx = str(tmp_path / "idx_mb")
    corpus = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    write_index(corpus, idx, mb=5)

    probe_doc = spark.createDataFrame([(2, _perturb(doc))],
                                      "doc_id long, text string")
    # normal probe and a DIFFERENT batch's probe both see the near-dup
    assert probe_index(spark, idx, probe_doc, corpus).count() == 1
    assert probe_index(spark, idx, probe_doc, corpus,
                       exclude_mb=6).count() == 1
    # the stamping batch's own replay does not
    assert probe_index(spark, idx, probe_doc, corpus,
                       exclude_mb=5).count() == 0

    # un-stamped rows (batch API) are never excluded
    idx2 = str(tmp_path / "idx_plain")
    write_index(corpus, idx2)
    assert probe_index(spark, idx2, probe_doc, corpus,
                       exclude_mb=5).count() == 1

    # mb-stamped "append" is dynamic overwrite of its own partition:
    # writing batch 5 twice leaves ONE copy of its signature rows
    append_index(corpus, idx, mb=5)
    rows = spark.read.parquet(idx)
    assert rows.count() == rows.distinct().count() == 8  # BANDS per doc
