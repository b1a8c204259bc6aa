

def test_pack_sequences_offsets_are_contiguous(spark, sf_dir):
    """Packing layout invariants: within each language the token
    offsets tile [0, total) with no gaps or overlaps in the declared
    order, and window spans match the offsets arithmetically."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["text_pack_windows"](spark, sf_dir) \
        .collect()
    by_lang = {}
    for r in rows:
        off = r.win_start  # reconstruct: win_start = off // 512
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r.n_tokens, r.doc_id))
        off = 0
        for r in rs:
            assert r.win_start == off // 512
            assert r.win_end == (off + r.n_tokens - 1) // 512
            assert r.n_windows_spanned == r.win_end - r.win_start + 1
            off += r.n_tokens


def test_novelty_curve_first_bucket_is_all_new(spark, sf_dir):
    """Slice 0 has no history, so its novelty is exactly 1.0; later
    slices can only repeat-or-add (0 <= n_new <= n_distinct), and the
    corpus-wide sum of n_new equals the number of distinct shingles."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    df = entrymod.queries()["text_novelty_curve"](spark, sf_dir)
    rows = {r.bucket: r for r in df.collect()}
    assert rows[0].n_new == rows[0].n_distinct
    assert float(rows[0].novelty) == 1.0
    for r in rows.values():
        assert 0 <= r.n_new <= r.n_distinct
    # total new across buckets == global distinct shingle count
    from data_ingestion_system_spark.catalog import Catalog
    toks = Catalog(spark, sf_dir).documents.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    ).filter(F.size("w") >= 5)
    n_distinct_global = toks.select(F.explode(F.expr(
        "transform(sequence(0, size(w) - 5), "
        "i -> xxhash64(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], "
        "w[i+4])))")).alias("sh")).distinct().count()
    assert sum(r.n_new for r in rows.values()) == n_distinct_global


def test_nb_langid_confusion_is_a_partition_of_the_corpus(spark, sf_dir):
    """Every document lands in exactly one confusion cell (the argmax is
    total and unique), and per-actual-lang row counts rebuild the lang
    histogram exactly."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_nb_langid"](spark, sf_dir)
    rows = df.collect()
    from data_ingestion_system_spark.catalog import Catalog
    truth = {r.lang: r.n for r in Catalog(spark, sf_dir).documents
             .groupBy("lang").count().withColumnRenamed("count", "n")
             .collect()}
    got = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + r.n_docs
    assert got == truth
