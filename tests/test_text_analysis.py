

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
