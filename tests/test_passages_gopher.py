"""Unit pins for dedup_duplicate_passages and text_gopher_rules:
independent pure-Python replays over the sf0.001 corpus (a second
oracle besides DuckDB — same style as the heavy-hitters replay)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from data_ingestion_system_spark.catalog import Catalog

K = 8
STOP = ("the", "a", "of", "and", "to", "in", "is", "it")


def _words(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def test_duplicate_passages_matches_python_replay(spark, sf_dir):
    from data_ingestion_system_spark.operators.queries_dedup import (
        dedup_duplicate_passages,
    )

    docs = {r.doc_id: _words(r.text)
            for r in Catalog(spark, sf_dir).documents.collect()}
    gram_docs: dict[tuple, set] = defaultdict(set)
    starts: dict[int, list[int]] = defaultdict(list)
    for did, w in docs.items():
        for i in range(len(w) - K + 1):
            g = tuple(w[i:i + K])
            gram_docs[g].add(did)
            starts[did].append(i)
    expected = set()
    for did, w in docs.items():
        hit = sorted(i for i in range(len(w) - K + 1)
                     if len(gram_docs[tuple(w[i:i + K])]) >= 2)
        run: list[int] = []
        for i in hit + [None]:
            if run and (i is None or i != run[-1] + 1):
                expected.add((did, run[0], run[-1] + K - 1, len(run)))
                run = []
            if i is not None:
                run.append(i)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in dedup_duplicate_passages(spark, sf_dir).collect()}
    assert got == expected
    # the fixture plants near-dup docs, so spans must actually exist
    assert len(got) > 0


def test_gopher_rules_match_python_replay(spark, sf_dir):
    from data_ingestion_system_spark.operators.queries_text import (
        text_gopher_rules,
    )

    rows = {r.doc_id: r for r in text_gopher_rules(spark, sf_dir).collect()}
    docs = Catalog(spark, sf_dir).documents.collect()
    assert len(rows) == len(docs)
    saw_pass = saw_fail = False
    for d in docs:
        w = _words(d.text)
        r = rows[d.doc_id]
        assert r.n_words == len(w)
        # HALF_UP to match Spark/DuckDB round(), not Python's half-even
        mwl = math.floor(sum(map(len, w)) / len(w) * 1e4 + 0.5) / 1e4
        assert abs(r.mean_word_len - mwl) < 1e-9
        n_stop = len(re.findall(r"\b(" + "|".join(STOP) + r")\b",
                                d.text.lower()))
        assert r.n_stop == n_stop
        assert r.ok_word_count == (50 <= len(w) <= 100000)
        assert r.ok_stopwords == (n_stop >= 2)
        assert r.pass_all == (r.ok_word_count and r.ok_word_len and r.ok_alpha
                              and r.ok_symbols and r.ok_stopwords)
        saw_pass |= bool(r.pass_all)
        saw_fail |= not r.pass_all
    # the rule set must actually split the corpus, not rubber-stamp it
    assert saw_pass and saw_fail


def test_top2gram_chars_matches_python_replay(spark, sf_dir):
    """Char-weighted top-2-gram rule: independent Counter replay with
    the same (count, gram) tie-break, HALF_UP rounding like the
    engines'."""
    from collections import Counter

    from data_ingestion_system_spark.operators.queries_text import (
        text_top2gram_chars,
    )

    cat = Catalog(spark, sf_dir)
    docs = {r.doc_id: r.text for r in cat.documents.collect()}
    rows = {r.doc_id: r
            for r in text_top2gram_chars(spark, sf_dir).collect()}
    n_checked = 0
    for did, text in docs.items():
        w = _words(text)
        if len(w) < 2:
            assert did not in rows
            continue
        grams = Counter(" ".join(w[i:i + 2]) for i in range(len(w) - 1))
        top_gram = max(grams, key=lambda g: (grams[g], g))
        chars_ns = len(re.sub(r"\s", "", text))
        frac = grams[top_gram] * len(top_gram.replace(" ", "")) / chars_ns
        frac = math.floor(frac * 1e6 + 0.5) / 1e6
        r = rows[did]
        assert r.top_gram == top_gram, did
        assert r.top_cnt == grams[top_gram], did
        assert abs(r.top2gram_char_frac - frac) < 1e-9, did
        n_checked += 1
    assert n_checked == len(rows)
