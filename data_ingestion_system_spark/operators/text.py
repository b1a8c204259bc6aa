"""Text-analysis column expressions for large-scale training-data pipelines.

North-star extensions (BASELINE.json) beyond the reference surface: token
counting, quality scoring, language identification, and document
fingerprinting over a `text` column.  Everything here is built from
JVM-side `pyspark.sql.functions` (regexp/string/hash expressions inside
whole-stage codegen) — no Python UDFs in the hot path, so the same
expressions run unchanged over 100 TB of documents.

The regex subset used (\\b, \\s, \\w, alternation) behaves identically in
Java regex (Spark) and RE2 (DuckDB oracle), which is what makes these ops
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single non-space symbols —
# a deterministic stand-in for subword tokenization that needs no vocab.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
STOPWORD_PATTERN = r"\b(" + "|".join(STOPWORDS) + r")\b"
PUNCT_PATTERN = r"[^\w\s]"

# marker vocabularies for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "que", "es"),
    "fr": ("le", "les", "des", "est"),
    "zh": ("de", "shi", "le", "bu"),
}


def whitespace_tokens(col: Column) -> Column:
    """Whitespace tokenization (trimmed so edge spaces don't make empties)."""
    return F.split(F.trim(col), r"\s+")


def n_tokens_ws(col: Column) -> Column:
    return F.size(whitespace_tokens(col))


def n_tokens_bpe(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def n_punct(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_PATTERN), F.lit(0)))


def n_stopwords(col: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(STOPWORD_PATTERN), F.lit(0)))


def lang_marker_count(col: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0)))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length saturation + low punctuation +
    stopword presence — the standard cheap pre-filters for LLM corpora.
    Formula mirrored verbatim in the oracle SQL; rounded for hash parity."""
    nt = n_tokens_ws(col).cast("double")
    punct_ratio = n_punct(col).cast("double") / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    stop_ratio = n_stopwords(col).cast("double") / F.greatest(nt, F.lit(1.0))
    score = (
        F.lit(0.3) * F.least(F.lit(1.0), nt / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.4) * F.least(F.lit(1.0), stop_ratio * F.lit(4.0))
    )
    return F.round(score, 4)


# PII-shaped redaction patterns.  Kept inside the Java∩RE2 regex subset
# (classes, quantifiers, alternation — no backrefs, no lookaround) so the
# same pattern strings drive both Spark and the DuckDB oracle.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"(\+?[0-9]{1,3}[-. ]?)?(\([0-9]{2,4}\)[-. ]?)?[0-9]{2,4}[-. ][0-9]{2,4}([-. ][0-9]{2,4})?"
NUMBER_PATTERN = r"[0-9]+(\.[0-9]+)?"


def redact(col: Column, pattern: str, token: str) -> Column:
    """Replace every occurrence of ``pattern`` with ``token`` (Spark's
    regexp_replace is global; the oracle needs RE2's explicit 'g' flag)."""
    return F.regexp_replace(col, pattern, token)


def redact_pii(col: Column) -> Column:
    """Standard training-corpus scrub: emails, then phone-shaped digit
    runs, then remaining numbers.  Order matters — email local parts can
    contain digits, so emails are masked first.  Pure codegen'd
    regexp_replace chain: runs unchanged over 100 TB of text."""
    out = redact(col, EMAIL_PATTERN, "<EMAIL>")
    out = redact(out, PHONE_PATTERN, "<PHONE>")
    return redact(out, NUMBER_PATTERN, "<NUM>")


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (md5 is identical
    across engines, unlike xxhash64, so this one is oracle-checkable)."""
    return F.md5(normalized_text(col))


def hash_uniform(col: Column) -> Column:
    """Deterministic uniform in [0, 1) from a key: the first 52 bits of
    md5(key) scaled down.  A pure function of the ROW — the sampling
    primitive that is reproducible across runs, engines, partitionings,
    and incremental appends (engine-RNG sampling is none of these)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10)
        .cast("long") / F.lit(float(1 << 52))
    )


def hash_stratified_sample(df, fractions: dict, id_col: str = "doc_id",
                           stratum_col: str = "lang"):
    """Stratified sample: keep a row iff hash_uniform(id) < fraction of
    its stratum.  Map-only (the predicate evaluates at the scan), and
    the threshold form gives two guarantees RNG sampling cannot:

    * **monotone**: raising any fraction only ADDS rows — the f=0.1
      sample is a subset of the f=0.2 sample (top-up sampling without
      resampling the corpus);
    * **stable**: the kept set is independent of partitioning, row
      order, and what other rows exist (append-safe incremental runs).
    """
    u = hash_uniform(F.col(id_col))
    frac = F.lit(0.0)
    for k, v in fractions.items():
        frac = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(frac)
    return df.filter(u < frac)


def misra_gries_sketch(words, k: int = 512):
    """Per-partition Misra-Gries heavy-hitter summary over a one-column
    (`word`) DataFrame -> rows ``(word, cnt)`` plus one sentinel row
    ``('', partition_token_count)`` per partition.

    The 100 TB shape for "which terms exceed phi of the corpus": a plain
    groupBy(term) shuffles the ENTIRE vocabulary (URLs, ids — easily
    billions of groups) to count items of which only a handful matter.
    Misra-Gries keeps at most k counters per partition and guarantees
    every item with partition frequency > n_p/k survives; summing the
    per-partition guarantee, any item with GLOBAL frequency > N/k is
    emitted by at least one partition — so the candidate union is a
    SUPERSET of the true heavy hitters and only candidate-set-sized data
    (<= k rows/partition) ever shuffles.  An exact second pass, map-side
    semi-joined against the broadcast candidates, turns the superset
    into exact counts (see queries_text.text_heavy_hitters).

    Implementation is the MERGE form of MG (Agarwal et al., "Mergeable
    Summaries"): pandas value_counts per Arrow batch (vectorized — no
    per-token Python), counter merge, then the k-trim (subtract the
    (k+1)-th largest count, drop non-positives), which preserves the
    n_p/k error bound while doing O(batch + k log k) work per batch.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def mg(batches):
        acc, n_tokens = mg_reduce((pdf["word"] for pdf in batches), k)
        yield pd.DataFrame({
            "word": list(acc.index) + [""],
            "cnt": [int(c) for c in acc] + [n_tokens],
        })

    return words.mapInPandas(mg, "word string, cnt long")


def mg_reduce(word_batches, k: int):
    """Pure Misra-Gries merge core (used per partition by
    misra_gries_sketch; property-tested standalone): consume an iterable
    of pandas Series of words -> (counters: Series word->count,
    n_tokens).  Invariants (Agarwal et al.): <= k counters survive;
    every counter underestimates (acc[w] <= true[w]); the total
    undercount is bounded (true[w] - acc[w] <= n_tokens/k), hence any
    item with true count > n_tokens/k is present."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    acc = None
    n_tokens = 0
    for s in word_batches:
        n_tokens += len(s)
        vc = s.value_counts()
        acc = vc if acc is None else acc.add(vc, fill_value=0)
        if len(acc) > k:
            cut = acc.nlargest(k + 1).iloc[-1]
            acc = acc - cut
            acc = acc[acc > 0]
    if acc is None:
        acc = pd.Series(dtype="float64")
    return acc, n_tokens
