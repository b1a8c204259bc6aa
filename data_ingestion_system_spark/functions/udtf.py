"""Custom table-function (UDTF) surface: Python UDTFs (Spark 3.5+).

The reference has no UDF/UDAF/UDTF surface at all (SURVEY.md §2.12 — its
logic is host-language TypeScript); together with functions/udaf.py this
module closes the table-function corner the Spark-native way.  A Python
UDTF maps one input row to zero-or-more output rows with an explicit
schema — the escape hatch for row-expanding logic that built-in
generators (explode/inline/posexplode) can't express.

Scale note: a UDTF is a Python-process hop per batch, exactly like a
scalar Python UDF — so anything expressible with JVM generators should
use them instead.  The sliding-window chunker below exists in BOTH
forms: `chunk_starts`/JVM explode drives the declared query
(`text_chunk_windows`, codegen'd, oracle-checked) and `ChunkWindows` is
the UDTF surface, pinned equivalent in tests/test_text_ops.py.  Use the
UDTF shape only when the per-row expansion needs real Python (tokenizer
libraries, stateful decoders, ...).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

CHUNK_WINDOW = 32  # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (window - stride = overlap)


@udtf(returnType="chunk_id: int, chunk_text: string")
class ChunkWindows:
    """Split whitespace-tokenized text into overlapping sliding-window
    chunks (the standard context-window preparation for RAG / training
    corpora).  One input row -> ceil(len/stride) rows; the trailing chunk
    is allowed to be short, matching the sequential chunker."""

    def eval(self, text: str, window: int, stride: int):
        if text is None:
            return
        toks = text.strip().split()
        for i, start in enumerate(range(0, max(len(toks), 1), stride)):
            yield i, " ".join(toks[start:start + window])


def chunk_rows(tokens: Column, window: int = CHUNK_WINDOW,
               stride: int = CHUNK_STRIDE) -> Column:
    """JVM form of the same chunker: array of (chunk_id, chunk_text)
    structs, built from sequence/slice/concat_ws inside whole-stage
    codegen — explode the result to get the UDTF's output shape with no
    Python in the path."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(tokens) - 1, F.lit(0)), F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(tokens, s + 1, window)).alias("chunk_text"),
        ),
    )
