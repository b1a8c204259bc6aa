"""Single source of truth for the engine's declared queries.

Each entry: name -> (query_fn, oracle_sql | None) where

* ``query_fn(spark, sf_dir) -> DataFrame`` runs the operator Spark-side;
* ``oracle_sql`` is the equivalent ANSI SQL DuckDB runs on the same
  parquet tables (views named region/nation/.../embeddings) — ``None``
  for ops that are not SQL-expressible (the driver then records a weaker
  rows-only check).

Naming discipline: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
hashing values.

Query names map to SURVEY.md §2 operator ids (cited per function).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: declare a query + its DuckDB oracle."""

    def wrap(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_LOADED = False


def _grade_history() -> dict[str, tuple[int, bool]]:
    """name -> (latest_graded_round, latest_grade_green) from the
    committed ``CORRECTNESS_r*.json`` files at the repo root.

    A driver row is *green* iff ``err`` is null and rows/schema/hash all
    matched.  Rows-only grades (``err == "no_oracle"``) count as green
    ONLY for queries that genuinely register no oracle — for a query
    that has one, a ``no_oracle`` row means the oracle was missing when
    graded, i.e. the evidence is stale, so it must rotate forward.
    """
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows_only_ok = {n for n, (_, sql) in _REGISTRY.items() if sql is None}
    hist: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")]
        try:
            rnd = int(m)
            with open(path) as f:
                graded = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in graded.items():
            green = row.get("err") is None and all(
                row.get(k) is True
                for k in ("rows_match", "schema_match", "hash_match"))
            if (row.get("err") == "no_oracle" and name in rows_only_ok
                    and row.get("spark_rows") is not None):
                green = True
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, green)
    return hist


def _rotated_order() -> list[str]:
    """Grading order, derived — never hand-maintained (VERDICT r4 #1).

    The driver grades ``list(queries())[:50]`` each round, so ordering IS
    the grading window.  Buckets, each stable in registration order:

    1. never driver-graded (no row in any committed CORRECTNESS file);
    2. latest grade red — fixes land here until a green row banks them;
    3. greens, stalest round first (regression re-grades).

    Committed CORRECTNESS files only change between rounds, so the
    derived order is frozen for the whole round by construction; queries
    added mid-round are never-graded and enter the window automatically.
    """
    reg_pos = {n: i for i, n in enumerate(_REGISTRY)}
    hist = _grade_history()

    def key(name: str) -> tuple[int, int, int]:
        if name not in hist:
            return (0, 0, reg_pos[name])
        rnd, green = hist[name]
        return (2, rnd, reg_pos[name]) if green else (1, rnd, reg_pos[name])

    return sorted(_REGISTRY, key=key)


def _load_all() -> None:
    """Import every module that registers queries (idempotent), then
    reorder so the driver's 50-entry grading window covers the derived
    rotation (never-graded → red-latest → stalest-green)."""
    global _LOADED, _REGISTRY
    if _LOADED:
        return
    from data_ingestion_system_spark.operators import (  # noqa: F401
        queries_search,
        queries_similarity,
        queries_ingest,
        queries_multimodal,
        queries_subquery,
        queries_text,
        queries_dedup,
        queries_relational,
    )
    # Derived grading order; intent pinned by tests/test_registry_order.py.
    _REGISTRY = {n: _REGISTRY[n] for n in _rotated_order()}
    _LOADED = True
