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


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from data_ingestion_system_spark.operators import (  # noqa: F401
        queries_dedup,
        queries_ingest,
        queries_multimodal,
        queries_relational,
        queries_search,
        queries_similarity,
        queries_subquery,
        queries_text,
    )
    _LOADED = True
