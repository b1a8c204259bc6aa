"""Run every declared query against its DuckDB oracle — the same check the
driver performs at sf0.01, run here at sf0.001 for speed (set TEST_SF_DIR
to sf0.01 for the full-fidelity run)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, duck, ORACLES[name], name)
    else:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
