"""Registry-wide oracle output-type lint (VERDICT r7 next-round #2).

The driver's value hash is sensitive to the PHYSICAL Arrow type of each
oracle output column where its rows/schema checks are not: DuckDB
returns an uncast integer ``sum()`` as HUGEINT (Arrow
``decimal128(38,0)``) while the matching Spark aggregate is ``bigint``,
so a value-identical result still hash-mismatches (this cost
``text_novelty_curve`` two red rounds, r6+r7).  This test makes the
class structurally impossible: every declared oracle is planned through
DuckDB with ``LIMIT 0`` and its Arrow output schema must contain no
decimal / hugeint-typed column.  Oracles that genuinely need fixed-point
output must cast to BIGINT/DOUBLE explicitly (the registry-wide
discipline every other query already follows).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import duckdb_connection

ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def _offending_columns(schema: pa.Schema) -> list[str]:
    bad = []
    for field in schema:
        t = field.type
        if pa.types.is_decimal(t):
            bad.append(f"{field.name}: {t}")
    return bad


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_are_hashable(name, duck):
    sql = ORACLES[name]
    # LIMIT 0 plans the query and yields the physical output schema
    # without materializing rows; DuckDB accepts CTE-led SELECTs as a
    # derived table.
    schema = duck.execute(
        f"SELECT * FROM ({sql}) __lint LIMIT 0"
    ).fetch_arrow_table().schema
    bad = _offending_columns(schema)
    assert not bad, (
        f"oracle '{name}' produces decimal-typed output column(s) {bad}; "
        "the driver's hash distinguishes DuckDB HUGEINT/DECIMAL from "
        "Spark BIGINT/DOUBLE even when values are identical — add an "
        "explicit CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
    )
