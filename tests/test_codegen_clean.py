"""Whole-stage-codegen hygiene gate: every declared query must COMPILE.

Spark's default posture (``spark.sql.codegen.fallback=true``) is to
swallow janino compile failures and silently run the span interpreted —
correctness survives but the hot path loses codegen, which is exactly
what happened to ``dedup_embedding_cosine`` in round 2 (the unrolled
cosine inside a BroadcastHashJoin ``doConsume`` blew janino's limits
and the join quietly ran interpreted, 3.1 s → 4.5 s).  With fallback
DISABLED a compile failure becomes a hard error, so this test turns
"silently slower" into "red build" for all 142 declared plans.

sf0.001 keeps the data cost trivial; compile cost is data-independent
(the generated code depends only on the plan), so this pins codegen
health for every plan shape the engine declares.
"""

from __future__ import annotations

import pytest

from data_ingestion_system_spark import registry

QUERIES = registry.queries()


@pytest.fixture(scope="module")
def strict_codegen(spark):
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", old)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_declared_query_codegen_compiles(strict_codegen, sf_dir, name):
    df = QUERIES[name](strict_codegen, sf_dir)
    # noop sink: full distributed execution, no driver-side row transfer
    df.write.format("noop").mode("overwrite").save()
