"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference API-audit ingestion system
(Aryanahyperverge/Data_ingestion_system), re-expressed Spark-first.

The reference is a TypeScript pipeline (Express middleware -> S3 -> SQS ->
Lambda -> Postgres + Redis cache) whose data semantics are: ingest
request/response events, correlate them by transaction id, and serve
conjunctive-equality filtered, time-ordered, limited searches with optional
payload enrichment.  This package implements those semantics natively on
Spark (DataFrame / SQL / Catalyst / Structured Streaming), plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) mandated by the project north star.

Layout:
    session.py    - SparkSession bootstrap tuned for the workload
    catalog.py    - table registry over a directory of parquet tables
    operators/    - query operators (search, joins, dedup, similarity, ...)
    functions/    - scalar/vector column-expression helpers
    sources/      - batch sources & partitioned sinks (JSON landing, binary)
    streaming/    - Structured Streaming ingest pipeline + metrics
    plans/        - above-plan components (TTL'd result cache)
"""

__version__ = "0.1.0"
