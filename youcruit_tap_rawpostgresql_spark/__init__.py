"""youcruit_tap_rawpostgresql_spark — a PySpark-native ELT + query engine.

A from-scratch, idiomatic-Spark engine with the query and data-processing
capabilities of the reference Singer tap ``tap-rawpostgresql`` (config-declared
raw-SQL streams, declared column schemas, FULL_TABLE/INCREMENTAL bookmark
replication, type conformance, stream maps, schema flattening, gzip-JSONL
batch export), where Spark SQL / Catalyst replaces the PostgreSQL server as
the relational engine, plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Reference parity map: see SURVEY.md §2 (operator inventory). Reference file
citations in docstrings point into /root/reference (read-only).
"""

__version__ = "0.1.0"

from youcruit_tap_rawpostgresql_spark.spec import (  # noqa: F401
    BatchSinkConfig,
    ColumnSpec,
    StreamSpec,
    TapConfig,
)
