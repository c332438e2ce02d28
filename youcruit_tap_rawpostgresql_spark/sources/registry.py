"""Parquet source registry: load testdata tables and register temp views.

In the reference, the "source" is a live PostgreSQL server and the whole SQL
string is shipped to it (``client.py:300-304``). Here the source is a set of
parquet tables registered as temp views; Spark SQL over those views replaces
the PostgreSQL planner/executor. Catalyst pushes filters/column pruning into
the parquet scan, which is the columnar analogue of whole-query pushdown.

Scale notes: parquet scans parallelize per file split
(``spark.sql.files.maxPartitionBytes``, default 128 MB); at 100 TB the same
``spark.read.parquet`` call fans out to thousands of tasks with no code
change. Views are plain metadata — registration cost is O(1) per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver generates (TESTDATA.md); identical schema across SFs.
TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't map them
    natively; we read them as longs and convert."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (session-TZ).

    Parquet micros timestamps with isAdjustedToUTC=false surface as
    TIMESTAMP_NTZ in Spark 4; the engine (and its DuckDB oracles, and
    streaming watermarks, which reject NTZ event time) operate on plain
    TIMESTAMP with the session pinned to UTC — the cast is shift-free."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata parquet table as a DataFrame.

    Nanosecond-timestamp columns (pandas/arrow default) are read as raw
    nano longs (``nanosAsLong``) and truncated to microsecond timestamps —
    the same floor-to-micros DuckDB applies, so oracles agree. The
    conversion is a per-row expression inside codegen; predicate pushdown
    on the converted column is lost, which is acceptable for the synthetic
    fixtures (production tables should write micros)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        from pyspark.sql import functions as F

        # the legacy conf is consulted at read time (the relation captures
        # it); restore afterwards so OTHER parquet reads in this session
        # keep normal nanos→timestamp semantics
        key = "spark.sql.legacy.parquet.nanosAsLong"
        old = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return normalize_timestamps(df)
    return normalize_timestamps(spark.read.parquet(path))


def register_testdata(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table.

    Returns the name → DataFrame mapping for direct DataFrame use.
    """
    # every query funnels through here: pin the session timezone so
    # timestamp formatting/comparison matches the (TZ-naive) oracle even on
    # a caller-supplied session on a non-UTC machine
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # cap the stock 200 shuffle partitions on caller-supplied sessions:
    # fixture-scale shuffles (and especially multi-stage stateful streaming,
    # where AQE is disabled) pay per-partition scheduling overhead ~6x for
    # nothing; results are partitioning-independent by construction
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 64:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except ValueError:
        pass  # "auto" (AQE-managed) — leave it alone
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
