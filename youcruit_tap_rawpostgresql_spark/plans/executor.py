"""Stream SQL execution over registered views.

Replaces the reference's boundary crossing at ``client.py:300-304``
(SQL string → psycopg2 → PostgreSQL) with ``spark.sql`` over temp views:
Catalyst parses/analyzes/optimizes and Tungsten executes. Parameter binding
semantics follow ``client.py:260-298``.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql
from youcruit_tap_rawpostgresql_spark.spec import SpecError, StreamSpec


def run_sql(
    spark: SparkSession,
    sql: str,
    params: Mapping[str, Any] | None = None,
    pg_dialect: bool = True,
) -> DataFrame:
    """Execute a SQL string (optionally PG-dialect) over registered views.

    Parameters bind NATIVELY (``spark.sql(..., args=)``): ``:name``
    markers become typed plan parameters — no quoting, no injection
    surface, and unbound markers fail analysis just like the literal
    binder raised KeyError. Dialect translation is syntax-only here
    (``bind=False``); the literal-substitution binder remains available
    for engines/paths without parameterized SQL."""
    if not sql or not sql.strip():
        raise SpecError("sql must not be empty")  # reference client.py:255-258
    text = translate_pg_sql(sql, bind=False) if pg_dialect else sql
    if params:
        return spark.sql(text, args=dict(params))
    return spark.sql(text)


def run_stream_sql(
    spark: SparkSession,
    spec: StreamSpec,
    params: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Execute a stream's declared SQL with bound parameters."""
    return run_sql(spark, spec.sql, params=params, pg_dialect=True)
