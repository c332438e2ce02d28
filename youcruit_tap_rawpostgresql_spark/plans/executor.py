"""Stream SQL execution over registered views.

Replaces the reference's boundary crossing at ``client.py:300-304``
(SQL string → psycopg2 → PostgreSQL) with ``spark.sql`` over temp views:
Catalyst parses/analyzes/optimizes and Tungsten executes. Parameter binding
semantics follow ``client.py:260-298``.
"""

from __future__ import annotations

import weakref as _weakref
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql
from youcruit_tap_rawpostgresql_spark.spec import SpecError, StreamSpec


# PG extension functions with no Spark builtin, registered as SQL scalar
# UDFs (JVM-side, codegen-friendly — Spark 4 SQL UDFs) so reference SQL
# carrying them runs verbatim. pg_trgm's similarity(): per-word trigram
# sets (lowercase, word split, two leading + one trailing space per word,
# pg_trgm's extraction scheme) and |A∩B|/|A∪B|; NULL input → NULL,
# no trigrams → 0 like PG. KNOWN DELTA (round-8 advisory, also in the
# plans/dialect.py header): the word split is ASCII-only ([^a-z0-9]+),
# matching a C-locale PG; pg_trgm under a real locale keeps non-ASCII
# alphanumerics, so similarity('café', …) diverges from a UTF-8 PG.
# The PG docs literal pins it:
# similarity('word', 'two words') = 0.36363636 (tests/test_pg_pinned.py).
# The % match OPERATOR is NOT rewritten (indistinguishable from modulo
# without type analysis) — write similarity(a, b) >= 0.3 explicitly.
_PG_FUNCTION_DDL = (
    """
CREATE OR REPLACE TEMPORARY FUNCTION trgm_set(s STRING) RETURNS ARRAY<STRING>
RETURN array_distinct(flatten(transform(
  filter(split(lower(s), '[^a-z0-9]+'), w -> w != ''),
  w -> transform(sequence(1, length(concat('  ', w, ' ')) - 2),
                 i -> substring(concat('  ', w, ' '), i, 3)))))
""",
    """
CREATE OR REPLACE TEMPORARY FUNCTION similarity(a STRING, b STRING)
RETURNS DOUBLE
RETURN CASE WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS DOUBLE)
  ELSE coalesce(
    CAST(size(array_intersect(trgm_set(a), trgm_set(b))) AS DOUBLE)
      / nullif(CAST(size(array_union(trgm_set(a), trgm_set(b))) AS DOUBLE),
               0.0),
    0.0) END
""",
)

_PG_FUNCTIONS_READY: "_weakref.WeakSet" = _weakref.WeakSet()


def ensure_pg_functions(spark: SparkSession) -> None:
    """Register the PG-extension SQL UDFs once per SparkSession. The memo
    is a WeakSet of session OBJECTS, not applicationId: temporary
    functions are session-scoped, and ``spark.newSession()`` shares the
    applicationId but not the function registry (round-8 self-review —
    an id-keyed memo would skip registration on the second session and
    similarity() would fail analysis there)."""
    if spark in _PG_FUNCTIONS_READY:
        return
    for ddl in _PG_FUNCTION_DDL:
        spark.sql(ddl)
    # jsonb mutators (round-11): pandas-UDF-backed — Spark has no json
    # mutation expression; see functions/jsonb.py for the PG semantics
    from youcruit_tap_rawpostgresql_spark.functions.jsonb import (
        register_jsonb_mutators,
    )

    register_jsonb_mutators(spark)
    _PG_FUNCTIONS_READY.add(spark)


def run_sql(
    spark: SparkSession,
    sql: str,
    params: Mapping[str, Any] | None = None,
    pg_dialect: bool = True,
    column_types: Mapping[str, str] | None = None,
    standard_conforming_strings: bool = False,
) -> DataFrame:
    """Execute a SQL string (optionally PG-dialect) over registered views.

    Parameters bind NATIVELY (``spark.sql(..., args=)``): ``:name``
    markers become typed plan parameters — no quoting, no injection
    surface, and unbound markers fail analysis just like the literal
    binder raised KeyError. Dialect translation is syntax-only here
    (``bind=False``); the literal-substitution binder remains available
    for engines/paths without parameterized SQL.

    ``column_types`` (round-10): lowercase column → PG type map (from
    the declared stream schemas, ``ytrs/spec.py``) enabling the
    dialect's type-dependent rewrites — integer ``/`` → div,
    ``date - date`` → datediff, ``::int`` rounding — over plain column
    refs; see ``translate_pg_sql``.

    ``standard_conforming_strings`` (round-12): PG's server-default
    literal reading — backslashes in plain '…' literals are data; see
    ``translate_pg_sql``."""
    if not sql or not sql.strip():
        raise SpecError("sql must not be empty")  # reference client.py:255-258
    if pg_dialect:
        ensure_pg_functions(spark)
    text = (
        translate_pg_sql(
            sql,
            bind=False,
            column_types=column_types,
            standard_conforming_strings=standard_conforming_strings,
        )
        if pg_dialect
        else sql
    )
    if params:
        return spark.sql(text, args=dict(params))
    return spark.sql(text)


def run_stream_sql(
    spark: SparkSession,
    spec: StreamSpec,
    params: Mapping[str, Any] | None = None,
    use_declared_types: bool = True,
    standard_conforming_strings: bool = False,
) -> DataFrame:
    """Execute a stream's declared SQL with bound parameters.

    The stream's DECLARED column types feed the dialect's type-dependent
    rewrites by default (round-10): PG semantics for integer ``/``,
    ``date - date``, and fractional ``::int`` casts over declared
    columns — the reference's server applied these from its catalog
    types; the declared schema is this engine's equivalent. Set
    ``use_declared_types=False`` for the purely textual translation."""
    return run_sql(
        spark,
        spec.sql,
        params=params,
        pg_dialect=True,
        column_types=spec.column_types if use_declared_types else None,
        standard_conforming_strings=standard_conforming_strings,
    )
