"""Declared-type-string → Spark DataType mapping.

The reference declares column types as SQL-ish strings in config
(``columns: [{name, type, nullable}]``, reference ``tap.py:86-109``) and maps
them to JSON Schema via the Singer SDK (``tap.py:175``, pass-through at
``client.py:121-141``). Observable contract pinned by reference tests:
``text → ["string"]``, ``int → ["integer"]``, nullable adds ``"null"``
(``tests/test_postgres.py:63-66``). UUID values coerce to string
(``client.py:156-159``).

Here the declared string maps directly to a Spark ``DataType``; JSON-Schema
emission for catalog output lives in :mod:`..catalog`.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Base scalar vocabulary (SURVEY.md §1.2). JSON Schema "integer" is
# unbounded, so every integer flavour widens to LongType.
_SCALAR_TYPES: dict[str, T.DataType] = {
    "text": T.StringType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "uuid": T.StringType(),  # no native UUID type in Spark; cast at scan
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "int4": T.LongType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
    "smallint": T.LongType(),
    "serial": T.LongType(),
    "bigserial": T.LongType(),
    # JSON-Schema's name for floats — the catalog EMITS "number" for double
    # columns, so the discovered catalog must parse back as a config
    "number": T.DoubleType(),
    "float": T.DoubleType(),
    "float4": T.DoubleType(),
    "float8": T.DoubleType(),
    "real": T.DoubleType(),
    "double": T.DoubleType(),
    "double precision": T.DoubleType(),
    "numeric": T.DecimalType(38, 18),
    "decimal": T.DecimalType(38, 18),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamp without time zone": T.TimestampType(),
    "binary": T.BinaryType(),
    "bytea": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^(?:numeric|decimal)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_ARRAY_RE = re.compile(r"^array\s*<\s*(.+)\s*>$")

# JSON-Schema type names for catalog emission (reference tests pin these:
# tests/test_postgres.py:63-66, tests/test_sqlite.py:71-75).
_JSONSCHEMA_NAMES: dict[type, str] = {
    T.StringType: "string",
    T.LongType: "integer",
    T.IntegerType: "integer",
    T.DoubleType: "number",
    T.DecimalType: "number",
    T.BooleanType: "boolean",
    T.BinaryType: "string",
}


def to_spark_type(declared: str) -> T.DataType:
    """Resolve a declared config type string to a Spark DataType.

    Raises ``ValueError`` for unknown types (the reference would fail at
    the SDK's to_jsonschema_type similarly).
    """
    key = declared.strip().lower()
    if key in _SCALAR_TYPES:
        return _SCALAR_TYPES[key]
    m = _DECIMAL_RE.match(key)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _ARRAY_RE.match(key)
    if m:
        return T.ArrayType(to_spark_type(m.group(1)))
    if key.endswith("[]"):  # PG array syntax
        return T.ArrayType(to_spark_type(key[:-2]))
    raise ValueError(f"unknown declared column type: {declared!r}")


def to_jsonschema_type(declared: str, nullable: bool) -> dict:
    """Declared type string → JSON Schema fragment, Singer-style.

    Mirrors the observable mapping of the reference
    (``client.py:121-130`` + SDK): base name plus ``"null"`` when nullable.
    Datetime-ish types add ``format: date-time``.
    """
    spark_type = to_spark_type(declared)
    if isinstance(spark_type, T.TimestampType):
        names = ["string"]
        fmt: dict = {"format": "date-time"}
    elif isinstance(spark_type, T.DateType):
        names = ["string"]
        fmt = {"format": "date"}
    elif isinstance(spark_type, T.ArrayType):
        names = ["array"]
        fmt = {}
    else:
        names = [_JSONSCHEMA_NAMES.get(type(spark_type), "string")]
        fmt = {}
    if nullable:
        names = names + ["null"]
    return {"type": names, **fmt}
