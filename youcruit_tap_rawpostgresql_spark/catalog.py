"""Catalog emission (reference Q2 discovery + R5 about).

Config-declared catalog entries derive purely from config — no source
connection is made (reference ``tap.py:159-209``; pinned by tests against
an unreachable DB, ``tests/test_postgres.py:58-66``). Shape mirrors the
Singer catalog: stream id, schema, key properties, replication metadata,
selected flag. ``discover_live_catalog`` adds the live-introspection path
(S9): JDBC DatabaseMetaData over the source connection, tested end-to-end
against embedded Derby.
"""

from __future__ import annotations

from youcruit_tap_rawpostgresql_spark.spec import StreamSpec, TapConfig

CAPABILITIES = [
    # reference tap.py:244-259
    "catalog",
    "state",
    "discover",
    "about",
    "stream-maps",
    "schema-flattening",
    "batch",
]


def catalog_entry(spec: StreamSpec) -> dict:
    return {
        "tap_stream_id": spec.fully_qualified_name,
        "stream": spec.fully_qualified_name,
        "database": spec.database,
        "schema": spec.jsonschema(),
        "key_properties": spec.key_properties,
        "replication_key": spec.replication_key,
        "replication_method": spec.replication_method,
        "metadata": [
            {
                "breadcrumb": [],
                "metadata": {
                    "selected": True,
                    "replication-method": spec.replication_method,
                    **(
                        {"replication-key": spec.replication_key}
                        if spec.replication_key
                        else {}
                    ),
                },
            }
        ],
    }


def discover_catalog(config: TapConfig) -> dict:
    """``--discover`` output: the full catalog document (no Spark session
    required — pure config transformation)."""
    return {"streams": [catalog_entry(s) for s in config.streams]}


# java.sql.Types code → this engine's declared column type vocabulary
# (spec.ColumnSpec.type / reference config "type" strings)
_JDBC_TYPE_MAP = {
    -5: "int8",     # BIGINT
    4: "int4",      # INTEGER
    5: "smallint",  # SMALLINT ("int2" is not in the spec type vocabulary)
    -6: "smallint",  # TINYINT
    12: "text",     # VARCHAR
    1: "text",      # CHAR
    -1: "text",     # LONGVARCHAR
    2005: "text",   # CLOB
    8: "float8",    # DOUBLE
    6: "float8",    # FLOAT
    7: "float4",    # REAL
    2: "numeric",   # NUMERIC
    3: "numeric",   # DECIMAL
    16: "bool",     # BOOLEAN
    -7: "bool",     # BIT
    93: "timestamp",  # TIMESTAMP
    91: "date",     # DATE
    # Spark's JDBC reader surfaces java.sql.Types.TIME as TimestampType
    # (JdbcUtils getCatalystType), so declare what the extract will carry
    92: "timestamp",  # TIME
    -2: "bytea",    # BINARY
    -3: "bytea",    # VARBINARY
    -4: "bytea",    # LONGVARBINARY
    2004: "bytea",  # BLOB
}


def discover_live_catalog(
    spark, jdbc_config: dict, schema_pattern: str | None = None
) -> dict:
    """Live-database discovery (S9): introspect the SOURCE's tables and
    columns over JDBC ``DatabaseMetaData`` — the engine-agnostic metadata
    channel every JDBC driver implements (the analogue of the reference's
    sqlalchemy inspection available to it via its connector). Returns a
    Singer catalog document whose streams carry a generated
    ``SELECT * FROM <table>`` SQL, discovered columns with driver-reported
    types/nullability, and primary-key-derived ``key_properties`` — a
    usable starting config for every table the pattern matches.

    Driver-side cost is one metadata round-trip per call (the column
    ResultSet streams row-at-a-time through py4j) — catalog size, not
    data size; this never touches table rows."""
    from youcruit_tap_rawpostgresql_spark.sources.jdbc import jdbc_url
    from youcruit_tap_rawpostgresql_spark.spec import ColumnSpec, StreamSpec

    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if jdbc_config.get("user") is not None:
        props.setProperty("user", str(jdbc_config["user"]))
    if jdbc_config.get("password") is not None:
        props.setProperty("password", str(jdbc_config["password"]))
    # ensure the driver class is registered in the JVM before DriverManager
    # looks the URL up (same class Spark's JDBC source loads)
    driver = jdbc_config.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(jdbc_url(jdbc_config), props)
    try:
        md = conn.getMetaData()
        cols_by_table: dict[tuple[str, str], list[ColumnSpec]] = {}
        rs = md.getColumns(None, schema_pattern, None, None)
        while rs.next():
            key = (rs.getString("TABLE_SCHEM") or "", rs.getString("TABLE_NAME"))
            cols_by_table.setdefault(key, []).append(
                ColumnSpec(
                    name=rs.getString("COLUMN_NAME"),
                    type=_JDBC_TYPE_MAP.get(int(rs.getInt("DATA_TYPE")), "text"),
                    nullable=int(rs.getInt("NULLABLE")) != 0,
                )
            )
        rs.close()
        # only TABLE-type relations become streams (skip system/metadata
        # relations, which getColumns also reports on some engines)
        tables = set()
        # py4j needs a real java String[] for the JDBC types parameter
        type_arr = spark.sparkContext._gateway.new_array(jvm.java.lang.String, 1)
        type_arr[0] = "TABLE"
        trs = md.getTables(None, schema_pattern, None, type_arr)
        while trs.next():
            tables.add(
                (trs.getString("TABLE_SCHEM") or "", trs.getString("TABLE_NAME"))
            )
        trs.close()
        streams = []
        for (schema, table) in sorted(tables):
            cols = cols_by_table.get((schema, table))
            if not cols:
                continue
            pks = []
            krs = md.getPrimaryKeys(None, schema or None, table)
            while krs.next():
                pks.append((int(krs.getInt("KEY_SEQ")), krs.getString("COLUMN_NAME")))
            krs.close()
            # escape embedded double quotes when quoting identifiers: a
            # discovered name containing `"` must not produce broken (or,
            # from a hostile source, attacker-shaped) stream SQL
            qt = '"' + table.replace('"', '""') + '"'
            qs = '"' + schema.replace('"', '""') + '"' if schema else None
            streams.append(
                StreamSpec(
                    name=table,
                    sql=f"SELECT * FROM {qs}.{qt}"
                    if schema
                    else f"SELECT * FROM {qt}",
                    columns=cols,
                    key_properties=[c for _, c in sorted(pks)],
                    database=jdbc_config.get("database", "jdbc"),
                    db_schema=schema or "public",
                )
            )
        return {"streams": [catalog_entry(s) for s in streams]}
    finally:
        conn.close()


def about() -> dict:
    """``--about`` output (reference R5)."""
    from youcruit_tap_rawpostgresql_spark import __version__

    return {
        "name": "tap-rawpostgresql-spark",
        "version": __version__,
        "capabilities": CAPABILITIES,
        "engine": "pyspark",
    }
