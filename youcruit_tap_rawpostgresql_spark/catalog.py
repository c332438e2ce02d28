"""Catalog emission (reference Q2 discovery + R5 about).

Catalog entries derive purely from config — no source connection is made
(reference ``tap.py:159-209``; pinned by tests against an unreachable DB,
``tests/test_postgres.py:58-66``). Shape mirrors the Singer catalog:
stream id, schema, key properties, replication metadata, selected flag.
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


def about() -> dict:
    """``--about`` output (reference R5)."""
    from youcruit_tap_rawpostgresql_spark import __version__

    return {
        "name": "tap-rawpostgresql-spark",
        "version": __version__,
        "capabilities": CAPABILITIES,
        "engine": "pyspark",
    }
