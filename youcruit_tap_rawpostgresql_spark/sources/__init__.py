from youcruit_tap_rawpostgresql_spark.sources.registry import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    register_testdata,
)
