from youcruit_tap_rawpostgresql_spark.streaming.incremental_stream import (  # noqa: F401
    run_windowed_stream,
)
