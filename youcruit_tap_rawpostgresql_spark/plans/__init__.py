from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql  # noqa: F401
from youcruit_tap_rawpostgresql_spark.plans.executor import run_stream_sql  # noqa: F401
