"""Query bank: every operator from SURVEY.md §2 as a named (PySpark fn,
DuckDB-oracle SQL) pair. The driver's correctness gate runs both sides at
sf0.01 and hash-compares; bench runs the headline subset at sf0.1.
"""

from youcruit_tap_rawpostgresql_spark.querybank.registry import (  # noqa: F401
    REGISTRY,
    QueryCase,
    register,
    tables,
)

# importing the banks populates REGISTRY
from youcruit_tap_rawpostgresql_spark.querybank import core  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import windows  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import scalars  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import taplevel  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import llm  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import extras  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import tpch_more  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import tpch_rest  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import ann  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import pipeline_ops  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import scale  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import sql_surface  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import etl  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import text_stats  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import graph  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import modern  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import corpus  # noqa: F401,E402
