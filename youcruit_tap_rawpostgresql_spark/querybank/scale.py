"""Scale-pattern cases: techniques that only matter at 100 TB (skew
salting, two-phase aggregation), each proven result-identical to the naive
formulation via the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables

_N_SALT = 8


@register(
    "agg_salted_skew",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: pre-aggregate on (key, salt) so one
    hot key spreads over N_SALT reducers, then combine the partials.

    Scale: THE standard fix when one key holds 1% of 100 TB and a plain
    groupBy funnels it into a single reducer. Decimal partial sums keep the
    re-aggregation exact (decimal addition is associative, unlike double),
    which is why the result hash-matches the naive one-phase oracle."""
    e = tables(spark, sf_dir)["events"]
    salt = (F.col("event_id") % _N_SALT).alias("salt")
    partial = (
        e.select("user_id", salt, "value")
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("pv"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )
