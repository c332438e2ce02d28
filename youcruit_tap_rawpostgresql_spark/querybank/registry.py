"""Registry of judge-facing query cases.

Each case is a named PySpark callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string over the pre-registered testdata views.

Float-exactness convention (so value hashes match the oracle bit-for-bit):
the testdata doubles are all 2-decimal-exact, so monetary/quantity aggregates
cast inputs to DECIMAL(18,2) first — decimal sums are exact and identical in
any engine — then cast the final aggregate back to DOUBLE (deterministic).
Averages are expressed as exact-decimal-sum / count in both engines so the
single IEEE division is bit-identical. Timestamps in outputs are formatted to
ISO strings to dodge timezone/representation drift.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from youcruit_tap_rawpostgresql_spark.sources.registry import register_testdata


@dataclass(frozen=True)
class QueryCase:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → driver records rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QueryCase] = {}

# cache of (id(spark), sf_dir) -> {table: DataFrame} so 50+ queries don't
# re-read parquet footers over and over during a correctness sweep
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
# temp views are session-global and last-writer-wins, so when one session
# alternates scale factors the views must be re-registered even though the
# per-SF DataFrames are cached — otherwise spark.sql()-based queries read
# the OTHER scale factor's views while DataFrame-based queries read the
# right data (caught by a cross-SF test run)
_ACTIVE_SF: dict[int, str] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = register_testdata(spark, sf_dir)
    elif _ACTIVE_SF.get(id(spark)) != sf_dir:
        for name, df in _TABLE_CACHE[key].items():
            df.createOrReplaceTempView(name)
    _ACTIVE_SF[id(spark)] = sf_dir
    return _TABLE_CACHE[key]


def register(name: str, oracle: Optional[str] = None, headline: bool = False):
    """Decorator: register a query case under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query case {name!r}")
        REGISTRY[name] = QueryCase(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco
