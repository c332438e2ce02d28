"""Declared-schema conformance (reference ``client.py:144-161`` P2-P4).

The reference conforms each record row-at-a-time to the declared JSON-Schema
types, coerces UUID values to str, and drops undeclared keys with a warning.
Columnar equivalent: a single ``select`` that projects exactly the declared
columns, casting each to its declared Spark type. Catalyst folds this into
the scan (column pruning + cast expressions inside whole-stage codegen) —
strictly better than the reference's post-fetch per-row loop, and the cost is
O(columns), not O(rows × columns) of Python-side work.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from youcruit_tap_rawpostgresql_spark.spec import SpecError, StreamSpec

logger = logging.getLogger(__name__)


def conform(df: DataFrame, spec: StreamSpec, strict: bool = False) -> DataFrame:
    """Project/cast ``df`` to the stream's declared schema.

    - undeclared result columns are dropped (reference drops unmapped
      properties with a warning — docstring ``client.py:147-151``)
    - declared-but-missing columns raise when ``strict`` else become NULL
    - every kept column is cast to its declared type (UUID→string is just a
      string cast here — reference ``client.py:156-159``)
    """
    from pyspark.sql import functions as F

    present = {c.lower(): c for c in df.columns}
    dropped = [c for c in df.columns if c.lower() not in {s.name.lower() for s in spec.columns}]
    if dropped:
        logger.warning(
            "stream %s: dropping undeclared result columns %s", spec.name, dropped
        )
    exprs = []
    for col in spec.columns:
        if col.name.lower() in present:
            exprs.append(
                F.col(present[col.name.lower()]).cast(col.spark_type).alias(col.name)
            )
        elif strict:
            raise SpecError(
                f"stream {spec.name!r}: declared column {col.name!r} missing from result"
            )
        else:
            exprs.append(F.lit(None).cast(col.spark_type).alias(col.name))
    return df.select(*exprs)
