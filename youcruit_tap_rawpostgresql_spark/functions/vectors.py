"""Columnar vector math over ``array<float>`` embedding columns.

All pure Spark SQL higher-order functions — JVM-side, no UDFs, no Arrow
transfer. The fold order of ``F.aggregate`` is sequential left-to-right, so
results are deterministic and engine-portable (bit-identical to any other
sequential left fold in double precision).

Scale: these expressions evaluate per-row inside whole-stage codegen; a
cosine top-k over 100 TB of embeddings is bounded by scan + shuffle of the
candidate pairs, not by the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(x: Column) -> Column:
    return x.cast("double")


def dot(a, b) -> Column:
    """Sequential-fold dot product in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _dbl(x) * _dbl(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _dbl(x) * _dbl(x))
    )


def cosine_similarity(a, b) -> Column:
    """cos(a, b) = dot / (|a| |b|), NULL-safe on zero vectors."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n != 0, d / n)


def l2_distance(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
