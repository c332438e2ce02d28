"""Multi-dimensional data layout: Z-order (Morton) clustering.

Partitioning prunes on ONE column; bucketing co-locates ONE key. When scans
filter on TWO independent columns (e.g. part AND supplier), sorting the
write by an interleaved-bit Z-order key gives every file/row-group a small
min/max box in BOTH dimensions, so parquet statistics prune either way —
the technique Delta/Iceberg expose as OPTIMIZE ZORDER, built here from
plain column expressions.

Scale: the Z-key is a per-row expression (map-only); the clustered write is
one range-repartition + local sort — the same cost as any sorted write.
Pruning then happens at planning/scan time from footer statistics, reading
O(box volume) instead of O(table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a, b, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns into
    one bigint Morton key: bit i of ``a`` → bit 2i, bit i of ``b`` → bit
    2i+1. A left-to-right sum of shift/mask terms — pure codegen-friendly
    integer arithmetic, no UDF.

    NOTE: raw interleaving assumes both dimensions use comparable bit
    widths. When ranges differ (e.g. an 11-bit key against a 4-bit key)
    the wide dimension owns all high bits and the curve degenerates into a
    plain sort on it — normalize first (``normalize_to_bits``), which is
    what ``write_zordered`` does."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    al, bl = a.cast("bigint"), b.cast("bigint")
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(al, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bl, i).bitwiseAND(F.lit(1))
        acc = acc + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return acc


def normalize_to_bits(col, vmin: int, vmax: int, bits: int) -> Column:
    """Rank-scale an integer column from [vmin, vmax] onto [0, 2^bits):
    exact integer multiply-then-truncating-divide (``div``, never IEEE
    ``/`` — a double divide loses bits once (value-vmin)·(2^bits-1)
    crosses 2^53, e.g. epoch-microsecond keys, and buckets would drift
    from the integer-division oracle)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("bigint")
    span = max(vmax - vmin, 1)
    scaled = (c - F.lit(vmin).cast("bigint")) * F.lit((1 << bits) - 1).cast("bigint")
    return F.call_function("div", scaled, F.lit(span).cast("bigint"))


def o_zorder_key(a: str, b: str, bits: int = 16) -> str:
    """DuckDB SQL computing the identical Morton key (oracle parity)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({b} // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int, bits: int = 8
) -> None:
    """Write ``df`` clustered by the Z-order of (col_a, col_b): both
    columns are first rank-scaled onto the same ``bits``-wide range (one
    min/max aggregate — without this, the wider-ranged column would own
    every high bit and the curve degenerates into a plain sort on it),
    then range-repartitioned on the interleaved key so each output file
    owns a contiguous Morton range (a small box in BOTH dimensions)."""
    amin, amax, bmin, bmax = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if amin is None or bmin is None:  # empty input: nothing to cluster
        df.write.mode("overwrite").parquet(path)
        return
    keyed = df.withColumn(
        "__z",
        zorder_key(
            normalize_to_bits(col_a, amin, amax, bits),
            normalize_to_bits(col_b, bmin, bmax, bits),
            bits,
        ),
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
