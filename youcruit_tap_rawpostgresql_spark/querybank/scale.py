"""Scale-pattern cases: techniques that only matter at 100 TB (skew
salting, two-phase aggregation), each proven result-identical to the naive
formulation via the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from youcruit_tap_rawpostgresql_spark.functions.hashing import hash64
from youcruit_tap_rawpostgresql_spark.operators.layout import o_zorder_key, zorder_key
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


@register(
    "join_salted_skew",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_lines,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated skew join, proven result-identical to the plain
    join: the (conceptually skewed) fact side gets a random-free
    deterministic salt in [0, N); the dimension side is replicated N ways
    via explode, and the join key becomes (key, salt) — one hot key's rows
    spread over N reducers instead of one.

    Scale: the manual fallback when AQE's skew splitting can't help (e.g.
    a single key larger than any split threshold, or a non-AQE engine
    path). Replication multiplies the SMALL side by N only. The salt is
    l_linenumber % N — deterministic, so the oracle (plain join) must
    agree exactly; correctness does not depend on salt distribution, only
    balance does."""
    t = tables(spark, sf_dir)
    n_salt = _N_SALT
    l = t["lineitem"].select(
        "l_orderkey",
        "l_quantity",
        (F.col("l_linenumber") % n_salt).alias("salt"),
    )
    o_rep = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt"),
    )
    joined = l.join(
        o_rep,
        (l.l_orderkey == o_rep.o_orderkey) & (l.salt == o_rep.salt),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_qty"),
    )


@register(
    "scalar_zorder_key",
    oracle=f"""
SELECT l_orderkey, l_linenumber, {o_zorder_key('l_partkey', 'l_suppkey')} AS zkey
FROM lineitem WHERE l_orderkey % 100 = 0
""",
)
def scalar_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key computation — the clustering expression behind
    multi-dimensional layout (operators/layout.py). Pure integer
    shift/mask arithmetic, bit-identical in any engine; the layout test
    (tests/test_plans.py) proves the pruning effect of writing in this
    order."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        zorder_key("l_partkey", "l_suppkey").alias("zkey"),
    )


def dense_id_map(df: DataFrame, id_col: str = "doc_id", n_shards: int = 8):
    """(``(id_col, dense_id)`` frame, total count): dense global ids
    (1..N, no gaps) in hash order WITHOUT a global sort — the two-phase
    enumeration shared by `ids_dense_assign` and any op that needs a
    bijection onto a contiguous rank space (`sample_negative_pairs`
    draws uniform ranks through it).

    Scale: the textbook ROW_NUMBER() OVER (ORDER BY …) collapses to ONE
    partition. Here: shard by hash range (the hash is uniform, so shards
    balance), rank within each shard, then add per-shard prefix offsets
    (shard counts are a driver-sized list). Same numbering, but the heavy
    rank runs per-shard in parallel."""
    h = hash64(F.col(id_col).cast("string"))
    # uniform hash → range-shard by top bits: shard = h * n >> 60 would
    # need bit ops on 60-bit values; modulo of the high half is simpler
    # and equally deterministic. Ranking key within and across shards is
    # (h, id), and shards are ordered by hash RANGE, so concatenating
    # shard ranks in shard order reproduces the global (h, id) order.
    shard = F.floor(h / F.lit((1 << 60) // n_shards)).cast("int").alias("shard")
    base = df.select(id_col, h.alias("h"), shard)
    wsh = W.partitionBy("shard").orderBy("h", id_col)
    ranked = base.withColumn("shard_rank", F.row_number().over(wsh))
    counts = {
        r["shard"]: r["cnt"]
        for r in base.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    off = F.create_map(
        *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
    )
    mapped = ranked.select(
        id_col,
        (F.col("shard_rank").cast("bigint") + off[F.col("shard")]).alias(
            "dense_id"
        ),
    )
    return mapped, acc


@register(
    "ids_dense_assign",
    # the oracle is the single-sort definition; the engine computes the
    # same numbering with per-shard ranks + driver-side prefix offsets
    oracle="""
SELECT doc_id,
  ROW_NUMBER() OVER (
    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
             doc_id) AS dense_id
FROM documents
""",
)
def ids_dense_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global id assignment (1..N, no gaps) in hash order — the
    renumbering step before packing/sharding — WITHOUT a global sort
    (see ``dense_id_map`` for the two-phase shape and scale story)."""
    d = tables(spark, sf_dir)["documents"]
    mapped, _total = dense_id_map(d, "doc_id")
    return mapped


@register(
    "join_range_binned",
    oracle="""
WITH iv AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
    MIN(ts) AS s, MAX(ts) AS e
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
)
SELECT iv.event_type, iv.day, COUNT(*) AS n_in
FROM iv JOIN events ev ON ev.ts BETWEEN iv.s AND iv.e
GROUP BY iv.event_type, iv.day
""",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: point-in-interval overlap (`ts BETWEEN s AND e`)
    rewritten as a HASH EQUI-JOIN — each interval explodes into the hour
    buckets it covers, each point carries its single hour bucket, the join
    runs on the bucket, and the exact BETWEEN refines afterward. Every
    (point, interval) pair meets on exactly one bucket (the point's), so
    no dedup is needed. Plan-audited: no nested-loop join.

    Scale: a naive big×big interval join plans as broadcast-nested-loop or
    a cartesian — O(n·m) comparisons. Binning makes it a shuffle equi-join
    whose width is n + Σ(interval span / bin width): the standard trick
    (also behind interval trees in single-node engines) when BOTH sides
    are large; bin width tunes fan-out vs refinement selectivity. The
    oracle runs the naive BETWEEN join — result-identical."""
    e = tables(spark, sf_dir)["events"]
    iv = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    iv_bins = iv.select(
        "event_type",
        "day",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s")),
                F.date_trunc("hour", F.col("e")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("b"),
    )
    pts = e.select(F.col("ts").alias("p_ts"), F.date_trunc("hour", "ts").alias("b"))
    return (
        pts.join(iv_bins, "b")
        .filter(F.col("p_ts").between(F.col("s"), F.col("e")))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_in"))
    )
