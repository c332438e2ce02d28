"""ETL/CDC-flavored operators (the reference's home turf: replication and
state tracking, reference `client.py:260-283` bookmark semantics generalized).

Three classic warehouse-maintenance shapes the raw-SQL tap surface is used
for in practice, each built as a single-shuffle Spark plan:

- ``cdc_snapshot_diff``: classify per-key state changes between two
  bookmark cutoffs in ONE scan + ONE shuffle (conditional ``max_by`` with a
  FILTER clause instead of two snapshot subqueries + full outer join).
- ``scd2_status_history``: gaps-and-islands run-collapse (SCD2 validity
  intervals) — two window passes that share one hash partitioning plus a
  partial-agg groupBy on the same key prefix.
- ``funnel_ordered_steps``: strict ordered-step funnel via a per-user fold
  (state machine over the time-sorted event array) — one shuffle total,
  versus the textbook 3-join formulation the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from youcruit_tap_rawpostgresql_spark.querybank.helpers import (
    iso_date,
    iso_ts,
    sessionized,
)
from youcruit_tap_rawpostgresql_spark.querybank.helpers import persist_scoped
from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables

_D1 = "1998-01-01"
_D2 = "2000-01-01"


@register(
    "cdc_snapshot_diff",
    headline=True,
    oracle=f"""
WITH g AS (
  -- DuckDB arg_max lacks composite ordering keys; this fixed-width string
  -- encoding of (o_orderdate, o_orderkey) is order-isomorphic to the
  -- struct key the Spark plan uses
  SELECT o_custkey,
    arg_max((o_orderkey, o_orderstatus),
      strftime(o_orderdate, '%Y%m%d%H%M%S')
        || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS b,
    arg_max((o_orderkey, o_orderstatus),
      strftime(o_orderdate, '%Y%m%d%H%M%S')
        || lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))
      FILTER (WHERE o_orderdate < TIMESTAMP '{_D1}') AS a
  FROM orders
  WHERE o_orderdate < TIMESTAMP '{_D2}'
  GROUP BY o_custkey
)
SELECT o_custkey,
  a[1] AS old_orderkey, a[2] AS old_status,
  b[1] AS new_orderkey, b[2] AS new_status,
  CASE WHEN a IS NULL THEN 'insert' ELSE 'update' END AS op
FROM g
WHERE a IS NULL OR a <> b
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff of "latest order per customer" state between
    bookmark cutoffs {_D1} and {_D2} (reference's incremental bookmark
    semantics, `client.py:260-283`, applied to state diffing).

    Scale: ONE scan of the fact table (predicate `< D2` pushed to parquet)
    and ONE shuffle on the key — the older snapshot is a FILTER-clause
    conditional aggregate, not a second scan, and there is no join at all.
    `max_by` with a (date, key) struct ordering key is deterministic under
    date ties. Append-only source ⇒ no 'delete' branch can fire; the CASE
    covers insert/update."""
    o = tables(spark, sf_dir)["orders"]
    pick = "named_struct('k', o_orderkey, 's', o_orderstatus)"
    order_key = "named_struct('d', o_orderdate, 'k', o_orderkey)"
    g = (
        o.filter(F.col("o_orderdate") < F.lit(_D2).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(
            F.expr(f"max_by({pick}, {order_key})").alias("b"),
            F.expr(
                f"max_by({pick}, {order_key}) "
                f"FILTER (WHERE o_orderdate < TIMESTAMP '{_D1}')"
            ).alias("a"),
        )
    )
    return (
        g.filter(F.col("a").isNull() | (F.col("a") != F.col("b")))
        .select(
            "o_custkey",
            F.col("a.k").alias("old_orderkey"),
            F.col("a.s").alias("old_status"),
            F.col("b.k").alias("new_orderkey"),
            F.col("b.s").alias("new_status"),
            F.when(F.col("a").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
    )


@register(
    "scd2_status_history",
    headline=True,
    oracle="""
WITH flagged AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
    CASE WHEN o_orderstatus IS DISTINCT FROM
      lag(o_orderstatus) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
    THEN 1 ELSE 0 END AS chg
  FROM orders
), runs AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
    SUM(chg) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
)
SELECT o_custkey, o_orderstatus,
  strftime(MIN(o_orderdate), '%Y-%m-%d') AS valid_from,
  strftime(MAX(o_orderdate), '%Y-%m-%d') AS valid_to,
  COUNT(*) AS n_orders
FROM runs
GROUP BY o_custkey, o_orderstatus, grp
""",
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity intervals: collapse each customer's consecutive
    runs of equal order status into (valid_from, valid_to, n_orders) rows —
    the gaps-and-islands pattern (lag → change flag → running-sum group id).

    Scale: both window passes AND the final groupBy share the o_custkey hash
    partitioning, so the whole history rebuild is one shuffle; runs collapse
    map-side in the partial aggregate."""
    o = tables(spark, sf_dir)["orders"]
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "chg",
        F.when(
            ~F.col("o_orderstatus").eqNullSafe(F.lag("o_orderstatus").over(wo)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "grp", F.sum("chg").over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("o_custkey", "o_orderstatus", "grp")
        .agg(
            iso_date(F.min("o_orderdate"), "valid_from"),
            iso_date(F.max("o_orderdate"), "valid_to"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .drop("grp")
    )


@register(
    "funnel_ordered_steps",
    headline=True,
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(v.t1) AS t1, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(c.t1) AS t1, min(c.t2) AS t2, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT user_id,
  strftime(t1, '%Y-%m-%d %H:%M:%S') AS view_ts,
  strftime(t2, '%Y-%m-%d %H:%M:%S') AS click_ts,
  strftime(t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM p
""",
)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (first view → first later click → first later
    purchase) per user.

    Scale: the oracle's textbook formulation is three self-joins (three
    shuffles of the fact table); this plan is ONE shuffle — group each
    user's events, time-sort the array, and fold a 3-slot state machine over
    it with `F.aggregate` (JVM lambda, no Python). Per-user arrays are
    bounded by the watermark/session horizon in production; for unbounded
    histories the same fold runs as applyInPandasWithState. Timestamp ties
    are broken by event_id in the sort; the fixture has none (verified), so
    the min-based oracle agrees."""
    ev = (
        tables(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )
    folded = seq.select(
        "user_id",
        F.aggregate(
            "seq",
            init,
            lambda acc, e: F.when(
                (e["event_type"] == "view") & acc["t1"].isNull(),
                F.struct(
                    e["ts"].alias("t1"), acc["t2"].alias("t2"), acc["t3"].alias("t3")
                ),
            )
            .when(
                (e["event_type"] == "click")
                & acc["t1"].isNotNull()
                & acc["t2"].isNull(),
                F.struct(
                    acc["t1"].alias("t1"), e["ts"].alias("t2"), acc["t3"].alias("t3")
                ),
            )
            .when(
                (e["event_type"] == "purchase")
                & acc["t2"].isNotNull()
                & acc["t3"].isNull(),
                F.struct(
                    acc["t1"].alias("t1"), acc["t2"].alias("t2"), e["ts"].alias("t3")
                ),
            )
            .otherwise(acc),
        ).alias("s"),
    )
    return folded.filter(F.col("s.t3").isNotNull()).select(
        "user_id",
        iso_ts(F.col("s.t1"), "view_ts"),
        iso_ts(F.col("s.t2"), "click_ts"),
        iso_ts(F.col("s.t3"), "purchase_ts"),
    )


@register(
    "cohort_retention",
    headline=True,
    # week arithmetic stays integral: both engines truncate to Monday and
    # the day-diff between two week-truncs is an exact multiple of 7
    oracle="""
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
  CAST(date_diff('day', date_trunc('week', f.first_ts),
                 date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
  COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week, then
    distinct active users per (cohort, weeks-since-cohort) cell — the
    standard product-analytics rollup over the reference's event stream.

    Scale: first_ts is a whole-partition window min — ONE scan of events
    and ONE user_id shuffle, with no user-sized aggregate to broadcast (a
    groupBy+join formulation either broadcasts one-row-per-user — which
    dies at billions of users — or shuffles events twice). The final
    (cohort, offset) cells are ~weeks² groups; the distinct-count is
    deduped map-side by the partial aggregate."""
    e = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id")
    return (
        e.select("user_id", "ts", F.min("ts").over(w).alias("first_ts"))
        .select(
            F.date_format(F.date_trunc("week", F.col("first_ts")), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.expr(
                "cast(datediff(date_trunc('week', ts),"
                " date_trunc('week', first_ts)) div 7 as bigint)"
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "ab_test_ttest",
    # Welch t-statistic with every moment derived from EXACT decimal sums:
    # value is 2dp so Σv (DECIMAL(12,2)) and Σv² (DECIMAL(25,4) products)
    # aggregate exactly in any engine; the handful of float ops after that
    # are written in the same order on both sides — no distributed-variance
    # merge (stddev_samp) anywhere, so no accumulation-order drift
    oracle="""
WITH s AS (
  SELECT
    COUNT(*) FILTER (WHERE event_type = 'click') AS n1,
    CAST(SUM(CAST(value AS DECIMAL(12,2)))
      FILTER (WHERE event_type = 'click') AS DOUBLE) AS s1,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
      FILTER (WHERE event_type = 'click') AS DOUBLE) AS ss1,
    COUNT(*) FILTER (WHERE event_type = 'view') AS n2,
    CAST(SUM(CAST(value AS DECIMAL(12,2)))
      FILTER (WHERE event_type = 'view') AS DOUBLE) AS s2,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
      FILTER (WHERE event_type = 'view') AS DOUBLE) AS ss2
  FROM events
)
SELECT n1, n2,
  ROUND(s1 / n1, 6) AS mean_click,
  ROUND(s2 / n2, 6) AS mean_view,
  ROUND((s1 / n1 - s2 / n2) /
    sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
       + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2), 6) AS t_welch
FROM s
""",
)
def ab_test_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch t-statistic (click vs view event values) — the
    experiment-analysis primitive, computed from exact decimal first/second
    moments in ONE scan + ONE single-row reduce.

    Scale: conditional FILTER aggregates give both arms from one pass;
    the moments are mergeable partial aggregates (map-side combine), so
    this is scan-bound at any data size — and exactly reproducible,
    unlike a distributed stddev whose merge order varies."""
    e = tables(spark, sf_dir)["events"]
    dv = F.col("value").cast("decimal(12,2)")
    click = F.col("event_type") == "click"
    view = F.col("event_type") == "view"
    s = e.agg(
        F.count(F.when(click, 1)).alias("n1"),
        F.sum(F.when(click, dv)).cast("double").alias("s1"),
        F.sum(F.when(click, dv * dv)).cast("double").alias("ss1"),
        F.count(F.when(view, 1)).alias("n2"),
        F.sum(F.when(view, dv)).cast("double").alias("s2"),
        F.sum(F.when(view, dv * dv)).cast("double").alias("ss2"),
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    n2, s2, ss2 = F.col("n2"), F.col("s2"), F.col("ss2")
    v1 = (ss1 - s1 * s1 / n1) / (n1 - F.lit(1))
    v2 = (ss2 - s2 * s2 / n2) / (n2 - F.lit(1))
    return s.select(
        "n1",
        "n2",
        F.round(s1 / n1, 6).alias("mean_click"),
        F.round(s2 / n2, 6).alias("mean_view"),
        F.round((s1 / n1 - s2 / n2) / F.sqrt(v1 / n1 + v2 / n2), 6).alias(
            "t_welch"
        ),
    )


@register(
    "ols_regr_slope",
    # PG's regr_slope/regr_intercept family, recomputed from exact decimal
    # moments (quantity and price are 2dp ⇒ Σx, Σy, Σxy, Σx² aggregate
    # exactly as decimals) so both engines run the identical few float ops
    oracle="""
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
           * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
           * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS intercept
FROM m
""",
)
def ols_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of extendedprice on quantity (PG `regr_slope` /
    `regr_intercept` delegated surface) via exact-moment aggregation —
    one scan, mergeable partials, bit-reproducible across engines.

    Scale: the five moments are classic map-side-combinable aggregates;
    the per-group math is constant work after the reduce."""
    l = tables(spark, sf_dir)["lineitem"]
    dx = F.col("l_quantity").cast("decimal(12,2)")
    dy = F.col("l_extendedprice").cast("decimal(12,2)")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (first-order Markov counts over each user's
    time-ordered stream) — the input to next-action models and anomaly
    screens on the reference's event data.

    Scale: one user_id window pass; the transition matrix is
    |event_types|² rows however large the stream — all-integer."""
    e = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dau_wau_rolling",
    # WAU via contribution fan-out: each event marks its user active for
    # the 7 day-buckets [day, day+6], so trailing-7-day distinct users is
    # a plain per-day distinct count — no self-join, no window distinct
    # (which neither engine supports)
    oracle="""
WITH dau AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
    COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
), fan AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) + CAST(k AS INTEGER) AS day, user_id
  FROM events, unnest(generate_series(0, 6)) AS u(k)
), wau AS (
  SELECT day, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
FROM dau d JOIN wau w ON d.day = w.day
""",
)
def dau_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day distinct active users (DAU/WAU), restricted
    to days with activity. Window COUNT(DISTINCT) doesn't exist in any
    engine; the scalable form fans each event into the 7 day-buckets it
    keeps a user active for, then runs ordinary distinct counts.

    Scale: fan-out is a constant 7× on (day, user) pairs — already
    deduplicated map-side by the partial aggregate — versus a 7-way
    range self-join of the full stream."""
    e = tables(spark, sf_dir)["events"]
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    dau = (
        e.select(day.alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    fan = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        day.alias("d0"),
        "user_id",
    ).select(F.date_add(F.col("d0"), F.col("k")).alias("day"), "user_id")
    wau = fan.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau"
    )


@register(
    "scd2_point_in_time_join",
    # the PIT lookup: each order matched to the status interval that was
    # valid at its order date. Interval bounds come from the same
    # gaps-and-islands run-collapse as scd2_status_history, so every order
    # date falls in exactly one [valid_from, valid_to] interval of its key
    oracle="""
WITH flagged AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
    CASE WHEN o_orderstatus IS DISTINCT FROM
      lag(o_orderstatus) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
    THEN 1 ELSE 0 END AS chg
  FROM orders
), runs AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
    SUM(chg) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
), dim AS (
  SELECT o_custkey AS d_custkey, o_orderstatus AS status_at_time,
    MIN(o_orderdate) AS valid_from, MAX(o_orderdate) AS valid_to
  FROM runs GROUP BY o_custkey, o_orderstatus, grp
)
SELECT o.o_orderkey, o.o_custkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date, d.status_at_time
FROM orders o JOIN dim d
  ON o.o_custkey = d.d_custkey
  AND o.o_orderdate >= d.valid_from AND o.o_orderdate <= d.valid_to
WHERE o.o_orderkey % 10 = 0
""",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal validity) join: each order looked up against
    the SCD2 status interval in force at its order date — the feature-store
    / audit query that motivates keeping SCD2 history at all.

    Scale: the interval dimension derives from the fact's own key, so the
    range join is an equi-join on the key plus an interval predicate —
    Spark evaluates the band as a post-join filter on co-partitioned data,
    never a cross product. For wide temporal dims, bucket both sides by
    key + coarse time bucket (the as-of pattern in join_asof)."""
    o = tables(spark, sf_dir)["orders"]
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "chg",
        F.when(
            ~F.col("o_orderstatus").eqNullSafe(F.lag("o_orderstatus").over(wo)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "grp", F.sum("chg").over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    dim = runs.groupBy(
        F.col("o_custkey").alias("d_custkey"),
        F.col("o_orderstatus").alias("status_at_time"),
        "grp",
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.max("o_orderdate").alias("valid_to"),
    )
    probe = o.filter(F.col("o_orderkey") % 10 == 0)
    return (
        probe.join(
            dim,
            (probe["o_custkey"] == dim["d_custkey"])
            & (probe["o_orderdate"] >= dim["valid_from"])
            & (probe["o_orderdate"] <= dim["valid_to"]),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "status_at_time",
        )
    )


@register(
    "ts_week_over_week",
    oracle="""
WITH w AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM events GROUP BY 1
)
SELECT week, revenue,
  ROUND(revenue / lag(revenue) OVER (ORDER BY week) - 1, 6) AS wow_growth
FROM w
""",
)
def ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: exact-decimal weekly revenue, then a lag
    ratio (one IEEE division + subtraction, 6dp-rounded) — the
    period-over-period report every sync feeds.

    Scale: weekly rollup shrinks to ~52 rows/year before the unpartitioned
    lag window touches it — the global window is safe BECAUSE it runs on
    the aggregate, never the raw stream."""
    e = tables(spark, sf_dir)["events"]
    w = (
        e.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week")
        )
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("revenue"))
    )
    win = W.orderBy("week")
    return w.select(
        "week",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(win) - 1, 6).alias(
            "wow_growth"
        ),
    )


@register(
    "cumulative_unique_users",
    # cumulative distinct = cumulative sum of FIRST-seen flags — the
    # classic rewrite that avoids a running COUNT(DISTINCT) window (which
    # no engine supports)
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY user_id
), per_day AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY 1
), days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
  COALESCE(p.new_users, 0) AS new_users,
  CAST(SUM(COALESCE(p.new_users, 0)) OVER (ORDER BY d.day
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
FROM days d LEFT JOIN per_day p ON d.day = p.day
""",
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day, via first-seen-day flags + a
    running sum — the growth-curve query, O(days) window input instead of
    an (impossible) running COUNT(DISTINCT) over the raw stream.

    Scale: one user-keyed agg (first day) + one day-keyed agg; the
    unpartitioned window only ever sees one row per day."""
    e = tables(spark, sf_dir)["events"]
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(day.alias("day")).distinct()
    win = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    joined = days.join(per_day, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(win).cast("bigint").alias("cumulative_users"),
    )


@register(
    "funnel_latency_quantiles",
    # latencies are integer seconds (epoch differences); exact percentile
    # interpolation over integers, 6dp-rounded output
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(v.t1) AS t1, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(c.t1) AS t1, min(c.t2) AS t2, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), lat AS (
  SELECT user_id,
    CAST(floor(epoch(t2)) - floor(epoch(t1)) AS BIGINT) AS view_to_click_s,
    CAST(floor(epoch(t3)) - floor(epoch(t2)) AS BIGINT) AS click_to_buy_s
  FROM p
)
SELECT COUNT(*) AS n_converted,
  ROUND(CAST(quantile_cont(view_to_click_s, 0.5) AS DOUBLE), 6)
    AS p50_view_to_click_s,
  ROUND(CAST(quantile_cont(click_to_buy_s, 0.5) AS DOUBLE), 6)
    AS p50_click_to_buy_s,
  ROUND(CAST(quantile_cont(click_to_buy_s, 0.9) AS DOUBLE), 6)
    AS p90_click_to_buy_s
FROM lat
""",
)
def funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-latency distribution for converted users (view→click and
    click→purchase medians, p90) — the timing half of funnel analysis,
    composed on the ordered-funnel result.

    Scale: the funnel is the single-shuffle fold; the latency quantiles
    reduce converted-user-sized data to one row (exact percentile here,
    approx sketch at 100 TB per agg_percentiles' note)."""
    from youcruit_tap_rawpostgresql_spark.querybank.etl import funnel_ordered_steps

    f = funnel_ordered_steps(spark, sf_dir)
    lat = f.select(
        (
            F.unix_timestamp(F.to_timestamp("click_ts"))
            - F.unix_timestamp(F.to_timestamp("view_ts"))
        ).alias("view_to_click_s"),
        (
            F.unix_timestamp(F.to_timestamp("purchase_ts"))
            - F.unix_timestamp(F.to_timestamp("click_ts"))
        ).alias("click_to_buy_s"),
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(view_to_click_s, 0.5)"), 6).alias(
            "p50_view_to_click_s"
        ),
        F.round(F.expr("percentile(click_to_buy_s, 0.5)"), 6).alias(
            "p50_click_to_buy_s"
        ),
        F.round(F.expr("percentile(click_to_buy_s, 0.9)"), 6).alias(
            "p90_click_to_buy_s"
        ),
    )


@register(
    "user_longest_streak",
    # gaps-and-islands over active DAYS: island id = day − dense_rank-th
    # day (both integers), longest streak = max island size
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), grouped AS (
  SELECT user_id, day,
    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS INTEGER) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, COUNT(*) AS len FROM grouped
  GROUP BY user_id, island
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak_days,
  CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id
""",
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-days streak per user (gaps-and-islands
    on the day grid: day − row_number is constant within a run) — the
    engagement metric next to DAU/retention.

    Scale: distinct (user, day) collapses map-side; the window and both
    groupBys share the user_id partitioning — one shuffle."""
    e = tables(spark, sf_dir)["events"]
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grouped = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    streaks = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


@register(
    "impute_group_median",
    # a deterministic 1-in-9 of balances is nulled out (the fixture has no
    # NULLs — without this the imputation branch would be vacuous), then
    # refilled with the per-nation exact median of the REMAINING values
    oracle="""
WITH dirty AS (
  SELECT c_custkey, c_nationkey,
    CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
), med AS (
  SELECT c_nationkey,
    ROUND(CAST(quantile_cont(bal, 0.5) AS DOUBLE), 6) AS median_bal
  FROM dirty WHERE bal IS NOT NULL GROUP BY c_nationkey
)
SELECT d.c_custkey, d.c_nationkey,
  COALESCE(d.bal, m.median_bal) AS bal_imputed,
  d.bal IS NULL AS was_imputed
FROM dirty d JOIN med m ON d.c_nationkey = m.c_nationkey
""",
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation: NULL balances refilled with their
    nation's exact median of observed values, imputation flagged — the
    repair step between conformance-quarantine and the warehouse write.

    Scale: per-group medians are a group-count-sized broadcast back onto
    the rows; swap exact percentile for the approx sketch at 100 TB. The
    6dp-rounded median keeps the filled value cross-engine identical."""
    c = tables(spark, sf_dir)["customer"]
    dirty = c.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 9 == 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ).alias("bal"),
    )
    med = (
        dirty.filter(F.col("bal").isNotNull())
        .groupBy("c_nationkey")
        .agg(F.round(F.expr("percentile(bal, 0.5)"), 6).alias("median_bal"))
    )
    return dirty.join(F.broadcast(med), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        F.coalesce("bal", "median_bal").alias("bal_imputed"),
        F.col("bal").isNull().alias("was_imputed"),
    )


@register(
    "user_profile_pivot",
    # wide per-user feature row: first/last event type by a composite
    # (ts, event_id) key (deterministic under ts ties), counts and exact
    # sums — the feature-assembly shape feeding training joins
    oracle="""
SELECT user_id,
  arg_min(event_type, strftime(ts, '%Y%m%d%H%M%S') || '.' ||
          lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
          lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_type,
  arg_max(event_type, strftime(ts, '%Y%m%d%H%M%S') || '.' ||
          lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
          lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""",
)
def user_profile_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile assembly: first/last event type, activity counts,
    exact value total, type diversity — one groupBy produces the wide
    feature row (min_by/max_by on a struct key; the DuckDB oracle encodes
    the same (ts µs, event_id) ordering as a fixed-width string because its
    arg_min lacks composite keys).

    Scale: single shuffle on user_id; every aggregate is map-side
    combinable — the canonical one-pass feature extraction."""
    e = tables(spark, sf_dir)["events"]
    key = "named_struct('t', ts, 'e', event_id)"
    return e.groupBy("user_id").agg(
        F.expr(f"min_by(event_type, {key})").alias("first_type"),
        F.expr(f"max_by(event_type, {key})").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
            "total_value"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "session_type_cooccurrence",
    # unordered event-type pairs co-occurring within a session (a < b
    # canonical order) — composes the sessionizer; all-integer counts
    oracle="""
WITH g AS (
  SELECT user_id, event_id, event_type, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, event_type,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM g
), types AS (
  SELECT DISTINCT user_id, session_seq, event_type FROM s
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  COUNT(*) AS n_sessions
FROM types a JOIN types b
  ON a.user_id = b.user_id AND a.session_seq = b.session_seq
  AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
""",
)
def session_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type co-occurrence (how often do 'click' and
    'error' happen in the same session?) — the association input for
    basket/affinity analysis, composed on the 30-minute sessionizer.

    Scale: the distinct (session, type) set collapses the stream before
    the pair join; pairs are bounded by |types|² per session, never event
    counts."""
    e = tables(spark, sf_dir)["events"]
    sess = sessionized(e, "user_id", "event_type")
    types = sess.select("user_id", "session_seq", "event_type").distinct()
    a = types.select(
        "user_id", "session_seq", F.col("event_type").alias("type_a")
    )
    b = types.select(
        "user_id", "session_seq", F.col("event_type").alias("type_b")
    )
    return (
        a.join(b, ["user_id", "session_seq"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "max_concurrent_sessions",
    # sweep-line over session intervals: +1 at start, −1 after end, running
    # sum ordered by (time, delta) so ends process before starts at the
    # same instant — all integers, the canonical max-overlap algorithm
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM g
), iv AS (
  SELECT user_id, session_seq, MIN(ts) AS s_start,
    MAX(ts) + INTERVAL 30 MINUTE AS s_end
  FROM s GROUP BY user_id, session_seq
), pts AS (
  SELECT s_start AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT s_end AS t, -1 AS delta FROM iv
), run AS (
  SELECT t, SUM(delta) OVER (ORDER BY t, delta
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM pts
)
SELECT CAST(MAX(live) AS BIGINT) AS max_concurrent,
  CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions
FROM run
""",
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency: maximum number of simultaneously-open sessions
    (session = 30-min-gap window, open until last event + 30 min) via the
    sweep-line ±1 running sum — the capacity-planning number.

    Scale: intervals are session-count-sized (already collapsed); the
    global ordered sweep is the textbook form here — at 100 TB, bucket the
    timeline (e.g. per hour), take per-bucket maxima of bucket-local
    sweeps seeded with the carried-in live count."""
    e = tables(spark, sf_dir)["events"]
    s = sessionized(e, "user_id", "ts")
    iv = s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("s_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("s_end"),
    )
    pts = iv.select(F.col("s_start").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    run = pts.select(
        F.sum("delta")
        .over(
            W.orderBy("t", "delta").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("live")
    )
    return run.agg(
        F.max("live").cast("bigint").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
    )


@register(
    "session_type_lift",
    # association lift over sessions: lift(a,b) = N·n_ab / (n_a·n_b) —
    # one integer product each side of a single IEEE division
    oracle="""
WITH g AS (
  SELECT user_id, event_id, event_type, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, event_type,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM g
), types AS (
  SELECT DISTINCT user_id, session_seq, event_type FROM s
), n_total AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, session_seq FROM types)
), marg AS (
  SELECT event_type, COUNT(*) AS n_t FROM types GROUP BY event_type
), pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM types a JOIN types b
    ON a.user_id = b.user_id AND a.session_seq = b.session_seq
    AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_ab,
  ROUND(CAST(t.n * p.n_ab AS DOUBLE) / (ma.n_t * mb.n_t), 6) AS lift
FROM pair p
JOIN marg ma ON ma.event_type = p.type_a
JOIN marg mb ON mb.event_type = p.type_b
CROSS JOIN n_total t
""",
)
def session_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift between event types at session granularity
    (lift > 1 ⇒ types co-occur more than independence predicts) — the
    affinity score on top of the co-occurrence counts.

    Scale: marginals and the session total are type-count-sized
    broadcasts; the pair join is bounded by |types|² per session."""
    e = tables(spark, sf_dir)["events"]
    s = sessionized(e, "user_id", "event_type")
    # cache: marginals, the session total, and the pair join all derive
    # from this one distinct set
    types = persist_scoped(
        "session_type_lift.types",
        s.select("user_id", "session_seq", "event_type").distinct(),
    )
    # lazy broadcast total instead of an eager driver-side count() that
    # paid a full extra sessionization job at plan-construction time
    n_total_df = (
        types.select("user_id", "session_seq")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    marg = types.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = types.select("user_id", "session_seq", F.col("event_type").alias("type_a"))
    b = types.select("user_id", "session_seq", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, ["user_id", "session_seq"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pair.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(n_total_df))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                (F.col("n_total") * F.col("n_ab")).cast("double")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "user_burstiness",
    # inter-event gaps are INTEGER seconds (floored epochs), so Σg and Σg²
    # aggregate exactly; mean/variance/CoV are the only float ops, written
    # identically on both sides. Users need ≥3 events for a sample variance
    oracle="""
WITH gaps AS (
  SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT)
      - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))) AS BIGINT)
      AS g
  FROM events
), agg AS (
  SELECT user_id, COUNT(g) AS n, SUM(g) AS s, SUM(g * g) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
  ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_gap_s,
  ROUND(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
        / (CAST(s AS DOUBLE) / n), 6) AS cov_burstiness
FROM agg WHERE n >= 2
""",
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user: coefficient of variation of the
    gap distribution (CoV ≈ 1 ⇒ Poisson-like, > 1 ⇒ bursty) — the
    behavioral feature complementing sessionization.

    Scale: one window pass for gaps, then integer-moment partial
    aggregates — same exact-moments pattern as the Welch t and OLS
    cases, one shuffle end-to-end."""
    e = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).alias("g")
    gaps = e.select("user_id", g).filter(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count("g").alias("n"), F.sum("g").alias("s"), F.sum(F.col("g") * F.col("g")).alias("ss")
    )
    n, s, ss = F.col("n"), F.col("s").cast("double"), F.col("ss").cast("double")
    mean = s / n
    sd = F.sqrt((ss - s * F.col("s") / n) / (n - F.lit(1)))
    return agg.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd / mean, 6).alias("cov_burstiness"),
    )


@register(
    "order_fulfillment_lag",
    # accumulating-snapshot rollup: per order, lag from order date to
    # first/last shipment (integer day diffs), plus the share fulfilled
    # within 30 days — counts and day arithmetic only
    oracle="""
WITH lag AS (
  SELECT o.o_orderkey, o.o_orderpriority,
    date_diff('day', CAST(o.o_orderdate AS DATE),
              CAST(MIN(l.l_shipdate) AS DATE)) AS first_ship_days,
    date_diff('day', CAST(o.o_orderdate AS DATE),
              CAST(MAX(l.l_shipdate) AS DATE)) AS last_ship_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(MIN(first_ship_days) AS BIGINT) AS min_first_ship_days,
  CAST(MAX(last_ship_days) AS BIGINT) AS max_last_ship_days,
  COUNT(*) FILTER (WHERE last_ship_days <= 30) AS n_fully_shipped_30d
FROM lag GROUP BY o_orderpriority
""",
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot rollup: order-to-first/last-shipment lags per
    priority class, with the 30-day full-fulfillment count — the lifecycle
    fact every order pipeline reports.

    Scale: the header-detail join shuffles both sides on the order key
    they share; the per-order accumulate collapses line fan-out before the
    tiny priority rollup."""
    t = tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    lag = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(
                F.to_date(F.min("l_shipdate")), F.to_date(F.col("o_orderdate"))
            ).alias("first_ship_days"),
            F.datediff(
                F.to_date(F.max("l_shipdate")), F.to_date(F.col("o_orderdate"))
            ).alias("last_ship_days"),
        )
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("first_ship_days").cast("bigint").alias("min_first_ship_days"),
        F.max("last_ship_days").cast("bigint").alias("max_last_ship_days"),
        F.count(F.when(F.col("last_ship_days") <= 30, 1)).alias(
            "n_fully_shipped_30d"
        ),
    )


@register(
    "ts_seasonality_profile",
    # weekday seasonality: exact-decimal sums per ISO weekday (pinned via
    # the portable weekday()+1 == isodow convention), one division each
    oracle="""
SELECT CAST(isodow(ts) AS BIGINT) AS iso_weekday,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)
    AS avg_value
FROM events GROUP BY 1
""",
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality profile (the simplest seasonal decomposition:
    day-of-week level averages) — exact sums, pinned weekday convention.

    Scale: 7-group partial aggregate; the shuffle is constant-size."""
    e = tables(spark, sf_dir)["events"]
    return e.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("iso_weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
            "total_value"
        ),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
    )


@register(
    "stats_chisq_cells",
    # chi-square independence cells for event_type × ISO weekday: observed
    # is an integer, expected = row·col/N is two integer products and one
    # division — per-cell output keeps every float op order-free
    oracle="""
WITH obs AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS wd, COUNT(*) AS o
  FROM events GROUP BY 1, 2
), rows_t AS (
  SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type
), cols_t AS (
  SELECT wd, SUM(o) AS c FROM obs GROUP BY wd
), n_t AS (
  SELECT SUM(o) AS n FROM obs
)
SELECT obs.event_type, obs.wd, obs.o,
  ROUND(CAST(r.r * c.c AS DOUBLE) / n.n, 6) AS expected,
  ROUND(POWER(obs.o - CAST(r.r * c.c AS DOUBLE) / n.n, 2)
        / (CAST(r.r * c.c AS DOUBLE) / n.n), 6) AS chisq_contrib
FROM obs
JOIN rows_t r ON r.event_type = obs.event_type
JOIN cols_t c ON c.wd = obs.wd
CROSS JOIN n_t n
""",
)
def stats_chisq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells (event type × weekday): per-cell
    observed, expected-under-independence, and contribution — the
    contingency analysis behind 'is activity mix day-dependent?'. Per-cell
    emission keeps every float op single and ordered (a global Σ would be
    accumulation-order-dependent; the consumer sums the 35 cells).

    Scale: the contingency table is |types|×7 — marginals broadcast."""
    e = tables(spark, sf_dir)["events"]
    obs = e.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("bigint").alias("wd")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_t = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_t = obs.groupBy("wd").agg(F.sum("o").alias("c"))
    n_t = obs.agg(F.sum("o").alias("n"))
    expected = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    return (
        obs.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "wd")
        .crossJoin(F.broadcast(n_t))
        .select(
            "event_type",
            "wd",
            "o",
            F.round(expected, 6).alias("expected"),
            F.round(
                F.pow(F.col("o") - expected, F.lit(2)) / expected, 6
            ).alias("chisq_contrib"),
        )
    )


@register(
    "attribution_first_touch",
    # first-touch attribution: every purchase's value credited to the
    # user's FIRST-ever event type (the acquisition-channel proxy);
    # first pick is deterministic under the (ts, event_id) composite key
    oracle="""
WITH first_touch AS (
  SELECT user_id,
    arg_min(event_type, strftime(ts, '%Y%m%d%H%M%S') ||
            lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
            lpad(CAST(event_id AS VARCHAR), 12, '0')) AS channel
  FROM events GROUP BY user_id
)
SELECT f.channel,
  COUNT(*) AS n_purchases,
  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
FROM events e JOIN first_touch f ON e.user_id = f.user_id
WHERE e.event_type = 'purchase'
GROUP BY f.channel
""",
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: purchase value rolled up to each user's
    first-ever event type — the marketing-attribution join (last-touch is
    the max_by twin).

    Scale: the first-touch map is one user-keyed aggregate; the purchase
    join re-uses the user partitioning; exact decimal sums."""
    e = tables(spark, sf_dir)["events"]
    key = "named_struct('t', ts, 'e', event_id)"
    first = e.groupBy("user_id").agg(
        F.expr(f"min_by(event_type, {key})").alias("channel")
    )
    return (
        e.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "attributed_value"
            ),
        )
    )


@register(
    "rfm_segmentation",
    # RFM terciles with integer keep rules (3·rank ≤ n / ≤ 2n) — no float
    # percentile boundary; recency measured in whole days to a fixed
    # reference date
    oracle="""
WITH base AS (
  SELECT o_custkey,
    date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '2003-01-01')
      AS recency_d,
    COUNT(*) AS frequency,
    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, recency_d, frequency,
    ROW_NUMBER() OVER (ORDER BY recency_d, o_custkey) AS rr,
    ROW_NUMBER() OVER (ORDER BY frequency DESC, o_custkey) AS rf,
    ROW_NUMBER() OVER (ORDER BY monetary DESC, o_custkey) AS rm,
    COUNT(*) OVER () AS n
  FROM base
)
SELECT CASE WHEN 3 * rr <= n THEN 1 WHEN 3 * rr <= 2 * n THEN 2 ELSE 3 END
         || CASE WHEN 3 * rf <= n THEN 1 WHEN 3 * rf <= 2 * n THEN 2 ELSE 3 END
         || CASE WHEN 3 * rm <= n THEN 1 WHEN 3 * rm <= 2 * n THEN 2 ELSE 3 END
         AS rfm_segment,
  COUNT(*) AS n_customers,
  CAST(MIN(recency_d) AS BIGINT) AS min_recency_d,
  CAST(MAX(frequency) AS BIGINT) AS max_frequency
FROM ranked GROUP BY 1
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers bucketed into recency/frequency/monetary
    terciles (1 = best), segment label = concatenated tercile digits — the
    classic CRM partitioning, with integer rank rules so no percentile
    boundary exists.

    Scale: per-customer rollup is one shuffle; the global rank is
    fixture-scale — at 100 TB switch to the two-phase per-shard rank
    (ids_dense_assign) or quantile-sketch boundaries."""
    o = tables(spark, sf_dir)["orders"]
    base = o.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.lit("2003-01-01")), F.to_date(F.max("o_orderdate"))
        ).alias("recency_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("monetary"),
    )
    ranked = base.select(
        "o_custkey",
        "recency_d",
        "frequency",
        F.row_number().over(W.orderBy("recency_d", "o_custkey")).alias("rr"),
        F.row_number()
        .over(W.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("rf"),
        F.row_number()
        .over(W.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("rm"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )

    def tercile(r):
        return (
            F.when(3 * F.col(r) <= F.col("n"), F.lit(1))
            .when(3 * F.col(r) <= 2 * F.col("n"), F.lit(2))
            .otherwise(F.lit(3))
        )

    return (
        ranked.select(
            F.concat(
                tercile("rr").cast("string"),
                tercile("rf").cast("string"),
                tercile("rm").cast("string"),
            ).alias("rfm_segment"),
            "recency_d",
            "frequency",
        )
        .groupBy("rfm_segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("recency_d").cast("bigint").alias("min_recency_d"),
            F.max("frequency").cast("bigint").alias("max_frequency"),
        )
    )


@register(
    "event_path_trigrams",
    # top 10 three-step user paths: lag/lead over the per-user stream,
    # integer counts, (count desc, path) deterministic ranking
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), paths AS (
  SELECT prev || '>' || event_type || '>' || nxt AS path
  FROM seq WHERE prev IS NOT NULL AND nxt IS NOT NULL
), ranked AS (
  SELECT path, COUNT(*) AS n,
    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rnk
  FROM paths GROUP BY path
)
SELECT path, n, rnk FROM ranked WHERE rnk <= 10
""",
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path mining: the 10 most common three-step event sequences —
    the navigation-flow summary behind funnel design.

    Scale: one user-keyed window pass; the path vocabulary is |types|³
    bounded, so the count shuffle is tiny."""
    e = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    paths = seq.filter(
        F.col("prev").isNotNull() & F.col("nxt").isNotNull()
    ).select(F.concat_ws(">", "prev", "cur", "nxt").alias("path"))
    ranked = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk", F.row_number().over(W.orderBy(F.col("n").desc(), "path"))
        )
    )
    return ranked.filter(F.col("rnk") <= 10)


@register(
    "session_entry_exit",
    # entry/exit distribution: each session's first and last event type
    # (deterministic under the (ts, event_id) key), counted as a matrix
    oracle="""
WITH g AS (
  SELECT user_id, event_id, event_type, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, event_id, event_type, ts,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM g
), fl AS (
  SELECT user_id, session_seq,
    arg_min(event_type, strftime(ts, '%Y%m%d%H%M%S') ||
            lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
            lpad(CAST(event_id AS VARCHAR), 12, '0')) AS entry_type,
    arg_max(event_type, strftime(ts, '%Y%m%d%H%M%S') ||
            lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
            lpad(CAST(event_id AS VARCHAR), 12, '0')) AS exit_type
  FROM s GROUP BY user_id, session_seq
)
SELECT entry_type, exit_type, COUNT(*) AS n_sessions
FROM fl GROUP BY entry_type, exit_type
""",
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit matrix: how sessions start vs how they end —
    the landing/abandonment distribution on top of the sessionizer.

    Scale: the first/last picks collapse each session map-side (min_by /
    max_by on the composite key); the matrix is |types|²."""
    e = tables(spark, sf_dir)["events"]
    s = sessionized(e, "user_id", "event_id", "event_type", "ts")
    key = "named_struct('t', ts, 'e', event_id)"
    fl = s.groupBy("user_id", "session_seq").agg(
        F.expr(f"min_by(event_type, {key})").alias("entry_type"),
        F.expr(f"max_by(event_type, {key})").alias("exit_type"),
    )
    return fl.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


@register(
    "attribution_last_touch",
    # the max_by twin of first-touch: credit each purchase to the LAST
    # non-purchase event before it… simplified to the user's latest
    # non-purchase touch (deterministic composite key), the common
    # practical approximation
    oracle="""
WITH last_touch AS (
  SELECT user_id,
    arg_max(event_type, strftime(ts, '%Y%m%d%H%M%S') ||
            lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '-' ||
            lpad(CAST(event_id AS VARCHAR), 12, '0')) AS channel
  FROM events WHERE event_type <> 'purchase' GROUP BY user_id
)
SELECT l.channel,
  COUNT(*) AS n_purchases,
  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
FROM events e JOIN last_touch l ON e.user_id = l.user_id
WHERE e.event_type = 'purchase'
GROUP BY l.channel
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: purchase value credited to the user's most
    recent non-purchase event type — first/last-touch pair complete.

    Scale: identical shape to first-touch (one user-keyed pick + the
    purchase join on the same partitioning)."""
    e = tables(spark, sf_dir)["events"]
    key = "named_struct('t', ts, 'e', event_id)"
    last = (
        e.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.expr(f"max_by(event_type, {key})").alias("channel"))
    )
    return (
        e.filter(F.col("event_type") == "purchase")
        .join(last, "user_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "attributed_value"
            ),
        )
    )


@register(
    "rank_movement_report",
    # nation revenue league table, 1996 vs 1997: integer ranks from exact
    # decimal revenue (custkey-ordered tiebreak), rank delta — the
    # period-over-period movement report
    oracle="""
WITH rev AS (
  SELECT c.c_nationkey AS nationkey,
    CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) AS yr,
    SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE strftime(o.o_orderdate, '%Y') IN ('1996', '1997')
  GROUP BY 1, 2
), ranked AS (
  SELECT nationkey, yr,
    ROW_NUMBER() OVER (PARTITION BY yr ORDER BY r DESC, nationkey) AS rk
  FROM rev
)
SELECT a.nationkey,
  CAST(a.rk AS BIGINT) AS rank_1996, CAST(b.rk AS BIGINT) AS rank_1997,
  CAST(a.rk - b.rk AS BIGINT) AS rank_gain
FROM ranked a JOIN ranked b
  ON a.nationkey = b.nationkey AND a.yr = 1996 AND b.yr = 1997
""",
)
def rank_movement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """League-table movement: nation revenue rank in 1996 vs 1997 with the
    rank delta — the period-over-period standings report (exact decimal
    revenue, integer ranks, deterministic tiebreak).

    Scale: one fact scan covers both periods (year is a grouping key, not
    two scans); ranks run over group-count-sized rows."""
    t = tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1996, 1997))
        .groupBy("c_nationkey", "yr")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("r"))
    )
    wy = W.partitionBy("yr").orderBy(F.col("r").desc(), "c_nationkey")
    ranked = rev.withColumn("rk", F.row_number().over(wy))
    a = ranked.filter(F.col("yr") == 1996).select(
        F.col("c_nationkey").alias("nationkey"), F.col("rk").alias("rank_1996")
    )
    b = ranked.filter(F.col("yr") == 1997).select(
        F.col("c_nationkey").alias("nationkey"), F.col("rk").alias("rank_1997")
    )
    return a.join(b, "nationkey").select(
        "nationkey",
        F.col("rank_1996").cast("bigint").alias("rank_1996"),
        F.col("rank_1997").cast("bigint").alias("rank_1997"),
        (F.col("rank_1996") - F.col("rank_1997")).cast("bigint").alias("rank_gain"),
    )


@register(
    "survival_km_fulfillment",
    # the ln-sum runs in ascending-duration order on both sides (same
    # additions, same single exp), 6dp-rounded; counts are exact ints
    oracle="""
WITH dur AS (
  SELECT o.o_orderkey,
    date_diff('day', CAST(o.o_orderdate AS DATE), CAST(MAX(l.l_shipdate) AS DATE)) AS dur,
    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
), g AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS m FROM dur GROUP BY dur
), r AS (
  SELECT dur, d,
    CAST(SUM(m) OVER (ORDER BY dur DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n
  FROM g
)
SELECT dur AS t_days, d, n AS n_at_risk,
  CASE WHEN d = n THEN 0.0 ELSE
    ROUND(exp(SUM(CASE WHEN d < n THEN ln(1 - CAST(d AS DOUBLE) / n) ELSE 0 END)
              OVER (ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
  END AS survival
FROM r WHERE d > 0
""",
)
def survival_km_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of order fulfillment time (event =
    order reached final status 'F'; still-open orders are right-censored
    at their last shipment): at each observed event time t, S(t) multiplies
    in (1 − d/n) over the at-risk set — the estimator product expressed as
    exp(Σ ln(·)) so both engines run the identical op sequence. Censoring
    is what makes this KM and not a plain quantile: open orders still
    count in n until they drop out.

    Scale: durations aggregate per order (one fact shuffle with partial
    agg); everything after runs on the distinct-duration grid — bounded
    by the calendar (thousands of rows), not by fact scale, so the
    global (unpartitioned) windows stay cheap at any corpus size. The classic use over sync pipelines: time-to-complete SLAs
    with in-flight records censored, not dropped."""
    t = tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    dur = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("mx"))
        .select(
            F.datediff(F.to_date("mx"), F.to_date("o_orderdate")).alias("dur"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
    )
    g = dur.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"), F.count(F.lit(1)).alias("m")
    )
    w_desc = W.orderBy(F.col("dur").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    r = g.select(
        "dur", "d", F.sum("m").over(w_desc).cast("bigint").alias("n")
    )
    w_asc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    events_only = r.filter(F.col("d") > 0)
    return events_only.select(
        F.col("dur").alias("t_days"),
        "d",
        F.col("n").alias("n_at_risk"),
        # the d = n row (all remaining at-risk fulfill — only possible at
        # the last event time) would put ln(0) in the chain: emitted as an
        # exact 0 instead, with a guarded dummy term in the running sum
        F.when(F.col("d") == F.col("n"), F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d") < F.col("n"),
                            F.log(1 - F.col("d").cast("double") / F.col("n")),
                        ).otherwise(F.lit(0.0))
                    ).over(w_asc)
                ),
                6,
            )
        )
        .alias("survival"),
    )


@register(
    "attribution_time_decay",
    # per-touch weights are IEEE-identical (one div on exact ints); the
    # per-channel weight sums accumulate in DECIMAL(18,6) after a
    # deterministic per-value rounding, so summation order cannot matter
    oracle="""
WITH purch AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT p.p_id, p.user_id, e.event_type AS channel,
    date_diff('day', CAST(e.ts AS DATE), CAST(p.p_ts AS DATE)) AS age_d
  FROM purch p
  JOIN events e ON e.user_id = p.user_id AND e.ts < p.p_ts
    AND e.event_type <> 'purchase'
), wt AS (
  SELECT channel,
    CAST(CAST(1.0 AS DOUBLE) / (1 + age_d) AS DECIMAL(18,6)) AS w
  FROM touch
)
SELECT channel,
  CAST(SUM(w) AS DOUBLE) AS credit,
  COUNT(*) AS n_touches
FROM wt GROUP BY channel
""",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: every pre-purchase touch (any
    non-purchase event type) earns credit
    1/(1+age_days) toward its channel — the middle ground between the
    first/last-touch cases (all-or-nothing) and data-driven models. The
    hyperbolic weight keeps arithmetic rational; quantizing each weight
    to DECIMAL(18,6) BEFORE summing makes the aggregate exact and
    order-free (a raw float sum would hash-differ across partitionings).

    Scale: the touch join is user-keyed (one shuffle); at 100 TB bound
    the lookback window (age < N days) so the per-user touch fan-out
    stays constant."""
    e = tables(spark, sf_dir)["events"]
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touch = purch.join(
        e.filter(F.col("event_type") != "purchase"),
        (F.col("user_id") == F.col("p_user")) & (F.col("ts") < F.col("p_ts")),
    ).select(
        F.col("event_type").alias("channel"),
        F.datediff(F.to_date("p_ts"), F.to_date("ts")).alias("age_d"),
    )
    w = (F.lit(1.0) / (1 + F.col("age_d"))).cast("decimal(18,6)")
    return touch.select("channel", w.alias("w")).groupBy("channel").agg(
        F.sum("w").cast("double").alias("credit"),
        F.count(F.lit(1)).alias("n_touches"),
    )


@register(
    "events_json_schema_profile",
    oracle="""
WITH k AS (
  SELECT event_type, unnest(json_keys(props)) AS key FROM events
), t AS (
  SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
)
SELECT k.event_type, key, COUNT(*) AS n_present,
  ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_events), 6) AS fill_rate
FROM k JOIN t ON k.event_type = t.event_type
GROUP BY k.event_type, key
""",
)
def events_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: per event type, which JSON keys
    its payloads actually carry and how often — the drift instrument
    that tells an ELT owner a producer added/dropped a field long before
    a downstream cast fails. Key extraction is the engine-native
    ``json_object_keys`` (no schema declaration needed).

    Scale: key explode is map-side (a few keys per event); both
    aggregates partial-combine, and the per-type totals are a
    broadcast-sized join side."""
    ev = tables(spark, sf_dir)["events"]
    k = ev.select(
        "event_type", F.explode(F.json_object_keys("props")).alias("key")
    )
    t = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        k.groupBy("event_type", "key")
        .agg(F.count(F.lit(1)).alias("n_present"))
        .join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "key",
            "n_present",
            F.round(
                F.col("n_present").cast("double") / F.col("n_events"), 6
            ).alias("fill_rate"),
        )
    )
