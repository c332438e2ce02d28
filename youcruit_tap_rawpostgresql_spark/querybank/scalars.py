"""Scalar-function query cases (SURVEY.md §2.8): string, date/time, math,
conditional, array, JSON families. All JVM-side built-ins — zero Python UDFs
(whole-stage codegen keeps these in one pass over the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables


@register(
    "scalar_string",
    oracle="""
SELECT p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  substring(p_name, 1, 5) AS name_prefix,
  length(p_name) AS name_len,
  concat(p_brand, ':', p_type) AS brand_type,
  trim('  pad  ') AS trimmed,
  replace(p_type, ' ', '_') AS type_snake,
  CASE WHEN p_name LIKE '%el%' THEN 1 ELSE 0 END AS has_el,
  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
  array_to_string(string_split(p_type, ' '), '|') AS type_parts
FROM part
""",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, length, concat, trim,
    replace, LIKE, regexp_extract, split."""
    p = tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").like("%el%"), 1).otherwise(0).alias("has_el"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.array_join(F.split("p_type", " "), "|").alias("type_parts"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
  abs(l_extendedprice - 1000.0) AS abs_diff,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.25 AS DECIMAL(4,2)) AS DOUBLE) AS quarter,
  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
  CAST(l_quantity AS BIGINT) % 5 AS mod5,
  round(sqrt(l_extendedprice), 6) AS sqrt_price,
  round(ln(l_extendedprice + 1.0), 6) AS ln_price,
  round(power(l_discount + 1.0, 2), 6) AS pow_disc,
  greatest(l_discount, l_tax) AS max_rate,
  least(l_discount, l_tax) AS min_rate,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc
FROM lineitem WHERE l_orderkey % 100 = 0
""",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals rounded to 6dp (libm vs JDK Math may
    differ in the last ulp)."""
    l = tables(spark, sf_dir)["lineitem"]
    return l.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        # exact decimal product, not round(x*0.25, 2): Spark rounds doubles
        # via their shortest string repr, DuckDB via exact binary value —
        # they disagree on .525-style boundaries
        (F.col("l_extendedprice").cast("decimal(12,2)") * F.lit(0.25).cast("decimal(4,2)"))
        .cast("double")
        .alias("quarter"),
        F.ceil(F.col("l_quantity") / 7.0).alias("ceil7"),
        F.floor(F.col("l_quantity") / 7.0).alias("floor7"),
        (F.col("l_quantity").cast("bigint") % 5).alias("mod5"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2), 6).alias("pow_disc"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
    )


@register(
    "scalar_datetime",
    oracle="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(month(o_orderdate) AS INT) AS mo,
  CAST(day(o_orderdate) AS INT) AS dom,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
  CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders WHERE o_orderkey % 50 = 0
""",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, add interval, diff.

    DOW convention pinned to Sunday=1 (DuckDB dayofweek is Sunday=0, Spark
    is Sunday=1 — oracle side adjusts; here both emit Sunday=1 by +1 on the
    DuckDB side... actually: Spark dayofweek(Sunday)=1; DuckDB
    dayofweek(Sunday)=0, so oracle casts Spark's convention)."""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
        ).alias("plus30"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_95"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_bucket,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
  CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation,
  greatest(c_acctbal, 0.0) AS bal_floor0,
  (c_acctbal > 0 AND c_nationkey < 10) AS flag
FROM customer
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, greatest, boolean expr."""
    c = tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_nationkey") % 2 != 0, F.col("c_nationkey")).alias("odd_nation"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        ((F.col("c_acctbal") > 0) & (F.col("c_nationkey") < 10)).alias("flag"),
    )


@register(
    "scalar_array",
    oracle="""
SELECT vec_id, label,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
  round(CAST(list_aggregate(embedding, 'sum') AS DOUBLE), 5) AS comp_sum,
  round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS comp_max,
  len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings WHERE vec_id % 10 = 0
""",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, index, aggregate
    (higher-order functions), filter. comp_sum rounded to 5dp — float
    accumulation order differs across engines."""
    e = tables(spark, sf_dir)["embeddings"]
    return e.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            5,
        ).alias("comp_sum"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 6
        ).alias("comp_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "scalar_json",
    oracle="""
SELECT event_id, event_type,
  CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT) AS k_value,
  json_extract_string(props, '$.missing') AS missing_key
FROM events WHERE event_id % 20 = 0
""",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: extract typed values from a JSON string column
    (maps PG ``->``/``->>`` to get_json_object)."""
    e = tables(spark, sf_dir)["events"]
    return e.filter(F.col("event_id") % 20 == 0).select(
        "event_id",
        "event_type",
        # floor(double) on BOTH sides: a bare string->bigint cast rounds
        # in DuckDB but truncates/NULLs in Spark for non-integral values
        F.floor(F.get_json_object("props", "$.k").cast("double"))
        .alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@register(
    "json_struct_agg",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
  COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
FROM events GROUP BY event_type
""",
)
def json_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON parse (from_json → typed struct) feeding an
    aggregation — the schema-on-read path for semi-structured columns
    (vs get_json_object string extraction in scalar_json). Scale: parse
    happens once per row pre-shuffle; only the extracted long shuffles."""
    e = tables(spark, sf_dir)["events"]
    parsed = e.select(
        "event_type",
        F.from_json("props", "struct<k:bigint>").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").alias("k_total"),
        F.count(F.when(F.col("p.k") > 50, 1)).alias("k_high"),
    )


@register(
    "scalar_string_extras",
    oracle="""
SELECT c_custkey,
  translate(c_name, '#0', '-x') AS translated,
  repeat(c_mktsegment, 2) AS doubled,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
  reverse(c_name) AS reversed,
  replace(c_name, 'Customer', 'C') AS shortened
FROM customer WHERE c_custkey % 50 = 0
""",
)
def scalar_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche (translate / repeat / lpad / reverse /
    replace — all delegated-PG surface, identical semantics in Spark and
    DuckDB). Map-only columnar projections."""
    c = tables(spark, sf_dir)["customer"]
    return c.filter(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        F.translate("c_name", "#0", "-x").alias("translated"),
        F.repeat("c_mktsegment", 2).alias("doubled"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_name").alias("reversed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias(
            "shortened"
        ),
    )


@register(
    "scalar_datetime_extras",
    # conventions pinned cross-engine: ISO weekday = Spark weekday()+1 ==
    # DuckDB isodow; weekofyear is ISO in both; last_day/quarter identical
    oracle="""
SELECT o_orderkey,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week
FROM orders WHERE o_orderkey % 100 = 0
""",
)
def scalar_datetime_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime tranche: last_day / quarter / ISO weekday / ISO
    week. Weekday numbering differs across engines (Spark dayofweek is
    Sunday=1; DuckDB isodow is Monday=1), so the portable form is Spark's
    ``weekday()+1`` — pinned here so the convention is load-bearing."""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_weekday"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
    )


@register(
    "scalar_bitwise",
    oracle="""
SELECT o_orderkey,
  o_orderkey & 255 AS low_byte,
  o_orderkey | 4096 AS with_flag,
  xor(o_orderkey, 21845) AS xored,
  o_orderkey << 2 AS shifted_l,
  o_orderkey >> 3 AS shifted_r
FROM orders WHERE o_orderkey % 100 = 0
""",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts — PG's `#` xor spelled
    portably) — integer-exact in any engine; the building blocks of the
    Z-order/bucketing layout math."""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ 21845").alias("xored"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shifted_l"),
        F.expr("shiftright(o_orderkey, 3)").alias("shifted_r"),
    )


@register(
    "scalar_null_semantics",
    # NULLIF manufactures NULLs, then every null-handling construct the
    # PG surface carries is exercised: COALESCE, IS DISTINCT FROM,
    # null-safe compare, GREATEST/LEAST null-skipping
    oracle="""
SELECT o_orderkey,
  NULLIF(o_orderstatus, 'O') AS status_or_null,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_defaulted,
  o_orderstatus IS DISTINCT FROM 'F' AS not_f_nullsafe,
  NULLIF(o_orderstatus, 'O') IS NULL AS was_open,
  GREATEST(o_totalprice, 100000.0) AS floored_price,
  LEAST(NULLIF(o_totalprice, o_totalprice), o_totalprice) AS least_with_null
FROM orders WHERE o_orderkey % 100 = 0
""",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface (SURVEY §2.8 conditional family): NULLIF /
    COALESCE / IS DISTINCT FROM / GREATEST / LEAST — identical three-valued
    logic in Spark and DuckDB (both skip NULLs in GREATEST/LEAST, unlike
    engines that propagate them)."""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_defaulted"
        ),
        F.expr("o_orderstatus IS DISTINCT FROM 'F'").alias("not_f_nullsafe"),
        F.nullif("o_orderstatus", F.lit("O")).isNull().alias("was_open"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floored_price"),
        F.least(
            F.nullif("o_totalprice", F.col("o_totalprice")), F.col("o_totalprice")
        ).alias("least_with_null"),
    )


@register(
    "scalar_xml_extract",
    oracle="""
WITH x AS (
  SELECT p_partkey,
    '<item><id>' || CAST(p_partkey AS VARCHAR) || '</id><brand>' || p_brand
      || '</brand><size>' || CAST(p_size AS VARCHAR) || '</size></item>' AS xml
  FROM part WHERE p_partkey % 7 = 0
)
SELECT p_partkey,
  CAST(regexp_extract(xml, '<id>([0-9]+)</id>', 1) AS BIGINT) AS xid,
  regexp_extract(xml, '<brand>(.*?)</brand>', 1) AS xbrand,
  CAST(regexp_extract(xml, '<size>([0-9]+)</size>', 1) AS BIGINT) AS xsize,
  (regexp_extract(xml, '<brand>(.*?)</brand>', 1) <> '') AS has_brand
FROM x
""",
)
def scalar_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar surface: XPath probes (``xpath_long`` / ``xpath_string``
    / ``xpath_boolean``) over a per-row XML payload — the PG analogue is
    ``xpath()``/``xmltable``. The oracle uses regexp extraction over the
    identically-constructed document, so a path-evaluation bug mismatches.

    Scale: XPath evaluation is a per-row JVM expression (no shuffle); for
    hundreds of probes per document the VARIANT/from_xml parse-once forms
    take over (same trade as get_json_object vs parse_json)."""
    p = tables(spark, sf_dir)["part"]
    x = p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.concat(
            F.lit("<item><id>"),
            F.col("p_partkey").cast("string"),
            F.lit("</id><brand>"),
            F.col("p_brand"),
            F.lit("</brand><size>"),
            F.col("p_size").cast("string"),
            F.lit("</size></item>"),
        ).alias("xml"),
    )
    return x.select(
        "p_partkey",
        F.expr("xpath_long(xml, '/item/id')").alias("xid"),
        F.expr("xpath_string(xml, '/item/brand')").alias("xbrand"),
        F.expr("xpath_long(xml, '/item/size')").alias("xsize"),
        F.expr("xpath_boolean(xml, '/item/brand')").alias("has_brand"),
    )


@register(
    "tablefunc_json_elements",
    oracle="""
WITH j AS (
  SELECT o_orderkey,
    [o_orderkey % 10, CAST(o_custkey % 100 AS BIGINT),
     CAST(length(o_orderpriority) AS BIGINT)] AS arr
  FROM orders WHERE o_orderkey % 20 = 0
)
SELECT o_orderkey,
  CAST(pos - 1 AS INT) AS pos,
  arr[pos] AS element
FROM (SELECT o_orderkey, arr, unnest(generate_series(1, len(arr))) AS pos FROM j)
""",
)
def tablefunc_json_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-returning JSON expansion (PG ``jsonb_array_elements WITH
    ORDINALITY``): a JSON array payload is parsed once (``from_json`` to
    ``array<bigint>``) and fanned out to one row per element with its
    position (``posexplode``). The oracle builds the same array from the
    source columns directly, so a parse or ordering bug mismatches.

    Scale: parse + explode are narrow (pipelined, no exchange); the
    fan-out factor is the array length, and position comes from the
    generator — no window, no sort."""
    o = tables(spark, sf_dir)["orders"]
    j = o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.concat(
            F.lit("["),
            (F.col("o_orderkey") % 10).cast("string"),
            F.lit(","),
            (F.col("o_custkey") % 100).cast("string"),
            F.lit(","),
            F.length("o_orderpriority").cast("string"),
            F.lit("]"),
        ).alias("payload"),
    )
    parsed = j.select(
        "o_orderkey", F.from_json("payload", "array<bigint>").alias("arr")
    )
    return parsed.select(
        "o_orderkey", F.posexplode("arr").alias("pos", "element")
    )


@register(
    "scalar_trgm_similarity",
    oracle="""
WITH t AS (
  SELECT p_partkey,
    '  ' || lower(p_name) || ' ' AS a,
    '  ' || lower(p_type) || ' ' AS b
  FROM part WHERE p_partkey % 9 = 0
), g AS (
  SELECT p_partkey,
    list_distinct(list_transform(generate_series(1, length(a) - 2),
                                 i -> a[i:(i+2)])) AS ta,
    list_distinct(list_transform(generate_series(1, length(b) - 2),
                                 i -> b[i:(i+2)])) AS tb
  FROM t
)
SELECT p_partkey,
  CAST(len(list_intersect(ta, tb)) AS DOUBLE)
    / len(list_distinct(list_concat(ta, tb))) AS sim,
  (CAST(len(list_intersect(ta, tb)) AS DOUBLE)
    / len(list_distinct(list_concat(ta, tb)))) >= 0.3 AS is_similar
FROM g
""",
)
def scalar_trgm_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_trgm parity: trigram similarity (`similarity()` / the `%`
    operator, default threshold 0.3) as native array expressions — pad
    with two leading/one trailing space like pg_trgm, distinct 3-grams,
    |A∩B| / |A∪B|. Exact across engines: set sizes are integers and the
    single division is one IEEE op.

    Scale: map-only per-row expression here; for trigram JOINs (fuzzy
    match against a dictionary) the same trigram array explodes into an
    inverted index — the distributed analogue of pg_trgm's GIN index
    (er_blocked_fuzzy_join shows the blocked-join form)."""
    p = tables(spark, sf_dir)["part"]

    def trigrams(col):
        padded = F.concat(F.lit("  "), F.lower(col), F.lit(" "))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - 2),
                lambda i: F.substring(padded, i, F.lit(3)),
            )
        )

    g = p.filter(F.col("p_partkey") % 9 == 0).select(
        "p_partkey",
        trigrams(F.col("p_name")).alias("ta"),
        trigrams(F.col("p_type")).alias("tb"),
    )
    sim = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    return g.select(
        "p_partkey", sim.alias("sim"), (sim >= 0.3).alias("is_similar")
    )
