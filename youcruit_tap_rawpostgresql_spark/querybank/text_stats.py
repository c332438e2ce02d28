"""Corpus statistics / ranking operators for the LLM-data pipeline
(SURVEY.md §2.12 extension family): TF-IDF term ranking, BM25 keyword
retrieval scoring, and Zipf-bucket vocabulary profiling.

Float-exactness: products/divisions are IEEE-correctly-rounded, so writing
the SAME expression tree on both engines is bit-stable; `ln` is the one
libm-dependent call, mitigated by ranking on the ROUNDED score (6dp) with a
token tiebreak so a last-ulp drift cannot flip result ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from youcruit_tap_rawpostgresql_spark.functions.text_funcs import tokens
from youcruit_tap_rawpostgresql_spark.querybank.llm import O_TOKS
from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables


@register(
    "text_tfidf_topk",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(t) AS token
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
    ROUND(tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df), 6)
      AS tfidf
  FROM tf JOIN df ON tf.token = df.token
), ranked AS (
  SELECT doc_id, token, tf, df, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 3
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tfidf = tf · ln(N/df)).

    Scale: tf is one explode + one (doc, token) shuffle; df derives from tf
    (NOT a second corpus pass — the shared exchange is pinned by a plan
    test) and is vocabulary-sized, so it broadcasts back onto tf — the
    corpus is shuffled exactly once, and Spark's WindowGroupLimit bounds
    the ranking exchange to ≤3 rows/doc map-side. Ranking orders by
    the 6dp-ROUNDED score (token tiebreak) so cross-engine ln drift in the
    last ulp cannot reorder the top-k."""
    d = tables(spark, sf_dir)["documents"]
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # the trivially-true tf >= 1 guard is load-bearing: WITHOUT it Catalyst
    # rewrites this count-over-groups into a DISTINCT (dropping tf), the
    # df subtree no longer canonicalizes equal to the join's tf subtree,
    # and the corpus is scanned+exploded+shuffled TWICE. With it, the
    # (doc_id, token) exchange is shared (ReusedExchange / AQE stage
    # reuse) — measured 0.95s vs 1.21s at sf0.1
    df = (
        tf.filter(F.col("tf") >= 1)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "rnk")
    )


_BM25_TERMS = ("customer", "dup")
_K1 = "1.2"
_B = "0.75"


@register(
    "text_bm25_keyword",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, {O_TOKS} AS t FROM documents
), dl AS (
  SELECT doc_id, len(t) AS dl FROM docs
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
    (CAST(SUM(dl) AS DOUBLE) / COUNT(*)) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS token FROM docs)
  WHERE token IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}')
  GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
)
SELECT tf.doc_id,
  ROUND(SUM(
    ln(1.0 + (CAST(stats.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
    * ((tf.tf * ({_K1} + 1.0))
       / (tf.tf + {_K1} * ((1.0 - {_B}) + (({_B} * dl.dl) / stats.avgdl))))
  ), 6) AS bm25
FROM tf
JOIN df ON tf.token = df.token
JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats
GROUP BY tf.doc_id
""",
)
def text_bm25_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval score of every matching document for the fixed
    two-term query {_BM25_TERMS} (k1=1.2, b=0.75, Robertson idf with +1).

    Scale: term postings (tf) come from one explode restricted to the query
    terms — the IN filter prunes before the (doc, token) shuffle; df and the
    corpus stats are scalar-sized and broadcast. Unordered output keeps the
    float score out of any ranking decision. The expression tree is
    parenthesized identically on both engines; every op except ln is IEEE
    correctly-rounded, and ln feeds only the 6dp-rounded output."""
    d = tables(spark, sf_dir)["documents"]
    docs = d.select("doc_id", tokens("text").alias("t"))
    dl = docs.select("doc_id", F.size("t").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf >= 1 keeps the count aggregate in the df subtree so it
    # canonicalizes equal to the join's tf side and the corpus
    # scan+explode+exchange is REUSED, not recomputed (see
    # text_tfidf_topk for the measured effect of this guard)
    df = (
        tf.filter(F.col("tf") >= 1)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    k1, b = F.lit(1.2), F.lit(0.75)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        (F.col("tf") * (k1 + F.lit(1.0)))
        / (
            F.col("tf")
            + k1 * ((F.lit(1.0) - b) + ((b * F.col("dl")) / F.col("avgdl")))
        )
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )


@register(
    "text_zipf_buckets",
    oracle=f"""
WITH tok AS (
  SELECT unnest(t) AS token
  FROM (SELECT {O_TOKS} AS t FROM documents)
), cnt AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
)
SELECT length(bin(c)) AS bucket, COUNT(*) AS n_tokens,
  MIN(c) AS min_count, MAX(c) AS max_count
FROM cnt GROUP BY bucket
""",
)
def text_zipf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency profile in power-of-two buckets (Zipf curve
    summary): bucket = bit-length of the token's corpus count — integer-only
    (length of the binary string), no float log anywhere.

    Scale: token counts are a partial-aggregated explode; the bucket rollup
    input is vocabulary-sized. This is the profile that drives data-driven
    stopword and boilerplate thresholds upstream of dedup."""
    d = tables(spark, sf_dir)["documents"]
    cnt = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy(F.length(F.bin("c")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.min("c").alias("min_count"),
        F.max("c").alias("max_count"),
    )


@register(
    "text_unigram_logprob",
    headline=True,
    # the per-doc sum folds log-probs in POSITION order on both engines
    # (array fold vs list(… ORDER BY pos) + list_reduce), so the only
    # cross-engine difference is the last ulp of ln itself — absorbed by
    # the 6dp output rounding, never amplified by reordering
    oracle=f"""
WITH docs AS (
  SELECT doc_id, {O_TOKS} AS t FROM documents
), tokp AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM docs
), tok AS (
  SELECT doc_id, pos, t[pos] AS token FROM tokp
), vocab AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok
), lp AS (
  SELECT token, ln((SELECT total FROM tot) / c) AS lp FROM vocab
), per AS (
  SELECT t.doc_id, list(l.lp ORDER BY t.pos) AS lps
  FROM tok t JOIN lp l ON t.token = l.token
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
  ROUND(list_reduce(lps, (x, y) -> x + y) / len(lps), 6) AS avg_neg_logp
FROM per
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model quality score: average per-token negative log-probability
    under the corpus's own unigram LM (the cheap stand-in for the
    perplexity-filter stage of a training-data pipeline — low avg ⇒
    stereotyped text, high avg ⇒ rare-token soup).

    Scale: the unigram model derives from ONE (token) aggregate of the
    exploded corpus and is vocabulary-sized, so it broadcasts back onto the
    token stream; the per-doc re-collect shuffles (doc_id, pos, lp) once.
    The fold itself is a per-row array aggregate — no driver involvement."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # total tokens = Σ vocab counts — a 1-row broadcast onto the vocabulary
    # (a driver-side tok.count() would re-explode the whole corpus in a
    # separate job just to produce this scalar)
    tot = vocab.agg(F.sum("c").cast("double").alias("total"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "token", F.log(F.col("total") / F.col("c")).alias("lp")
    )
    per = (
        tok.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lp"))).alias("arr"))
    )
    folded = F.aggregate(
        F.transform("arr", lambda x: x["lp"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return per.select(
        "doc_id",
        F.size("arr").cast("bigint").alias("n_tokens"),
        F.round(folded / F.size("arr"), 6).alias("avg_neg_logp"),
    )


@register(
    "text_inverted_index",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({O_TOKS})) AS token FROM documents
)
SELECT token, COUNT(*) AS df,
  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM tok GROUP BY token
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (token → sorted posting list + document
    frequency) — the IR-side storage structure behind BM25 serving and
    contamination lookups, emitted as canonical CSV strings.

    Scale: one explode + one token-keyed shuffle with map-side partial
    collect; posting lists are per-token (vocabulary-partitioned), so a
    100 TB corpus builds as wide as the vocabulary. Hot stop-word postings
    are the known skew — in production those rows are capped or
    block-compressed, here they stay exact for the oracle."""
    d = tables(spark, sf_dir)["documents"]
    return (
        d.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


@register(
    "bpe_first_merges",
    # the first iteration of BPE vocabulary induction: count adjacent
    # character pairs across the corpus and rank the merge candidates —
    # all-integer counts with a lexical tiebreak
    oracle=f"""
WITH tok AS (
  SELECT unnest({O_TOKS}) AS w FROM documents
), pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM tok)
  WHERE len(w) >= 2
), ranked AS (
  SELECT pair, COUNT(*) AS n,
    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rnk
  FROM pairs GROUP BY pair
)
SELECT pair, n, rnk FROM ranked WHERE rnk <= 10
""",
)
def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, first merge step: the 10 most frequent
    adjacent character pairs across the tokenized corpus (deterministic
    count-desc, pair-asc ranking) — the tokenizer-training primitive.

    Scale: explode to (pair) rows, one vocabulary-sized shuffle with
    map-side partial counts; successive BPE iterations re-run the same
    shape over the re-segmented corpus."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select(F.explode(tokens("text")).alias("w")).filter(F.length("w") >= 2)
    pairs = w.select(
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"), "w"
    ).select(F.substring(F.col("w"), F.col("i"), 2).alias("pair"))
    # substring with a column start needs expr form in some versions; the
    # above resolves on Spark 4. Count + deterministic rank:
    ranked = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("n").desc(), F.col("pair"))
            ),
        )
    )
    return ranked.filter(F.col("rnk") <= 10)


@register(
    "text_oov_rate",
    # vocabulary = tokens appearing >= 20 times corpus-wide; OOV rate =
    # out-of-vocabulary tokens / tokens, one IEEE division of two ints
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({O_TOKS}) AS w FROM documents
), vocab AS (
  SELECT w FROM tok GROUP BY w HAVING COUNT(*) >= 20
)
SELECT t.doc_id,
  COUNT(*) AS n_tokens,
  COUNT(*) FILTER (WHERE v.w IS NULL) AS n_oov,
  ROUND(CAST(COUNT(*) FILTER (WHERE v.w IS NULL) AS DOUBLE) / COUNT(*), 6)
    AS oov_rate,
  CAST(COUNT(*) FILTER (WHERE v.w IS NULL) * 10 >= COUNT(*) AS BOOLEAN)
    AS is_noisy
FROM tok t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
""",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    frequent-token vocabulary (≥20 occurrences) with a ≥10%-OOV noise
    flag — the vocabulary-coverage filter of a training-data pipeline.

    Scale: the vocabulary derives from the token aggregate and broadcasts
    onto the token stream (vocab ≪ corpus); integer flag comparison, no
    float threshold boundary."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("w"))
    vocab = (
        tok.groupBy("w").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 20)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "w", "left")
    oov = F.count(F.when(F.col("in_vocab").isNull(), 1))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.alias("n_oov"),
        F.round(oov.cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        (oov * 10 >= F.count(F.lit(1))).alias("is_noisy"),
    )


@register(
    "text_langid_ngram_profile",
    # real n-gram language ID: per-language top-20 char-trigram profiles
    # (deterministic count-desc/trigram-asc rank) built from the corpus's
    # own declared labels, then each doc classified by profile-overlap
    # count (argmax with lexical tiebreak) — integers end to end
    oracle="""
WITH tri AS (
  SELECT d.doc_id, d.lang, substr(d.text, i, 3) AS tg
  FROM (SELECT doc_id, lang, lower(trim(text)) AS text FROM documents) d,
    unnest(generate_series(1, length(d.text) - 2)) AS u(i)
), profile AS (
  SELECT lang, tg FROM (
    SELECT lang, tg, ROW_NUMBER() OVER (PARTITION BY lang
      ORDER BY COUNT(*) DESC, tg) AS r
    FROM tri GROUP BY lang, tg
  ) WHERE r <= 20
), doc_tg AS (
  SELECT DISTINCT doc_id, tg FROM tri
), scores AS (
  SELECT dt.doc_id, p.lang, COUNT(*) AS overlap
  FROM doc_tg dt JOIN profile p ON p.tg = dt.tg
  GROUP BY dt.doc_id, p.lang
), best AS (
  SELECT doc_id, lang AS predicted_lang, overlap,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY overlap DESC, lang) AS r
  FROM scores QUALIFY r = 1
)
SELECT b.doc_id, b.predicted_lang, b.overlap, d.lang AS declared_lang,
  b.predicted_lang = d.lang AS correct
FROM best b JOIN documents d ON d.doc_id = b.doc_id
""",
)
def text_langid_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language identification (the n-gram profile
    method proper, next to the stopword heuristic in text_langid): build
    each language's top-20 trigram profile from labeled data, classify
    every document by profile overlap.

    Scale: profiles are |langs|×20 (broadcast); the trigram explode
    shuffles once for the profile build and once for scoring; overlap
    scoring is an equi-join on the trigram. All ranking integer with
    lexical tiebreaks."""
    from youcruit_tap_rawpostgresql_spark.querybank.helpers import spread

    d = spread(tables(spark, sf_dir)["documents"])
    # trivially-true isnotnull(doc_id): the final join on doc_id infers it
    # into the SCORING branch's scan only, which de-canonicalizes the two
    # exchanges; carrying it in the shared base keeps them equal
    base = d.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", "lang", F.lower(F.trim("text")).alias("text")
    )
    tri = base.filter(F.length("text") >= 3).select(
        # length guard BEFORE sequence(): Spark's sequence(1, 0) infers a
        # DESCENDING step and emits [1, 0] — bogus "trigrams" for <3-char
        # docs where DuckDB's generate_series(1, 0) is empty (same guard
        # bpe_first_merges applies)
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))")
        ).alias("tg"),
    ).filter(
        # trivially true (substr of non-null text is never null) but
        # written into the SHARED subtree so the scoring branch's inferred
        # join-key isnotnull(tg) cannot break exchange canonicalization —
        # the dsir_importance_select trick (guide §2.4)
        F.col("tg").isNotNull()
    )
    # ONE corpus explode: per-(doc, trigram) counts are the shared
    # aggregate both branches reuse — the profile re-aggregates its output
    # (sum of per-doc counts = the direct (lang, tg) count) and the
    # distinct doc-trigram set is exactly its key set (a doc has one
    # lang). Previously profile and doc_tg each exploded the corpus.
    doc_counts = tri.groupBy("doc_id", "lang", "tg").agg(
        F.count(F.lit(1)).alias("c")
    )
    profile = (
        doc_counts.groupBy("lang", "tg")
        .agg(F.sum("c").alias("c"))
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.col("c").desc(), "tg")
            ),
        )
        .filter(F.col("r") <= 20)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    # trivially-true c >= 1 keeps the count expression ALIVE in this
    # branch — without it column pruning drops count(1) from the scoring
    # branch's partial aggregate and the two exchanges no longer
    # canonicalize equal (same guard dsir_importance_select documents)
    doc_tg = doc_counts.filter(F.col("c") >= 1).select("doc_id", "tg")
    scores = (
        doc_tg.join(F.broadcast(profile), "tg")
        .groupBy("doc_id", "p_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    best = (
        scores.withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("overlap").desc(), "p_lang")
            ),
        )
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("p_lang").alias("predicted_lang"), "overlap")
    )
    return best.join(
        F.broadcast(d.select("doc_id", F.col("lang").alias("declared_lang"))),
        "doc_id",
    ).select(
        "doc_id",
        "predicted_lang",
        "overlap",
        "declared_lang",
        (F.col("predicted_lang") == F.col("declared_lang")).alias("correct"),
    )


@register(
    "profile_doc_length_hist",
    # corpus length profile: 10-token-wide integer buckets — the
    # distribution that sets chunking/packing parameters upstream
    oracle=f"""
SELECT (CAST(len({O_TOKS}) AS BIGINT) // 10) * 10 AS bucket_lo,
  COUNT(*) AS n_docs,
  CAST(MIN(len({O_TOKS})) AS BIGINT) AS min_tokens,
  CAST(MAX(len({O_TOKS})) AS BIGINT) AS max_tokens
FROM documents GROUP BY 1
""",
)
def profile_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (10-token buckets) — the profile that
    justifies the 128-token packing capacity and 16-token chunk window
    used elsewhere. Integer bucket arithmetic, constant-size shuffle."""
    d = tables(spark, sf_dir)["documents"]
    n = F.size(tokens("text")).cast("bigint")
    return d.select(n.alias("n_tokens")).groupBy(
        ((F.col("n_tokens") / 10).cast("bigint") * 10).alias("bucket_lo")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@register(
    "text_halves_overlap",
    # array set operations surface (union/intersect/except as scalars):
    # the two halves of each document compared as token SETS — sorted-CSV
    # canonical output so engine-internal set order never leaks
    oracle=f"""
WITH h AS (
  SELECT doc_id,
    list_distinct(list_slice(t, 1, len(t) // 2)) AS a,
    list_distinct(list_slice(t, len(t) // 2 + 1, len(t))) AS b
  FROM (SELECT doc_id, {O_TOKS} AS t FROM documents)
)
SELECT doc_id,
  CAST(len(list_intersect(a, b)) AS INT) AS n_shared,
  CAST(len(list_distinct(list_concat(a, b))) AS INT) AS n_union,
  -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
  -- array_join([]) is '' — bites only when a ⊆ b (first such docs
  -- appear at sf0.1; found by the round-4 full sf0.1 sweep)
  COALESCE(
    array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','),
    '') AS only_first_half
FROM h WHERE len(a) > 0 AND len(b) > 0
""",
)
def text_halves_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation surface (SURVEY §2.8: array_intersect /
    array_union / array_except) applied as a self-similarity probe: token
    sets of each document's two halves — high overlap flags internally
    repetitive documents.

    Scale: per-row array expressions, map-only."""
    d = tables(spark, sf_dir)["documents"]
    t = tokens("text")
    half = (F.size(t) / 2).cast("int")
    a = F.array_distinct(F.slice(t, 1, half))
    # Column-argument slice keeps BOTH halves on the shared tokens()
    # definition (the previous inline SQL re-expanded the tokenizer and
    # would silently diverge if tokens() ever changed)
    b = F.array_distinct(F.slice(t, half + F.lit(1), F.size(t)))
    return (
        d.select(
            "doc_id",
            a.alias("a"),
            b.alias("b"),
        )
        .filter((F.size("a") > 0) & (F.size("b") > 0))
        .select(
            "doc_id",
            F.size(F.array_intersect("a", "b")).alias("n_shared"),
            F.size(F.array_union("a", "b")).alias("n_union"),
            F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias(
                "only_first_half"
            ),
        )
    )


@register(
    "text_quality_logit",
    oracle="""
WITH f AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tok,
    CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
      / len(string_split(text, ' ')) AS frac_stop,
    CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      / len(string_split(text, ' ')) AS mean_len
  FROM documents
), z AS (
  SELECT doc_id, n_tok,
    ((-1.0 + 10.0 * frac_stop) + 0.2 * (mean_len - 4.5)) + 0.01 * n_tok AS zv
  FROM f
)
SELECT doc_id, n_tok,
  ROUND(1.0 / (1.0 + exp(-zv)), 6) AS score,
  zv > 0.0 AS keep
FROM z
""",
)
def text_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring as a columnar expression: a fixed-weight
    logistic scorer over cheap text features (stopword fraction, mean token
    length, token count) — the stand-in for the fastText/logreg quality
    classifiers LLM pipelines apply corpus-wide (weights come from offline
    training; INFERENCE is just arithmetic). The keep decision tests the
    exact linear score (z > 0 — bit-identical across engines since both
    evaluate the same IEEE op sequence); the sigmoid is display-rounded
    to 6dp (exp differs in the last ulp across libm implementations).

    Scale: map-only, whole-stage codegen, no Python — classifier scoring
    at 100 TB is a scan, not a model-serving problem."""
    docs = tables(spark, sf_dir)["documents"]
    toks = F.split("text", " ")
    f = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        (
            F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "to")))
            .cast("double")
            / F.size(toks)
        ).alias("frac_stop"),
        (
            (F.length("text") - F.size(toks) + 1).cast("double") / F.size(toks)
        ).alias("mean_len"),
    )
    z = f.select(
        "doc_id",
        "n_tok",
        (
            (F.lit(-1.0) + 10.0 * F.col("frac_stop"))
            + 0.2 * (F.col("mean_len") - 4.5)
        ).alias("zp"),
    ).select(
        "doc_id", "n_tok", (F.col("zp") + 0.01 * F.col("n_tok")).alias("zv")
    )
    return z.select(
        "doc_id",
        "n_tok",
        F.round(1.0 / (1.0 + F.exp(-F.col("zv"))), 6).alias("score"),
        (F.col("zv") > 0.0).alias("keep"),
    )


@register(
    "text_kwic_concordance",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), hits AS (
  SELECT doc_id, unnest(generate_series(1, len(ts))) AS pos, ts FROM toks
)
SELECT doc_id, CAST(pos AS INT) AS pos,
  COALESCE(array_to_string(ts[GREATEST(1, pos - 2):(pos - 1)], ' '), '') AS left_ctx,
  COALESCE(array_to_string(ts[(pos + 1):LEAST(len(ts), pos + 2)], ' '), '') AS right_ctx
FROM hits WHERE ts[pos] = 'spark'
""",
)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance for the term 'spark': every
    occurrence with two tokens of left/right context — the corpus-
    inspection view behind data-quality spot checks and term-usage
    audits (and the retrieval unit for fine-grained citation).

    Scale: positions come from sequence+explode (no window), context from
    array slices — map-only besides the explode; a term-filtered postings
    layout (text_phrase_search) serves the same query without scanning
    non-matching docs."""
    docs = tables(spark, sf_dir)["documents"]
    hits = docs.select(
        "doc_id",
        F.split("text", " ").alias("ts"),
    ).select(
        "doc_id",
        "ts",
        F.explode(F.sequence(F.lit(1), F.size("ts"))).alias("pos"),
    ).filter(F.element_at("ts", F.col("pos")) == "spark")
    left = F.array_join(
        F.slice(
            F.col("ts"),
            F.greatest(F.lit(1), F.col("pos") - 2),
            F.col("pos") - F.greatest(F.lit(1), F.col("pos") - 2),
        ),
        " ",
    )
    right = F.array_join(
        F.slice(
            F.col("ts"),
            F.col("pos") + 1,
            F.least(F.size("ts"), F.col("pos") + 2) - F.col("pos"),
        ),
        " ",
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        left.alias("left_ctx"),
        right.alias("right_ctx"),
    )


@register(
    "text_token_entropy",
    # fold parity: per-doc terms sum in TOKEN order on both engines
    # (array_sort + F.aggregate vs list(… ORDER BY token) + list_reduce);
    # the trailing `+ 0.0` normalizes the single-token doc's -0.0 so both
    # engines hash the same zero
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({O_TOKS}) AS token FROM documents
), tc AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
), per AS (
  SELECT doc_id,
    list(c ORDER BY token) AS cs,
    CAST(SUM(c) AS DOUBLE) AS n
  FROM tc GROUP BY doc_id
)
SELECT doc_id,
  CAST(len(cs) AS BIGINT) AS n_distinct,
  ROUND(-list_reduce(
     list_transform(cs, c -> (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)),
     (x, y) -> x + y) + 0.0, 6) AS token_entropy
FROM per
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document token-distribution Shannon entropy (bits): the
    repetitiveness quality signal — boilerplate/looping text concentrates
    mass on few tokens (low H), natural prose spreads it (high H ≈
    log2(n_distinct)). Complements ``text_unigram_logprob`` (which scores
    against the CORPUS model, not the doc's own distribution) and
    ``text_repetition``.

    Scale: one (doc, token) count aggregate — partial map-side combine —
    then a per-doc array fold; no joins, no broadcast, nothing
    corpus-global."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("token", "c"))).alias("arr"),
        F.sum("c").cast("double").alias("n"),
    )
    term = F.transform(
        "arr",
        lambda x: (x["c"].cast("double") / F.col("n"))
        * F.log2(x["c"].cast("double") / F.col("n")),
    )
    folded = F.aggregate(term, F.lit(0.0), lambda acc, x: acc + x)
    return per.select(
        "doc_id",
        F.size("arr").cast("bigint").alias("n_distinct"),
        F.round(-folded + F.lit(0.0), 6).alias("token_entropy"),
    )
