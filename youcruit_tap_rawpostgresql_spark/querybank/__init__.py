"""Query bank: every operator from SURVEY.md §2 as a named (PySpark fn,
DuckDB-oracle SQL) pair. The driver's correctness gate runs both sides at
sf0.01 and hash-compares; bench runs the headline subset at sf0.1.
"""

from youcruit_tap_rawpostgresql_spark.querybank.registry import (  # noqa: F401
    REGISTRY,
    QueryCase,
    register,
    tables,
)

# importing the banks populates REGISTRY
from youcruit_tap_rawpostgresql_spark.querybank import core  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import windows  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import scalars  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import taplevel  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import llm  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import extras  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import tpch_more  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import tpch_rest  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import ann  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import pipeline_ops  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import scale  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import sql_surface  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import etl  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import text_stats  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import graph  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import modern  # noqa: F401,E402
from youcruit_tap_rawpostgresql_spark.querybank import corpus  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Registration-order prefix: the round driver's correctness gate checks the
# FIRST 50 registry entries. Round-4 judge directive: ROTATE the window so
# driver-grade evidence accumulates across the whole 294-case bank — keep
# ~10 flagship pins every round, fill the other 40 slots with cases never
# driver-checked in any prior round. ROTATION.md tracks which cases were in
# which round's window. Names here must exist; a typo fails loudly at
# import time rather than silently shrinking the checked window.
_PINS = [
    # every-round flagships: one per major family
    "q1_pricing_summary", "q21_sole_late_supplier",
    "tap_batch_export_roundtrip", "tap_jdbc_live_roundtrip",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_ann_ivf_pq",
    "text_tfidf_topk", "kmeans_embed_lloyd", "stream_stateful_sessionize",
]
_ROTATION_R08 = [
    # 40 slots (see ROTATION.md; 37 first-timers verified against the
    # CORRECTNESS_r02-r07 union of 199 + 3 round-8-born/churned cases —
    # new code needs driver rows most, the r06/r07 precedent). Round-7
    # judge directives 3+8: the pre-planned r08 window, with all five
    # bench headliners still lacking driver rows included
    # (dedup_paragraph_exact, sketch_hll_mergeable, text_unigram_logprob,
    # variant_json_extract, cohort_retention).
    # round-8-born / round-8-rewritten first: the verbatim pg_trgm
    # similarity() SQL-UDF case; the quarantine's memory->parquet sink
    # rewrite; the recall eval's fixed-query-sample cap (both r07 rows
    # predate this round's rewrites)
    "pg_dialect_trgm_similarity", "stream_minhash_quarantine",
    "int8_recall_eval",
    # the six dropped from the r07 plan + text_doc_frequency go first
    "dedup_paragraph_exact", "sample_stratified", "scalar_map_lambda",
    "text_chunk_windows", "graph_bfs_hops", "sketch_hll_mergeable",
    "text_doc_frequency",
    # dedup family spread
    "dedup_minhash_signatures", "dedup_incremental_ingest",
    "dedup_exact_stats", "dedup_canonical_map", "url_normalize_dedupe",
    # multimodal
    "multimodal_resize", "multimodal_audio_energy",
    "multimodal_byte_histogram", "multimodal_frame_embed_cluster",
    # sampling / splits
    "sample_quality_top_half", "sample_cap_per_source",
    "sample_mixture_epochs", "split_leakage_audit",
    "sample_split_by_component",
    # embeddings
    "embed_pq_codes", "embed_matryoshka_eval", "embed_power_iteration",
    "embed_random_projection",
    # text analysis
    "text_unigram_logprob", "text_repetition", "text_inverted_index",
    "bpe_first_merges", "text_quality_logit",
    # modern-SQL / ETL / graph / skew spread (feature_hashing,
    # ts_ohlc_daily, profile_numeric_columns rolled to r09 to make room
    # for the three round-8 cases above)
    "variant_json_extract", "cohort_retention", "pii_mask_hash",
    "pii_scan_luhn", "agg_salted_skew",
    "join_salted_skew", "graph_label_propagation",
]
_PREFIX = _PINS + _ROTATION_R08
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R08
