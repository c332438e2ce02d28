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
    # r13: flagship pin set unchanged (ROTATION.md) — raw-SQL scan,
    # live JDBC, the sink round-trip, and the LLM-pipeline flagships
    "q1_pricing_summary", "q21_sole_late_supplier",
    "tap_batch_export_roundtrip", "tap_jdbc_live_roundtrip",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_ann_ivf_pq",
    "text_tfidf_topk", "kmeans_embed_lloyd", "stream_stateful_sessionize",
]
_ROTATION_R13 = [
    # round-12 judge directive 2: r13-born cases FIRST (the SRF
    # direction-guard family — judge directive 1 — and the to_char
    # day/month name templates — directive 3), then the r05-cohort
    # refresh (oldest remaining driver evidence after the r12 window
    # took the r02–r04 cohorts and q2/q4)
    "pg_dialect_srf_direction_r13", "pg_dialect_tochar_names_r13",
    "pg_dialect_probe_fixes_r13",
    # late round-13 registrations (session 2): the multi-SRF zip
    # family (select-list lockstep expansion, FROM unnest(a,b), ROWS
    # FROM, reverse subscripts) and the hypothetical-set /
    # width_bucket-array / composite-null family; they swap out
    # scd2_status_history and stream_dedup_watermark tail-first per
    # the convention below (recorded in ROTATION.md)
    "pg_dialect_srf_zip_r13", "pg_dialect_hypothetical_r13",
    # the r05 cohort (37 cases; ROTATION.md r05 section minus the two
    # already refreshed in r12 and graph_triangle_count, swapped out —
    # tail-first per the convention below — for the r13 probe-fix case
    # and deferred to r14)
    "q6_forecast_revenue", "q8_market_share", "q9_product_profit",
    "q17_small_quantity", "q22_dormant_customers",
    "subquery_exists_correlated", "cte_top_supplier", "join_lateral",
    "pivot_sum", "unpivot_stack", "recursive_cte_chain",
    "distinct_on_latest", "agg_percentiles", "win_sliding_median",
    "topk_with_ties", "scalar_math", "scalar_null_semantics",
    "pg_dialect_operators", "pg_dialect_timezone", "tap_catalog",
    "tap_conform_quarantine", "tap_backfill_chunks",
    "versioned_time_travel", "dq_expectations", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_components", "text_langid",
    "text_fingerprint", "text_bm25_keyword", "sim_ann_lsh",
    "ann_recall_eval", "embed_quantize_int8",
    "contamination_ngram_overlap", "stream_windowed_agg",
    # any further r13-born case swaps out the TAIL r05 refresh above
    # (newest-first), deferring it to r14 — record the swap in
    # ROTATION.md
]
_PREFIX = _PINS + _ROTATION_R13
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R13
