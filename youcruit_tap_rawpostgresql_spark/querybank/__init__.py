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
    # r12: flagship pin set unchanged (ROTATION.md) — raw-SQL scan,
    # live JDBC, the sink round-trip, and the LLM-pipeline flagships
    "q1_pricing_summary", "q21_sole_late_supplier",
    "tap_batch_export_roundtrip", "tap_jdbc_live_roundtrip",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_ann_ivf_pq",
    "text_tfidf_topk", "kmeans_embed_lloyd", "stream_stateful_sessionize",
]
_ROTATION_R12 = [
    # round-11 judge directive 1: the late-registered r11 probe-fix
    # family FIRST (pins + oracle but no driver row yet)
    "pg_dialect_probe_fixes_r11",
    # the 13 r02-cohort join/set-op/sort cases deferred from r11
    # (stable Spark-native kernels; their only driver row is r02)
    "join_inner", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_cross", "join_semi", "join_anti",
    "set_union_all", "set_union_distinct", "set_intersect",
    "set_except", "sort_limit", "filter_predicates",
    # the r03–r04 cohort (20 cases, oldest remaining driver evidence)
    "cdc_snapshot_diff", "dedup_exact", "graph_pagerank_trade",
    "join_asof_nearest", "multimodal_decode", "pack_greedy_capacity",
    "scalar_array_lambda", "scalar_datetime", "scalar_json",
    "scalar_string", "sessionize", "sim_ann_lsh_multiprobe",
    "tap_conform_schema", "tap_flatten", "tap_full_table_start",
    "tap_incremental_bookmark", "tap_stream_map", "text_quality",
    "text_token_stats", "udf_pandas_tokens",
    # tail slots: r12-born cases land here as the round produces them
    # (swapping out the r05-cohort refreshes below, newest-first);
    # until then, next-oldest evidence (r05 cohort) fills the window
    "pg_dialect_regexp_backrefs", "pg_dialect_tochar_format_r12",
    "pg_dialect_probe_fixes_r12", "pg_dialect_jsonb_operators",
    "q2_min_cost_supplier", "q4_order_priority",
]
_PREFIX = _PINS + _ROTATION_R12
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R12
