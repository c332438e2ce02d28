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
    # r11: the full flagship pin set returns after r10's one-round trim
    # (ROTATION.md) — raw-SQL scan, live JDBC, the sink round-trip, and
    # the LLM-pipeline flagships
    "q1_pricing_summary", "q21_sole_late_supplier",
    "tap_batch_export_roundtrip", "tap_jdbc_live_roundtrip",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_ann_ivf_pq",
    "text_tfidf_topk", "kmeans_embed_lloyd", "stream_stateful_sessionize",
]
_ROTATION_R11 = [
    # the two r10 `err` rows FIRST (round-10 judge directive 1): their
    # array outputs now ship as to_json text — these driver rows going
    # green closes the bank at 325/325 driver-grade
    "pg_dialect_agg_order_semantics", "pg_dialect_quoting_encode",
    # round-11-born (new code needs driver rows most): the jsonb
    # mutator family (directive 5) and the GROUPS-frame rewrite
    # (directive 6)
    "pg_dialect_jsonb_mutators", "win_groups_frame",
    # the rest of the window refreshes the OLDEST driver evidence
    # (round-10 judge directive 3): 36 of the 49 cases whose only
    # driver row is r02 — six-plus rounds stale — prioritizing the
    # dialect-routed and window/aggregate kernels that churned since
    # (array_agg/string_agg rewrites, ORDER-BY null placement, the
    # round-9/10 window-frame passes). The 13 deferred-to-r12 cases
    # are untouched Spark-native join/set-op/sort kernels (see
    # ROTATION.md).
    "agg_approx_distinct", "agg_array_agg_distinct", "agg_bool_and_or",
    "agg_cube", "agg_distinct", "agg_filter_clause", "agg_grouping_sets",
    "agg_having", "agg_rollup", "agg_share_of_parent", "agg_stats",
    "agg_string_agg", "agg_weighted_avg", "join_null_safe",
    "join_range_quantity", "join_theta_pairs", "proj_literals_pg_dialect",
    "q3_top_orders", "q5_nation_revenue", "set_except_all",
    "set_intersect_all", "sort_keyset_page", "sort_limit_offset",
    "subquery_notin_vs_notexists", "tablefunc_regexp_matches",
    "topk_per_group", "win_agg_over_whole_partition",
    "win_centered_time_frame", "win_ignore_nulls_locf", "win_lag_lead",
    "win_last_nth", "win_range_frame", "win_ranking", "win_running_agg",
    "win_sliding_rows", "win_time_range_frame",
]
_PREFIX = _PINS + _ROTATION_R11
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R11
