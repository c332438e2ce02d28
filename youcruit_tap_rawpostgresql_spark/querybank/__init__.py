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
_ROTATION_R07 = [
    # 40 slots, all never driver-checked in r02-r06 (see ROTATION.md).
    # Round-6 judge directive 2: the six round-6-born/churned cases are
    # promoted (dsir, int8 topk, LSH threshold twin, the two incremental
    # dedup ops, DISTINCT ON), plus the round-7-born int8_recall_eval.
    # round-6-born / churned code first
    "dsir_importance_select", "sim_cosine_int8_topk",
    "sim_cosine_threshold_lsh", "dedup_bloom_incremental",
    "dedup_minhash_incremental", "pg_dialect_distinct_on",
    "int8_recall_eval",
    # deferred from the original r06 plan
    "subquery_in", "join_asof", "sql_lateral_column_alias",
    "set_union_by_name", "win_named_window", "scalar_bitwise",
    # PG dialect / ANN / joins / tap formats
    "pg_dialect_like_epoch", "pg_dialect_arrays", "sim_ann_ivf",
    "sim_ann_pq_adc", "join_range_binned", "tap_orc_export_roundtrip",
    # relational / TPC-H
    "q11_important_stock", "q13_order_distribution", "q15_top_supplier",
    "q16_supplier_variety",
    # aggregates
    "agg_group_by_all", "agg_grouping_marker", "agg_percentile_disc",
    "agg_bit_flags",
    # scalars
    "scalar_string_extras", "scalar_datetime_extras",
    # SQL surface / table functions
    "sql_values_lookup", "sql_named_params", "tablefunc_json_elements",
    "tablefunc_sequence", "tablefunc_explode_outer",
    # streaming
    "stream_session_window", "stream_sliding_window",
    "stream_ewma_stateful",
    # dedup / sampling / streaming-LSH (stream_minhash_quarantine is
    # round-7-born: churned/new code gets driver rows first)
    "dedup_semantic_cluster", "sample_hash_split",
    "stream_minhash_quarantine",
]
_PREFIX = _PINS + _ROTATION_R07
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R07
