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
    # r14: flagship pin set unchanged (ROTATION.md) — raw-SQL scan,
    # live JDBC, the sink round-trip, and the LLM-pipeline flagships
    "q1_pricing_summary", "q21_sole_late_supplier",
    "tap_batch_export_roundtrip", "tap_jdbc_live_roundtrip",
    "dedup_minhash_lsh", "sim_cosine_topk", "sim_ann_ivf_pq",
    "text_tfidf_topk", "kmeans_embed_lloyd", "stream_stateful_sessionize",
]
_ROTATION_R14 = [
    # r14 pre-plan (ROTATION.md) with the new-code-first precedent:
    # (a) the 11 cases whose kernels CHURNED in this optimization round
    # (grouped_map_topk's batch rewrite; the fused ANN index family —
    # sim_ann_ivf_pq is covered by its pin) go first so the driver
    # re-grades the new code,
    "grouped_map_topk", "sim_ann_lsh", "sim_cosine_threshold_lsh",
    "sim_ann_lsh_multiprobe", "ann_recall_eval", "sim_ann_ivf",
    "dedup_semantic_cluster", "cluster_quality_profile",
    "sim_ann_ivf_pruned_store", "embed_pq_codes", "sim_ann_pq_adc",
    # (b) the three r13 swap-outs (last driver rows are r05-era),
    "graph_triangle_count", "scd2_status_history",
    "stream_dedup_watermark",
    # (c) the r06-cohort refresh in the r06 section's order, trimmed to
    # fit 40 (the tail — dedup_keep_best onward — rolls to r15; note
    # sim_ann_ivf_pruned_store already sits in group (a))
    "q7_nation_volume", "q10_returned_items", "q12_shipmode_buckets",
    "q14_promo_ratio", "q18_large_orders", "q19_disjunctive_predicates",
    "q20_qualified_suppliers", "subquery_scalar", "sql_pivot_clause",
    "sql_unpivot_clause", "agg_mode_per_group", "agg_listagg_ordered",
    "scalar_conditional", "scalar_array", "pg_dialect_strings",
    "knn_label_vote", "er_blocked_fuzzy_join", "sim_cosine_threshold",
    "text_langid_ngram_profile", "text_boilerplate_fraction",
    "text_ngram_topk", "tap_table_checksum", "tap_integrity_audit",
    "tap_batch_reingest_source", "tap_schema_evolution_read",
    "tap_corrupt_record_ingest",
]
_PREFIX = _PINS + _ROTATION_R14
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R14
