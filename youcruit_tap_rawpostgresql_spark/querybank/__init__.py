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
_ROTATION_R09 = [
    # 40 slots (see ROTATION.md): 2 round-9-born cases first (new code
    # needs driver rows most — the r06/r07/r08 precedent) + 38
    # first-timers from the pre-planned r09 window, verified against the
    # CORRECTNESS_r02-r08 union of 237. Five behavioral/warehouse names
    # roll to r10 to fit (recsys_item_cooccurrence, markov_transitions,
    # dau_wau_rolling, scd2_point_in_time_join, cumulative_unique_users).
    # round-9-born: the two new dialect surfaces (round-9 judge
    # directives 1+2 — string-window clipping and numeric to_char)
    "pg_dialect_string_windows", "pg_dialect_to_char_numeric",
    # rolled from r08 (displaced once already — they go first)
    "feature_hashing", "ts_ohlc_daily", "profile_numeric_columns",
    # scalar/SQL surface
    "json_struct_agg", "scalar_xml_extract", "scalar_trgm_similarity",
    "scalar_collation_ci", "scalar_csv_roundtrip", "scalar_zorder_key",
    "sql_identifier_clause", "sql_session_variable",
    "sql_execute_immediate",
    # embeddings / serving
    "embed_centroid_per_source", "source_centroid_similarity",
    "cluster_quality_profile", "sketch_topk_approx",
    # grouped-map / UDTF
    "udtf_long_tokens", "grouped_map_topk",
    # stats / profile
    "profile_outlier_iqr", "stats_gini_coefficient", "stats_theil_index",
    "profile_winsorize", "profile_mad", "hist_width_bucket",
    "stats_chisq_cells", "ab_test_ttest", "ols_regr_slope",
    # time series
    "ts_autocorr_lag1", "ts_seasonal_anomaly", "ts_resample_gapfill",
    "ts_ewma_final", "ts_time_weighted_avg", "ts_holt_linear",
    "ts_cusum_alerts",
    # sampling
    "sample_weighted_reservoir", "sample_balanced_classes",
    "sample_negative_pairs", "sample_temperature_quota",
]
_PREFIX = _PINS + _ROTATION_R09
assert len(_PREFIX) == 50, f"driver window is 50 entries, prefix has {len(_PREFIX)}"
_missing = [n for n in _PREFIX if n not in REGISTRY]
assert not _missing, f"prefix names not in REGISTRY: {_missing}"
_rest = {k: v for k, v in REGISTRY.items() if k not in set(_PREFIX)}
_reordered = {k: REGISTRY[k] for k in _PREFIX}
_reordered.update(_rest)
REGISTRY.clear()
REGISTRY.update(_reordered)
del _PREFIX, _missing, _rest, _reordered, _PINS, _ROTATION_R09
