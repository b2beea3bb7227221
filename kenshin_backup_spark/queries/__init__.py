"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name -> DuckDB SQL]``. The driver runs both sides at
sf0.01 and compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in both engines;
- output columns are restricted to STRING / BIGINT / DOUBLE;
- float aggregations use the quantized-exact helpers in
  :mod:`kenshin_backup_spark.functions.deterministic` on BOTH sides;
- queries with no ORACLE entry are approximate/streaming ops the driver
  checks rows-only (``__spark_entry__.py`` contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kenshin_backup_spark.cache import clear_tracked
from kenshin_backup_spark.queries import (
    advanced,
    batch4,
    batch5,
    batch6,
    batch7,
    batch8,
    batch9,
    batch10,
    batch11,
    batch12,
    batch13,
    batch14,
    batch15,
    batch16,
    batch17,
    batch18,
    batch19,
    batch20,
    batch21,
    batch22,
    batch23,
    batch24,
    batch25,
    batch26,
    batch27,
    batch28,
    batch29,
    batch30,
    batch31,
    batch32,
    batch33,
    batch34,
    batch35,
    batch36,
    batch37,
    batch38,
    batch39,
    batch40,
    batch41,
    batch42,
    batch43,
    batch44,
    batch45,
    batch46,
    batch47,
    batch48,
    batch49,
    batch50,
    batch51,
    batch52,
    batch53,
    batch54,
    batch55,
    batch56,
    batch57,
    batch58,
    batch59,
    batch60,
    batch61,
    batch62,
    batch63,
    batch64,
    batch65,
    batch66,
    batch67,
    batch68,
    batch69,
    batch70,
    batch71,
    batch72,
    batch73,
    batch74,
    batch75,
    batch76,
    batch77,
    batch78,
    batch79,
    batch80,
    batch81,
    batch82,
    batch83,
    batch84,
    llm,
    relational,
    relational2,
    streaming_q,
    tsdb,
)

_MODULES = (
    tsdb,
    relational,
    llm,
    streaming_q,
    advanced,
    relational2,
    batch4,
    batch5,
    batch6,
    batch7,
    batch8,
    batch9,
    batch10,
    batch11,
    batch12,
    batch13,
    batch14,
    batch15,
    batch16,
    batch17,
    batch18,
    batch19,
    batch20,
    batch21,
    batch22,
    batch23,
    batch24,
    batch25,
    batch26,
    batch27,
    batch28,
    batch29,
    batch30,
    batch31,
    batch32,
    batch33,
    batch34,
    batch35,
    batch36,
    batch37,
    batch38,
    batch39,
    batch40,
    batch41,
    batch42,
    batch43,
    batch44,
    batch45,
    batch46,
    batch47,
    batch48,
    batch49,
    batch50,
    batch51,
    batch52,
    batch53,
    batch54,
    batch55,
    batch56,
    batch57,
    batch58,
    batch59,
    batch60,
    batch61,
    batch62,
    batch63,
    batch64,
    batch65,
    batch66,
    batch67,
    batch68,
    batch69,
    batch70,
    batch71,
    batch72,
    batch73,
    batch74,
    batch75,
    batch76,
    batch77,
    batch78,
    batch79,
    batch80,
    batch81,
    batch82,
    batch83,
    batch84,
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-13 re-curation
#: (COVERAGE.md's standing rule — the burn-down stays closed, windows
#: hold in priority order):
#: 1. changed-code cert — round 13 widened-kernel certification:
#:    graphite_groupbynode_median (batch84, VERDICT r12 #4) drives the
#:    r12 groupByNode aggFunc widening (_combine_grouped median) through
#:    Engine.render. The OTHER r13 changes need no re-cert: the two
#:    aliasQuery fuzz fixes (VERDICT r12 #1) are a tokenizer extension
#:    (identical tokens for every certified target — none contains ';')
#:    and empty-set early returns in aliasQuery/applyByNode (the
#:    certified non-empty plans are byte-identical) — pytest-pinned in
#:    tests/test_render.py::test_aliasquery_tagged_requery_and_empty_set.
#: 2. the SEVEN remaining r6 rows (the r12 queue — alphabetical; the
#:    r12 _PRIORITY comment said six, omitting tsdb_gap_ratio);
#: 3. the next-oldest evidence: the first 42 rows of the 50-row r7
#:    cohort (alphabetical, latest-green == r7 computed from the
#:    CORRECTNESS_r01–r12 union). The last eight r7 rows
#:    (tsdb_downsample_minmax_pairs, tsdb_forecast_backtest,
#:    tsdb_histogram_shard_merge, tsdb_namespace_levels,
#:    tsdb_vshape_patterns, unpivot_lineitem_measures,
#:    window_frame_distinct_users, window_percent_rank_acctbal)
#:    carry to the r14 queue, then the r8 cohort.
#: The 9 rows-only-by-design queries (approx_distinct_parts,
#: approx_event_percentiles, emb_intrinsic_dimension,
#: emb_kmeans_clusters, emb_mmr_rerank*, events_rolling_wau_hll,
#: graph_pagerank_docs, tsdb_downsample_lttb,
#: tsdb_holt_linear_forecast*) never hold window slots (*certified via
#: their exact twins/upgrades in r8 — no re-cert due). Every row that
#: rotates out keeps exact-cell parity coverage in
#: tests/test_oracle_parity.py.
_PRIORITY = (
    # --- 1. round-13 changed-code cert: the r12 groupByNode aggFunc
    # widening, certified end-to-end (batch84; VERDICT r12 #4) ------------
    "graphite_groupbynode_median",
    # --- 2. the seven remaining r6 rows (the r12 queue) -------------------
    "tsdb_gap_ratio",
    "tsdb_heatmap_buckets",
    "tsdb_moving_median",
    "tsdb_multires_rollup",
    "tsdb_rollup_salted_1h",
    "tsdb_seasonal_profile",
    "tsdb_tukey_outliers",
    # --- 3. next-oldest evidence: the r7 cohort (first 42 of 50) ----------
    "agg_skewness_kurtosis",
    "array_hof_embeddings",
    "array_set_ops_shingles",
    "asof_click_next_purchase",
    "dedup_embedding_cosine",
    "dedup_graph_degree_stats",
    "dedup_substring_spans",
    "dq_constraint_report",
    "emb_drift_by_label",
    "emb_truncation_recall",
    "events_audience_overlap",
    "events_user_gini_diversity",
    "gdpr_erasure_audit",
    "graph_triangle_stats",
    "json_roundtrip_events",
    "lineitem_discount_effectiveness",
    "lineitem_shipping_delays",
    "lineitem_weighted_median",
    "llm_cluster_representative",
    "llm_jaccard_threshold_sweep",
    "llm_mix_rebalance_plan",
    "map_props_entries",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "orders_backlog_over_time",
    "orders_cohort_ltv",
    "orders_duplicate_payments",
    "orders_market_basket",
    "orders_yoy_growth",
    "part_brand_share_shift",
    "privacy_k_anonymity_report",
    "source_csv_malformed_handling",
    "source_schema_evolution",
    "sql_api_revenue_by_nation",
    "streaming_counter_resets",
    "supplier_concentration_hhi",
    "text_bigram_novelty",
    "text_code_detection",
    "text_vocab_growth",
    "tsdb_alert_rule_eval",
    "tsdb_changepoint_cusum",
    "tsdb_counter_gauge_classify",
)


def _ordered(full: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in full]
    if missing:
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    out = {n: full[n] for n in _PRIORITY}
    out.update((n, v) for n, v in full.items() if n not in out)
    return out


def _with_cache_clear(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    # Clear the PREVIOUS query's tracked operator caches when the next one
    # is built, so a long harness session over the full registry never
    # accumulates cross-query cached frames (cleared frames recompute —
    # never a correctness concern).
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        clear_tracked()
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return _ordered({n: _with_cache_clear(fn) for n, fn in out.items()})


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return {
        n: out[n] for n in queries() if n in out
    }
