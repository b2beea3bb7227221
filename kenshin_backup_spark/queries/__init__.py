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
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-7 re-curation
#: executes VERDICT r6 item #2 — the FINAL ~50-slot burn-down rotation
#: (65 never-driver-checked after r6: 56 with oracles + 9 rows-only that
#: must never hold slots), with every slot spent on a HASHABLE query:
#: 1. `tsdb_changepoint_cusum` re-cert first — its r6 hash mismatch was
#:    proven value-identical (DuckDB HUGEINT widening of a windowed
#:    SUM(BIGINT)); the oracle now casts `cusum_q` to BIGINT per the
#:    registry type contract, structurally guarded by
#:    tests/test_oracle_types.py (bind-level DESCRIBE over all oracles);
#: 2. `streaming_counter_resets` — the r1 straggler checked before its
#:    oracle existed (`err: no_oracle` in CORRECTNESS_r01); it has had a
#:    full DuckDB oracle for rounds and was never re-rotated (VERDICT r6
#:    "wrong" #4);
#: 3. 48 never-checked rotations from COVERAGE.md's r7 queue:
#:    relational/scalar 5, array/map/json 4, business shapes 12, TSDB
#:    tail 7, dedup/emb/LLM tail 10 (incl. `llm_jaccard_threshold_sweep`
#:    AFTER its t10 BIGINT cast landed), text tail 3 (incl.
#:    `text_vocab_growth` AFTER its cum_* BIGINT casts landed),
#:    sources/governance 7.
#: If all pass, cumulative unique driver-green grows 204 → 254/278 and
#: the oracle-backed-never-FULL-green remainder drops to 8 (the deferred
#: low-risk relational/scalar family in COVERAGE.md's r8 queue:
#: agg_grouping_flags, scalar_bitwise_shift, scalar_date_family2,
#: scalar_split_part_family, scalar_string_family3, window_suffix_revenue,
#: join_cross_grid, join_null_safe_status — deferred because each has
#: multiple already-driver-green siblings in the same scalar/join family).
#: Every previously-green row that rotates out keeps exact-cell parity
#: coverage in tests/test_oracle_parity.py.
_PRIORITY = (
    # --- re-cert: r6's value-identical hash mismatch, oracle cast fixed ------
    "tsdb_changepoint_cusum",
    # --- the checked-before-oracle-existed straggler (VERDICT r6 #4) ---------
    "streaming_counter_resets",
    # --- never driver-checked: relational / scalar ---------------------------
    "agg_skewness_kurtosis",
    "window_frame_distinct_users",
    "window_percent_rank_acctbal",
    "unpivot_lineitem_measures",
    "sql_api_revenue_by_nation",
    # --- never driver-checked: array / map / json ----------------------------
    "array_hof_embeddings",
    "array_set_ops_shingles",
    "json_roundtrip_events",
    "map_props_entries",
    # --- never driver-checked: business shapes -------------------------------
    "lineitem_discount_effectiveness",
    "lineitem_shipping_delays",
    "lineitem_weighted_median",
    "orders_backlog_over_time",
    "orders_cohort_ltv",
    "orders_duplicate_payments",
    "orders_market_basket",
    "orders_yoy_growth",
    "part_brand_share_shift",
    "supplier_concentration_hhi",
    "events_audience_overlap",
    "events_user_gini_diversity",
    # --- never driver-checked: TSDB tail -------------------------------------
    "tsdb_alert_rule_eval",
    "tsdb_counter_gauge_classify",
    "tsdb_downsample_minmax_pairs",
    "tsdb_forecast_backtest",
    "tsdb_histogram_shard_merge",
    "tsdb_namespace_levels",
    "tsdb_vshape_patterns",
    # --- never driver-checked: dedup / embeddings / LLM tail -----------------
    "dedup_embedding_cosine",
    "dedup_graph_degree_stats",
    "dedup_substring_spans",
    "emb_drift_by_label",
    "emb_truncation_recall",
    "graph_triangle_stats",
    "llm_cluster_representative",
    "llm_jaccard_threshold_sweep",
    "llm_mix_rebalance_plan",
    "asof_click_next_purchase",
    # --- never driver-checked: text tail -------------------------------------
    "text_bigram_novelty",
    "text_code_detection",
    "text_vocab_growth",
    # --- never driver-checked: sources / governance --------------------------
    "source_csv_malformed_handling",
    "source_schema_evolution",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "dq_constraint_report",
    "gdpr_erasure_audit",
    "privacy_k_anonymity_report",
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
