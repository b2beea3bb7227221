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
    batch85,
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
    batch85,
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-14 re-curation
#: (COVERAGE.md's standing rule — the burn-down stays closed, windows
#: hold in priority order):
#: 1. changed-code certs — the two batch85 adds (both VERDICT/ADVICE
#:    traceable): graphite_negnode_summarize_units (VERDICT r13 #1 —
#:    the r13 parity-wave composite: negative name nodes + the
#:    'mon'/'hours' prefix-unit table + falsy maxDataPoints, one hash)
#:    and graphite_reduce_apply_negnode (ADVICE r13 mediums #1+#2 —
#:    applyByNode(-1)'s empty prefix and reduceSeries' negative
#:    reduceNode group key, both FIXED this round and certified
#:    through Engine.render). The other r14 changes need no re-cert:
#:    the ANSI conf pin (session.RUNTIME_CONFS) is a no-op on the 4.x
#:    engine every cert runs on, and positive-node applyByNode/
#:    reduceSeries expressions are byte-identical by construction
#:    (branch-on-sign only adds the negative arm).
#: 2. the remaining EIGHT r7 rows (queued by the r13 comment, verified
#:    against the CORRECTNESS_r01–r13 union);
#: 3. the full r8 cohort (39 rows, alphabetical, latest-green == r8);
#: 4. one r9 row (agg_grouping_sets, alphabetically first) to fill the
#:    window to 50. The rest of the r9 cohort (38 rows) heads the r15
#:    queue.
#: The 9 rows-only-by-design queries (approx_distinct_parts,
#: approx_event_percentiles, emb_intrinsic_dimension,
#: emb_kmeans_clusters, emb_mmr_rerank*, events_rolling_wau_hll,
#: graph_pagerank_docs, tsdb_downsample_lttb,
#: tsdb_holt_linear_forecast*) never hold window slots (*certified via
#: their exact twins/upgrades in r8 — no re-cert due). Every row that
#: rotates out keeps exact-cell parity coverage in
#: tests/test_oracle_parity.py.
_PRIORITY = (
    # --- 1. round-15 changed-code cert (batch85 gained the fixture-span
    # assert — ADVICE r14 low #4; session.tune() readback rides every row) --
    "graphite_negnode_summarize_units",
    # --- 2. the 38 remaining r9 rows (the r15 queue in COVERAGE.md,
    # verified == the oldest-evidence cohort from the CORRECTNESS union) ---
    "agg_median_quantity",
    "asof_purchase_last_click",
    "dedup_simhash_md5",
    "emb_cosine_topk",
    "events_rolling_wau",
    "events_transition_matrix",
    "funnel_signup_click_purchase",
    "join_semi_discounted_orders",
    "llm_corpus_curation",
    "range_join_value_bands",
    "scalar_array_ops",
    "scalar_datetime_orders",
    "scalar_json_event_props",
    "scalar_math_funcs",
    "scd2_user_state",
    "setops_customer_cohorts",
    "source_bucketed_join",
    "source_csv_roundtrip",
    "source_partitioned_pruning",
    "streaming_session_windows",
    "text_char_ngram_langid",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_multi_exists",
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier",
    "tpch_q9_profit_by_nation_year",
    "tsdb_anomaly_mad",
    "tsdb_glob_fetch",
    "tsdb_interpolate_linear",
    "tsdb_ladder_coarse_fetch",
    "tsdb_ladder_roundtrip",
    "tsdb_policy_assign",
    "tsdb_time_weighted_avg",
    "window_first_last_nth",
    "window_range_7day_sum",
    "window_running_revenue",
    # --- 3. window fill: the 11-row head of the 48-row r10 cohort
    # (alphabetical; remainder + r11 cohorts queue for r16) -----------
    "customer_rfm_scores",
    "dedup_connected_components",
    "dedup_embedding_cosine_bucketed",
    "dedup_exact_fingerprint",
    "dedup_minhash_portable",
    "dedup_ngram_jaccard_capped",
    "emb_ann_topk_srp",
    "events_bot_detection",
    "events_seasonal_residual_anomalies",
    "graphite_render_alias_consolidate",
    "graphite_render_bandmath",
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
