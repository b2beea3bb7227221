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
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-8 re-curation —
#: the burn-down is DONE (every oracle-backed query has a full
#: rows+schema+hash driver row once this window certifies), so slots now
#: split three ways:
#: 1. the LAST 8 never-full-green queries (COVERAGE.md's r8 queue —
#:    the deferred low-risk relational/scalar family);
#: 2. the 5 NEW round-8 certs — batch72's render tier and batch73's
#:    LLM-corpus governance pair (regex PII scan; n-gram benchmark
#:    contamination via a broadcast posting join) — all exact-parity
#:    green at sf0.001 and sf0.01 before rotation. Of batch72:
#:    the generic render family
#:    (highest/aggregate-median), the map/reduce-over-nodes tier
#:    (reduceSeries/applyByNode) and the generator functions
#:    (time() + sumSeriesLists) — all exact-parity green at sf0.001 and
#:    sf0.01 before rotation;
#: 3. re-certs: 7 for code this round CHANGED (ladder delete/fetch gained
#:    the layout-manifest guard → the two ladder maintenance certs;
#:    Engine.render now threads the request window → the five
#:    graphite_render_* certs), then the oracle-backed rows with the
#:    OLDEST driver evidence (the r1/r2 greens) re-verified under the
#:    current engine — three of those slots later yielded to the
#:    round-8-late certs (batch73's governance pair, batch74's seeded
#:    IVF); the displaced rows keep exact-cell parity coverage in
#:    tests/test_oracle_parity.py.
#: The 7 rows-only-by-design queries (approx_distinct_parts,
#: approx_event_percentiles, emb_intrinsic_dimension, emb_kmeans_clusters,
#: events_rolling_wau_hll, graph_pagerank_docs, tsdb_downsample_lttb)
#: still never hold window slots. emb_mmr_rerank and
#: tsdb_holt_linear_forecast left this list in round 8 — their
#: sequential traces gained bit-exact recursive-CTE oracles
#: (batch41._MMR_SQL, batch16._HOLT_SQL); the float PageRank and LTTB
#: gained oracle-checked twins (batch76, batch75) while remaining
#: rows-only themselves. Every row that rotates out keeps exact-cell
#: parity coverage in tests/test_oracle_parity.py.
_PRIORITY = (
    # --- the last 8 never-full-green (burn-down completion) ------------------
    "agg_grouping_flags",
    "scalar_bitwise_shift",
    "scalar_date_family2",
    "scalar_split_part_family",
    "scalar_string_family3",
    "window_suffix_revenue",
    "join_cross_grid",
    "join_null_safe_status",
    # --- new round-8 certs: wave-4 render tier (batch72) ---------------------
    "graphite_render_generic",
    "graphite_render_mapreduce",
    "graphite_render_timegen",
    # --- re-certs: code changed this round ------------------------------------
    "tsdb_ladder_roundtrip",
    "tsdb_ladder_coarse_fetch",
    "graphite_render_pipeline",
    "graphite_render_ratio",
    "graphite_render_seriesbytag",
    "graphite_render_bandmath",
    "graphite_render_rollstats",
    # --- re-certs: oldest driver evidence (r1) --------------------------------
    "agg_cube_priority_status",
    "agg_distinct_counts",
    "agg_rollup_flag_status",
    "pivot_status_by_priority",
    "text_fingerprints",
    "text_langid_heuristic",
    "tpch_q4_order_priority",
    "tsdb_moving_avg",
    "window_lag_lead_orders",
    "window_ntile_quartiles",
    # --- re-certs: oldest driver evidence (r2) --------------------------------
    "dedup_ngram_jaccard",
    "emb_knn_label_vote",
    "graphite_exclude_average",
    "graphite_groupbynode_sum",
    "join_anti_customers_no_orders",
    "join_outer_customer_orders",
    "scalar_string_part_names",
    "text_stats_by_lang",
    "tpch_q10_returned_items",
    "tpch_q17_small_quantity",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tsdb_derivative",
    "tsdb_fetch_keep_last",
    # --- new round-8 cert: graphite maxDataPoints consolidation (batch77;
    # exact-parity green at sf0.001 AND sf0.01 before rotation; displaced
    # the tsdb_glob_fetch r2 re-cert, which keeps exact-cell parity
    # coverage in tests/test_oracle_parity.py and glob coverage via every
    # graphite_render_* cert's brace-glob fetches) ---------------------------
    "graphite_render_maxdatapoints",
    # --- new round-8 certs: LLM-corpus governance (batch73) -------------------
    "text_pii_scan",
    "llm_contamination_report",
    # --- new round-8 certs: oracle-checkable IVF ANN (batch74), exact LTTB
    # (batch75), and the in-place MMR oracle upgrade (batch41._MMR_SQL —
    # certifying now keeps the burn-down closed) — all exact-parity green
    # at sf0.001 AND sf0.01 before rotation; displaced the
    # scalar_math_funcs / scalar_array_ops / scalar_datetime_orders r2
    # re-certs, which keep exact-cell parity coverage in
    # tests/test_oracle_parity.py --------------------------------------------
    "emb_ann_ivf_seeded",
    "tsdb_downsample_lttb_exact",
    "emb_mmr_rerank",
    # --- new round-8 cert: quantized integer PageRank (batch76; exact-parity
    # green at sf0.001 AND sf0.01; displaced the window_running_revenue r2
    # re-cert, which keeps parity + scalepat plan-gate coverage) --------------
    "graph_pagerank_quantized",
    # --- round-8 in-place upgrade: Holt linear forecast gained a recursive
    # oracle (batch16._HOLT_SQL) — certifying now keeps the burn-down
    # closed; displaced the source_csv_roundtrip r2 re-cert ------------------
    "tsdb_holt_linear_forecast",
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
