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
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-12 re-curation
#: (COVERAGE.md's standing rule — the burn-down stays closed, windows
#: hold in priority order):
#: 1. changed-code cert — round 12 rewired group()/unique() to carry
#:    graphite's CONCATENATION order through the union
#:    (seriesfns._concat_order, ADVICE r11); the changed-code evidence
#:    IS the new batch83 cert (no prior cert's plan evaluates group/
#:    unique — verified by grep over queries/). The OTHER r12 changes
#:    need no re-cert: the averageOutsidePercentile empty-band fix and
#:    the removeBetweenPercentile guard touch functions in NO registry
#:    query (pytest-pinned, VERDICT r11 #1), and render_pie's new
#:    include_empty flag defaults to the certified behavior (the
#:    certified plan is unchanged).
#: 2. the nine r5 rows the r11 window could not seat (its queue);
#: 3. the next-oldest evidence: the first 39 rows of the 46-row r6
#:    cohort (alphabetical, latest-green == r6 computed from the
#:    CORRECTNESS_r01–r11 union). The last six r6 rows
#:    (tsdb_heatmap_buckets, tsdb_moving_median, tsdb_multires_rollup,
#:    tsdb_rollup_salted_1h, tsdb_seasonal_profile, tsdb_tukey_outliers)
#:    carry to the r13 queue, then the r7 cohort.
#: The 9 rows-only-by-design queries (approx_distinct_parts,
#: approx_event_percentiles, emb_intrinsic_dimension,
#: emb_kmeans_clusters, emb_mmr_rerank*, events_rolling_wau_hll,
#: graph_pagerank_docs, tsdb_downsample_lttb,
#: tsdb_holt_linear_forecast*) never hold window slots (*certified via
#: their exact twins/upgrades in r8 — no re-cert due). Every row that
#: rotates out keeps exact-cell parity coverage in
#: tests/test_oracle_parity.py.
_PRIORITY = (
    # --- 1. round-12 changed-code certs: the group()/unique()
    # concatenation order (batch83; ADVICE r11), and the r12-fuzz fix
    # wave's one certified plan change — series_stdev's Σq² moment now
    # try_sums (graphite_deviant_rank re-cert; the groupByNode kernel
    # widening keeps the certified 'sum' path byte-identical) ----------------
    "graphite_render_group_order",
    "graphite_deviant_rank",
    # --- 2. the nine r5 rows the r11 window could not seat --------------------
    "tsdb_integral_persecond",
    "tsdb_period_over_period",
    "tsdb_rate_irate",
    "tsdb_rollup_cascade_1d",
    "tsdb_sort_by_maxima",
    "tsdb_wide_series_grid",
    "tsdb_xff_guard",
    "window_cume_dist",
    "window_range_price_band",
    # --- 3. next-oldest evidence: the r6 cohort (first 39 of 46) --------------
    "cohort_retention_weekly",
    "dedup_cross_source_report",
    "dedup_lsh_precision_report",
    "dedup_method_agreement",
    "dedup_ngram_containment",
    "dedup_sentence_exact",
    "emb_centroid_by_label",
    "emb_int8_quantize_stats",
    "emb_norm_outliers",
    "events_ab_assignment_balance",
    "events_attribution_linear",
    "events_dau_mau_stickiness",
    "events_inter_arrival",
    "events_top_paths",
    "graphite_minmax_band",
    "graphite_moving_minmax",
    "graphite_npercentile_clip",
    "graphite_transform_chain",
    "hybrid_search_rrf",
    "layout_compaction_plan",
    "layout_partition_skew_report",
    "layout_zorder_key",
    "llm_corpus_mix_report",
    "llm_quality_weighted_sample",
    "scalar_math_family2",
    "source_json_roundtrip",
    "text_gopher_quality_gate",
    "text_langid_f1",
    "text_readability_scores",
    "text_repetition_signals",
    "text_tfidf_keywords",
    "text_word_rarity",
    "tsdb_anomaly_zscore",
    "tsdb_bollinger_bands",
    "tsdb_capacity_forecast_linreg",
    "tsdb_counter_rate_wrap",
    "tsdb_dominant_period",
    "tsdb_downsample_maxdev",
    "tsdb_gap_islands",
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
