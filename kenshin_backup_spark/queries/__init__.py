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
)

#: The driver's per-round CORRECTNESS window covers the FIRST 50 registry
#: entries, so this ordering is evidence policy. Round-11 re-curation
#: (COVERAGE.md's standing rule — the burn-down stays closed, windows
#: hold in priority order):
#: 1. re-certs of changed code — round 11 changed (a) the ADVICE-r10
#:    branches (asPercent kwarg-nodes dispatch, timeStack sign
#:    normalization, as_percent_nodes total-only keys), whose
#:    changed-code evidence IS the new batch80 certs below (no prior
#:    cert's plan touched those branches), and (b) the two batch53
#:    char-array builds (split('') replaces the O(n²) per-position
#:    substring in the winnowing gram hash AND the BPE adjacent-pair
#:    build; output row-identical), re-certified by seating
#:    ``dedup_winnowing_pairs`` and ``text_bpe_pair_merges`` first.
#: 2. the NEW round-11 certs (batch80/81/82): the asPercent grouping
#:    form with a series total + keyword nodes + a total-only group key
#:    (fails pre-fix on both ADVICE-r10 asPercent items),
#:    timeStack('-1d') on the Engine refetch rail (fails on the
#:    pre-fix future-shift), aliasQuery (the r11 catalog-closure
#:    per-series re-query), and the pie render surface (all three
#:    pieMode kernels + the literal slice through Engine.render_pie) —
#:    all exact-parity green at sf0.001 AND sf0.01 before rotation;
#: 3. the five r4 rows the r10 window displaced (its queue);
#: 4. the next-oldest evidence: the first 39 rows of the 48-row r5
#:    cohort (alphabetical). The last nine r5 rows
#:    (tsdb_integral_persecond, tsdb_period_over_period, tsdb_rate_irate,
#:    tsdb_rollup_cascade_1d, tsdb_sort_by_maxima, tsdb_wide_series_grid,
#:    tsdb_xff_guard, window_cume_dist, window_range_price_band) carry
#:    to the r12 queue.
#: The 9 rows-only-by-design queries (approx_distinct_parts,
#: approx_event_percentiles, emb_intrinsic_dimension,
#: emb_kmeans_clusters, emb_mmr_rerank*, events_rolling_wau_hll,
#: graph_pagerank_docs, tsdb_downsample_lttb,
#: tsdb_holt_linear_forecast*) never hold window slots (*certified via
#: their exact twins/upgrades in r8 — no re-cert due). Every row that
#: rotates out keeps exact-cell parity coverage in
#: tests/test_oracle_parity.py.
_PRIORITY = (
    # --- 1. changed-code re-certs: the batch53 codepoint/char-array
    # rewrites (split('') for the O(n²) per-position substring — the
    # winnowing gram hash and the BPE adjacent-pair build) ----------------------
    "dedup_winnowing_pairs",
    "text_bpe_pair_merges",
    # --- 2. new round-11 certs (batch80/81/82) — batch80/81 are also the
    # changed-code evidence for the ADVICE-r10 fixes and the
    # catalog-closure aliasQuery; batch82 pins the pie render surface ----------
    "graphite_render_aspercent_nodes",
    "graphite_render_timestack_neg",
    "graphite_render_aliasquery",
    "graphite_render_pie",
    # --- 3. the five r4 rows the r10 window displaced -------------------------
    "tsdb_rollup_1h",
    "tsdb_slo_burn_rate",
    "tsdb_theilsen_trend",
    "upsert_latest_state",
    "window_topk_parts_per_brand",
    # --- 4. next-oldest evidence: the r5 cohort (first 39 of 48) --------------
    "agg_boolean_bitwise",
    "agg_covar_corr_quantized",
    "agg_mode_priority",
    "agg_string_concat_sorted",
    "agg_value_histogram",
    "batch_session_windows",
    "emb_dimension_stats",
    "graphite_aspercent",
    "graphite_divide_series",
    "graphite_series_by_tag",
    "graphite_tag_catalog",
    "llm_sequence_packing",
    "llm_stratified_sample",
    "scalar_date_arithmetic",
    "scalar_levenshtein_names",
    "scalar_null_conditionals",
    "scalar_regexp_extract_all",
    "scalar_string_family2",
    "source_avro_roundtrip",
    "source_orc_roundtrip",
    "source_text_lineproto",
    "streaming_avro_ingest_rollup",
    "streaming_dedup_slots",
    "streaming_enrich_bands",
    "streaming_hopping_rollup",
    "streaming_sharded_rollup",
    "streaming_update_sink_rollup",
    "text_pii_mask",
    "tpch_q11_important_parts",
    "tpch_q12_ship_lag",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_relation",
    "tpch_q18_large_orders",
    "tpch_q20_dominant_suppliers",
    "tpch_q22_cohort",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tsdb_hopping_window",
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
