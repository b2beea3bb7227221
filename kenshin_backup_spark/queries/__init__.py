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
#: entries, so this ordering is evidence policy. Round-16 re-curation
#: (COVERAGE.md's standing rule — the burn-down stays closed, windows
#: hold in priority order; this is exactly the r16 queue COVERAGE.md
#: wrote in r15, extended by the touched-path-first rule):
#: 1. changed-code certs — the 22 queries whose execution path changed
#:    in this optimization round: the 20 store-backed render queries
#:    (Engine.write now captures the raw bounds with df.observe on the
#:    ladder-build pass and takes a single-policy fast path — r16
#:    OPTIMIZATION log §1) and the two COMPLETE-mode streaming queries
#:    (run_stream_to_memory now skips the trailing no-data micro-batch
#:    for complete output — §4). All 22 passed exact-cell parity at
#:    sf0.01 when the change landed; the window makes the driver
#:    re-certify exactly the touched paths (the rule VERDICT r15 kept).
#: 2. the r10-cohort remainder (37 rows minus the 11 already seated in
#:    priority 1), alphabetical — the oldest-evidence burn-down;
#: 3. fill to 50 from the r11 cohort head (alphabetical); the r11
#:    remainder queues for r17.
#: The 9 rows-only-by-design queries never hold window slots. Every row
#: that rotates out keeps exact-cell parity coverage in
#: tests/test_oracle_parity.py.
_PRIORITY = (
    # --- 1. r16 changed-code certs: the 20 store-render queries (observe
    # bounds + single-policy write fast path) + the 2 complete-mode
    # streaming queries (no-data micro-batch skip) ----------------------
    "graphite_groupbynode_median",
    "graphite_negnode_summarize_units",
    "graphite_reduce_apply_negnode",
    "graphite_render_alias_consolidate",
    "graphite_render_aliasquery",
    "graphite_render_aspercent_nodes",
    "graphite_render_bandmath",
    "graphite_render_generic",
    "graphite_render_group_order",
    "graphite_render_linreg_source",
    "graphite_render_mapreduce",
    "graphite_render_maxdatapoints",
    "graphite_render_pie",
    "graphite_render_pipeline",
    "graphite_render_ratio",
    "graphite_render_rollstats",
    "graphite_render_seriesbytag",
    "graphite_render_timegen",
    "graphite_render_timeshift_weekly",
    "graphite_render_timestack_neg",
    "streaming_rollup_1h",
    "streaming_session_windows",
    # --- 2. the r10-cohort remainder not already seated above
    # (alphabetical; 26 rows) -------------------------------------------
    "graphite_summarize_top",
    "incremental_rollup_merge",
    "join_interval_overlap",
    "llm_curation_funnel_v2",
    "llm_decontamination",
    "llm_document_chunking",
    "llm_train_test_split",
    "multimodal_decode_features",
    "orders_pareto_curve",
    "retrieval_ann_recall_report",
    "retrieval_bm25_topk",
    "source_pickle_batches",
    "source_whisper_roundtrip",
    "streaming_drawdown",
    "streaming_ewma_final",
    "streaming_purchase_click_join",
    "text_quality_scores",
    "text_zipf_topwords",
    "tpch_q15_top_supplier",
    "tpch_q1_pricing_summary",
    "tsdb_anomaly_ensemble",
    "tsdb_autocorrelation",
    "tsdb_cross_correlation",
    "tsdb_fetch_gapfill",
    "tsdb_histogram_percentile",
    "tsdb_policy_driven_rollup",
    # --- 3. window fill: the 2-row head of the 50-row r11 cohort
    # (alphabetical; remainder queues for r17) --------------------------
    "agg_boolean_bitwise",
    "agg_covar_corr_quantized",
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
