"""Physical-plan regression tests (SURVEY.md §4, 100 TB design gates):
filters push to the scan, dims broadcast, hot paths stay in codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_backup_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
    unpartitioned_windows,
    wholestage_codegen_spans,
    without_aqe,
)
from kenshin_backup_spark.queries.relational import (
    tpch_q1_pricing_summary,
    tpch_q3_shipping_priority,
    tpch_q5_local_supplier,
    tpch_q6_forecast_revenue,
)
from kenshin_backup_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_q6_filters_pushed_to_scan(spark):
    df = tpch_q6_forecast_revenue(spark, SF_SMOKE)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf


def test_q1_column_pruning(spark):
    df = tpch_q1_pricing_summary(spark, SF_SMOKE)
    cols = set(scan_read_schema(df))
    assert "l_comment" not in cols  # nonexistent anyway, guard the idea
    # only the 7 needed columns are read, not the full 11-column schema
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }


def test_q3_q5_broadcast_dims(spark):
    assert has_broadcast_join(tpch_q3_shipping_priority(spark, SF_SMOKE))
    assert has_broadcast_join(tpch_q5_local_supplier(spark, SF_SMOKE))


def test_q1_stays_in_codegen(spark):
    df = tpch_q1_pricing_summary(spark, SF_SMOKE)
    # disable AQE only for inspection: load_table's tune() re-enables it
    # during construction, and planning happens lazily at explain time
    with without_aqe(spark):
        assert wholestage_codegen_spans(df) >= 1


def test_exact_metric_filter_pushes_equality(spark):
    from kenshin_backup_spark.operators.fetch import metric_filter

    ev = load_table(spark, SF_SMOKE, "events")
    df = metric_filter(ev.select("event_type", "value"), "event_type", "click")
    pf = " ".join(pushed_filters(df))
    assert "EqualTo(event_type,click)" in pf


def test_stratified_sample_single_exchange(spark):
    """The sampling decision is scan-side: the only exchange in the whole
    plan is the final 5-group aggregate's shuffle."""
    from kenshin_backup_spark.queries.batch10 import llm_stratified_sample

    df = llm_stratified_sample(spark, SF_SMOKE)
    with without_aqe(spark):
        plan = explain_str(df)
    # tree form is "Exchange (n)"; the details section repeats "(n) Exchange"
    assert plan.count("Exchange (") <= 1


def test_hopping_window_uses_expand_not_double_scan(spark):
    """Hop windows replicate rows via one in-pipeline Expand node; the
    events table is scanned exactly once."""
    from kenshin_backup_spark.queries.batch11 import tsdb_hopping_window

    df = tsdb_hopping_window(spark, SF_SMOKE)
    with without_aqe(spark):
        plan = explain_str(df)
    assert "Expand" in plan
    assert plan.count("Scan parquet  (") == 1


def test_bucketed_embedding_neardup_has_no_theta_join(spark):
    """The SRP-bucketed near-dup must plan as equi-joins only — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere (the all-pairs
    variant's scale-killer this operator exists to remove)."""
    from kenshin_backup_spark.queries.batch22 import (
        dedup_embedding_cosine_bucketed,
    )

    df = dedup_embedding_cosine_bucketed(spark, SF_SMOKE)
    text = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_partitioned_layout_prunes_partitions(spark):
    """The date predicate must reach the PartitionFilters of the staged
    date-partitioned scan — the 100 TB lever that turns a full-table scan
    into a 3-directory read."""
    from kenshin_backup_spark.queries.batch25 import source_partitioned_pruning

    df = source_partitioned_pruning(spark, SF_SMOKE)
    text = explain_str(df)
    m = [ln for ln in text.splitlines() if "PartitionFilters" in ln]
    assert m, f"no PartitionFilters in plan:\n{text}"
    assert any("event_date" in ln for ln in m), m


def test_heatmap_single_exchange(spark):
    """The heatmap pre-aggregation is one partial-agg pass: exactly one
    shuffle exchange in the whole plan."""
    from kenshin_backup_spark.queries.batch25 import tsdb_heatmap_buckets

    df = tsdb_heatmap_buckets(spark, SF_SMOKE)
    with without_aqe(spark):
        text = explain_str(df, "simple")
    assert text.count("Exchange hashpartitioning") == 1, text


def test_srp_topk_has_no_cross_join(spark):
    """The scalable ANN top-k must contain no cross join (the brute-force
    twin's deliberate BroadcastNestedLoopJoin is exactly what it replaces)
    and must use WindowGroupLimit so the per-query top-k prunes map-side."""
    from kenshin_backup_spark.queries.batch30 import emb_ann_topk_srp

    df = emb_ann_topk_srp(spark, SF_SMOKE)
    text = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    assert "WindowGroupLimit" in text


def test_minhash_portable_has_no_cross_join(spark):
    """Portable MinHash: band equi-join + verify join only."""
    from kenshin_backup_spark.queries.batch30 import dedup_minhash_portable

    df = dedup_minhash_portable(spark, SF_SMOKE)
    text = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_hybrid_search_no_corpus_self_join_blowup(spark):
    """Hybrid retrieval: the corpus appears via the posting equi-join and
    the candidate verify joins — never a cross join."""
    from kenshin_backup_spark.queries.batch31 import hybrid_search_rrf

    df = hybrid_search_rrf(spark, SF_SMOKE)
    text = explain_str(df)
    assert "CartesianProduct" not in text


# --- unpartitioned-window gates (the round-3 verdict's #1 anti-pattern) -----

def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_seasonal_anomalies_is_takeordered_not_global_window(spark):
    """The global top-20 must plan as TakeOrderedAndProject (per-task
    partial top-k) with the rank window applied over the 20-row limit —
    never a ranking window over the full events table."""
    from kenshin_backup_spark.queries.batch34 import (
        events_seasonal_residual_anomalies,
    )

    df = events_seasonal_residual_anomalies(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in explain_str(df)
    assert "GlobalLimit 20" in _optimized(df)


def test_zipf_topwords_is_takeordered(spark):
    from kenshin_backup_spark.queries.batch29 import text_zipf_topwords

    df = text_zipf_topwords(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in explain_str(df)
    assert "GlobalLimit 50" in _optimized(df)


def test_global_scalar_queries_have_no_windows(spark):
    """q11/q15 attach their global total/max as a broadcast 1-row cross
    join — zero Window nodes anywhere in the plan."""
    from kenshin_backup_spark.queries.batch9 import (
        tpch_q11_important_parts,
        tpch_q15_top_supplier,
    )

    for fn in (tpch_q11_important_parts, tpch_q15_top_supplier):
        assert unpartitioned_windows(fn(spark, SF_SMOKE)) == [], fn.__name__


def test_prefix_sum_queries_unpartitioned_windows_are_bounded(spark):
    """Pareto / RFM / ntile-quartiles route global rank+cumsum through
    with_global_prefix: the ONLY unpartitioned windows left are the
    per-partition offset frames (ordered by __scalepat_pid, whose row
    count is the partition count — bounded, not data-proportional)."""
    from kenshin_backup_spark.queries.advanced import window_ntile_quartiles
    from kenshin_backup_spark.queries.batch21 import orders_pareto_curve
    from kenshin_backup_spark.queries.batch27 import customer_rfm_scores

    for fn in (orders_pareto_curve, customer_rfm_scores, window_ntile_quartiles):
        specs = unpartitioned_windows(fn(spark, SF_SMOKE))
        assert specs, f"{fn.__name__}: expected bounded offset windows"
        for spec in specs:
            assert "__scalepat_pid" in spec, f"{fn.__name__}: {spec}"


def test_bench_headliners_have_no_data_proportional_global_window(spark):
    """Every bench-headline batch query must be free of unpartitioned
    windows over data-proportional input: any unpartitioned window in the
    plan must order by __scalepat_pid (bounded offsets) or sit above a
    GlobalLimit (bounded top-k rank)."""
    import bench as bench_mod
    from kenshin_backup_spark.queries import queries as all_queries

    qs = all_queries()
    for name in bench_mod.HEADLINE:
        if name.startswith("streaming_") or name == "dedup_connected_components":
            continue  # streaming queries execute on build; CC collects
        df = qs[name](spark, SF_SMOKE)
        specs = unpartitioned_windows(df)
        if not specs:
            continue
        plan = _optimized(df)
        assert all("__scalepat_pid" in s for s in specs) or "GlobalLimit" in plan, (
            name,
            specs,
        )


def test_batch37_39_plans_are_scale_safe(spark):
    """Batch-37/38/39 contracts: no cartesian product anywhere (the only
    cross joins are broadcast 1-row scalar attaches), and every window is
    partitioned (per-query / per-metric / per-cohort ranks — no
    data-proportional global window)."""
    from kenshin_backup_spark.queries.batch37 import (
        retrieval_bm25_topk,
        tsdb_autocorrelation,
        tsdb_cross_correlation,
        llm_train_test_split,
    )
    from kenshin_backup_spark.queries.batch38 import (
        agg_skewness_kurtosis,
        events_user_gini_diversity,
        lineitem_weighted_median,
    )
    from kenshin_backup_spark.queries.batch39 import (
        orders_cohort_ltv,
        text_tfidf_keywords,
        tsdb_histogram_percentile,
    )

    for fn in (
        retrieval_bm25_topk,
        tsdb_autocorrelation,
        tsdb_cross_correlation,
        llm_train_test_split,
        agg_skewness_kurtosis,
        events_user_gini_diversity,
        lineitem_weighted_median,
        orders_cohort_ltv,
        text_tfidf_keywords,
        tsdb_histogram_percentile,
    ):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df)
        assert "CartesianProduct" not in text, fn.__name__
        assert unpartitioned_windows(df) == [], fn.__name__


def test_driver_window_plans_have_no_global_anti_patterns(spark):
    """Mechanized audit over the driver's 50-slot correctness window
    (minus streaming/iterative/side-effecting queries, which execute on
    build): no CartesianProduct, and any unpartitioned window must be
    bounded — over a with_global_prefix offsets frame (__scalepat_pid),
    under a GlobalLimit, or in the explicit bounded whitelist (windows
    whose input is a fixed-cardinality aggregate, e.g. 10 deciles).
    A full-registry sweep of this audit ran clean in round 4."""
    from kenshin_backup_spark.queries import queries as all_queries

    BOUNDED_WHITELIST = {"text_vocab_growth"}  # 10-row decile frame
    SKIP = {
        "dedup_connected_components",  # iterative, collects a probe
        "source_whisper_roundtrip",  # writes fixture files on build
        "source_pickle_batches",
        "source_text_lineproto",
        "tsdb_ladder_roundtrip",  # materializes a parquet ladder
        "upsert_latest_state",
        "source_bucketed_join",
        "source_partitioned_pruning",
        "graph_pagerank_docs",
    }
    qs = all_queries()
    for name in list(qs)[:50]:
        if name.startswith("streaming_") or name in SKIP:
            continue
        df = qs[name](spark, SF_SMOKE)
        exec_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in exec_plan, name
        specs = [
            s
            for s in unpartitioned_windows(df)
            if "__scalepat_pid" not in s
        ]
        if not specs or name in BOUNDED_WHITELIST:
            continue
        plan = _optimized(df)
        assert "GlobalLimit" in plan, (name, specs)


def test_late_round4_batch_plans_are_scale_safe(spark):
    """Batch-53..59 contracts for queries NOT already covered by the
    driver-window audit: no cartesian product; any unpartitioned window
    is bounded under a GlobalLimit (top-30 merges / top-10 screens)."""
    from kenshin_backup_spark.queries.batch56 import tsdb_counter_gauge_classify
    from kenshin_backup_spark.queries.batch58 import dedup_method_agreement
    from kenshin_backup_spark.queries.batch59 import emb_pca_project

    for fn in (tsdb_counter_gauge_classify, dedup_method_agreement,
               emb_pca_project):
        df = fn(spark, SF_SMOKE)
        text = explain_str(df)
        assert "CartesianProduct" not in text, fn.__name__
        specs = unpartitioned_windows(df)
        if specs:
            assert "GlobalLimit" in _optimized(df), (fn.__name__, specs)


def test_winnowing_fingerprints_no_shuffle_before_rows(spark):
    """Round-6 regression lock: the array-side winnowing fingerprint
    stage must stay shuffle-free — no Exchange and no per-position sort
    Window anywhere in its plan (the pre-rewrite form shuffled every
    char position twice; see SCALE.md). The first exchange in the full
    pairs query belongs to the posting aggregation, above this frame."""
    from kenshin_backup_spark.plans import explain_str
    from kenshin_backup_spark.queries.batch53 import winnowing_fingerprints
    from kenshin_backup_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = explain_str(winnowing_fingerprints(docs), "formatted")
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan


def test_df_caps_are_broadcast_anti_joins(spark):
    """Round-15 regression lock: the df-cap in BOTH posting-list dedup
    paths must be a broadcast ANTI join on the bounded hot head
    (|posting|/max_df keys by pigeonhole), never an inner join on the
    keep tail (~the whole vocabulary — a corpus-sized broadcast)."""
    from kenshin_backup_spark.plans import explain_str
    from kenshin_backup_spark.queries.batch53 import dedup_winnowing_pairs
    from kenshin_backup_spark.queries.llm import dedup_ngram_jaccard_capped

    for fn in (dedup_ngram_jaccard_capped, dedup_winnowing_pairs):
        plan = explain_str(fn(spark, SF_SMOKE), "formatted")
        assert "LeftAnti" in plan, plan
        assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_bm25_doc_length_is_scan_side(spark):
    """Round-15 regression lock for retrieval_bm25_topk: per-doc length
    rides the tf aggregate (scan-side size() on a NAMED array column), so
    (a) the only nested-loop join is the 1-row corpus-stats broadcast —
    the old doc-count-sized lengths broadcast join must not come back;
    (b) the text-normalize regex pipeline evaluates per DOCUMENT, never
    per exploded word (the named-array projection guard — inlining the
    expression into size() re-ran the regex per word, measured 3x)."""
    from kenshin_backup_spark.plans import explain_str
    from kenshin_backup_spark.queries.batch37 import retrieval_bm25_topk

    plan = explain_str(retrieval_bm25_topk(spark, SF_SMOKE), "formatted")
    # tree lines only — formatted explain repeats each node in the details
    assert plan.count("BroadcastNestedLoopJoin Cross") == 1, plan
    # the explode must consume the NAMED array column, not an inlined
    # normalize+split pipeline (which Catalyst would also duplicate into
    # the sibling size() projection under the Generate)
    assert "explode(__w" in plan, plan
