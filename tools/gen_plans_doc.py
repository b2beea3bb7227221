#!/usr/bin/env python3
"""Generate PLANS.md: formatted physical plans for representative queries,
annotated with the scale property each plan demonstrates. Run from repo
root: ``python tools/gen_plans_doc.py``."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    (
        "tpch_q6_forecast_revenue",
        "Predicate pushdown: all three filters reach the parquet scan "
        "(PushedFilters), and only 4 of 11 columns are read (ReadSchema).",
    ),
    (
        "graphite_render_linreg_source",
        "Refetch rail (r10): the OLS fit is ONE per-series aggregate "
        "over the separately-fetched source window, broadcast back onto "
        "the render frame — no window function beyond the per-metric "
        "grid fill, no collect; the two archive fetches prune their "
        "date partitions independently.",
    ),
    (
        "tpch_q5_local_supplier",
        "Join strategy: every dimension joins as BroadcastHashJoin; only the "
        "lineitem–orders fact join shuffles.",
    ),
    (
        "tsdb_rollup_1h",
        "Rollup kernel: ONE scan of raw events; partial HashAggregate before "
        "the exchange (map-side combine); grid/keys derive from the tiny "
        "aggregated side and broadcast back.",
    ),
    (
        "dedup_exact_fingerprint",
        "Dedup shuffle carries the 32-byte md5 fingerprint, not documents — "
        "the hash is computed scan-side below the exchange.",
    ),
    (
        "emb_cosine_topk",
        "Vector top-k: candidates scan once; the bounded query side is "
        "broadcast; scoring is codegen'd array arithmetic (no UDF).",
    ),
    (
        "tsdb_hopping_window",
        "Hopping windows: ONE scan + one Expand node (each event replicated "
        "to its two windows inside the pipeline) — not a self-union double "
        "scan; partial aggregation still applies after the Expand.",
    ),
    (
        "tpch_q2_min_cost_supplier",
        "Per-group argmin: the whole dimension chain (part, supplier, "
        "nation, region) broadcasts; the only exchanges are the two keyed "
        "aggregations (pair-level, then part-level struct-min).",
    ),
    (
        "llm_stratified_sample",
        "Stratified sampling: the keep/drop hash is a scan-side integer "
        "expression — the plan has zero exchanges below the final "
        "5-group aggregate.",
    ),
    (
        "dedup_embedding_cosine_bucketed",
        "Bucketed embedding near-dup (round 2): ONLY hash equi-joins — the "
        "operator exists to remove the all-pairs a.id<b.id "
        "BroadcastNestedLoopJoin; SRP signatures are scan-side expressions.",
    ),
    (
        "llm_decontamination",
        "Decontamination (round 2): the benchmark gram set is "
        "distinct+broadcast; the corpus explodes grams scan-side and "
        "equi-joins the broadcast — zero corpus shuffle before the "
        "per-doc count.",
    ),
    (
        "emb_ann_topk_srp",
        "Scalable ANN top-k (round 3): no cross join anywhere (contrast "
        "emb_cosine_topk's deliberate broadcast NLJ); Spark inserts "
        "WindowGroupLimit Partial/Final so the per-query top-k is pruned "
        "map-side before the rank shuffle.",
    ),
    (
        "dedup_minhash_portable",
        "Portable MinHash LSH (round 3): persisted shingle+hash cache feeds "
        "array-side signature minima, band-key Generate, band equi-join, "
        "and the exact array_intersect Jaccard verify applied INSIDE the "
        "join — all joins are hash equi-joins.",
    ),
    (
        "events_seasonal_residual_anomalies",
        "Global top-k done right (round 4): the |residual| ranking plans as "
        "TakeOrderedAndProject (each task keeps its local top-20, driver "
        "merges) and the rank window runs over the 20 surviving rows — "
        "round 3's version moved the ENTIRE events table through one "
        "unpartitioned Window task.",
    ),
    (
        "orders_pareto_curve",
        "Global prefix sums without a global sort (round 4, "
        "operators/scalepat.with_global_prefix): range repartition on the "
        "sort key, per-partition cumsum/row_number windows keyed on "
        "spark_partition_id, per-partition subtotals (one row per "
        "partition) windowed into running offsets, broadcast back. The "
        "only unpartitioned window in the plan is over the "
        "partition-count-row offsets frame.",
    ),
    (
        "retrieval_bm25_topk",
        "BM25 retrieval (round 4): the inverted-index shape — every join "
        "is a hash equi-join (term posting join, doc-length join, "
        "broadcast df-capped query terms); corpus stats attach as a "
        "broadcast 1-row cross join; WindowGroupLimit prunes the per-query "
        "top-k map-side. The corpus never self-joins.",
    ),
    (
        "tsdb_autocorrelation",
        "Series ACF (round 4): the fact table collapses to the "
        "(metric, hour) grain in a partial-aggregated rollup BEFORE the "
        "lag self-join, so the join input is ~8.8k rows/metric·year; the "
        "lag fan-out is a scan-side Generate over the rollup, and moment "
        "sums partial-aggregate again after the join.",
    ),
    (
        "dedup_winnowing_pairs",
        "Winnowing fingerprint dedup (round 4; r11 scan rewrite): the "
        "codepoint array, per-position polynomial hashes, window minima "
        "and per-doc dedup all evaluate ARRAY-SIDE in one scan "
        "projection (split('') builds the char array in one O(n) pass — "
        "the old per-position substring was quadratic in document "
        "length); only SELECTED fingerprints become rows; the pair join "
        "is a hash equi-join on the 8-byte fingerprint with a df-capped "
        "posting list — char-level dedup with zero cross joins.",
    ),
    (
        "graphite_render_group_order",
        "Concatenation-order selection (round 12): the group()/unique() "
        "order rank (`_concat_order`) touches only one-row-per-series "
        "frames — distinct, a struct-min groupBy, a range-rank keyed by "
        "series count — and broadcast-joins the rank back; limit stays "
        "the TakeOrdered-over-survivors pattern. The render's archive "
        "scan and hourly grid are unchanged: ordering metadata never "
        "reshuffles data volume.",
    ),
    (
        "graphite_groupbynode_median",
        "Widened groupByNode kernel (round 13): the per-bucket median "
        "routes through _combine_grouped — ONE hash aggregate on the "
        "coarser (group, bucket) key whose collect_list is bounded by "
        "member count per group (series count, never data volume), then "
        "an array_sort + element_at middle pick. The groupBy key is "
        "coarser than the input key, so the shuffle shrinks and "
        "partial-aggregates map-side; the render under it is the "
        "unchanged archive fetch + hourly grid.",
    ),
    (
        "incremental_rollup_merge",
        "Incremental MV maintenance (round 4): the latest-day boundary "
        "attaches as a broadcast 1-row scalar (no driver collect, no "
        "global window); state and delta partial-aggregate map-side and "
        "merge by integer addition — the oracle equality against a full "
        "recompute is the mergeability proof.",
    ),
    (
        "tsdb_multires_rollup",
        "Multi-resolution rollup (round 4): 1h/6h/1d ladder levels from "
        "ONE parquet scan — a single Generate replicates each row to its "
        "three granularities in-pipeline, partial aggregation runs below "
        "the one exchange. The naive plan scans the fact table three "
        "times; at 100 TB that is two extra passes over the lake.",
    ),
    (
        "llm_curation_funnel_v2",
        "Curation funnel capstone (round 4): the winnowing pair frame "
        "collapses to a distinct drop set and broadcast semi-joins back; "
        "quality and sampling are scan-side integer flags; the funnel is "
        "ONE map-side-combinable aggregate — three pipeline stages, one "
        "Catalyst plan, no second scan of the corpus.",
    ),
    (
        "tsdb_histogram_percentile",
        "Histogram percentile (round 4): bucket assignment is a scan-side "
        "integer expression; the shuffled state is metrics × le-buckets "
        "integer counts (mergeable by addition across shards/windows); "
        "windows partition on the metric key.",
    ),
    (
        "graphite_render_rollstats",
        "Render-language composite (round 6): the whole nested target "
        "(store fetch → gap-filled grid → daily summarize → "
        "movingMedian / percentileOfSeries) compiles into ONE Catalyst "
        "plan over the hourly ladder — graphite-web re-walks Python "
        "lists per function. The two collect_list sites are bounded by "
        "the WINDOW ARGUMENT (3 points) and the GLOB's series count "
        "(3 series), never the data volume; the rolling window "
        "partitions by metric.",
    ),
    (
        "graphite_render_maxdatapoints",
        "maxDataPoints consolidation (round 8): the per-series "
        "(count, start, end) windows hash-partition on metric and the "
        "band group-by REUSES that clustering — one Exchange for the "
        "whole consolidation, band state O(1) per group, nothing "
        "collected to the driver. The kernel dispatch (six CASE arms "
        "over the consolidateBy legend wrap) is codegen'd column "
        "arithmetic.",
    ),
    (
        "graphite_render_alias_consolidate",
        "Consolidation-hint threading (round 9): the rename erases the "
        "legend wrap, so the kernel arrives as EVALUATOR STATE and the "
        "plan dispatches on a LITERAL — the per-row regexp_extract "
        "disappears entirely from the hinted path. Same single "
        "consolidation Exchange as the maxdatapoints cert.",
    ),
    (
        "graphite_render_pie",
        "Pie render surface (round 11): each pieMode kernel is ONE "
        "gap-ignoring aggregate keyed on the series name, stacked "
        "directly on the render plan — the partial+final HashAggregate "
        "pair REUSES the grid's metric clustering, so the plan adds NO "
        "new Exchange at all (graphite-web walks every series in Python "
        "per slice); the literal name:value slice is a 1-row local plan "
        "that never touches the store.",
    ),
    (
        "tpch_q18_large_volume",
        "Large-volume customers (round 9): lineitem shuffles ONCE on its "
        "natural key for the quantity aggregate, the HAVING filter "
        "collapses it ~50x before the orders join, and customer joins "
        "as BroadcastHashJoin.",
    ),
    (
        "graphite_negnode_summarize_units",
        "Round-14 parity-wave cert: summarize(aliasByNode(groupByNode("
        "*.*.*, -2, 'sum'), -1), '6hours', 'max') stacks TWO shrinking "
        "hash aggregates on the archive fetch — groupByNode merges "
        "series onto the coarser (group, bucket) key, summarize "
        "re-buckets onto (group, 6h); shuffle volume strictly decreases "
        "through both, and negative name-node indexing is pure "
        "expression mapping (no extra exchange).",
    ),
]

FOOTER = """
## Plan-shape lessons (measured, round 4)

- **An unpartitioned ranking window is a single-task sort — use
  orderBy().limit() or range-partitioned prefix sums.** `row_number()
  OVER (ORDER BY x)` moves every input row to ONE task (`WindowExec: No
  Partition Defined`); `orderBy().limit(k)` plans as
  TakeOrderedAndProject (partial top-k map-side), and exact global
  rank/cumsum decomposes into per-range windows + broadcast offsets
  (`operators/scalepat.py`). `plans.unpartitioned_windows` +
  `tests/test_plans.py` gate the whole class mechanically.

## Plan-shape lessons (measured, round 3)

- **Persist the signature frame, not just the shingle frame.** Both sides
  of an LSH band self-join read the signatures; without `sigs.persist()`
  the plan shows two identical Generate subtrees — the k·|sh| minhash
  transforms (and the 16×64 SRP projections in the embedding twin) run
  twice. (`operators/dedup.py minhash_portable_pairs`,
  `operators/similarity.py cosine_near_pairs_bucketed`.)
- **Filter above the persist boundary.** `where(size(sh) > 0)` below the
  persist gets pushed into the scan as a data filter, duplicating the
  whole normalize→shingle pipeline into the cache build (measured
  5.6 s → 2.0 s at sf0.1 when moved above). Catalyst pushdown is usually
  free performance; above a cache boundary it can double expensive
  projections.
- **Emit literal matrices as ONE parsed SQL literal.** Building a 16×64
  plane matrix from per-element `F.lit` calls costs ~1.6 s of driver-side
  py4j round-trips per call site; `F.expr("array(array(...),...)")`
  parses JVM-side in milliseconds and constant-folds identically.
- **streaming_update_sink_rollup** is not a single plan: four micro-batch
  executions of the streaming rollup, each ending in
  `upsert_rollup_partitions`' read-merge-rewrite (broadcast join on
  touched dates + left-anti on revised buckets + dynamic partition
  overwrite). The oracle equality proves the merge preserved every
  un-revised bucket across the replayed batches.
"""


def main() -> None:
    from kenshin_backup_spark import queries as registry
    from kenshin_backup_spark.plans import explain_str, without_aqe
    from kenshin_backup_spark.session import get_spark

    spark = get_spark("plans-doc")
    qs = registry.queries()
    out = [
        "# PLANS — physical-plan evidence for the scale design\n",
        "Generated by `tools/gen_plans_doc.py` (AQE disabled for static",
        "inspection; at runtime AQE additionally coalesces shuffles and",
        "splits skewed partitions). Each plan is annotated with the property",
        "it demonstrates; `tests/test_plans.py` asserts these properties so",
        "they cannot regress silently.\n",
    ]
    with without_aqe(spark):
        for name, why in SHOWCASE:
            df = qs[name](spark, "/root/testdata/sf0.001")
            text = explain_str(df, "formatted")
            # keep the plan tree + the scan detail blocks; drop column lists
            text = re.sub(r"Output \[\d+\]: \[[^\]]*\]", "Output: [...]", text)
            text = re.sub(r"Arguments: [^\n]{120,}", "Arguments: [...]", text)
            lines = text.strip().splitlines()
            if len(lines) > 400:
                # render_many unions duplicate whole render trees — the
                # property each showcase demonstrates lives in the tree
                # HEAD (exchanges, join strategies, scan pushdown), so
                # keep that and say what was elided
                kept = "\n".join(lines[:250])
                text = (
                    f"{kept}\n... [{len(lines) - 250} further plan lines "
                    "elided — repeated per-target subtrees]"
                )
            else:
                text = "\n".join(lines)
            out.append(f"## {name}\n\n{why}\n\n```\n{text}\n```\n")
    out.append(FOOTER)
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
