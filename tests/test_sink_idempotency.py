"""Round-5 evidence set (VERDICT r4 #6 + ADVICE items).

1. Sink exactly-once under micro-batch replay: foreachBatch is
   at-least-once, so both sinks must tolerate re-applying an epoch —
   the update sink via idempotent merge-upsert, the sharded append sink
   via epoch-keyed dynamic partition overwrite.
2. Engine-backed seriesByTag over DOTTED tagged metrics (the render
   catalog must resolve via the match-everything sentinel, not the
   one-component glob ``*``).
3. Engine.metrics: one unioned scan, multi-policy browse, limit cap.
4. pca_fit null/empty-vector counting and ragged-dimension guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kenshin_backup_spark.api import Engine
from kenshin_backup_spark.operators.policies import Policy


def _rollup_schema() -> str:
    return (
        "metric string, bucket_ts long, cnt long, sum_q long, "
        "min_v double, max_v double, last_ts long, last_v double"
    )


def _snapshot(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_upsert_replay_is_exactly_once(spark, tmp_path):
    """Re-applying the SAME micro-batch (crash between write and
    checkpoint commit) must leave the sink byte-identical."""
    from kenshin_backup_spark.streaming.ingest import upsert_rollup_partitions

    path = str(tmp_path / "upsert")
    day = 1_000_000 - (1_000_000 % 86_400)
    b1 = spark.createDataFrame(
        [
            ("m1", day, 1, 100, 1.0, 1.0, day, 1.0),
            ("m1", day + 86_400, 5, 500, 1.0, 5.0, day + 86_400, 5.0),
        ],
        _rollup_schema(),
    )
    b2 = spark.createDataFrame(
        [("m2", day + 600, 3, 350, 1.0, 3.0, day + 700, 3.0)],
        _rollup_schema(),
    )
    upsert_rollup_partitions(b1, path)
    upsert_rollup_partitions(b2, path)
    want = _snapshot(spark, path)
    # replay the last epoch, then an older epoch — both no-ops
    upsert_rollup_partitions(b2, path)
    assert _snapshot(spark, path) == want
    upsert_rollup_partitions(b1, path)
    assert _snapshot(spark, path) == want


def test_sharded_append_replay_is_exactly_once(spark, tmp_path):
    """The append sink's epoch-keyed dynamic overwrite: replaying epoch N
    rewrites exactly its own (shard, date, epoch) partitions — no doubled
    rows, and other epochs' buckets (even same shard+date) survive."""
    from kenshin_backup_spark.streaming.ingest import append_sharded_partitions

    path = str(tmp_path / "sharded")
    day = 1_000_000 - (1_000_000 % 86_400)
    e0 = spark.createDataFrame(
        [
            ("click", day, 2, 200, 1.0, 2.0, day, 2.0),
            ("view", day + 3600, 1, 50, 0.5, 0.5, day + 3600, 0.5),
        ],
        _rollup_schema(),
    )
    e1 = spark.createDataFrame(
        # same date as epoch 0 — replay of e1 must not clobber e0's rows
        [("click", day + 7200, 4, 400, 1.0, 4.0, day + 7200, 4.0)],
        _rollup_schema(),
    )
    append_sharded_partitions(e0, path, 0, shard_col="metric", n_shards=4)
    append_sharded_partitions(e1, path, 1, shard_col="metric", n_shards=4)
    want = _snapshot(spark, path)
    assert len(want) == 3
    for _ in range(2):  # replay epoch 1 twice
        append_sharded_partitions(e1, path, 1, shard_col="metric", n_shards=4)
        assert _snapshot(spark, path) == want
    # replay the OLDER epoch too
    append_sharded_partitions(e0, path, 0, shard_col="metric", n_shards=4)
    assert _snapshot(spark, path) == want


# --- ADVICE: tagged catalog through Engine.render --------------------------


def _tagged_engine(spark, tmp_path):
    eng = Engine(
        spark,
        str(tmp_path / "store"),
        policies=[Policy(name="default", pattern=".*", steps=(3600,), agg="sum")],
    )
    rows = [
        # normal graphite form: DOTTED bare name + tags
        ("disk.used;dc=east;host=a", 7200, 1.0),
        ("disk.used;dc=west;host=b", 7200, 2.0),
        ("disk.free;dc=east;host=a", 7200, 4.0),
        ("cpu.load;dc=east;host=a", 7200, 8.0),
        ("plainmetric", 7200, 16.0),
    ]
    pts = spark.createDataFrame(rows, "metric string, es long, value double").select(
        "metric", F.timestamp_seconds("es").alias("ts"), "value"
    )
    eng.write(pts)
    return eng


def test_render_series_by_tag_dotted_names(spark, tmp_path):
    """seriesByTag through Engine.render must see tagged series whose bare
    name contains a dot (the catalog resolves via the None sentinel; the
    old fetch_fn('*') silently excluded every dotted name)."""
    eng = _tagged_engine(spark, tmp_path)
    got = eng.render("seriesByTag('dc=east')", 3600, 10_800)
    names = {r.metric for r in got.select("metric").distinct().collect()}
    assert names == {
        "disk.used;dc=east;host=a",
        "disk.free;dc=east;host=a",
        "cpu.load;dc=east;host=a",
    }


def test_render_series_by_tag_name_tag(spark, tmp_path):
    """The reserved 'name' tag selects on the BARE series name (graphite
    tag spec), for both exact and regex operators."""
    eng = _tagged_engine(spark, tmp_path)
    got = eng.render("seriesByTag('name=disk.used')", 3600, 10_800)
    names = {r.metric for r in got.select("metric").distinct().collect()}
    assert names == {
        "disk.used;dc=east;host=a",
        "disk.used;dc=west;host=b",
    }
    got2 = eng.render("seriesByTag('name=~^disk\\.', 'dc!=west')", 3600, 10_800)
    names2 = {r.metric for r in got2.select("metric").distinct().collect()}
    assert names2 == {
        "disk.used;dc=east;host=a",
        "disk.free;dc=east;host=a",
    }


# --- Engine.metrics: one unioned scan over >1 policy -----------------------


def test_metrics_browse_multi_policy(spark, tmp_path):
    eng = Engine(
        spark,
        str(tmp_path / "store"),
        policies=[
            Policy(name="clicks", pattern=r"^click", steps=(600, 3600), agg="sum"),
            Policy(name="default", pattern=".*", steps=(3600,), agg="average"),
        ],
    )
    rows = [("click", 7200.0 + i, 1.0) for i in range(3)] + [
        ("click.mobile", 7200.0, 1.0),
        ("view", 7200.0, 2.0),
        ("purchase", 7200.0, 3.0),
    ]
    pts = spark.createDataFrame(rows, "metric string, es double, value double").select(
        "metric", F.timestamp_seconds("es").alias("ts"), "value"
    )
    eng.write(pts)
    # glob browse spans BOTH policy ladders in one unioned job
    assert eng.metrics("*") == ["click", "purchase", "view"]
    assert eng.metrics("click.*") == ["click.mobile"]
    assert eng.metrics("{click,view}") == ["click", "view"]
    assert eng.metrics("view") == ["view"]  # exact name, equality pushdown
    assert eng.metrics("nope") == []
    # driver-side materialization cap
    assert len(eng.metrics("*", limit=2)) == 2


# --- pca_fit null/ragged guards (ADVICE) -----------------------------------


def test_pca_fit_ignores_null_and_empty_vectors(spark):
    from kenshin_backup_spark.operators.linalg import pca_fit

    rows = [
        (1, [1.0, 0.0]),
        (2, [3.0, 0.0]),
        (3, None),
        (4, []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, evals, mean, total = pca_fit(df, k=2)
    # n must be 2 (non-empty vectors), so the mean is (2, 0) — counting
    # the null/empty rows would shrink it to (1, 0)
    assert mean == pytest.approx([2.0, 0.0])
    assert total == pytest.approx(1.0)  # var of {1,3} with n divisor


def test_pca_fit_raises_on_ragged_dimensions(spark):
    from kenshin_backup_spark.operators.linalg import pca_fit

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        pca_fit(df, k=1)
