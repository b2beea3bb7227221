"""Unit tests for the rollup core (SURVEY.md §5.2.2/5.2.3): cascade
equivalence, xFilesFactor edges, last tie-breaking, alignment."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.rollup import (
    align_epoch,
    cascade,
    finalize,
    rollup_partials,
)

UTC = dt.timezone.utc


def _points(spark, rows):
    return spark.createDataFrame(
        [(m, dt.datetime.fromtimestamp(ts, UTC), v) for m, ts, v in rows],
        "metric string, ts timestamp, value double",
    )


def test_align_epoch_floors(spark):
    df = _points(spark, [("m", 3661, 1.0)])
    got = df.select(align_epoch("ts", 60).alias("b")).first()["b"]
    assert got == 3660
    got = df.select(align_epoch("ts", 3600).alias("b")).first()["b"]
    assert got == 3600


@pytest.mark.parametrize("coarse", [120, 600, 3600])
def test_cascade_equals_direct(spark, coarse):
    """rollup(rollup(x, 60), coarse) == rollup(x, coarse) — including the
    (sum,count)-carried average, min/max, and last."""
    rows = []
    ts = 1000
    for i in range(500):
        ts += 37 + (i % 11)
        rows.append(("a" if i % 3 else "b", ts, float((i * 7919) % 501) / 7))
    df = _points(spark, rows)
    fine = rollup_partials(df, key_cols=["metric"], step_seconds=60)
    casc = finalize(cascade(fine, key_cols=["metric"], step_seconds=coarse))
    direct = finalize(rollup_partials(df, key_cols=["metric"], step_seconds=coarse))
    cols = ["metric", "bucket_ts", "cnt", "sum_value", "avg_value",
            "min_value", "max_value", "last_value"]
    a = sorted(map(tuple, casc.select(cols).collect()))
    b = sorted(map(tuple, direct.select(cols).collect()))
    assert a == b


def test_last_tie_break_max_value(spark):
    """Two points in the same second: last = larger value (deterministic)."""
    df = _points(spark, [("m", 100, 1.0), ("m", 100, 9.0), ("m", 100, 3.0)])
    out = finalize(rollup_partials(df, key_cols=["metric"], step_seconds=60))
    assert out.first()["last_value"] == 9.0


def test_xff_guard_edges(spark):
    """xff 0.5 with 2 of 4 expected slots filled → kept; 1 of 4 → gap."""
    df = _points(spark, [("m", 0, 1.0), ("m", 60, 2.0)])
    parts = rollup_partials(df, key_cols=["metric"], step_seconds=240)
    kept = finalize(parts, agg="average", xff=0.5, total_slots=4).first()
    assert kept["value"] == pytest.approx(1.5)
    dropped = finalize(parts, agg="average", xff=0.75, total_slots=4).first()
    assert dropped["value"] is None


def test_xff_zero_and_one(spark):
    df = _points(spark, [("m", 0, 4.0)])
    parts = rollup_partials(df, key_cols=["metric"], step_seconds=240)
    assert finalize(parts, agg="sum", xff=0.0, total_slots=4).first()["value"] == 4.0
    assert finalize(parts, agg="sum", xff=1.0, total_slots=4).first()["value"] is None


def test_null_values_counted_as_gaps(spark):
    df = spark.createDataFrame(
        [("m", dt.datetime.fromtimestamp(0, UTC), None),
         ("m", dt.datetime.fromtimestamp(10, UTC), 2.0)],
        "metric string, ts timestamp, value double",
    )
    out = finalize(rollup_partials(df, key_cols=["metric"], step_seconds=60))
    row = out.first()
    assert row["cnt"] == 1
    assert row["sum_value"] == 2.0
    assert row["last_value"] == 2.0


def test_five_kernels(spark):
    df = _points(spark, [("m", 1, 1.0), ("m", 2, 5.0), ("m", 3, 3.0)])
    parts = rollup_partials(df, key_cols=["metric"], step_seconds=60)
    expected = {"average": 3.0, "sum": 9.0, "last": 3.0, "max": 5.0, "min": 1.0}
    for agg, want in expected.items():
        got = finalize(parts, agg=agg).first()["value"]
        assert got == pytest.approx(want), agg
