"""Unit tests for the fetch API (SURVEY.md §3.2): archive selection,
range clamping, glob translation, grid gap-fill."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import glob_to_regex
from kenshin_backup_spark.operators.fetch import (
    Archive,
    clamp_range,
    fetch,
    select_archive,
    time_grid,
)
from kenshin_backup_spark.operators.rollup import rollup_partials

ARCHIVES = [Archive(10, 360), Archive(60, 1440), Archive(600, 1440)]  # 1h/1d/10d


def test_select_archive_finest_covering():
    now = 1_000_000
    assert select_archive(ARCHIVES, now - 100, now).step_seconds == 10
    assert select_archive(ARCHIVES, now - 7200, now).step_seconds == 60
    assert select_archive(ARCHIVES, now - 200_000, now).step_seconds == 600
    # beyond all retentions → coarsest
    assert select_archive(ARCHIVES, now - 10_000_000, now).step_seconds == 600


def test_clamp_range():
    assert clamp_range(0, 500, 1000, 600) == (400, 500)
    assert clamp_range(450, 5000, 1000, 600) == (450, 1000)
    with pytest.raises(ValueError):
        clamp_range(700, 800, 1000, 100)


@pytest.mark.parametrize(
    "glob,matches,rejects",
    [
        ("a.b.c", ["a.b.c"], ["a.b.cd", "a.b", "x.b.c"]),
        ("a.*.c", ["a.b.c", "a.xx.c"], ["a.b.d", "a.b.x.c"]),
        ("a.?.c", ["a.b.c"], ["a.bb.c"]),
        ("servers.{web,db}.cpu", ["servers.web.cpu", "servers.db.cpu"], ["servers.app.cpu"]),
        ("a.[bc].d", ["a.b.d", "a.c.d"], ["a.x.d"]),
        ("a.[!bc].d", ["a.x.d", "a.!.d"], ["a.b.d", "a.c.d"]),
        ("a.[b-d].e", ["a.c.e"], ["a.x.e"]),
        ("a.{b.c", ["a.{b.c"], ["a.Xb.c"]),       # unbalanced '{' → literal
        ("a.[b.c", ["a.[b.c"], ["a.b.c"]),        # unbalanced '[' → literal
    ],
)
def test_glob_to_regex(glob, matches, rejects):
    import re

    pat = re.compile(glob_to_regex(glob))
    for m in matches:
        assert pat.match(m), (glob, m)
    for r in rejects:
        assert not pat.match(r), (glob, r)


def test_time_grid_alignment(spark):
    rows = [r["bucket_ts"] for r in time_grid(spark, 105, 310, 60).collect()]
    assert rows == [60, 120, 180, 240, 300]


def test_fetch_end_to_end(spark):
    utc = dt.timezone.utc
    pts = spark.createDataFrame(
        [("web.cpu", dt.datetime.fromtimestamp(t, utc), float(t)) for t in (5, 15, 65, 200)]
        + [("db.cpu", dt.datetime.fromtimestamp(25, utc), 1.0)],
        "metric string, ts timestamp, value double",
    )
    levels = {10: rollup_partials(pts, key_cols=["metric"], step_seconds=10)}
    out = fetch(
        spark,
        levels,
        [Archive(10, 100)],
        metric_glob="*.cpu",
        from_ts=0,
        until_ts=220,
        now_ts=220,
        key_cols=["metric"],
    )
    rows = {(r["metric"], r["bucket_ts"]): r["cnt"] for r in out.collect()}
    # 23 slots (0..220) × 2 metrics
    assert len(rows) == 23 * 2
    assert rows[("web.cpu", 0)] == 1
    assert rows[("web.cpu", 60)] == 1
    assert rows[("web.cpu", 30)] is None  # gap
    assert rows[("db.cpu", 20)] == 1
