"""Graphite at-time grammar tests (attime.parse_at_time) — pinned to the
transcribed graphite-web semantics, including the documented quirks
(12pm → 00:00 via graphite's (h+12)%24; one sign distributes over every
offset term), plus the Engine string-window integration."""

from __future__ import annotations

import datetime as dt

import pytest

from kenshin_backup_spark.attime import parse_at_time, parse_time_offset

UTC = dt.timezone.utc
#: 2024-01-18 13:37:42 UTC, a Thursday
NOW = int(dt.datetime(2024, 1, 18, 13, 37, 42, tzinfo=UTC).timestamp())


def _utc(*args):
    return int(dt.datetime(*args, tzinfo=UTC).timestamp())


def test_offsets():
    assert parse_time_offset("") == 0
    assert parse_time_offset("-1d") == -86400
    assert parse_time_offset("+2h") == 7200
    assert parse_time_offset("30min") == 1800  # leading digit = plus
    assert parse_time_offset("-1d2h") == -(86400 + 7200)  # sign distributes
    assert parse_time_offset("1w") == 7 * 86400
    assert parse_time_offset("2mon") == 60 * 86400
    assert parse_time_offset("1y") == 365 * 86400
    with pytest.raises(ValueError):
        parse_time_offset("-1m")  # bare 'm' ambiguous — graphite rejects
    with pytest.raises(ValueError):
        parse_time_offset("-1")  # missing unit


def test_epoch_and_absolute_forms_need_no_now():
    assert parse_at_time(1704067200) == 1704067200
    assert parse_at_time("1704067200") == 1704067200
    assert parse_at_time("20240115") == _utc(2024, 1, 15)
    assert parse_at_time("17:00_20240115") == _utc(2024, 1, 15, 17, 0)
    assert parse_at_time("01/15/2024") == _utc(2024, 1, 15)
    assert parse_at_time("01/15/24") == _utc(2024, 1, 15)
    assert parse_at_time("01/15/99") == _utc(1999, 1, 15)
    # graphite's pivot is year+=1900 then <1970 → +100, so the boundary
    # sits at 70, NOT strptime's %y pivot at 69 (ADVICE r8): 69 → 2069
    assert parse_at_time("06/15/69") == _utc(2069, 6, 15)
    assert parse_at_time("06/15/70") == _utc(1970, 6, 15)


def test_relative_forms():
    assert parse_at_time("now", NOW) == NOW
    assert parse_at_time("-1d", NOW) == NOW - 86400
    assert parse_at_time("now-30min", NOW) == NOW - 1800
    assert parse_at_time("now+2h", NOW) == NOW + 7200
    assert parse_at_time("-1d2h", NOW) == NOW - 93600
    # YYYYMMDD reference composes with an offset
    assert parse_at_time("20240115-1d", NOW) == _utc(2024, 1, 14)


def test_day_and_time_of_day_references():
    assert parse_at_time("midnight", NOW) == _utc(2024, 1, 18)
    assert parse_at_time("noon", NOW) == _utc(2024, 1, 18, 12)
    assert parse_at_time("teatime", NOW) == _utc(2024, 1, 18, 16)
    assert parse_at_time("today", NOW) == _utc(2024, 1, 18)
    assert parse_at_time("yesterday", NOW) == _utc(2024, 1, 17)
    assert parse_at_time("tomorrow", NOW) == _utc(2024, 1, 19)
    assert parse_at_time("noon_yesterday", NOW) == _utc(2024, 1, 17, 12)
    assert parse_at_time("17:00", NOW) == _utc(2024, 1, 18, 17)
    assert parse_at_time("8:30pm", NOW) == _utc(2024, 1, 18, 20, 30)
    assert parse_at_time("8:30am", NOW) == _utc(2024, 1, 18, 8, 30)
    # graphite quirk, transcribed: (12+12)%24 == 0
    assert parse_at_time("12:00pm", NOW) == _utc(2024, 1, 18)
    # most recent weekday; NOW is a Thursday
    assert parse_at_time("monday", NOW) == _utc(2024, 1, 15)
    assert parse_at_time("thursday", NOW) == _utc(2024, 1, 18)
    assert parse_at_time("friday", NOW) == _utc(2024, 1, 12)
    assert parse_at_time("january8", NOW) == _utc(2024, 1, 8)
    assert parse_at_time("midnight_tomorrow-1s", NOW) == (
        _utc(2024, 1, 19) - 1
    )


def test_relative_without_now_raises_with_clear_message():
    for s in ("now", "-1d", "midnight", "monday", "17:00"):
        with pytest.raises(ValueError, match="now_ts"):
            parse_at_time(s)
    with pytest.raises(ValueError):
        parse_at_time("gibberish", NOW)
    with pytest.raises(ValueError):
        parse_at_time("", NOW)


def test_offset_identity_property():
    # parse(ref+off) == parse(ref) + off for 200 random (ref, off) pairs
    import random

    rng = random.Random(99)
    refs = ["now", "midnight", "yesterday", "20240115", "noon"]
    for _ in range(200):
        ref = rng.choice(refs)
        n = rng.randint(1, 500)
        unit, secs = rng.choice(
            [("s", 1), ("min", 60), ("h", 3600), ("d", 86400),
             ("w", 7 * 86400), ("mon", 30 * 86400), ("y", 365 * 86400)]
        )
        sign = rng.choice(["-", "+"])
        got = parse_at_time(f"{ref}{sign}{n}{unit}", NOW)
        want = parse_at_time(ref, NOW) + (1 if sign == "+" else -1) * n * secs
        assert got == want, f"{ref}{sign}{n}{unit}"


def test_engine_accepts_attime_strings(spark, tmp_path):
    """fetch/render/render_many with graphite from/until strings equal
    their integer-window twins (now injected — never the wall clock)."""
    from tests.test_api import _engine, _points
    from pyspark.sql import functions as F

    eng = _engine(spark, tmp_path)
    pts = _points(spark)
    eng.write(pts)
    es = F.unix_timestamp("ts").cast("long")
    hi = pts.agg(F.max(es)).collect()[0][0] + 1

    ints = eng.fetch("view", hi - 7 * 86400, hi, now_ts=hi).collect()
    strs = eng.fetch("view", "-7d", "now", now_ts=hi).collect()
    assert sorted(ints) == sorted(strs) and len(ints) > 0

    r_int = eng.render("scale(view, 2)", hi - 86400, hi, now_ts=hi).collect()
    r_str = eng.render("scale(view, 2)", "-1d", "now", now_ts=hi).collect()
    assert sorted(r_int) == sorted(r_str) and len(r_int) > 0

    m = eng.render_many(["view"], "-1d", "now", now_ts=hi).collect()
    assert sorted(r.bucket_ts for r in m) == sorted(
        r.bucket_ts for r in r_int
    )

    with pytest.raises(ValueError, match="now_ts"):
        eng.fetch("view", "-7d", "now")
