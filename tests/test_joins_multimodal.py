"""Unit tests for as-of / range joins (J5/J6) and multimodal plumbing (X4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kenshin_backup_spark.operators.joins import asof_join, range_join_bucketed
from kenshin_backup_spark.operators.multimodal import (
    decode_stub,
    frame_sample_stub,
    with_binary_payload,
)

UTC = dt.timezone.utc


def _ts(t):
    return dt.datetime.fromtimestamp(t, UTC)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(100)), (2, "u1", _ts(200)), (3, "u2", _ts(50))],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(90), 9.0), ("u1", _ts(150), 15.0), ("u2", _ts(60), 6.0)],
        "user string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["user"], value_cols=["v"])
    got = {r["id"]: (r["v_asof"], r["ts_asof_ts"]) for r in out.collect()}
    assert got[1] == (9.0, 90)     # 90 <= 100
    assert got[2] == (15.0, 150)   # most recent before 200
    assert got[3] == (None, None)  # nothing at-or-before 50


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, "u", _ts(100))], "id long, user string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(100), 7.0)], "user string, ts timestamp, v double")
    out = asof_join(left, right, on=["user"], value_cols=["v"]).collect()
    assert out[0]["v_asof"] == 7.0


def test_asof_join_null_value_from_matched_row(spark):
    """A right row with a NULL value IS the match (pandas merge_asof
    semantics): the attached value must be that row's NULL, not an older
    non-null value, and ts/value must come from the same matched row."""
    left = spark.createDataFrame(
        [(1, "u", _ts(200))], "id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(90), 9.0), ("u", _ts(150), None)],
        "user string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["user"], value_cols=["v"]).collect()
    assert out[0]["v_asof"] is None
    assert out[0]["ts_asof_ts"] == 150


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, "u", _ts(100))], "id long, user string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(90), 9.0), ("u", _ts(110), 11.0)], "user string, ts timestamp, v double"
    )
    out = asof_join(left, right, on=["user"], value_cols=["v"], direction="forward").collect()
    assert out[0]["v_asof"] == 11.0


def test_range_join_bucketed(spark):
    left = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], "id long, x long")
    right = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 20), ("c", 14, 30)], "tag string, lo long, hi long"
    )
    out = range_join_bucketed(
        left,
        right,
        left_point=F.col("x"),
        right_lo=F.col("lo"),
        right_hi=F.col("hi"),
        bucket_width=8,
    )
    got = sorted((r["id"], r["tag"]) for r in out.collect())
    assert got == [(1, "a"), (2, "b"), (2, "c"), (3, "c")]


def test_multimodal_payload_and_decode(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "x" * 700)], "doc_id long, text string")
    d = with_binary_payload(docs)
    meta = {r["doc_id"]: r["media_meta"]["n_bytes"] for r in d.collect()}
    assert meta == {1: 11, 2: 700}

    feats = {r["doc_id"]: r for r in decode_stub(d).collect()}
    assert feats[1]["width"] == 64 + (11 % 577)
    assert feats[2]["n_frames"] == 1 + (700 % 7)
    assert len(feats[1]["feature"]) == 4

    frames = frame_sample_stub(d, every=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc[1] == sorted(by_doc[1])
    assert all(i % 2 == 0 for i in by_doc[1])
