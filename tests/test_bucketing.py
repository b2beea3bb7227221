"""Bucketing layout test: a fact-fact join over co-bucketed tables must
plan WITHOUT a shuffle exchange (the 100 TB layout claim in SCALE.md)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kenshin_backup_spark.plans import explain_str, without_aqe
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.bucketed import bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_eliminates_shuffle(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "li_b", key="l_orderkey", buckets=8)
    write_bucketed(orders, "ord_b", key="o_orderkey", buckets=8)

    j = bucketed_join(spark, "li_b", "ord_b", ("l_orderkey", "o_orderkey"))
    # disable auto-broadcast: at test scale Catalyst would broadcast the
    # 1.5k-row side and skip bucketing entirely; at 100 TB both sides are
    # far beyond any broadcast threshold and this is the operative plan.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with without_aqe(spark):
            text = explain_str(j, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in text
    assert "Exchange hashpartitioning" not in text, (
        f"bucketed join still shuffles:\n{text}"
    )

    # and the result is the same as the plain join
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert j.count() == plain


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain scans plans a shuffle exchange."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with without_aqe(spark):
            text = explain_str(j, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange hashpartitioning" in text
