"""Batch-14 queries: portable string family 3, Morton (Z-order) keys as a
first-class layout operator, and explicit grouping-id flags.

Z-ordering is the engine's answer to "cluster the 100 TB table for BOTH
metric- and time-local scans": interleaving the bits of the two scan keys
gives one sort key whose ranges stay local in both dimensions. The Morton
code here is pure BIGINT shift/mask arithmetic — identical in Spark and
DuckDB, so even the layout operator is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- string family 3 -------------------------------------------------------

def scalar_string_family3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """translate / lpad / rpad / reverse / ascii / chr / repeat — the
    formatting-and-codec string surface (initcap and overlay excluded:
    absent in DuckDB 1.0)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("p_type", 10, ".").alias("type_padded"),
        F.reverse("p_name").alias("name_rev"),
        F.ascii("p_brand").cast("long").alias("first_byte"),
        F.chr((F.col("p_partkey") % 26) + 65).alias("key_letter"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
    )


_STR3_SQL = """
SELECT p_partkey,
       translate(p_brand, '#', '-') AS brand_dash,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(p_type, 10, '.') AS type_padded,
       reverse(p_name) AS name_rev,
       CAST(ascii(p_brand) AS BIGINT) AS first_byte,
       chr(CAST(p_partkey % 26 + 65 AS INTEGER)) AS key_letter,
       repeat('*', CAST(p_size % 5 AS INTEGER)) AS stars
FROM part
"""


# --- Morton / Z-order layout keys -----------------------------------------

def _spread_bits(x: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value (classic magic-mask
    cascade) — x's bit i moves to bit 2i."""
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (user_id, hour-bucket): the Z-order clustering key a
    100 TB events table sorts by so both per-user and per-time scans stay
    range-local. Emits each event's key plus its 1024-key Z-block — the
    unit a writer would range-partition on."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    u16 = (F.col("user_id") % 65536).cast("long")
    b16 = (((es / 3600).cast("long")) % 65536).cast("long")
    zkey = _spread_bits(u16).bitwiseOR(F.shiftleft(_spread_bits(b16), 1))
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        zkey.alias("zkey"),
        F.shiftright(zkey, 10).alias("zblock"),
    )


def _spread_sql(x: str) -> str:
    s1 = f"(({x}) | (({x}) << 8)) & 16711935"
    s2 = f"(({s1}) | (({s1}) << 4)) & 252645135"
    s3 = f"(({s2}) | (({s2}) << 2)) & 858993459"
    s4 = f"(({s3}) | (({s3}) << 1)) & 1431655765"
    return s4


_Z_U = _spread_sql("user_id % 65536")
_Z_B = _spread_sql(f"(({_ES} // 3600)) % 65536")

_ZORDER_SQL = f"""
SELECT event_id,
       ({_Z_U}) | (({_Z_B}) << 1) AS zkey,
       (({_Z_U}) | (({_Z_B}) << 1)) >> 10 AS zblock
FROM events
"""


# --- explicit grouping-id flags -------------------------------------------

def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube with explicit per-column grouping() flags (the portable form of
    grouping_id — bit order differs between engines, per-column flags
    don't)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gflags"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "gflags",
            "n",
        )
    )


_GROUPFLAGS_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
       COALESCE(l_linestatus, '<all>') AS l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gflags,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


QUERIES = {
    "scalar_string_family3": scalar_string_family3,
    "layout_zorder_key": layout_zorder_key,
    "agg_grouping_flags": agg_grouping_flags,
}

ORACLE = {
    "scalar_string_family3": _STR3_SQL,
    "layout_zorder_key": _ZORDER_SQL,
    "agg_grouping_flags": _GROUPFLAGS_SQL,
}
