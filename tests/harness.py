"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares row-count + schema + order-insensitive value hash
(``__spark_entry__.py`` contract). This harness is intentionally *stricter*:
exact cell-level equality after canonical normalization, so anything that
passes here passes any reasonable hash.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(spark, name, fn, sql, sf_dir) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    res = con.sql(sql)
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return CompareResult(name, False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        return CompareResult(name, False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mismatches = []
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            # tolerate nothing, but report the first few diffs usefully
            mismatches.append((i, ra, rb))
            if len(mismatches) >= 3:
                break
    if mismatches:
        detail = "; ".join(
            f"row {i}: spark={ra} duck={rb}" for i, ra, rb in mismatches
        )
        return CompareResult(name, False, f"value mismatch: {detail}")
    return CompareResult(name, True, f"{len(spark_rows)} rows exact-match")
