"""Physical-plan inspection utilities.

These parse ``df._jdf.queryExecution().explainString(...)`` output — the
same text ``df.explain("formatted")`` prints — into checkable facts:

- :func:`pushed_filters` — predicates that reached the parquet scan
  (``PushedFilters: [...]``); an empty list on a filtered scan means the
  filter is being evaluated post-scan (a 100 TB regression).
- :func:`scan_read_schema` — columns actually read (``ReadSchema``);
  verifies column pruning.
- :func:`has_broadcast_join` — a ``BroadcastHashJoin`` is present
  (dims must never sort-merge).
- :func:`wholestage_codegen_spans` — count of WholeStageCodegen subtrees;
  expressions falling out of codegen (UDFs in the hot path) show up here.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def without_aqe(spark: SparkSession):
    """AQE wraps plans in AdaptiveSparkPlan(isFinalPlan=false), hiding
    codegen/join-strategy detail until runtime; disable it while *building*
    a plan whose static shape is under test."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            # split on commas OUTSIDE parens: "EqualTo(a,b), IsNotNull(a)"
            out.extend(p.strip() for p in re.split(r",\s*(?![^()]*\))", body))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen subtrees (build the df under
    :func:`without_aqe` for a static answer)."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    if m:
        return int(m.group(1))
    return len(re.findall(r"WholeStageCodegen", explain_str(df, "simple")))
