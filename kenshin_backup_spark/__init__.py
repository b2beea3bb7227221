"""kenshin_backup_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference TSDB (zzl0/Kenshin-backup,
a Graphite-compatible time-series database; see SURVEY.md).

Architecture: idiomatic Spark. DataFrame/SQL logical plans optimized by
Catalyst; Structured Streaming for the ingest path; zero custom Catalyst
rules (SURVEY.md §4.2); Pandas UDFs only where built-ins genuinely cannot
express the semantics (multimodal decode plumbing).

Layout
------
- ``session``    : SparkSession builder + per-session tuning knobs
- ``sources``    : batch/stream loaders for the driver testdata tables
- ``functions``  : deterministic numeric helpers, vector math, text exprs
- ``operators``  : rollup ladder, fetch API, dedup, similarity, text, joins
- ``streaming``  : Graphite-protocol line parsing, streaming rollups, sinks
- ``plans``      : plan-inspection helpers (pushdown / broadcast assertions)
- ``queries``    : the driver-facing registry (queries + DuckDB oracle SQL)

Provenance note: the reference mount ``/root/reference/`` contained zero
files at survey time (SURVEY.md §0); reference behavior cited here comes
from public knowledge of douban/Kenshin, tagged in SURVEY.md.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps ``import kenshin_backup_spark`` free of a
    pyspark import cost until an attribute is touched)."""
    api = {
        "Engine": ("kenshin_backup_spark.api", "Engine"),
        "get_spark": ("kenshin_backup_spark.session", "get_spark"),
        "tune": ("kenshin_backup_spark.session", "tune"),
        "load_table": ("kenshin_backup_spark.sources", "load_table"),
        "rollup_partials": ("kenshin_backup_spark.operators.rollup", "rollup_partials"),
        "cascade": ("kenshin_backup_spark.operators.rollup", "cascade"),
        "finalize": ("kenshin_backup_spark.operators.rollup", "finalize"),
        "fetch": ("kenshin_backup_spark.operators.fetch", "fetch"),
        "Archive": ("kenshin_backup_spark.operators.fetch", "Archive"),
        "Ladder": ("kenshin_backup_spark.operators.ladder", "Ladder"),
        "build_ladder": ("kenshin_backup_spark.operators.ladder", "build_ladder"),
        "fetch_from_ladder": ("kenshin_backup_spark.operators.ladder", "fetch_from_ladder"),
        "asof_join": ("kenshin_backup_spark.operators.joins", "asof_join"),
        "Policy": ("kenshin_backup_spark.operators.policies", "Policy"),
        "assign_policy": ("kenshin_backup_spark.operators.policies", "assign_policy"),
    }
    if name in api:
        import importlib

        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
