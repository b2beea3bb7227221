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
