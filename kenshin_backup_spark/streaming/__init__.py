"""Structured Streaming ingest path (SURVEY.md §2.7, §3.1)."""

from kenshin_backup_spark.streaming.ingest import (
    parse_graphite_lines,
    run_stream_to_memory,
    streaming_rollup,
)

__all__ = ["parse_graphite_lines", "run_stream_to_memory", "streaming_rollup"]
