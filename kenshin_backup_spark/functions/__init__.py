"""Scalar/aggregate expression helpers shared by operators and queries."""

from kenshin_backup_spark.functions.deterministic import (
    QUANT,
    epoch_seconds,
    glob_to_regex,
    last_by_ts,
    qavg,
    qsum,
)

__all__ = ["QUANT", "epoch_seconds", "glob_to_regex", "last_by_ts", "qavg", "qsum"]
