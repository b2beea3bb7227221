"""Batch sources for the driver testdata tables (TESTDATA.md / FIXTURES.md).

Streaming sources live in :mod:`kenshin_backup_spark.streaming`.
"""

from kenshin_backup_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
