"""Tracked operator-level caching.

Operators persist frames that feed both sides of a self-join (LSH
signatures, posting lists, rollup partials). A long-lived harness session
running the full ~200-query registry would otherwise accumulate every
query's caches until they evict each other, so ALL operator persists route
through :func:`persist_tracked` and the registry clears the previous
query's caches when the next query is built
(``kenshin_backup_spark.queries.queries()`` wraps every callable with
:func:`clear_tracked`). Unpersisting is never a correctness concern — a
cleared frame silently recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and remember it for :func:`clear_tracked`. Chainable
    as ``df.transform(persist_tracked)`` anywhere ``.persist()`` fits."""
    _TRACKED.append(df.persist())
    return df


def clear_tracked() -> None:
    """Unpersist every frame persisted via :func:`persist_tracked`."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
