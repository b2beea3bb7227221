"""Bind-level type gate for every DuckDB oracle (round-7 guard).

Round 6 burned a driver-window slot on ``tsdb_changepoint_cusum``: both
engines produced cell-identical values, but DuckDB widened a windowed
``SUM(BIGINT)`` to HUGEINT so the driver's value hash (which serializes
typed cells) mismatched. The registry's own contract
(``queries/__init__.py``) is that every oracle emits only
STRING/BIGINT/DOUBLE columns; this test enforces it *statically* by
binding each oracle SQL in DuckDB (``DESCRIBE`` — plan-only, no
execution) over the sf0.001 views and asserting every output column is
VARCHAR, BIGINT, or DOUBLE.

This is the sibling of
``test_driver_window_slots_are_all_hashable`` (the r5 no-oracle guard):
both make a harness-contract violation impossible to reintroduce.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.harness import duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

ALLOWED = {"VARCHAR", "BIGINT", "DOUBLE"}


def test_all_oracles_bind_to_contract_types():
    from kenshin_backup_spark import queries as registry

    osql = registry.oracle_sql()
    con = duck_connect(SF_DIR)
    offenders = []
    for name, sql in osql.items():
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except duckdb.Error as e:  # pragma: no cover - bind failure is its own bug
            offenders.append((name, "<bind error>", str(e)[:120]))
            continue
        for col, ctype, *_ in desc:
            if ctype not in ALLOWED:
                offenders.append((name, col, ctype))
    assert offenders == [], (
        "oracle columns outside the VARCHAR/BIGINT/DOUBLE contract "
        f"(driver value-hash will mismatch on width): {offenders}"
    )
