#!/usr/bin/env python3
"""Exact-cell DuckDB parity for a named subset of registry queries.

Usage: python tools/parity_subset.py [--sf DIR] name [name ...]
Runs tests/harness.compare_query (stricter than the driver hash) for each
named query that has an oracle; rows-only queries are just executed.
Prints PASS/FAIL per query and a summary line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    from kenshin_backup_spark import queries as registry
    from kenshin_backup_spark.session import get_spark
    from tests.harness import compare_query

    spark = get_spark("kenshin-parity")
    qs = registry.queries()
    oracles = registry.oracle_sql()
    fails = []
    for name in args:
        if name not in qs:
            print(f"{name}: UNKNOWN")
            fails.append(name)
            continue
        if name in oracles:
            res = compare_query(spark, name, qs[name], oracles[name], sf_dir)
            print(f"{name}: {'PASS' if res.ok else 'FAIL'} ({res.detail})")
            if not res.ok:
                fails.append(name)
        else:
            try:
                n = len(qs[name](spark, sf_dir).collect())
                print(f"{name}: RAN rows-only ({n} rows)")
            except Exception as e:  # noqa: BLE001
                print(f"{name}: ERROR {e}")
                fails.append(name)
    print(f"SUMMARY: {len(args) - len(fails)}/{len(args)} ok; FAILS: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
