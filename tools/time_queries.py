#!/usr/bin/env python3
"""Time a subset of registry queries: min of N reps each, noop sink.

Usage: python tools/time_queries.py [-n REPS] name [name ...]
Prints one JSON line {name: min_sec}. Same methodology as bench.py
(clearCache between reps, full noop execution) but scoped to the named
queries so an A/B of one change is not drowned by 29-query session noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    from kenshin_backup_spark import queries as registry
    from kenshin_backup_spark.session import get_spark

    spark = get_spark("kenshin-time")
    qs = registry.queries()
    from kenshin_backup_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:
            pass
    warm = "/root/testdata/sf0.001"
    for name in args:
        try:
            qs[name](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    out = {}
    for name in args:
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(ts), "all": ts}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
