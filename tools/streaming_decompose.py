#!/usr/bin/env python3
"""Decompose streaming_rollup_1h's fixed micro-batch costs (VERDICT r15
"Next round" #4): time the equivalent BATCH aggregation, the streaming
run, and the streaming run without the trailing no-data micro-batch
(``spark.sql.streaming.noDataMicroBatches.enabled=false`` — legal for
COMPLETE-mode output, which re-emits all state each batch regardless of
watermark; append-mode sinks NEED the no-data batch to close windows, so
this is probed here, never set globally).

Usage: python tools/streaming_decompose.py [--sf DIR] [--reps N]
Prints one JSON line per phase set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 4
    while args:
        if args[0] == "--sf":
            sf_dir, args = args[1], args[2:]
        elif args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")

    from pyspark.sql import functions as F

    from kenshin_backup_spark.operators.rollup import finalize, rollup_partials
    from kenshin_backup_spark.queries.streaming_q import (
        _events_stream,
        streaming_rollup_1h,
    )
    from kenshin_backup_spark.session import get_spark
    from kenshin_backup_spark.sources import load_table
    from kenshin_backup_spark.streaming.ingest import (
        run_stream_to_memory,
        streaming_rollup,
    )

    spark = get_spark("kenshin-streaming-decompose")
    out: dict[str, list[float]] = {}

    def probe(label, fn):
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = ts

    # (a) the equivalent BATCH rollup — the data-proportional floor
    def batch_equiv():
        ev = load_table(spark, sf_dir, "events")
        rolled = rollup_partials(
            ev, key_cols=["event_type"], step_seconds=3600
        )
        return finalize(rolled)

    probe("batch_equiv", batch_equiv)

    # (b) the full streaming query as benched
    probe("stream_full", lambda: streaming_rollup_1h(spark, sf_dir))

    # (c) streaming without the trailing no-data micro-batch
    def stream_no_ndb():
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        try:
            stream = _events_stream(spark, sf_dir)
            rolled = streaming_rollup(
                stream, key_col="event_type", step_seconds=3600,
                watermark="1 hour",
            )
            got = run_stream_to_memory(spark, rolled, output_mode="complete")
            return finalize(got)
        finally:
            spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")

    probe("stream_no_nodata_batch", stream_no_ndb)

    print(json.dumps({k: {"min": min(v), "all": v} for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
