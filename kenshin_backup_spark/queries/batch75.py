"""Batch-75 query (round 8): the oracle-checkable LTTB downsampler.

``tsdb_downsample_lttb_exact`` upgrades Largest-Triangle-Three-Buckets
(the standard dashboard downsampler, SURVEY §2.9 / W4-adjacent) from
rows-only evidence to a full rows+schema+hash driver certification.
The float variant (``tsdb_downsample_lttb``, batch41) stays rows-only
because its triangle areas are float expressions whose greedy argmax
has no cross-engine guarantee; this twin restates the ALGORITHM over
exact integers so the sequential greedy trace is reproducible in SQL:

- Bucket boundaries use INTEGER arithmetic: for point indices
  ``1..n-2`` split into ``n_out-2`` buckets, bucket ``s`` spans
  ``[(s·(n−2)) div (n_out−2) + 1, ((s+1)·(n−2)) div (n_out−2) + 1)``
  (clamped to ``n−1``) — no float ratio, so both engines agree on every
  boundary. When ``n > n_out`` every bucket is provably non-empty.
- Point values are the quantized bucket means ``vq = sq div cnt``
  (``sq = Σ floor(value·1e6)`` — non-negative by the data contract, so
  floor-vs-truncate division semantics cannot diverge).
- The triangle-area argmax compares
  ``N_j = (a_ts·c − T)·(vq_j − a_vq) − (a_ts − ts_j)·(Q − a_vq·c)``
  where ``(T, Q, c)`` are the next bucket's exact integer sums — the
  usual ``avg`` divided out by cross-multiplying with ``c``, keeping
  every term BIGINT (|N| < 1e17 at these magnitudes). Max ``|N_j|``,
  ties → earliest point: a total order both engines compute identically.

The Spark side runs the greedy per series inside ``applyInPandas`` (the
batch41 bounded-series argument: a series' retention bounds its length
by definition — here ≤ ~720 hourly points). The DuckDB oracle replays
the same greedy with a RECURSIVE CTE: the per-step argmax is a
row_number window in the recursive term, the next-bucket sums are
precomputed per (series, step), and the recursion runs lockstep for
all series with ``n > n_out`` (58 steps at n_out=60).

Scale notes (100 TB): the hourly pre-aggregation is the only shuffle
of raw data; the greedy then touches one row per (series, hour) —
``applyInPandas`` groups by series key, so parallelism is the series
count and per-task memory is the bounded series length. The recursion
exists only on the oracle side; Spark never iterates.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

_N_OUT = 60
_D = _N_OUT - 2
_SLOT_S = 3600


def _lttb_exact_indices(ts: list[int], vq: list[int], n_out: int = _N_OUT) -> list[int]:
    """Greedy LTTB over exact integers (see module docstring); returns
    the picked point indices. Pure-Python ints — no numpy float paths."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    m, d = n - 2, n_out - 2
    picked, a = [0], 0
    for s in range(d):
        lo = (s * m) // d + 1
        hi = min(((s + 1) * m) // d + 1, n - 1)
        nlo, nhi = hi, min(((s + 2) * m) // d + 1, n)
        t_sum = sum(ts[nlo:nhi])
        q_sum = sum(vq[nlo:nhi])
        c = nhi - nlo
        at, aq = ts[a], vq[a]
        best, bkey = lo, None
        for j in range(lo, hi):
            nj = (at * c - t_sum) * (vq[j] - aq) - (at - ts[j]) * (q_sum - aq * c)
            key = (-abs(nj), j)
            if bkey is None or key < bkey:
                best, bkey = j, key
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def tsdb_downsample_lttb_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean series → 60 LTTB-selected points per metric, with the
    exact-integer greedy (oracle-checkable twin of batch41's float LTTB)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            "event_type",
            ((es / _SLOT_S).cast("long") * _SLOT_S).alias("bucket_ts"),
            "value",
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("sq"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )

    def _pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        ts = [int(x) for x in pdf["bucket_ts"]]
        vq = [int(s) // int(c) for s, c in zip(pdf["sq"], pdf["cnt"])]
        out = pdf.iloc[_lttb_exact_indices(ts, vq)]
        return pd.DataFrame(
            {
                "event_type": out["event_type"],
                "ts": out["bucket_ts"].astype("int64"),
                # mirror the oracle's division order exactly:
                # (sq as double / 1e6) / cnt
                "value": (out["sq"].astype("float64") / 1_000_000.0)
                / out["cnt"].astype("int64"),
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        _pick, "event_type string, ts long, value double"
    )


_LTTB_SQL = f"""
WITH RECURSIVE
hourly AS (
  SELECT event_type, ({_ES}//{_SLOT_S})*{_SLOT_S} AS bucket_ts,
         SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS sq, COUNT(*) AS cnt
  FROM events GROUP BY 1,2
),
pts AS (
  SELECT event_type, bucket_ts, sq, cnt, sq // cnt AS vq,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1 AS i
  FROM hourly
),
ser AS (SELECT event_type, COUNT(*) AS n FROM pts GROUP BY 1),
steps AS (SELECT CAST(range AS BIGINT) AS s FROM range({_D})),
-- next-bucket exact sums per (series, step): the avg with the division
-- cross-multiplied out
nb AS (
  SELECT p.event_type, st.s,
         SUM(p.bucket_ts) AS t_sum, SUM(p.vq) AS q_sum, COUNT(*) AS c
  FROM ser sr
  JOIN steps st ON sr.n > {_N_OUT}
  JOIN pts p ON p.event_type = sr.event_type
   AND p.i >= LEAST(((st.s+1)*(sr.n-2))//{_D} + 1, sr.n-1)
   AND p.i <  LEAST(((st.s+2)*(sr.n-2))//{_D} + 1, sr.n)
  GROUP BY 1,2
),
-- lockstep greedy: state = (series, step, anchor); the per-step argmax
-- is the row_number window in the recursive term, ties -> earliest i
rec AS (
  SELECT p.event_type, CAST(0 AS BIGINT) AS s,
         p.i AS a_i, p.bucket_ts AS a_ts, p.vq AS a_vq
  FROM pts p JOIN ser sr ON sr.event_type = p.event_type AND sr.n > {_N_OUT}
  WHERE p.i = 0
  UNION ALL
  SELECT event_type, s + 1, pick_i, pick_ts, pick_vq FROM (
    SELECT r.event_type, r.s, p.i AS pick_i,
           p.bucket_ts AS pick_ts, p.vq AS pick_vq,
           ROW_NUMBER() OVER (
             PARTITION BY r.event_type
             ORDER BY ABS((r.a_ts*nb.c - nb.t_sum)*(p.vq - r.a_vq)
                          - (r.a_ts - p.bucket_ts)*(nb.q_sum - r.a_vq*nb.c)) DESC,
                      p.i ASC
           ) AS rn
    FROM rec r
    JOIN ser sr ON sr.event_type = r.event_type
    JOIN nb ON nb.event_type = r.event_type AND nb.s = r.s
    JOIN pts p ON p.event_type = r.event_type
      AND p.i >= (r.s*(sr.n-2))//{_D} + 1
      AND p.i <  LEAST(((r.s+1)*(sr.n-2))//{_D} + 1, sr.n-1)
    WHERE r.s < {_D}
  ) WHERE rn = 1
),
picks AS (
  SELECT event_type, a_i AS i FROM rec WHERE s >= 1
  UNION ALL SELECT event_type, 0 FROM ser WHERE n > {_N_OUT}
  UNION ALL SELECT event_type, n - 1 FROM ser WHERE n > {_N_OUT}
  UNION ALL
  SELECT p.event_type, p.i
  FROM pts p JOIN ser sr ON sr.event_type = p.event_type AND sr.n <= {_N_OUT}
)
SELECT p.event_type, p.bucket_ts AS ts,
       CAST((CAST(p.sq AS DOUBLE) / 1000000.0) / p.cnt AS DOUBLE) AS value
FROM picks k JOIN pts p ON p.event_type = k.event_type AND p.i = k.i
"""


QUERIES = {
    "tsdb_downsample_lttb_exact": tsdb_downsample_lttb_exact,
}

ORACLE = {
    "tsdb_downsample_lttb_exact": _LTTB_SQL,
}
