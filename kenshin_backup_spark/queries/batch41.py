"""Batch-41 queries (round 4): LTTB visualization downsampling, MMR
diversified reranking, and quality-weighted deterministic sampling.

- ``tsdb_downsample_lttb`` — Largest-Triangle-Three-Buckets, the standard
  dashboard downsampler (keeps the visually-dominant point per bucket).
  The selection is sequentially dependent (each bucket's pick forms the
  triangle anchor for the next), so it runs per-series inside
  ``applyInPandas`` — the same bounded-series argument as the stateful
  streaming operators: a series' retention bounds its length by
  definition. Rows-only (sequential greedy has no SQL oracle); pinned by
  property tests instead (endpoint anchoring, monotone output,
  output ⊆ input, exact bucket count).
- ``emb_mmr_rerank`` — maximal-marginal-relevance rerank of the exact
  cosine top-20 into a diversified top-5 (λ = 0.7). Greedy and
  sequentially dependent like LTTB, but per-query state is ≤ 20
  candidates — trivially bounded. All similarities derive from the house
  quantized integer dot products and every float op is IEEE-identical
  across engines, so since round 8 the greedy trace is replayed
  bit-for-bit by a recursive-CTE DuckDB oracle (``_MMR_SQL``); property
  tests additionally pin rank-1 = cosine top-1 and diversity ≤ plain
  top-5.
- ``llm_quality_weighted_sample`` — sampling proportional to a quality
  score with NO randomness: keep a doc iff
  ``md5(doc_id) mod 1e6 < floor(weight·1e6)`` — the hash plays the
  uniform variate, so the sample is reproducible in any engine (fully
  oracle-checked) and stable under corpus growth. This is how a 100 TB
  curation pipeline takes a quality-weighted subsample without a seed
  file: one scan, zero shuffle before the summary aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import md5_hash60, normalize_text
from kenshin_backup_spark.operators.similarity import cosine_topk, qdot, quantize_vec
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

# --- LTTB -------------------------------------------------------------------

_LTTB_OUT = 60
_SLOT_S = 3600


def _lttb(ts, vs, n_out: int):
    """Classic LTTB over parallel lists; ties → earliest point."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    # n_out buckets: first and last are the endpoints
    picked = [0]
    bucket = (n - 2) / (n_out - 2)
    a = 0
    for i in range(n_out - 2):
        start = int(i * bucket) + 1
        end = min(int((i + 1) * bucket) + 1, n - 1)
        nxt_start = end
        nxt_end = min(int((i + 2) * bucket) + 1, n)
        if nxt_end > nxt_start:
            avg_t = sum(ts[nxt_start:nxt_end]) / (nxt_end - nxt_start)
            avg_v = sum(vs[nxt_start:nxt_end]) / (nxt_end - nxt_start)
        else:
            avg_t, avg_v = ts[n - 1], vs[n - 1]
        at, av = ts[a], vs[a]
        best, best_area = start, -1.0
        for j in range(start, end):
            area = abs(
                (at - avg_t) * (vs[j] - av) - (at - ts[j]) * (avg_v - av)
            )
            if area > best_area:
                best, best_area = j, area
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def tsdb_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean series → 60 LTTB-selected points per metric."""
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
            (
                (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
                / F.count("value")
            )
            .cast("double")
            .alias("v")
        )
    )

    def _pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        idx = _lttb(pdf["bucket_ts"].tolist(), pdf["v"].tolist(), _LTTB_OUT)
        out = pdf.iloc[idx]
        return pd.DataFrame(
            {
                "event_type": out["event_type"],
                "ts": out["bucket_ts"].astype("int64"),
                "value": out["v"],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        _pick, "event_type string, ts long, value double"
    )


# --- MMR rerank -------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CAND = 20
_MMR_K = 5
_MMR_QUERIES = 10


def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-5 per query from the exact cosine top-20 via greedy
    MMR: pick argmax λ·rel − (1−λ)·max-sim-to-selected; ties → lower id.

    The candidate pairwise similarities are computed inside the per-query
    pandas group from the quantized integer vectors (≤ 20 candidates —
    bounded state). Relevance and inter-candidate cosine share the same
    quantization, so the greedy trace is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _MMR_QUERIES)
    base = cosine_topk(queries, emb, k=_MMR_CAND)
    qv = emb.select(
        F.col("vec_id").alias("cand_id"),
        quantize_vec("embedding").alias("qvec"),
    ).withColumn("qn", qdot(F.col("qvec"), F.col("qvec")))
    cand = base.join(qv, base.neighbor_id == qv.cand_id).select(
        base.query_id, base.neighbor_id, base.cosine, "qvec", "qn"
    )

    def _rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        vecs = np.array(pdf["qvec"].tolist(), dtype="float64")
        norms = np.sqrt(pdf["qn"].to_numpy(dtype="float64"))
        rel = pdf["cosine"].to_numpy()
        n = len(pdf)
        sims = (vecs @ vecs.T) / np.outer(norms, norms)
        selected: list[int] = []
        rows = []
        while len(selected) < min(_MMR_K, n):
            best_i, best_score = -1, None
            for i in range(n):
                if i in selected:
                    continue
                div = max((sims[i][j] for j in selected), default=0.0)
                score = _MMR_LAMBDA * rel[i] - (1.0 - _MMR_LAMBDA) * div
                if best_score is None or score > best_score:
                    best_i, best_score = i, score
            selected.append(best_i)
            rows.append(
                (
                    int(pdf["query_id"].iloc[best_i]),
                    len(selected),
                    int(pdf["neighbor_id"].iloc[best_i]),
                    float(rel[best_i]),
                    float(best_score),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["query_id", "rank", "neighbor_id", "relevance", "mmr_score"],
        )

    return cand.groupBy("query_id").applyInPandas(
        _rerank,
        "query_id long, rank long, neighbor_id long, relevance double, mmr_score double",
    )


#: The λ literals are CAST(… AS DOUBLE) — DuckDB parses bare ``0.7`` as
#: DECIMAL, and decimal ``1.0 - 0.7`` converts to the double 0.299999…,
#: one ulp away from Python's ``1.0 - 0.7`` (0.30000000000000004). The
#: relevance denominator is ``sqrt(a·b)`` (mirroring ``cosine_topk``)
#: while the pairwise-sim denominator is ``sqrt(a)·sqrt(b)`` (mirroring
#: the pandas ``np.outer(norms, norms)``) — the two are NOT the same
#: double, and each side of the harness must use its own.
_MMR_SQL = f"""
WITH RECURSIVE
q0 AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
q AS (
  SELECT id, v, list_dot_product(v, v) AS n2
  FROM q0 WHERE list_dot_product(v, v) > 0
),
scored AS (
  SELECT qa.id AS query_id, qb.id AS neighbor_id,
         CAST(list_dot_product(qa.v, qb.v)
              / sqrt(CAST(qa.n2 AS DOUBLE) * CAST(qb.n2 AS DOUBLE))
              AS DOUBLE) AS rel
  FROM q qa JOIN q qb ON qa.id < {_MMR_QUERIES} AND qa.id != qb.id
),
top20 AS (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rel DESC, neighbor_id
             ) AS rn
    FROM scored
  ) WHERE rn <= {_MMR_CAND}
),
pairsim AS (
  SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
         list_dot_product(va.v, vb.v)
           / (sqrt(CAST(va.n2 AS DOUBLE)) * sqrt(CAST(vb.n2 AS DOUBLE))) AS sim
  FROM top20 a
  JOIN top20 b ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
  JOIN q va ON va.id = a.neighbor_id
  JOIN q vb ON vb.id = b.neighbor_id
),
-- lockstep greedy: state = (query, rank, selected list); the per-step
-- argmax is the row_number window in the recursive term, ties -> lower id
rec AS (
  SELECT query_id, CAST(1 AS BIGINT) AS rank, neighbor_id,
         rel AS relevance,
         CAST({_MMR_LAMBDA} AS DOUBLE) * rel
           - (CAST(1.0 AS DOUBLE) - CAST({_MMR_LAMBDA} AS DOUBLE))
             * CAST(0.0 AS DOUBLE) AS mmr_score,
         [neighbor_id] AS sel
  FROM (
    SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rel DESC, neighbor_id
             ) AS rn
    FROM top20
  ) WHERE rn = 1
  UNION ALL
  SELECT query_id, rank + 1, pick, pick_rel, pick_score,
         list_append(sel, pick)
  FROM (
    SELECT r.query_id, r.rank, r.sel, c.neighbor_id AS pick,
           c.rel AS pick_rel,
           CAST({_MMR_LAMBDA} AS DOUBLE) * c.rel
             - (CAST(1.0 AS DOUBLE) - CAST({_MMR_LAMBDA} AS DOUBLE))
               * MAX(p.sim) AS pick_score,
           ROW_NUMBER() OVER (
             PARTITION BY r.query_id
             ORDER BY CAST({_MMR_LAMBDA} AS DOUBLE) * c.rel
                        - (CAST(1.0 AS DOUBLE) - CAST({_MMR_LAMBDA} AS DOUBLE))
                          * MAX(p.sim) DESC,
                      c.neighbor_id
           ) AS rn
    FROM rec r
    JOIN top20 c
      ON c.query_id = r.query_id AND NOT list_contains(r.sel, c.neighbor_id)
    JOIN pairsim p
      ON p.query_id = r.query_id AND p.ida = c.neighbor_id
     AND list_contains(r.sel, p.idb)
    WHERE r.rank < {_MMR_K}
    GROUP BY r.query_id, r.rank, r.sel, c.neighbor_id, c.rel
  ) WHERE rn = 1
)
SELECT query_id, rank, neighbor_id, relevance, mmr_score FROM rec
"""


# --- quality-weighted deterministic sampling --------------------------------


def llm_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each document with probability ∝ quality, with the md5 hash as
    the uniform variate (reproducible, seedless, engine-independent).

    weight = min(1, n_words / 200) — longer docs are likelier kept; keep
    iff ``md5(doc_id) mod 1e6 < floor(weight·1e6)``. Reports per-language
    totals so the oracle certifies the exact kept set."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    n_words = F.size(F.filter(F.split(normalize_text("text"), " "), lambda x: x != ""))
    weight = F.least(F.lit(1.0), n_words.cast("double") / F.lit(200.0))
    variate = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(1000000))
    kept = (variate < F.floor(weight * F.lit(1000000.0))).cast("int")
    return (
        docs.select("lang", "n_chars", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).cast("long").alias("kept_chars"),
        )
    )


_QWS_SQL = f"""
WITH base AS (
  SELECT lang, n_chars,
         CASE WHEN CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 1000000
                   < CAST(FLOOR(LEAST(CAST(1 AS DOUBLE),
                                      CAST(len(list_filter(
                                        str_split({_NORM.format(x="text")}, ' '),
                                        x -> x <> '')) AS DOUBLE)
                                      / CAST(200 AS DOUBLE)) * CAST(1000000 AS DOUBLE))
                          AS BIGINT)
              THEN 1 ELSE 0 END AS kept
  FROM documents WHERE text IS NOT NULL
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
FROM base GROUP BY 1
"""


QUERIES = {
    "tsdb_downsample_lttb": tsdb_downsample_lttb,
    "emb_mmr_rerank": emb_mmr_rerank,
    "llm_quality_weighted_sample": llm_quality_weighted_sample,
}

ORACLE = {
    # The float LTTB stays rows-only (float triangle areas give the greedy
    # no cross-engine guarantee; see batch75 for the exact-integer twin,
    # which IS oracle-checked). MMR gained a full oracle in round 8: its
    # arithmetic was already exact-mirrorable (integer dots; IEEE-identical
    # score ops), so the recursive CTE below replays the greedy trace
    # bit-for-bit — the λ literals are CAST to DOUBLE because DuckDB parses
    # bare 0.7 as DECIMAL and (1.0 - 0.7) would become a DIFFERENT double
    # constant (0.299999…) than Python's 1.0 - 0.7 (0.30000000000000004).
    "emb_mmr_rerank": _MMR_SQL,
    "llm_quality_weighted_sample": _QWS_SQL,
}
