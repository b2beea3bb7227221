"""Batch-37 queries (round 4): lexical BM25 retrieval, series
autocorrelation / cross-correlation, and a deterministic corpus split.

Four capabilities a training-data platform runs constantly, each expressed
as a scale-safe Spark plan and each fully DuckDB-oracle-checked:

- ``retrieval_bm25_topk`` — classic lexical retrieval over the documents
  corpus: posting-list candidates (the corpus never self-joins), df-capped
  query terms, and a *rational-idf* BM25 score. The house determinism
  convention bans transcendental functions in oracle-checked paths (libm
  ``ln`` may differ between the JVM and DuckDB in the last ulp), so idf is
  the monotone rational surrogate ``(N - df + 0.5)/(df + 0.5)`` instead of
  its log; a deployment that wants textbook BM25 swaps one expression.
  Every per-term contribution is quantized to an integer before the sum,
  so the fused score is bit-identical in any engine.
- ``tsdb_autocorrelation`` — per-metric ACF at lags 1..3 h over the hourly
  mean-value series, computed from exact integer moments (pairwise-complete
  on observed slots; no gap imputation).
- ``tsdb_cross_correlation`` — Pearson correlation between every metric
  pair on shared hourly slots, same integer-moment scheme.
- ``llm_train_test_split`` — the deterministic hash split every training
  pipeline needs: bucket = md5(doc_id) mod 100 → 90/5/5 train/valid/test,
  reproducible in any engine and stable under corpus growth (a new doc
  never moves an old doc's split).

At 100 TB: BM25 shuffles the corpus once on the term key (hash terms to
64-bit at scale, same lever as ``ngram_jaccard_pairs``); the query side is
bounded and broadcast; df-capping the query terms bounds candidate volume
exactly like the Σdf² cap in near-dup. The correlation queries aggregate to
the (metric, slot) grain scan-side first — the self-join input is the
rollup, not the raw fact table. The split is a pure scan-side expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
)
from kenshin_backup_spark.operators.dedup import md5_hash60, normalize_text
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"
_ES = EPOCH_S_SQL.format(x="ts")

# --- BM25 lexical retrieval -------------------------------------------------

_BM25_K1 = 2.2  # k1 + 1 with k1 = 1.2 (folded constant, double-exact literal)
_BM25_TOPK = 10
_BM25_QUERY_TERMS = 20
_N_QUERIES = 10


def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-idf BM25 top-10 per query document (doc_id < 10).

    Plan shape (the inverted-index shape, NOT a corpus self-join):

    1. one scan → (doc_id, term, tf) term frequencies + per-doc length;
    2. df per term (vocabulary-sized aggregate);
    3. query terms = the 20 *rarest* distinct terms of each query doc
       (df-capped: stopword-heavy terms never explode the candidate set —
       the same bounded-candidate-volume lever as the Σdf² near-dup cap);
    4. candidates via a single posting-list equi-join on term;
    5. per-term contribution quantized to 1e-6 and summed as BIGINT
       (order-insensitive, oracle-exact), top-10 per query by score.

    All arithmetic is +,-,*,/ on integer-derived doubles — bit-identical
    across engines (no ``ln``; see module docstring).
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    # dl (per-doc length = Σtf) is size(words) computed scan-side BEFORE the
    # explode and carried through the tf aggregate as max() (constant per
    # doc) — this deletes the old groupBy(doc_id) length pass AND the
    # doc-count-sized lengths join below (which Spark planned as a
    # BROADCAST of the whole doc-length table: scale-hostile).
    # NAME the words array in its own projection before referencing it
    # twice: with the regex pipeline inlined, Catalyst places the post-
    # Generate Project under the explode and re-runs the whole normalize+
    # split per exploded WORD (measured 3×: 2.2 → 6.5 s); on a named column
    # the per-row size() is O(1).
    tf = (
        docs.select(F.col("doc_id"), words.alias("__w"))
        .select(F.col("doc_id"), F.size("__w").alias("dl"), F.explode("__w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .transform(persist_tracked)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = tf.where(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("qid"), "term"
    )
    w_rare = W.partitionBy("qid").orderBy(F.asc("df"), F.asc("term"))
    # broadcast the BOUNDED query-term side, not dfreq — the old build side
    # was the full vocabulary df table (grows with the corpus).
    qsel = (
        dfreq.join(F.broadcast(qterms), "term")
        .withColumn("rn", F.row_number().over(w_rare))
        .where(F.col("rn") <= _BM25_QUERY_TERMS)
        .select("qid", "term", "df")
    )

    # global corpus stats as a broadcast 1-row cross join (house pattern):
    # n_docs = docs with ≥1 word = distinct doc_ids in tf; total_words =
    # Σ dl over docs = Σ tf over tf rows — one aggregate over the persisted
    # tf replaces the old dl-then-stats double pass.
    stats = tf.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("tf").cast("long").alias("total_words"),
    )
    cand = (
        F.broadcast(qsel)
        .join(tf, "term")
        .where(F.col("doc_id") != F.col("qid"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("total_words").cast("double") / F.col("n_docs").cast("double"),
        )
    )
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tfpart = (F.col("tf").cast("double") * F.lit(_BM25_K1)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib_q = F.floor((idf * tfpart) * F.lit(1000000.0)).cast("long")
    scored = (
        cand.select("qid", "doc_id", contrib_q.alias("cq"))
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.sum("cq").alias("sq"),
        )
    )
    w_rank = W.partitionBy("qid").orderBy(F.desc("sq"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= _BM25_TOPK)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("matched_terms").cast("long").alias("matched_terms"),
            (F.col("sq").cast("double") / F.lit(1000000.0)).alias("bm25"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


_BM25_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(str_split({_NORM.format(x="text")}, ' '),
                            x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_words FROM dl),
lengths AS (
  SELECT doc_id, dl, n_docs,
         CAST(total_words AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
  FROM dl CROSS JOIN stats
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
qsel AS (
  SELECT qid, term, df FROM (
    SELECT t.doc_id AS qid, t.term, d.df,
           ROW_NUMBER() OVER (PARTITION BY t.doc_id
                              ORDER BY d.df ASC, t.term ASC) AS rn
    FROM tf t JOIN dfreq d USING (term)
    WHERE t.doc_id < {_N_QUERIES}
  ) WHERE rn <= {_BM25_QUERY_TERMS}
),
cand AS (
  SELECT q.qid, t.doc_id, t.tf, q.df, l.dl, l.n_docs, l.avgdl
  FROM qsel q
  JOIN tf t USING (term)
  JOIN lengths l ON t.doc_id = l.doc_id
  WHERE t.doc_id <> q.qid
),
scored AS (
  SELECT qid, doc_id, COUNT(*) AS matched_terms,
         SUM(CAST(FLOOR((
           ((CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * ((CAST(tf AS DOUBLE) * CAST({_BM25_K1} AS DOUBLE))
              / (CAST(tf AS DOUBLE)
                 + CAST(1.2 AS DOUBLE)
                   * (CAST(0.25 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE)
                        * (CAST(dl AS DOUBLE) / avgdl))))
         ) * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS sq
  FROM cand GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(matched_terms AS BIGINT) AS matched_terms,
       CAST(sq AS DOUBLE) / CAST(1000000 AS DOUBLE) AS bm25,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY sq DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {_BM25_TOPK}
"""


# --- hourly mean series (shared by the two correlation queries) -------------

_SLOT_S = 3600
#: means quantized to 1e-3 before the moment sums: values ≤ ~500 → q ≤ 5e5,
#: q² ≤ 2.5e11, ×~720 slots ≤ 2e14 — exact in BIGINT and in DOUBLE (< 2^53).
_ACF_Q = 1000


def _hourly_qmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, slot, qm): hourly mean value quantized to an integer.

    The mean is qsum/count (order-insensitive, engine-exact), so the
    FLOOR(mean·1e3) integer is bit-identical in Spark and DuckDB. The
    aggregate happens scan-side BEFORE any self-join — at 100 TB the
    correlation joins see ~years·metrics rows, never the fact table.
    """
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    mean = (
        (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
        / F.count("value")
    ).cast("double")
    return (
        ev.select("event_type", (es / _SLOT_S).cast("long").alias("slot"), "value")
        .groupBy("event_type", "slot")
        .agg(F.floor(mean * _ACF_Q).cast("long").alias("qm"))
    )


_QMEANS_CTE = f"""
qmeans AS (
  SELECT event_type, CAST({_ES} // {_SLOT_S} AS BIGINT) AS slot,
         CAST(FLOOR(CAST({QSUM_SQL.format(x="value")} / COUNT(value) AS DOUBLE)
                    * {_ACF_Q}) AS BIGINT) AS qm
  FROM events GROUP BY 1, 2
)"""

_MOMENT_COLS = """
         COUNT(*) AS n_pairs,
         SUM(qx) AS sx, SUM(qy) AS sy, SUM(qx * qy) AS sxy,
         SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy
"""

_CORR_SQL_EXPR = """
  CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE)
        AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > CAST(0 AS DOUBLE)
  THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
  ELSE NULL END
"""


def _corr_from_moments(grouped: DataFrame) -> DataFrame:
    """Pearson r from exact integer moment sums, as one deterministic
    double expression (casts from exact BIGINTs, then +,-,*,/,sqrt)."""
    n = F.col("n_pairs").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    varx = n * F.col("sxx").cast("double") - sx * sx
    vary = n * F.col("syy").cast("double") - sy * sy
    num = n * F.col("sxy").cast("double") - sx * sy
    return grouped.withColumn(
        "corr",
        F.when((varx > 0) & (vary > 0), num / F.sqrt(varx * vary)).otherwise(
            F.lit(None).cast("double")
        ),
    )


def _moment_aggs() -> list:
    return [
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qy") * F.col("qy")).alias("syy"),
    ]


def tsdb_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric autocorrelation at lags 1..3 h over the hourly mean
    series (pairwise-complete: only slots where both t and t+lag were
    observed contribute — no imputation).

    Shape: hourly rollup scan-side → lag fan-out (3× a ~720-row/metric
    frame) → equi-join on (metric, slot+lag) → integer moment sums →
    closed-form r. The join keys include the metric, so the shuffle is
    per-series and skew-free; nothing here grows with the raw event count.
    """
    qmeans = _hourly_qmeans(spark, sf_dir).transform(persist_tracked)
    lagged = qmeans.select(
        "event_type",
        "slot",
        F.col("qm").alias("qx"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("lag"),
    )
    right = qmeans.select(
        F.col("event_type").alias("retype"),
        F.col("slot").alias("rslot"),
        F.col("qm").alias("qy"),
    )
    pairs = lagged.join(
        right,
        (F.col("retype") == F.col("event_type"))
        & (F.col("rslot") == F.col("slot") + F.col("lag")),
    ).select("event_type", "lag", "qx", "qy")
    grouped = pairs.groupBy("event_type", "lag").agg(*_moment_aggs())
    return _corr_from_moments(grouped).select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("corr").alias("acf"),
    )


_ACF_SQL = f"""
WITH {_QMEANS_CTE},
lags AS (SELECT UNNEST([1, 2, 3]) AS lag),
pairs AS (
  SELECT a.event_type, l.lag, a.qm AS qx, b.qm AS qy
  FROM qmeans a
  CROSS JOIN lags l
  JOIN qmeans b
    ON b.event_type = a.event_type AND b.slot = a.slot + l.lag
),
m AS (
  SELECT event_type, lag, {_MOMENT_COLS}
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS BIGINT) AS lag,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       ({_CORR_SQL_EXPR}) AS acf
FROM m
"""


def tsdb_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between every pair of metrics on shared hourly
    slots — the "do these two series move together" fleet diagnostic.

    Same integer-moment scheme as :func:`tsdb_autocorrelation`; the pair
    join is on the slot key over the (tiny) hourly rollup, and the pair
    count is metrics·(metrics−1)/2 — independent of the raw data volume.

    CONTRACT: all-pairs on the METRIC grain — for a user-selected series
    set (dashboards correlate 5-50 series), NOT a full million-metric
    catalog, where metrics² explodes. The catalog-scale lever is
    candidate pruning BEFORE the pair join: correlate only within a
    policy/namespace bucket (`split(metric,'.')[0]`, or the tag set),
    which turns the join key into (bucket, slot) and caps pairs at
    Σ bucket_size² — see SCALE.md.
    """
    qmeans = _hourly_qmeans(spark, sf_dir).transform(persist_tracked)
    a = qmeans.select(
        F.col("event_type").alias("metric_a"), "slot", F.col("qm").alias("qx")
    )
    b = qmeans.select(
        F.col("event_type").alias("metric_b"),
        F.col("slot").alias("rslot"),
        F.col("qm").alias("qy"),
    )
    pairs = a.join(
        b, (F.col("slot") == F.col("rslot")) & (F.col("metric_a") < F.col("metric_b"))
    ).select("metric_a", "metric_b", "qx", "qy")
    grouped = pairs.groupBy("metric_a", "metric_b").agg(*_moment_aggs())
    return _corr_from_moments(grouped).select(
        "metric_a",
        "metric_b",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("corr"),
    )


_XCORR_SQL = f"""
WITH {_QMEANS_CTE},
pairs AS (
  SELECT a.event_type AS metric_a, b.event_type AS metric_b,
         a.qm AS qx, b.qm AS qy
  FROM qmeans a
  JOIN qmeans b ON a.slot = b.slot AND a.event_type < b.event_type
),
m AS (
  SELECT metric_a, metric_b, {_MOMENT_COLS}
  FROM pairs GROUP BY 1, 2
)
SELECT metric_a, metric_b,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       ({_CORR_SQL_EXPR}) AS corr
FROM m
"""


# --- deterministic train/valid/test split ----------------------------------


def llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/valid/test corpus split by ``md5(doc_id) mod 100`` —
    the content-independent, engine-independent split every training
    pipeline needs. Hash-bucketing means the assignment is stable under
    corpus growth and reshuffling (a new document never moves an existing
    document's split), and the summary proves the split is balanced.

    Pure scan-side expression + one tiny aggregate; at 100 TB the split
    column is free and the summary is a 3-row result.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "doc_id", "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .withColumn(
            "avg_chars",
            (F.col("total_chars").cast("double") / F.col("n_docs").cast("double")),
        )
    )


_SPLIT_SQL = """
WITH tagged AS (
  SELECT doc_id, n_chars, lang,
         CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'valid'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
FROM tagged GROUP BY 1
"""


QUERIES = {
    "retrieval_bm25_topk": retrieval_bm25_topk,
    "tsdb_autocorrelation": tsdb_autocorrelation,
    "tsdb_cross_correlation": tsdb_cross_correlation,
    "llm_train_test_split": llm_train_test_split,
}

ORACLE = {
    "retrieval_bm25_topk": _BM25_SQL,
    "tsdb_autocorrelation": _ACF_SQL,
    "tsdb_cross_correlation": _XCORR_SQL,
    "llm_train_test_split": _SPLIT_SQL,
}
