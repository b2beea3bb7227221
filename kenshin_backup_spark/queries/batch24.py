"""Batch-24 queries: Gopher-style corpus quality signals (repetition
ratios, rule gate), near-dup cluster representatives, and graphite
movingMin/movingMax + nPercentile clipping.

The repetition/gate pair implements the published Gopher/C4 heuristics
(duplicate-n-gram fraction, word-count band, mean word length, alphabetic
ratio, stopword presence) with every threshold compared in INTEGER space
(``2*alpha_cnt >= n_words`` instead of ``ratio >= 0.5``) so the DuckDB
oracle matches bit-for-bit; the only doubles in the output are exact
integer divisions, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.dedup import (
    connected_components_star,
    ngram_jaccard_pairs,
    normalize_text,
    shingles_from_words,
)
from kenshin_backup_spark.operators.rollup import finalize, rollup_partials
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")
_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


# --- within-document repetition signals -----------------------------------

def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters: per document, the duplicate-word ratio,
    duplicate-3-gram ratio, and top-word fraction. High values mark
    boilerplate/spam that document-LEVEL dedup never sees.

    Scale: words/grams are counted with scan-side higher-order functions
    (no explode for the ratios); only the top-word mode needs an explode +
    per-(doc, word) count, keyed by doc_id so the aggregation is a single
    shuffle of (doc_id, word) pairs.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (normalize_text("text") != "")
    )
    base = docs.select(
        "doc_id", F.split(normalize_text("text"), " ").alias("w")
    )
    grams_total = F.greatest(F.size("w") - 2, F.lit(0))
    stats = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        grams_total.alias("n_grams"),
        F.size(shingles_from_words(F.col("w"), 3)).alias("n_distinct_grams"),
    )
    top = (
        base.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_n"))
    )
    out = stats.join(top, "doc_id")
    dup_word = (out.n_words - out.n_distinct).cast("double") / out.n_words
    dup_gram = F.when(
        out.n_grams > 0,
        (out.n_grams - out.n_distinct_grams).cast("double") / out.n_grams,
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_words").cast("long").alias("n_words"),
        dup_word.alias("dup_word_ratio"),
        dup_gram.alias("dup_3gram_ratio"),
        (F.col("top_word_n").cast("double") / out.n_words).alias("top_word_ratio"),
    )


_REPEAT_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w
  FROM documents
  WHERE text IS NOT NULL AND {_NORM.format(x="text")} <> ''
),
stats AS (
  SELECT doc_id,
         len(w) AS n_words,
         len(list_distinct(w)) AS n_distinct,
         greatest(len(w) - 2, 0) AS n_grams,
         len(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS n_distinct_grams
  FROM norm
),
top AS (
  SELECT doc_id, MAX(c) AS top_word_n FROM (
    SELECT doc_id, word, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(w) AS word FROM norm)
    GROUP BY doc_id, word
  ) GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_words AS BIGINT) AS n_words,
       CAST(s.n_words - s.n_distinct AS DOUBLE) / s.n_words AS dup_word_ratio,
       CASE WHEN s.n_grams > 0
            THEN CAST(s.n_grams - s.n_distinct_grams AS DOUBLE) / s.n_grams
            ELSE 0.0 END AS dup_3gram_ratio,
       CAST(t.top_word_n AS DOUBLE) / s.n_words AS top_word_ratio
FROM stats s JOIN top t USING (doc_id)
"""


# --- Gopher rule gate ------------------------------------------------------

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def text_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 rule gate with all thresholds in integer space:

    - word count in [10, 100000]
    - mean word length in [2, 12]  (chars*1 vs n_words*2 / n_words*12)
    - >= 50% of words contain a letter (unicode ``\\p{L}`` — works for zh)
    - >= 2 distinct English stopwords (lang='en' proxy for other langs)

    Emits per-document flags plus the final keep bit; the aggregate
    keep-rate per language comes free downstream. Pure scan-side
    expressions — no shuffle at all before the driver-side collect.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (normalize_text("text") != "")
    )
    base = docs.select(
        "doc_id", "lang", F.split(normalize_text("text"), " ").alias("w")
    )
    n_words = F.size("w")
    # normalized text uses single spaces: total letters = len - (n-1)
    n_chars = F.aggregate(
        F.transform("w", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    alpha_cnt = F.size(F.filter("w", lambda x: x.rlike(r"\p{L}")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct("w"), F.array(*[F.lit(s) for s in _STOPWORDS])
        )
    )
    flagged = base.select(
        "doc_id",
        "lang",
        n_words.alias("nw"),
        n_chars.alias("nc"),
        alpha_cnt.alias("na"),
        stop_hits.alias("ns"),
    )
    wc_ok = (F.col("nw") >= 10) & (F.col("nw") <= 100000)
    mwl_ok = (F.col("nc") >= 2 * F.col("nw")) & (F.col("nc") <= 12 * F.col("nw"))
    alpha_ok = 2 * F.col("na") >= F.col("nw")
    stop_ok = F.col("ns") >= 2
    keep = wc_ok & mwl_ok & alpha_ok & stop_ok
    return flagged.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("nw").cast("long").alias("n_words"),
        (F.col("nc").cast("double") / F.col("nw")).alias("mean_word_len"),
        wc_ok.cast("long").alias("wc_ok"),
        mwl_ok.cast("long").alias("mwl_ok"),
        alpha_ok.cast("long").alias("alpha_ok"),
        stop_ok.cast("long").alias("stop_ok"),
        keep.cast("long").alias("keep"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)

_GOPHER_SQL = f"""
WITH norm AS (
  SELECT doc_id, lang, str_split({_NORM.format(x="text")}, ' ') AS w
  FROM documents
  WHERE text IS NOT NULL AND {_NORM.format(x="text")} <> ''
),
feats AS (
  SELECT doc_id, lang,
         len(w) AS nw,
         list_sum(list_transform(w, x -> len(x))) AS nc,
         len(list_filter(w, x -> regexp_matches(x, '\\p{{L}}'))) AS na,
         len(list_intersect(list_distinct(w), [{_STOP_SQL}])) AS ns
  FROM norm
)
SELECT doc_id, lang,
       CAST(nw AS BIGINT) AS n_words,
       CAST(nc AS DOUBLE) / nw AS mean_word_len,
       CAST(nw >= 10 AND nw <= 100000 AS BIGINT) AS wc_ok,
       CAST(nc >= 2 * nw AND nc <= 12 * nw AS BIGINT) AS mwl_ok,
       CAST(2 * na >= nw AS BIGINT) AS alpha_ok,
       CAST(ns >= 2 AS BIGINT) AS stop_ok,
       CAST(nw >= 10 AND nw <= 100000 AND nc >= 2 * nw AND nc <= 12 * nw
            AND 2 * na >= nw AND ns >= 2 AS BIGINT) AS keep
FROM feats
"""


# --- near-dup cluster representative --------------------------------------

#: DuckDB edge CTE shared with batch10's connected-components oracle
#: (df-capped 3-gram Jaccard at 0.2, symmetrized).
_EDGES_CTE = f"""
norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm
),
posting0 AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
keep AS (SELECT g FROM posting0 GROUP BY g HAVING COUNT(*) <= 10),
posting AS (SELECT doc_id, g FROM posting0 JOIN keep USING (g)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.2
),
edges AS (
  SELECT id_a, id_b FROM pairs
  UNION ALL
  SELECT id_b AS id_a, id_a AS id_b FROM pairs
)
"""


def llm_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ENDGAME: near-dup clusters (connected components over
    Jaccard edges) keep their highest-quality member, not an arbitrary
    one — quality = word count, ties to the smallest doc_id. Returns only
    multi-member clusters with the chosen representative.

    Scale: star-contraction CC (all hash equi-joins) + one window argmax
    partitioned by component.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    labels = connected_components_star(edges, nodes=docs, node_col="doc_id")
    scored = labels.join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.size(F.split(normalize_text("text"), " ")).alias("n_words"),
        ),
        "id",
    )
    w = W.partitionBy("component").orderBy(
        F.desc("n_words"), F.asc("id")
    )
    ranked = scored.select(
        "component", "id", "n_words", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("id"))).alias("rep_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_words"))).alias("rep_words"),
        )
        .where(F.col("n_members") >= 2)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("rep_doc").cast("long").alias("rep_doc"),
            F.col("rep_words").cast("long").alias("rep_words"),
        )
    )


_REP_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
reach(src, dst) AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.id_b AS dst FROM reach r JOIN edges e ON e.id_a = r.dst
),
labels AS (
  SELECT src AS id, MIN(dst) AS component FROM reach GROUP BY src
),
scored AS (
  SELECT l.component, l.id,
         len(str_split({_NORM.format(x="d.text")}, ' ')) AS n_words
  FROM labels l JOIN documents d ON d.doc_id = l.id
),
ranked AS (
  SELECT component, id, n_words,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_words DESC, id ASC) AS rn
  FROM scored
)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(CASE WHEN rn = 1 THEN id END) AS rep_doc,
       CAST(MAX(CASE WHEN rn = 1 THEN n_words END) AS BIGINT) AS rep_words
FROM ranked GROUP BY component HAVING COUNT(*) >= 2
"""


# --- graphite movingMin / movingMax ---------------------------------------

def _ten_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    metric = F.concat_ws(
        ".",
        F.lit("app"),
        F.col("event_type"),
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")),
    )
    d = ev.select(metric.alias("metric"), "ts", "value")
    return finalize(
        rollup_partials(d, key_cols=["metric"], step_seconds=600), agg="average"
    ).select("metric", "bucket_ts", "value")


_TEN_SQL = f"""
e AS (
  SELECT 'app.' || event_type || '.u' || CAST(user_id % 4 AS VARCHAR) AS metric,
         value, CAST(({_ES} // 600) * 600 AS BIGINT) AS bucket_ts
  FROM events
),
ten AS (
  SELECT metric, bucket_ts,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE)
           / 1000000 / COUNT(value) AS value
  FROM e GROUP BY metric, bucket_ts
)
"""


def graphite_moving_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """movingMin/movingMax-STYLE envelope (window of 6 points = 1h over
    10-min buckets): the alert-hysteresis shape. min/max carry values
    through unchanged, so the quantized-average inputs stay bit-exact.

    NOT graphite-parity evidence: this query intentionally keeps the
    trailing-INCLUSIVE frame ``rowsBetween(-5, 0)`` (and its oracle
    mirrors it), whereas graphite-web's movingMin/movingMax use the
    strictly-before slice ``series[i-n:i]`` — that convention lives in
    ``operators/seriesfns.moving_min/moving_max`` (``_moving_frame``)
    and is what ``render()`` targets and the graphite_render_* certs
    exercise. Kept inclusive here because the query is driver-certified
    in this form and the inclusive frame is the common SQL idiom this
    relational-family query demonstrates (round-7 ADVICE annotation)."""
    ten = _ten_series(spark, sf_dir)
    w = W.partitionBy("metric").orderBy("bucket_ts").rowsBetween(-5, 0)
    return ten.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
        F.min("value").over(w).cast("double").alias("mov_min"),
        F.max("value").over(w).cast("double").alias("mov_max"),
    )


_MOVMM_SQL = f"""
WITH {_TEN_SQL}
SELECT metric, bucket_ts, value,
       MIN(value) OVER (PARTITION BY metric ORDER BY bucket_ts
                        ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS mov_min,
       MAX(value) OVER (PARTITION BY metric ORDER BY bucket_ts
                        ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS mov_max
FROM ten
"""


# --- graphite nPercentile / removeAbovePercentile -------------------------

def graphite_npercentile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite ``nPercentile(95)`` + ``removeAbovePercentile``: per
    metric, the interpolated p95 over QUANTIZED integer values (exact in
    both engines: linear interpolation over exactly-representable ints)
    and how many points it would clip."""
    ten = _ten_series(spark, sf_dir)
    qv = F.floor(F.col("value") * 1000000).cast("long")
    q = ten.select("metric", qv.alias("qv"))
    stats = q.groupBy("metric").agg(
        F.percentile("qv", 0.95).alias("p95q"),
        F.count(F.lit(1)).alias("n_total"),
    )
    clipped = (
        q.join(stats.select("metric", "p95q"), "metric")
        .where(F.col("qv").cast("double") > F.col("p95q"))
        .groupBy("metric")
        .agg(F.count(F.lit(1)).alias("n_clipped"))
    )
    return (
        stats.join(clipped, "metric", "left")
        .select(
            "metric",
            (F.col("p95q") / 1000000.0).alias("p95"),
            F.col("n_total").cast("long").alias("n_total"),
            F.coalesce(F.col("n_clipped"), F.lit(0)).cast("long").alias("n_clipped"),
        )
    )


_NPCT_SQL = f"""
WITH {_TEN_SQL},
q AS (
  SELECT metric, CAST(FLOOR(value * 1000000) AS BIGINT) AS qv FROM ten
),
stats AS (
  SELECT metric, quantile_cont(qv, 0.95) AS p95q, COUNT(*) AS n_total
  FROM q GROUP BY metric
),
clipped AS (
  SELECT q.metric, COUNT(*) AS n_clipped
  FROM q JOIN stats USING (metric)
  WHERE CAST(q.qv AS DOUBLE) > stats.p95q
  GROUP BY q.metric
)
SELECT s.metric, s.p95q / 1000000.0 AS p95,
       CAST(s.n_total AS BIGINT) AS n_total,
       CAST(COALESCE(c.n_clipped, 0) AS BIGINT) AS n_clipped
FROM stats s LEFT JOIN clipped c ON c.metric = s.metric
"""


QUERIES = {
    "text_repetition_signals": text_repetition_signals,
    "text_gopher_quality_gate": text_gopher_quality_gate,
    "llm_cluster_representative": llm_cluster_representative,
    "graphite_moving_minmax": graphite_moving_minmax,
    "graphite_npercentile_clip": graphite_npercentile_clip,
}

ORACLE = {
    "text_repetition_signals": _REPEAT_SQL,
    "text_gopher_quality_gate": _GOPHER_SQL,
    "llm_cluster_representative": _REP_SQL,
    "graphite_moving_minmax": _MOVMM_SQL,
    "graphite_npercentile_clip": _NPCT_SQL,
}
