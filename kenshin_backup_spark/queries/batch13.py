"""Batch-13 queries: exact moving median, calendar scalar family 2,
char-trigram language ID (the real n-gram heuristic), frame-distinct
counts, and two approximate ops (seeded k-means clusters, approximate
percentiles) registered rows-only per the driver contract.

movingMedian is graphite's only percentile-family series function; Spark
has no exact percentile window function, so the engine computes it as
sorted-array selection over the frame (collect_list → array_sort →
middle), which matches DuckDB's interpolating ``median() OVER`` exactly
for DOUBLE input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- exact moving median ---------------------------------------------------

def tsdb_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median(5): per metric, the exact median of the current +
    4 preceding points (even frames interpolate the two middle values —
    same arithmetic in both engines).

    NOT graphite-parity evidence: trailing-INCLUSIVE frame by intent
    (oracle mirrors it); graphite-web's movingMedian uses the
    strictly-before slice ``series[i-n:i]``, implemented in
    ``operators/seriesfns.moving_median`` and certified via
    ``graphite_render_rollstats`` (round-7 ADVICE annotation)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = (
        W.partitionBy("event_type")
        .orderBy("es", "event_id")
        .rowsBetween(-4, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    n = F.size(frame)
    lo = F.element_at(frame, (n / 2).cast("int"))
    hi = F.element_at(frame, (n / 2).cast("int") + 1)
    odd_mid = F.element_at(frame, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, odd_mid).otherwise((lo + hi) / 2.0)
    return (
        ev.select("event_type", "event_id", es.alias("es"), "value")
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            "es",
            med.cast("double").alias("moving_median"),
        )
    )


_MOVMED_SQL = f"""
SELECT event_type, event_id, CAST({_ES} AS BIGINT) AS es,
       CAST(median(value) OVER (PARTITION BY event_type
                                ORDER BY {_ES}, event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS moving_median
FROM events
"""


# --- calendar scalar family 2 ---------------------------------------------

def scalar_date_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quarter / ISO week / ISO weekday / last_day / add_months — the
    calendar algebra a retention scheduler needs. ISO weekday is computed
    as Spark weekday()+1 to match DuckDB isodow (1=Monday); month-end
    clamping (Jan 31 + 1 month = Feb 29) matches in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.unix_timestamp(F.last_day(d).cast("timestamp")).cast("long").alias("month_end_ts"),
        F.unix_timestamp(F.add_months(d, 3).cast("timestamp")).cast("long").alias("plus3mo_ts"),
    )


_DATE2_SQL = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       CAST(epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) // 1000
            AS BIGINT) AS month_end_ts,
       CAST(epoch_ms(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)) // 1000
            AS BIGINT) AS plus3mo_ts
FROM orders
"""


# --- char-trigram language ID ---------------------------------------------

#: Distinctive character trigrams per language (static profile — the
#: train-free variant of the classic Cavnar-Trenkle n-gram classifier).
_LANG_TRIGRAMS = {
    "en": ["the", "ing", "and"],
    "es": ["ión", "que", "los"],
    "de": ["sch", "der", "ein"],
    "fr": ["les", "une", "des"],
}


def text_char_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-level n-gram language ID: score each language by occurrences
    of its profile trigrams (zh scores by CJK codepoint count); prediction
    = argmax score with lang-ascending tie-break. Output is the (actual,
    predicted) confusion matrix. Pure scan-side regexp counts — no
    training, no shuffle until the 25-cell aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scores = {
        lang: sum((F.regexp_count(low, F.lit(g)) for g in grams), F.lit(0))
        for lang, grams in _LANG_TRIGRAMS.items()
    }
    scores["zh"] = F.regexp_count(F.col("text"), F.lit("[一-鿿]"))
    langs = sorted(scores)
    # first-match CASE chain in alphabetical order = argmax with
    # lowest-lang tie-break; the oracle repeats the identical chain.
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _langid_score_sql(lang: str) -> str:
    grams = _LANG_TRIGRAMS.get(lang)
    if grams is None:
        return "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
    return " + ".join(
        f"len(regexp_extract_all(lower(text), '{g}'))" for g in grams
    )


_LANGS_SORTED = sorted([*_LANG_TRIGRAMS, "zh"])


def _langid_case_chain() -> str:
    arms = []
    for lang in _LANGS_SORTED:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in _LANGS_SORTED if other != lang
        )
        arms.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " END"


_LANGID_SQL = f"""
WITH scored AS (
  SELECT lang,
         {", ".join(f"CAST({_langid_score_sql(l)} AS BIGINT) AS s_{l}" for l in _LANGS_SORTED)}
  FROM documents
), best AS (
  SELECT lang, {_langid_case_chain()} AS predicted FROM scored
)
SELECT lang, predicted, COUNT(*) AS n_docs FROM best GROUP BY 1, 2
"""


# --- frame-distinct counts -------------------------------------------------

def window_frame_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users among the last 10 events per metric — COUNT(DISTINCT)
    has no window form in either engine, so both build the frame list and
    deduplicate it (collect_list/array_distinct ↔ list/list_distinct)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = (
        W.partitionBy("event_type")
        .orderBy("es", "event_id")
        .rowsBetween(-9, 0)
    )
    return (
        ev.select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            es.alias("es"),
            "user_id",
        )
        .select(
            "event_type",
            "event_id",
            "es",
            F.size(F.array_distinct(F.collect_list("user_id").over(w)))
            .cast("long")
            .alias("distinct_users_10"),
        )
    )


_FRAMEDIST_SQL = f"""
SELECT event_type, event_id, CAST({_ES} AS BIGINT) AS es,
       CAST(len(list_distinct(list(user_id) OVER (
            PARTITION BY event_type ORDER BY {_ES}, event_id
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS BIGINT) AS distinct_users_10
FROM events
"""


# --- approximate ops (rows-only) ------------------------------------------

def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded MLlib k-means over the embeddings (the IVF coarse quantizer
    as a first-class op). Iterative float convergence → rows-only check;
    seeded determinism and full-coverage partitioning are unit-tested.
    (The fixture's ``label`` column is NOT geometrically separable —
    measured majority-label purity ≈ 0.17 at k=10 — so no purity
    assertion is possible against this synthetic data.)"""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    feats = emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    km = KMeans(k=10, seed=42, maxIter=10, featuresCol="features")
    model = km.fit(feats)
    return (
        model.transform(feats)
        .groupBy(F.col("prediction").cast("long").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").cast("long").alias("n_labels"),
        )
    )


def approx_event_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, the t-digest-class
    operator): p50/p95/p99 of value per metric. Approximate → rows-only;
    the exact twin is agg_median_quantity."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return ev.groupBy("event_type").agg(
        pct[0].cast("double").alias("p50"),
        pct[1].cast("double").alias("p95"),
        pct[2].cast("double").alias("p99"),
    )


QUERIES = {
    "tsdb_moving_median": tsdb_moving_median,
    "scalar_date_family2": scalar_date_family2,
    "text_char_ngram_langid": text_char_ngram_langid,
    "window_frame_distinct_users": window_frame_distinct_users,
    "emb_kmeans_clusters": emb_kmeans_clusters,
    "approx_event_percentiles": approx_event_percentiles,
}

ORACLE = {
    "tsdb_moving_median": _MOVMED_SQL,
    "scalar_date_family2": _DATE2_SQL,
    "text_char_ngram_langid": _LANGID_SQL,
    "window_frame_distinct_users": _FRAMEDIST_SQL,
    # emb_kmeans_clusters / approx_event_percentiles: approximate →
    # rows-only checks per the driver contract.
}
