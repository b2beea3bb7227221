"""Batch-10 queries: training-data pipeline ops (dedup clustering via
connected components, sequence packing, stratified sampling, PII masking),
the TSDB time-weighted average, an ORC source roundtrip, and deterministic
mode / percent_rank / safe-math families.

Determinism notes (functions/deterministic.py conventions):

- Connected-component labels are min-node-ids — integer, engine-neutral;
  the DuckDB oracle computes the same components with a recursive CTE.
- The stratified sampler uses a pure-integer Knuth multiplicative hash
  (``(id * 2654435761) % 1000``) — exact BIGINT arithmetic in both engines,
  no float RNG.
- Time-weighted average orders by (epoch_seconds, event_id) in BOTH
  engines so dt pairing is identical, and quantizes value before the
  value·dt product (BIGINT-exact).
- The math family sticks to IEEE-exact ops (sqrt is correctly rounded;
  ``x*x`` instead of pow; no exp/ln — see COVERAGE.md determinism
  contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.operators.dedup import connected_components_star, ngram_jaccard_pairs
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

#: Shared DuckDB CTE: symmetrized near-dup edge list from df-capped 3-gram
#: Jaccard pairs at threshold 0.2 (mirrors dedup_ngram_jaccard_capped).
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


# --- dedup clustering: connected components over near-dup pairs -----------

def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: pairwise Jaccard edges → connected components →
    one canonical doc (min id) per cluster. The step pairwise dedup misses:
    A~B, B~C ⇒ {A,B,C} one cluster even when A!~C."""
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    labels = connected_components_star(
        edges, nodes=docs, node_col="doc_id"
    )
    return labels.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("id") == F.col("component")).cast("long").alias("is_canonical"),
    )


_CC_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
reach(src, dst) AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.id_b AS dst FROM reach r JOIN edges e ON e.id_a = r.dst
)
SELECT src AS doc_id, MIN(dst) AS component,
       CAST(src = MIN(dst) AS BIGINT) AS is_canonical
FROM reach GROUP BY src
"""


# --- sequence packing: concat-and-chunk token budgeting -------------------

def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-pretraining sequence packing: per language, documents are
    concatenated in doc_id order and split into fixed token-budget packs
    (budget 2000); pack id = floor(preceding-cumulative-tokens / budget).
    Window is partitioned by lang — at scale each shard packs
    independently, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+"))
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    with_pack = (
        docs.select("lang", "doc_id", toks.cast("long").alias("n_tok"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("pack_id", F.floor(F.col("cum_before") / 2000).cast("long"))
    )
    return with_pack.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("pack_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


_PACK_SQL = """
WITH toks AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tok
  FROM documents
), packed AS (
  SELECT lang, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM toks
)
SELECT lang, CAST(FLOOR(cum_before / 2000) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed GROUP BY 1, 2
"""


# --- stratified sampling: deterministic integer-hash rates per stratum ----

def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling with a seedless integer hash — the
    reproducible corpus-mixing step (e.g. keep 30% en, 20% es, 15% zh,
    10% de, 5% fr). Hash and threshold are exact BIGINT ops, so the
    sampled set is bit-stable across engines, runs, and partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000)
    rate = (
        F.when(F.col("lang") == "en", 300)
        .when(F.col("lang") == "es", 200)
        .when(F.col("lang") == "zh", 150)
        .when(F.col("lang") == "de", 100)
        .otherwise(50)
    )
    sampled = docs.withColumn("keep", (h < rate).cast("long"))
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("keep").cast("long").alias("n_sampled"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars"))).cast("long").alias("sampled_chars"),
    )


_SAMPLE_SQL = """
WITH s AS (
  SELECT lang, n_chars,
         CASE WHEN (doc_id * 2654435761) % 1000 <
              CASE lang WHEN 'en' THEN 300 WHEN 'es' THEN 200
                        WHEN 'zh' THEN 150 WHEN 'de' THEN 100 ELSE 50 END
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(keep) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN keep = 1 THEN n_chars END) AS BIGINT) AS sampled_chars
FROM s GROUP BY 1
"""


# --- PII masking: deterministic regexp_replace chain ----------------------

def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training scrub pass: mask email-shaped tokens then digit runs,
    fingerprint the masked text. Patterns avoid engine-specific regex
    syntax (character classes + quantifiers only)."""
    docs = load_table(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    masked = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), "[0-9]+", "<NUM>"
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+")).cast("long").alias("n_digit_runs"),
        F.length(masked).cast("long").alias("masked_len"),
        F.md5(masked).alias("masked_fp"),
    )


_PII_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST(length(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
            '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS masked_len,
       md5(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
            '[0-9]+', '<NUM>', 'g')) AS masked_fp
FROM documents
"""


# --- TSDB: time-weighted average ------------------------------------------

def tsdb_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval TWA per metric: each value weighted by the gap to
    the next point (the standard TSDB operator raw avg gets wrong on
    uneven sampling). Both engines sort by (epoch_s, event_id) and
    quantize value before the value·dt product, so the BIGINT numerator is
    exact and associative."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = W.partitionBy("event_type").orderBy("es", "event_id")
    staged = (
        ev.select("event_type", "event_id", es.alias("es"), "value")
        .withColumn("dt", F.lead("es").over(w) - F.col("es"))
        .where(F.col("dt").isNotNull())
        .withColumn("prod_l", F.floor(F.col("value") * 1000000).cast("long") * F.col("dt"))
    )
    return staged.groupBy("event_type").agg(
        (
            F.sum("prod_l").cast("double")
            / (F.sum("dt").cast("double") * 1000000.0)
        ).alias("twa"),
        F.sum("dt").cast("long").alias("span_s"),
    )


_ES_EV = EPOCH_S_SQL.format(x="ts")

_TWA_SQL = f"""
WITH pts AS (
  SELECT event_type, event_id, {_ES_EV} AS es, value FROM events
), gaps AS (
  SELECT event_type, value, es,
         LEAD(es) OVER (PARTITION BY event_type ORDER BY es, event_id) - es AS dt
  FROM pts
)
SELECT event_type,
       CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT) * dt) AS DOUBLE)
         / (CAST(SUM(dt) AS DOUBLE) * 1000000.0) AS twa,
       CAST(SUM(dt) AS BIGINT) AS span_s
FROM gaps WHERE dt IS NOT NULL
GROUP BY 1
"""


# --- source: ORC roundtrip -------------------------------------------------

def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage orders to ORC (Spark's second first-class columnar format),
    read it back, aggregate — proves the engine's source layer is
    format-plural. Oracle aggregates the same rows from parquet."""
    orders = load_table(spark, sf_dir, "orders")
    stage = f"/tmp/kenshin_orc_stage/{os.path.basename(os.path.normpath(sf_dir))}/orders"
    (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .orc(stage)
    )
    back = spark.read.orc(stage)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        qsum("o_totalprice", "sum_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


_ORC_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {QSUM_SQL.format(x="o_totalprice")} AS sum_price,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders GROUP BY 1
"""


# --- deterministic mode (argmax with explicit tie-break) ------------------

def agg_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per market segment; ties broken by
    priority string ascending (encoded identically in both engines —
    Spark min(struct(-cnt, prio)), oracle row_number)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = counts.groupBy("c_mktsegment").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("o_orderpriority"))).alias("b")
    )
    return best.select(
        "c_mktsegment",
        F.col("b.o_orderpriority").alias("mode_priority"),
        (-F.col("b.nc")).cast("long").alias("mode_count"),
    )


_MODE_SQL = """
WITH counts AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
              ORDER BY cnt DESC, o_orderpriority ASC) AS rn
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS mode_priority,
       CAST(cnt AS BIGINT) AS mode_count
FROM ranked WHERE rn = 1
"""


# --- percent_rank ----------------------------------------------------------

def window_percent_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank of customer balance within nation — (rank-1)/(n-1) on
    identical integer ranks is the same double in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    return cust.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.percent_rank().over(w).cast("double").alias("pr"),
    )


_PRANK_SQL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal) AS DOUBLE) AS pr
FROM customer
"""


# --- IEEE-safe math family -------------------------------------------------

def scalar_math_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-portable math surface: sqrt (IEEE correctly rounded),
    squaring via multiplication, integer mod, greatest/least, sign, abs.
    Transcendentals (exp/ln/pow) stay excluded — last-ulp drift between
    JVM and libm breaks value hashes (COVERAGE.md determinism contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).cast("double").alias("rate_sign"),
        F.abs(F.col("l_extendedprice") - F.col("l_quantity")).alias("abs_diff"),
    )


_MATH2_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       sqrt(l_extendedprice) AS sqrt_price,
       l_discount * l_discount AS disc_sq,
       l_orderkey % 7 AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign,
       abs(l_extendedprice - l_quantity) AS abs_diff
FROM lineitem
"""


QUERIES = {
    "dedup_connected_components": dedup_connected_components,
    "llm_sequence_packing": llm_sequence_packing,
    "llm_stratified_sample": llm_stratified_sample,
    "text_pii_mask": text_pii_mask,
    "tsdb_time_weighted_avg": tsdb_time_weighted_avg,
    "source_orc_roundtrip": source_orc_roundtrip,
    "agg_mode_priority": agg_mode_priority,
    "window_percent_rank_acctbal": window_percent_rank_acctbal,
    "scalar_math_family2": scalar_math_family2,
}

ORACLE = {
    "dedup_connected_components": _CC_SQL,
    "llm_sequence_packing": _PACK_SQL,
    "llm_stratified_sample": _SAMPLE_SQL,
    "text_pii_mask": _PII_SQL,
    "tsdb_time_weighted_avg": _TWA_SQL,
    "source_orc_roundtrip": _ORC_SQL,
    "agg_mode_priority": _MODE_SQL,
    "window_percent_rank_acctbal": _PRANK_SQL,
    "scalar_math_family2": _MATH2_SQL,
}
