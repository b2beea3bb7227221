"""Batch-4 queries: oracle-checked SimHash (portable md5 hashes),
embedding-cosine near-dup, IVF ANN, JSON roundtrip/map functions, and
graphite integral/perSecond/namespace operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL, qsum
from kenshin_backup_spark.operators.dedup import simhash_near_pairs
from kenshin_backup_spark.operators.similarity import cosine_near_pairs, ivf_topk
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")
_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


# --- X2: SimHash, oracle-checked (portable md5 token hashes) ----------------

def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with PORTABLE 60-bit md5 token hashes: the
    full pipeline (normalize → 2-gram shingles → bit-majority signature →
    4×15-bit pigeonhole banding → Hamming verify) reproduces bit-for-bit
    in DuckDB, making this the oracle-checked SimHash. The xxhash64
    variant (dedup_simhash_pairs) is the faster engine-native twin."""
    docs = load_table(spark, sf_dir, "documents")
    out = simhash_near_pairs(docs, max_hamming=8, hash_fn="md5", bits=60)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def _simhash_md5_sql(bits: int = 60, max_h: int = 8) -> str:
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (hv & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    sig = "\n           | ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 1, 0)),
           i -> w[i] || ' ' || w[i+1])) AS sh
  FROM norm
),
posting AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
h AS (
  SELECT doc_id, CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS hv
  FROM posting
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         {sig} AS sig
  FROM votes
),
chunks AS (
  SELECT doc_id, sig, c, (sig >> ({chunk_bits} * c)) & {mask} AS key
  FROM sigs, UNNEST([0, 1, 2, 3]) AS t(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
  FROM chunks a JOIN chunks b
    ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_h}
"""


# --- X2/X3: embedding-cosine near-dup + IVF ANN -------------------------------

def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.9), quantized-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.9).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )


_EMB_NEARDUP_SQL = """
WITH qv AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
-- zero-norm guard (mirrors cosine_near_pairs): NaN semantics differ
norms AS (SELECT id, list_sum(list_transform(v, x -> x * x)) AS n2 FROM qv WHERE list_sum(list_transform(v, x -> x * x)) > 0),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         list_sum(list_transform(generate_series(1, len(a.v)),
                                 i -> a.v[i] * b.v[i])) AS dot
  FROM qv a JOIN qv b ON a.id < b.id
)
SELECT id_a, id_b,
       CAST(p.dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS DOUBLE) AS cosine
FROM pairs p
JOIN norms na ON na.id = p.id_a
JOIN norms nb ON nb.id = p.id_b
WHERE CAST(p.dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS DOUBLE) >= 0.9
"""


def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means centroid routing → per-bucket exact cosine
    (approximate: probed buckets only → rows-only; exact twin:
    emb_cosine_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=2)


# --- §2.6: JSON / map families ------------------------------------------------

def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialization fidelity: struct → to_json → from_json → aggregate.
    The oracle aggregates the raw columns, so any drift in the JSON
    round-trip (precision, key order, nulls) breaks the hash."""
    ev = load_table(spark, sf_dir, "events")
    packed = ev.select(
        F.to_json(F.struct("event_type", "value", "user_id")).alias("j")
    )
    schema = "event_type string, value double, user_id bigint"
    unpacked = packed.select(F.from_json("j", schema).alias("s")).select("s.*")
    return unpacked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        qsum("value", "sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_ROUNDTRIP_SQL = f"""
SELECT event_type, COUNT(*) AS n,
       {QSUM_SQL.format(x="value")} AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def map_props_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: props JSON → MapType → explode entries → per-key stats
    (map_keys/explode surface; oracle via DuckDB json_keys)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type", F.from_json("props", "map<string,bigint>").alias("m")
    )
    entries = m.select("event_type", F.explode("m").alias("key", "val"))
    return entries.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").cast("long").alias("sum_val"),
        F.min("val").cast("long").alias("min_val"),
        F.max("val").cast("long").alias("max_val"),
    )


_MAP_SQL = """
WITH kv AS (
  SELECT event_type,
         UNNEST(json_keys(props)) AS key,
         props
  FROM events
)
SELECT event_type, key, COUNT(*) AS n,
       CAST(SUM(CAST(props->>key AS BIGINT)) AS BIGINT) AS sum_val,
       MIN(CAST(props->>key AS BIGINT)) AS min_val,
       MAX(CAST(props->>key AS BIGINT)) AS max_val
FROM kv GROUP BY event_type, key
"""


# --- W2 extended: integral / perSecond / namespace ----------------------------

def tsdb_integral_persecond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite integral() + perSecond(): running quantized sum per metric
    and rate = delta_value / delta_seconds between consecutive points."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    q = F.floor(F.col("value") * 1000000).cast("long")
    w = W.partitionBy("event_type").orderBy(es, "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, 0)
    prev_q = F.lag(q).over(w)
    prev_es = F.lag(es).over(w)
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        es.alias("es"),
        (F.sum(q).over(wsum) / F.lit(1000000.0)).cast("double").alias("integral"),
        F.when(
            es > prev_es, ((q - prev_q) / F.lit(1000000.0)) / (es - prev_es)
        ).cast("double").alias("per_second"),
    )


_INTEGRAL_SQL = f"""
WITH e AS (
  SELECT event_id, event_type, CAST({_ES} AS BIGINT) AS es,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS q
  FROM events
)
SELECT event_id, event_type, es,
       CAST(SUM(q) OVER (PARTITION BY event_type ORDER BY es, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            / 1000000.0 AS DOUBLE) AS integral,
       CASE WHEN es > LAG(es) OVER w
            THEN CAST(((q - LAG(q) OVER w) / 1000000.0)
                      / (es - LAG(es) OVER w) AS DOUBLE) END AS per_second
FROM e
WINDOW w AS (PARTITION BY event_type ORDER BY es, event_id)
"""


def tsdb_namespace_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite dot-namespace: synthesize metric paths
    app.<event_type>.u<user_id%4>, split into hierarchy levels, aggregate
    per (level1, level2) — the metric-tree browse computation."""
    ev = load_table(spark, sf_dir, "events")
    metric = F.concat_ws(
        ".", F.lit("app"), F.col("event_type"),
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")),
    )
    d = ev.select(metric.alias("metric"), "value")
    parts = F.split("metric", r"\.")
    return (
        d.select(
            parts.getItem(0).alias("l0"),
            parts.getItem(1).alias("l1"),
            parts.getItem(2).alias("l2"),
            "value",
        )
        .groupBy("l0", "l1", "l2")
        .agg(F.count(F.lit(1)).alias("n"), qsum("value", "sum_value"))
    )


_NAMESPACE_SQL = f"""
WITH d AS (
  SELECT 'app' AS l0, event_type AS l1, 'u' || CAST(user_id % 4 AS VARCHAR) AS l2, value
  FROM events
)
SELECT l0, l1, l2, COUNT(*) AS n, {QSUM_SQL.format(x="value")} AS sum_value
FROM d GROUP BY l0, l1, l2
"""


def upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 / MERGE-INTO emulation (no Delta in this container): the
    current state per user = arg-max-by-time event, via the deterministic
    struct-ordering idiom — the anti-join+union upsert collapsed to one
    aggregation because the full history is present."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    latest = (
        ev.select(
            "user_id",
            F.struct(
                es.alias("es"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
                F.col("value").alias("v"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.max("s").alias("s"))
    )
    return latest.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("s.es").alias("last_es"),
        F.col("s.eid").cast("long").alias("last_event_id"),
        F.col("s.et").alias("last_event_type"),
        F.col("s.v").alias("last_value"),
    )


_UPSERT_SQL = f"""
SELECT user_id, es AS last_es, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM (
  SELECT user_id, CAST({_ES} AS BIGINT) AS es, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST({_ES} AS BIGINT) DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


QUERIES = {
    "upsert_latest_state": upsert_latest_state,
    "dedup_simhash_md5": dedup_simhash_md5,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "emb_ann_ivf": emb_ann_ivf,
    "json_roundtrip_events": json_roundtrip_events,
    "map_props_entries": map_props_entries,
    "tsdb_integral_persecond": tsdb_integral_persecond,
    "tsdb_namespace_levels": tsdb_namespace_levels,
}

ORACLE = {
    "upsert_latest_state": _UPSERT_SQL,
    "dedup_simhash_md5": _simhash_md5_sql(),
    "dedup_embedding_cosine": _EMB_NEARDUP_SQL,
    "json_roundtrip_events": _ROUNDTRIP_SQL,
    "map_props_entries": _MAP_SQL,
    "tsdb_integral_persecond": _INTEGRAL_SQL,
    "tsdb_namespace_levels": _NAMESPACE_SQL,
    # emb_ann_ivf: approximate (probed buckets) → rows-only by design.
}
