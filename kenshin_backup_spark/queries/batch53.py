"""Batch-53 queries (round 4): winnowing fingerprint dedup + BPE merge stats.

Two classic training-data-pipeline algorithms not yet in the registry:

- ``dedup_winnowing_pairs`` — MOSS-style winnowing (Schleimer, Wilkerson,
  Aiken, SIGMOD 2003): char k-gram hashes per position, select the minimum
  hash of every sliding window of ``w`` consecutive grams, and pair up
  documents sharing >= ``MIN_SHARED`` selected fingerprints. Winnowing
  guarantees any match of length >= w+k-1 chars is detected while keeping
  only ~2/(w+1) of the grams — the density/recall tradeoff that makes
  char-level dedup affordable at corpus scale.
- ``text_bpe_pair_merges`` — the first step of byte-pair-encoding tokenizer
  training: corpus-frequency-weighted counts of adjacent character pairs
  inside words, top 30 merge candidates.

Determinism: the gram hash is a portable base-31 polynomial over Unicode
code points (``ascii`` = code point of first char in BOTH Spark and DuckDB;
``substring`` is character-based in both), with precomputed integer power
literals — max value ~2.5e17 < int64, no modulus needed, bit-identical in
both engines. Both queries are therefore fully oracle-checked.

Scale notes (100 TB):
- winnowing explodes one row per gram position (~n_chars per doc), but the
  selection window partitions by ``doc_id`` — no global sort, no skew
  beyond document length. The fingerprint posting list is df-capped
  (drop hashes appearing in > 10 docs — boilerplate shingles) exactly like
  the capped-Jaccard plan, bounding candidate-pair volume; the pair join is
  an equi-join on the 8-byte fingerprint.
- BPE pair counting is a scan + map-side partial count on a key space
  bounded by |alphabet|^2; the global top-30 uses ``orderBy().limit()``
  (TakeOrderedAndProject — per-task partial top-k, no single-partition
  window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

#: Winnowing parameters: k-gram size, window length, posting df cap,
#: minimum shared fingerprints to emit a pair.
K = 8
W_WIN = 4
DF_CAP = 10
MIN_SHARED = 2

#: Precomputed 31^j literals (j = K-1 .. 0) shared by both engines.
_POW31 = [31**j for j in range(K - 1, -1, -1)]


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """Selected winnowing fingerprints ``(doc_id, fp)`` for a frame with
    ``doc_id`` and ``text`` columns. Guarantee (Schleimer et al. 2003,
    the reason `tests/test_properties.py` can assert it): any common
    substring of length >= K + W_WIN - 1 in the normalized space-stripped
    text yields at least one shared fingerprint.

    Round-6 rewrite: code points, per-position gram hashes, the sliding
    window minima, and the per-doc dedup all evaluate ARRAY-SIDE in one
    scan projection (transform / slice / array_min / array_distinct) —
    zero shuffles until the posting aggregation. The previous form
    exploded one row per CHAR POSITION and pushed all of them through a
    per-doc sort window plus a (doc_id, fp) distinct: two full shuffles
    of ~n_chars rows per doc. Now only the SELECTED fingerprints
    (≈ 2/(W+1) density, then per-doc distinct) ever become rows; output
    is row-for-row identical, so every oracle is unchanged (measured at
    sf0.1: see SCALE.md). Array work is O(n·W) element reads per doc,
    bounded by document length — the arrays live inside one task's row,
    never in shuffle buffers."""
    s = F.regexp_replace(normalize_text("text"), " ", "")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), s.alias("s")
    ).where(F.length("s") >= K + W_WIN - 1)
    # cps is already BIGINT (cast once per char below), so each hash term
    # is a bare element_at * pow — 8 fewer interpreted casts per position.
    hash_terms = " + ".join(
        f"element_at(cps, p + {j}) * {_POW31[j]}" for j in range(K)
    )
    return (
        # split('') yields the char array in ONE O(n) pass; the previous
        # ascii(substring(s, i, 1)) per position re-scanned the UTF-8
        # string from the start on every call (substring is O(i) on
        # UTF8String), making the codepoint array O(n²) per document —
        # measured r11: the fingerprint stage at sf0.1 dropped 3.1 → 2.1 s
        # warm (7.1 → 2.3 cold), and the gap grows with document length
        # (testdata docs are short; real corpora are KBs). Identical
        # output for every non-empty string (code points, not bytes, in
        # both forms); the length >= K+W-1 filter above excludes the only
        # divergent input (empty string).
        base.withColumn(
            "cps",
            F.expr("transform(split(s, ''), c -> CAST(ascii(c) AS BIGINT))"),
        )
        .withColumn(
            "hs",
            F.expr(f"transform(sequence(1, length(s) - {K - 1}), p -> {hash_terms})"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    # least() over W_WIN direct element_at reads instead of
                    # array_min(slice(...)): the slice allocated a fresh
                    # W-element array PER POSITION in the interpreted HOF
                    # evaluator (higher-order functions don't codegen) —
                    # identical minima, measured ~35% off the fingerprint
                    # scan stage at sf0.1 (r15).
                    f"array_distinct(transform(sequence(1, size(hs) - {W_WIN - 1}), "
                    "p -> least("
                    + ", ".join(f"element_at(hs, p + {j})" for j in range(W_WIN))
                    + ")))"
                )
            ).alias("fp"),
        )
    )


def winnowing_pairs(
    docs: DataFrame, *, df_cap: int = DF_CAP, min_shared: int = MIN_SHARED
) -> DataFrame:
    """Near-dup pairs from winnowing fingerprints. ``df_cap`` is an
    ABSOLUTE document-frequency cap calibrated to the corpus size —
    at production scale pass a corpus-relative value (e.g.
    ``df_cap = int(1e-4 * n_docs)``); SCALE.md's replication experiment
    shows why a fixed cap empties the report under 16× duplication."""
    # Same persist discipline as ngram_jaccard_pairs: the fingerprint
    # frame feeds THREE consumers (df count + both sides of the self-join)
    # and the char-position explode/window pipeline above it is the
    # expensive part — unpersisted it computes 3× (measured −23% warm,
    # −45% cold at sf0.1 from persisting fps + posting; see SCALE.md).
    fps = winnowing_fingerprints(docs).transform(persist_tracked)
    # Broadcast ANTI-join on the df > cap HEAD (bounded by |fps|/df_cap by
    # pigeonhole), not an inner join on the keep tail (~the whole
    # fingerprint vocabulary — a corpus-sized broadcast/shuffle at scale).
    # Identical predicate: fp ∉ hot ⟺ df(fp) ≤ df_cap. Same lever as
    # ngram_jaccard_pairs. Inner<->anti equivalence also needs non-null
    # keys (anti keeps nulls, inner drops them): fp is a least() over
    # xxhash64 values of non-null substrings — provably non-null
    # (ADVICE r15).
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") > df_cap
    )
    posting = fps.join(
        F.broadcast(hot.select("fp")), "fp", "left_anti"
    ).transform(persist_tracked)
    a = posting.alias("a")
    b = posting.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select("id_a", "id_b", F.col("shared").cast("long").alias("shared"))
    )


def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint near-dup pairs (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    return winnowing_pairs(docs)


_HASH_SQL = " + ".join(
    # BIGINT cast first: DuckDB's ascii() is INT32 and INT32 * INT32
    # overflows before promotion.
    f"CAST(ascii(substr(g, {j + 1}, 1)) AS BIGINT) * {_POW31[j]}"
    for j in range(K)
)

_WINNOW_SQL = f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         replace({_NORM.format(x="text")}, ' ', '') AS s
  FROM documents
  WHERE len(replace({_NORM.format(x="text")}, ' ', '')) >= {K + W_WIN - 1}
),
pos AS (
  SELECT doc_id, len(s) - {K - 1} AS n,
         UNNEST(generate_series(1, len(s) - {K - 1})) AS pos, s
  FROM base
),
hashes AS (
  SELECT doc_id, n, pos, {_HASH_SQL} AS h
  FROM (SELECT doc_id, n, pos, substr(s, pos, {K}) AS g FROM pos)
),
winmin AS (
  SELECT doc_id, n, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {W_WIN - 1} FOLLOWING) AS fp
  FROM hashes
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE pos <= n - {W_WIN - 1}
),
keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {DF_CAP}),
posting AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
FROM posting a JOIN posting b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {MIN_SHARED}
"""


def text_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 BPE merge candidates (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias(
            "w"
        )
    ).where(F.length("w") >= 2)
    # adjacent pairs from the O(n) char array (element_at is O(1));
    # substring(w, i, 2) per position is O(i) on UTF8String — quadratic
    # on pathological long [a-z]+ runs, the same latent shape the r11
    # winnowing rewrite removed. The char array materializes ONCE in its
    # own projection (a split inside the lambda would re-split per
    # element). Identical output: ASCII-only words (the [a-z]+
    # extraction), length >= 2 filtered above.
    pairs = words.select(F.split("w", "").alias("c")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(c) - 1), "
                "i -> concat(element_at(c, i), element_at(c, i + 1)))"
            )
        ).alias("pair")
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "pair", F.col("cnt").cast("long").alias("cnt")
    )


_BPE_SQL = """
WITH words AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
),
pairs AS (
  SELECT UNNEST(list_transform(
           generate_series(1, len(w) - 1), i -> substr(w, i, 2))) AS pair
  FROM words
  WHERE len(w) >= 2
),
counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank,
       pair, cnt
FROM counted
ORDER BY cnt DESC, pair ASC
LIMIT 30
"""


QUERIES = {
    "dedup_winnowing_pairs": dedup_winnowing_pairs,
    "text_bpe_pair_merges": text_bpe_pair_merges,
}

ORACLE = {
    "dedup_winnowing_pairs": _WINNOW_SQL,
    "text_bpe_pair_merges": _BPE_SQL,
}
