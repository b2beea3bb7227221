"""Vector similarity search (SURVEY.md §2.9 X3).

Brute-force exact cosine top-k as the correctness baseline, plus an
LSH-bucketed approximate path for scale.

Determinism contract: vectors are quantized to integers
(``floor(x * 1e4)``) before any arithmetic. Dot products and norms over
64-dim quantized vectors are integer-valued and < 2^53, so they are EXACT
in both BIGINT and DOUBLE arithmetic regardless of summation order — the
cosine scores hash-match the DuckDB oracle bit-for-bit, and top-k
membership cannot flip on float noise (ties broken by candidate id).

Scale notes (100 TB): brute-force is O(Q×N) dot products — fine for a
bounded query set against a broadcast of N≤10⁶ candidates, wrong beyond.
The scale path is :func:`brp_lsh_topk` (bucketed random projections: only
same-bucket candidates are scored) or an IVF layout: k-means coarse
centroids as a broadcast dim, candidates pre-partitioned by nearest
centroid, queries routed to their nprobe nearest centroids — both turn the
cross product into an equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from kenshin_backup_spark.cache import persist_tracked

#: Quantization scale for embedding elements (see module docstring).
VEC_QUANT = 10_000


def quantize_vec(col: Column | str) -> Column:
    """array<float> → array<bigint> via floor(double(x) · 1e4).

    The cast to double BEFORE multiplying is load-bearing: float32 → double
    is exact, and the multiply then happens in double in both engines.
    Multiplying in float32 (Spark's default for float·int) rounds
    differently than DuckDB and flips the floor by ±1.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * VEC_QUANT).cast("long"))


def qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (BIGINT)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k nearest
    candidates by cosine similarity (quantized-exact; ties → lower id).

    Plan: broadcast the (small) query side against the candidate scan,
    score with codegen'd array expressions, rank per query with a window.
    Returns ``(query_id, neighbor_id, cosine, rank)``.
    """
    # Zero-norm vectors would score cosine NaN, which Spark ranks largest
    # in a descending window — exclude them (oracles mirror the filter).
    q = (
        queries.select(F.col(id_col).alias("query_id"), quantize_vec(vec_col).alias("qv"))
        .withColumn("qn", qdot(F.col("qv"), F.col("qv")))
        .where(F.col("qn") > 0)
    )
    c = (
        candidates.select(F.col(id_col).alias("neighbor_id"), quantize_vec(vec_col).alias("cv"))
        .withColumn("cn", qdot(F.col("cv"), F.col("cv")))
        .where(F.col("cn") > 0)
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    dot = qdot(F.col("qv"), F.col("cv"))
    cos = (
        dot / F.sqrt(F.col("qn").cast("double") * F.col("cn").cast("double"))
    ).cast("double")
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def cosine_near_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup X2, embedding variant):
    all (a < b) pairs with quantized-exact cosine ≥ threshold.

    All-pairs is the exact baseline (O(N²) dots — fine to ~10⁴ rows); the
    scale path replaces the cross join with LSH/IVF bucketing (same
    verification expression on candidates only).
    """
    base = (
        df.select(F.col(id_col).alias("id"), quantize_vec(vec_col).alias("v"))
        .withColumn("n2", qdot(F.col("v"), F.col("v")))
        # zero-norm guard: cosine with a zero vector is NaN, and NaN
        # comparison/ordering semantics differ across engines
        .where(F.col("n2") > 0)
        # persist: quantization + self-dot feed both sides of the pair
        # join (house persist rule; baseline op, but the rule still holds)
        .transform(persist_tracked)
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    dot = qdot(F.col("a.v"), F.col("b.v"))
    cos = (
        dot / F.sqrt(F.col("a.n2").cast("double") * F.col("b.n2").cast("double"))
    ).cast("double")
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def srp_planes(num_planes: int, dim: int, *, seed: int = 42) -> list[list[int]]:
    """Seeded sign-random-projection hyperplanes with INTEGER components.

    Integer components make the projection sign an exact integer comparison
    in any engine (no float dot-product ulp drift), so SRP bucketing is
    deterministic and oracle-mirrorable — unlike Spark ML's private-float
    BRP hash functions.
    """
    import random

    rng = random.Random(seed)
    return [
        [rng.randint(-1000, 1000) for _ in range(dim)] for _ in range(num_planes)
    ]


def cosine_near_pairs_bucketed(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs WITHOUT the all-pairs theta-join:
    SRP-LSH candidate generation + exact quantized-cosine verification
    (the two-tier shape of ``dedup_lsh_verified``).

    Plan: per vector, ``num_planes`` sign bits from integer dot products
    with seeded integer hyperplanes → split into ``bands`` band keys →
    self **equi-join** on (band, key) → distinct candidate pairs → exact
    cosine filter. Near-duplicate vectors (cosine ≥ 0.95 ⇒ angle ≤ 18°)
    agree on any one band of 4 bits with high probability; recall is
    approximate but DETERMINISTIC, and identical in DuckDB — so unlike
    MinHash/BRP the result is fully oracle-checkable.

    At 100 TB: signature computation is scan-side codegen; the only
    shuffles are the (band, key) equi-join and the pair dedup — the same
    posting-list shape as the shingle join, with Σ(bucket size²) bounded
    by the bucket granularity (tune ``num_planes``/``bands``).
    """
    if num_planes % bands != 0:
        raise ValueError("num_planes must divide evenly into bands")

    base = (
        df.select(F.col(id_col).alias("id"), quantize_vec(vec_col).alias("v"))
        .withColumn("n2", qdot(F.col("v"), F.col("v")))
        # zero-norm guard: see cosine_near_pairs
        .where(F.col("n2") > 0)
        # persist: base feeds the signature build AND both verify-join
        # sides (va/vb) — without it the 64-dim quantize+norm pass runs
        # three times from the parquet scan
        .transform(persist_tracked)
    )
    # persist: both sides of the band self-join read the signatures; without
    # it the num_planes 64-dim projections run twice
    sigs = _srp_band_keys(
        base, id_out="id", num_planes=num_planes, bands=bands, dim=dim, seed=seed
    ).transform(persist_tracked)

    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    va = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n2").alias("na")
    )
    vb = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    dot = qdot(F.col("va"), F.col("vb"))
    cos = (
        dot / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
    ).cast("double")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _srp_band_keys(
    df: DataFrame,
    *,
    id_out: str,
    vec_col: str = "v",
    num_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Explode a quantized-vector frame into ``(id, band, key)`` SRP band
    signatures (shared by the near-pair and top-k SRP paths).

    The plane matrix is emitted as ONE SQL array-of-arrays literal parsed
    JVM-side rather than ``num_planes × dim`` individual ``F.lit`` calls —
    the per-literal py4j round-trips cost multiple SECONDS of driver-side
    plan build at 16×64 (measured 1.6 s → ~0 s); Catalyst constant-folds
    the parsed literal identically either way.
    """
    bits_per_band = num_planes // bands
    planes = srp_planes(num_planes, dim, seed=seed)
    planes_sql = (
        "array("
        + ",".join("array(" + ",".join(f"{c}L" for c in p) + ")" for p in planes)
        + ")"
    )
    bits_sql = (
        f"transform({planes_sql}, p -> CASE WHEN "
        f"aggregate(zip_with({vec_col}, p, (x, y) -> x * y), 0L, "
        "(acc, t) -> acc + t) > 0 THEN 1 ELSE 0 END)"
    )
    key_structs = ", ".join(
        f"named_struct('band', {b}, 'key', CAST("
        + " + ".join(
            f"element_at(__bits, {b * bits_per_band + j + 1}) * {1 << j}"
            for j in range(bits_per_band)
        )
        + " AS BIGINT))"
        for b in range(bands)
    )
    return (
        df.selectExpr("id", f"{bits_sql} AS __bits")
        .selectExpr("id", f"explode(array({key_structs})) AS bk")
        .selectExpr(f"id AS {id_out}", "bk.band AS band", "bk.key AS key")
    )


def srp_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Scalable ANN **top-k** via SRP banding + exact verify — the same
    integer-hyperplane candidate generation as
    :func:`cosine_near_pairs_bucketed`, applied to the top-k shape: query
    band signatures equi-join candidate band signatures, the distinct
    same-bucket pairs get an exact quantized cosine, and a per-query window
    keeps the k best (ties → lower neighbor id).

    Unlike :func:`brp_lsh_topk`/:func:`ivf_topk` the banding is integer-
    deterministic, so the result — though approximate in recall — is fully
    DuckDB-oracle-checkable.

    At 100 TB: no cross join anywhere; the plan is scan-side codegen
    signatures → one (band, key) equi-join → per-query top-k (partial
    window via AQE). Candidate volume is bounded by Σ(bucket_q ×
    bucket_c) per band — tuned by ``num_planes``/``bands`` exactly like
    the near-pair variant.
    """
    # Zero-norm guard: a vector whose components all quantize to 0 would
    # yield cosine NaN, and Spark ranks NaN LARGEST in a descending window
    # (DuckDB differs) — drop such vectors before signatures/ranking on
    # both the Spark and oracle sides.
    q = (
        queries.select(F.col(id_col).alias("id"), quantize_vec(vec_col).alias("v"))
        .withColumn("n2", qdot(F.col("v"), F.col("v")))
        .where(F.col("n2") > 0)
    )
    c = (
        candidates.select(F.col(id_col).alias("id"), quantize_vec(vec_col).alias("v"))
        .withColumn("n2", qdot(F.col("v"), F.col("v")))
        .where(F.col("n2") > 0)
        # persist: the corpus side feeds the signature build AND the exact
        # verify join (cv) — one quantize+norm pass instead of two. The
        # query side stays unpersisted (bounded rows; a cache build would
        # cost more than the recompute).
        .transform(persist_tracked)
    )

    kwargs = dict(num_planes=num_planes, bands=bands, dim=dim, seed=seed)
    qsig = _srp_band_keys(q, id_out="query_id", **kwargs)
    csig = _srp_band_keys(c, id_out="neighbor_id", **kwargs)
    cand = (
        qsig.join(csig, ["band", "key"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))

    qv = q.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("n2").alias("qn")
    )
    cv = c.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("n2").alias("cn"),
    )
    dot = qdot(F.col("qv"), F.col("cv"))
    cos = (
        dot / F.sqrt(F.col("qn").cast("double") * F.col("cn").cast("double"))
    ).cast("double")
    scored = (
        cand.join(qv, "query_id").join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_topk_seeded(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN top-k with a DETERMINISTIC coarse quantizer — the same
    inverted-file layout as :func:`ivf_topk` (cells as the join key,
    queries probe ``nprobe`` cells, exact scoring only inside probed
    cells) but with every stage integer-exact, so unlike the k-means
    variant the whole pipeline is DuckDB-oracle-checkable:

    - **Quantizer "training"** is seed selection, not iteration: the
      centroids are the ``n_centroids`` corpus vectors with the smallest
      ``md5(id)`` (a deterministic pseudo-random draw both engines
      compute identically), ranked into cids by that order.
    - **Assignment / routing** use squared L2 on the quantized vectors
      via ``n2_v + n2_c − 2·dot(v,c)`` — every term an exact BIGINT
      (|q|≤~1e5, 64 dims ⇒ well under 2^53), ties → lower cid.
    - **Scoring** is the exact quantized cosine of the other X3 paths.

    Plan shape (the 100 TB layout): the centroid table is a bounded
    driver collect (guarded) re-emitted as ONE SQL literal, so candidate
    assignment is a pure scan-side projection — the corpus NEVER
    shuffles for assignment; the probe→cell join broadcasts the tiny
    routed-query side onto the assigned corpus; the only window is
    per-query top-k over probed-cell candidates. Recall is approximate
    (unprobed cells may hide true neighbors — seed quality is a real
    trade vs k-means) but deterministic; exact twin: :func:`cosine_topk`.
    """
    if n_centroids > 4096:
        raise ValueError(
            f"n_centroids={n_centroids} exceeds the broadcast-dim contract "
            "(centroids are driver-collected and inlined as a plan literal)"
        )
    from kenshin_backup_spark.operators.scalepat import global_topk

    def prep(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col).alias("id"), quantize_vec(vec_col).alias("v"))
            .withColumn("n2", qdot(F.col("v"), F.col("v")))
            # zero-norm guard: see cosine_topk
            .where(F.col("n2") > 0)
        )

    # persist: the candidate base feeds the centroid-pick job AND the
    # assignment projection (house multi-consumer rule)
    base = prep(candidates).transform(persist_tracked)

    # Seed pick: bounded TakeOrderedAndProject (never a global sort), then
    # a driver-side collect of n_centroids quantized vectors — the bound is
    # the guarded n_centroids, never data volume.
    seeds = (
        global_topk(
            base.withColumn("__h", F.md5(F.col("id").cast("string"))),
            [F.asc("__h"), F.asc("id")],
            n_centroids,
        )
        .select("__h", "id", "v", "n2")
        .collect()
    )
    seeds.sort(key=lambda r: (r["__h"], r["id"]))

    # One SQL literal for the centroid table (per-element F.lit would cost
    # n_centroids×dim py4j round-trips — see _srp_band_keys).
    cents_sql = (
        "array("
        + ",".join(
            f"named_struct('cid', {i + 1}L, 'cn2', {r['n2']}L, "
            "'cv', array(" + ",".join(f"{int(x)}L" for x in r["v"]) + "))"
            for i, r in enumerate(seeds)
        )
        + ")"
    )
    # exact squared-L2 to centroid s, as a struct so array_min/array_sort
    # tie-break on the lower cid lexicographically
    d2_struct = (
        f"transform({cents_sql}, s -> struct("
        "n2 + s.cn2 - 2 * aggregate(zip_with(v, s.cv, (x, y) -> x * y), 0L, "
        "(acc, t) -> acc + t) AS d2, s.cid AS cid))"
    )

    assigned = base.selectExpr(
        "id AS neighbor_id",
        "v AS cv",
        "n2 AS cn",
        f"array_min({d2_struct}).cid AS cid",
    )
    routed = prep(queries).selectExpr(
        "id AS query_id",
        "v AS qv",
        "n2 AS qn",
        f"explode(transform(slice(array_sort({d2_struct}), 1, {nprobe}), "
        "s -> s.cid)) AS cid",
    )

    # Each candidate lives in exactly ONE cell (rn=1 assignment), so the
    # probe join cannot duplicate a (query, neighbor) pair — no distinct.
    paired = routed.join(assigned, "cid").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = (
        qdot(F.col("qv"), F.col("cv"))
        / F.sqrt(F.col("qn").cast("double") * F.col("cn").cast("double"))
    ).cast("double")
    scored = paired.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors — the 100 TB
    layout described in SCALE.md: k-means coarse centroids as a broadcast
    dim; candidates pre-partitioned by nearest centroid; queries routed to
    their ``nprobe`` nearest centroids; exact cosine only within probed
    buckets. The cross product becomes an equi-join on centroid id.

    Approximate (probed buckets may miss true neighbors) → rows-only check;
    exact twin: :func:`cosine_topk`.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__arr"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    # The centroid table is collected to the driver and re-broadcast below —
    # by construction it must stay a broadcast-sized dim. Guard the contract
    # rather than silently building a huge driver-side list.
    if n_centroids > 65536:
        raise ValueError(
            f"n_centroids={n_centroids} exceeds the broadcast-dim contract "
            "(centroids are driver-collected); shard the corpus or use brp_lsh_topk"
        )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features", predictionCol="cid")
    model = km.fit(feat)
    assigned = model.transform(feat).select(
        "neighbor_id", F.col("__arr").alias(vec_col), "cid"
    )

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = queries.sparkSession.createDataFrame(
        centroids, f"cid int, centroid array<double>"
    )

    # route each query to its nprobe nearest centroids (broadcast dim)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(cent_df))
    qdist = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("query_id").orderBy(F.asc(qdist), F.asc("cid"))
    routed = (
        qc.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= nprobe)
        .select("query_id", "qv", "cid")
    )

    # exact scoring ONLY within probed buckets (equi-join on cid)
    paired = routed.join(assigned, "cid").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    qq = quantize_vec("qv")
    cc = quantize_vec(vec_col)
    scored = paired.select(
        "query_id",
        "neighbor_id",
        (
            qdot(qq, cc)
            / F.sqrt(qdot(qq, qq).cast("double") * qdot(cc, cc).cast("double"))
        ).cast("double").alias("cosine"),
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
    )


def knn_label_vote(
    topk: DataFrame, labels: DataFrame, *, id_col: str = "vec_id", label_col: str = "label"
) -> DataFrame:
    """Majority label among a query's top-k neighbors (ties → smaller
    label). Composes with :func:`cosine_topk` for kNN classification."""
    lab = labels.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nb_label")
    )
    votes = (
        topk.join(F.broadcast(lab), "neighbor_id")
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nb_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("nb_label").alias("predicted_label"), "votes")
    )


def brp_lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors via Bucketed Random Projection LSH
    (Spark ML) — the 100 TB path: same-bucket equi-join instead of a cross
    product. Euclidean metric; on L2-normalized vectors the ranking agrees
    with cosine. Approximate → rows-only check in the driver harness.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
        return df.select(
            F.col(id_col).alias(out_id), array_to_vector(unit).alias("features")
        )

    qd = prep(queries, "query_id")
    cd = prep(candidates, "neighbor_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(cd)
    joined = model.approxSimilarityJoin(cd, qd, 2.0, distCol="l2")
    pairs = (
        joined.select(
            F.col("datasetB.query_id").alias("query_id"),
            F.col("datasetA.neighbor_id").alias("neighbor_id"),
            F.col("l2").cast("double").alias("l2"),
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("l2"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
