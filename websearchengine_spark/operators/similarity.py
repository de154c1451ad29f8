"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: JVM-side ``aggregate``/``zip_with`` dot
  product — no Python in the hot path, fully whole-stage-codegen'd.
- Sign-LSH bucketed variant: bucket = sign-bit pattern over a fixed set of
  dimensions; the query only scans its own bucket — the scale path (the
  bucket column becomes the storage partition key on a real deployment, so
  the scan prunes like the postings term-bucket).
- Embedding-cosine near-dup pairs with blocking (label or LSH bucket)
  so verification is never all-pairs.

Cosine here assumes unit-normalized inputs are NOT guaranteed: we compute
dot/(|a||b|) explicitly, accumulating in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_SIGN_DIMS = [0, 7, 14, 21, 28, 35, 42, 49]  # legacy axis-aligned contract

# random-hyperplane LSH defaults: seeded + rounded so Spark, the SQL
# oracle, and any pure-Python oracle derive bit-identical planes
HLSH_SEED = 42
HLSH_BITS = 8
HLSH_TABLES = 4
HLSH_PROBE_HAMMING = 1
NEAR_DUP_MAX_BUCKET = 256


def hyperplanes(
    dim: int, bits: int = HLSH_BITS, seed: int = HLSH_SEED, table: int = 0
) -> list[list[float]]:
    """``bits`` Gaussian hyperplanes for one LSH table — deterministic in
    (seed, table) and rounded to 6 dp so every engine (Spark literal
    arrays, DuckDB literal lists) computes identical sign bits."""
    import numpy as np

    rng = np.random.default_rng(seed * 1_000_003 + table)
    return [
        [round(float(v), 6) for v in row]
        for row in rng.standard_normal((bits, dim))
    ]


def hyperplane_bucket(col, planes: list[list[float]]) -> F.Column:
    """bucket = Σ 2^i · [plane_i · x >= 0] — whole-stage-codegen'd; on a
    stored table this column is the partition key (scan pruning)."""
    b = F.lit(0)
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(v) for v in p])
        b = b + F.when(_dot(col, pl) >= 0, F.lit(1 << i)).otherwise(0)
    return b.cast("long")


def _py_bucket(vec: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        if sum(float(x) * v for x, v in zip(vec, p)) >= 0:
            b |= 1 << i
    return b


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, query_vec: list[float], k: int = 20
) -> DataFrame:
    """(vec_id, score) — exact top-k by cosine to ``query_vec``.
    The query vector is a literal array (broadcast by construction); the
    scan + dot product is one codegen stage, top-k is
    TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(v * v for v in query_vec) ** 0.5
    score = F.round(
        _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn)), 6
    )
    return (
        embeddings.select("vec_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def with_sign_bucket(embeddings: DataFrame, dims: list[int] = LSH_SIGN_DIMS) -> DataFrame:
    """bucket = Σ 2^i · [embedding[dims[i]] >= 0] — a deterministic
    hyperplane-LSH with axis-aligned planes."""
    b = F.lit(0)
    for i, d in enumerate(dims):
        b = b + F.when(
            F.element_at(F.col("embedding"), d + 1) >= 0, F.lit(1 << i)
        ).otherwise(0)
    return embeddings.withColumn("bucket", b.cast("int"))


def cosine_topk_lsh(
    embeddings: DataFrame, query_vec: list[float], k: int = 20,
    dims: list[int] = LSH_SIGN_DIMS,
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket.  On a stored
    table partitioned by ``bucket`` this is a partition-pruned scan."""
    qbucket = 0
    for i, d in enumerate(dims):
        if query_vec[d] >= 0:
            qbucket |= 1 << i
    bucketed = with_sign_bucket(embeddings, dims).where(F.col("bucket") == qbucket)
    return cosine_topk_bruteforce(bucketed, query_vec, k)


def cosine_topk_hlsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    bits: int = HLSH_BITS,
    n_tables: int = HLSH_TABLES,
    probe_hamming: int = HLSH_PROBE_HAMMING,
    seed: int = HLSH_SEED,
) -> DataFrame:
    """Approximate top-k via seeded random-hyperplane sign-LSH with
    multi-table probing: a row survives if ANY of the ``n_tables``
    independent tables places it within Hamming distance
    ``probe_hamming`` of the query's bucket (bit_count(bucket XOR
    q_bucket)).  Recall grows with tables/probe radius while each table's
    candidate mass stays ~|corpus| / 2^bits · Σ_{i<=h} C(bits,i); the
    whole filter is one codegen'd projection, then brute-force cosine
    over the survivors."""
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        planes = hyperplanes(dim, bits, seed, t)
        qb = _py_bucket(query_vec, planes)
        dist = F.bit_count(
            hyperplane_bucket(F.col("embedding"), planes).bitwiseXOR(F.lit(qb))
        )
        c = dist <= F.lit(probe_hamming)
        cond = c if cond is None else (cond | c)
    return cosine_topk_bruteforce(embeddings.where(cond), query_vec, k)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + nprobe search —
# the second scale path beside sign-LSH.  Centroids are k x dim floats
# (driver/broadcast scale); vector->cluster assignment is map-side numpy
# matmul in an Arrow batch; on a stored table ``cluster`` is the
# partition key, so a query scans only its nprobe partitions.
# --------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_ITERS = 4


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
    seed: int = HLSH_SEED,
):
    """Deterministic Lloyd's k-means over unit-normalized vectors.

    Init: the ``n_centroids`` vectors with the smallest md5(vec_id || seed)
    (a seeded, order-independent sample) — selected as a distributed
    TakeOrdered (``orderBy(md5).limit(k)``), so the driver sees ≤ k rows
    regardless of corpus size.  Each iteration: map-side assignment (numpy
    matmul per Arrow batch) + one groupBy mean (k·dim rows); only the
    k x dim centroid matrix round-trips through the driver — that is the
    IVF design point (coarse quantizers are small by construction), the
    vectors themselves never leave the executors.

    Centroids are rounded to 6 dp after init and after every update so
    any engine (this distributed path, the sequential numpy twin in
    oracle/ivf.py that generates the DuckDB gate SQL) walks a
    bit-identical trajectory: float-sum-order noise in the means lives at
    ~1e-15 and dies at the rounding, while assignments only depend on the
    rounded matrix."""
    import numpy as np

    # Lloyd's makes `iters` passes over the corpus (init + one assignment
    # per iteration): materialize the projection once so training costs
    # ONE source scan, not iters+1 — at corpus scale each avoided pass is
    # a full table read.  StorageLevel default (memory, spill-to-disk)
    # keeps this safe when the vectors outsize executor memory.
    vecs = embeddings.select("vec_id", "embedding").persist()
    ranked = (
        vecs.orderBy(
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(f"|{seed}"))
            ),
            F.col("vec_id"),
        )
        .limit(n_centroids)
        .collect()
    )
    init = sorted(ranked, key=lambda r: r.vec_id)
    cent = np.array([list(r.embedding) for r in init], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    cent = np.round(cent, 6)
    try:
        for _ in range(iters):
            assigned = ivf_assign(vecs, cent)
            means = (
                assigned.select(
                    "cluster", F.posexplode("embedding").alias("dim", "v")
                )
                .groupBy("cluster", "dim")
                .agg(F.avg("v").alias("m"))
                .collect()
            )
            new = cent.copy()
            by_c: dict[int, dict[int, float]] = {}
            for r in means:
                by_c.setdefault(r.cluster, {})[r.dim] = r.m
            for c, dims in by_c.items():
                vec = np.array(
                    [dims[d] for d in sorted(dims)], dtype=np.float64
                )
                nrm = np.linalg.norm(vec)
                if nrm > 1e-12:
                    new[c] = vec / nrm
            cent = np.round(new, 6)
    finally:
        vecs.unpersist()
    return cent


def ivf_assign(embeddings: DataFrame, centroids) -> DataFrame:
    """embeddings + ``cluster`` column = argmax cosine to the broadcast
    centroid matrix; one numpy matmul per Arrow batch, map-side only."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = T.StructType(
        embeddings.schema.fields + [T.StructField("cluster", T.IntegerType())]
    )
    cols = embeddings.columns

    def _assign(batches):
        cent = bc.value
        for b in batches:
            v = np.array([list(x) for x in b["embedding"]], dtype=np.float64)
            nrm = np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = (v / nrm) @ cent.T
            b = b.copy()
            b["cluster"] = sims.argmax(axis=1).astype("int32")
            yield b[cols + ["cluster"]]

    return embeddings.mapInPandas(_assign, schema)


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    seed: int = HLSH_SEED,
    centroids=None,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` clusters whose centroids
    are closest to the query, brute-force inside.  Pass ``centroids``
    (from ivf_train) to amortize training across queries."""
    import numpy as np

    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))[: max(1, nprobe)]
    probes = [int(c) for c in order]
    assigned = ivf_assign(embeddings, centroids)
    cand = assigned.where(F.col("cluster").isin(probes))
    return cosine_topk_bruteforce(cand, query_vec, k)


def ivf_build(
    embeddings: DataFrame,
    out_dir: str,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
    seed: int = HLSH_SEED,
):
    """Persist the IVF layout: train, assign, and write vectors
    partitioned BY CLUSTER (``vectors/cluster=<c>/``) with the k x dim
    centroid matrix as a parquet sidecar.  This is the at-scale shape the
    in-memory path's docstrings promise: a query reads only its nprobe
    cluster partitions — directory-level partition pruning, the same
    mechanism as the postings term-bucket — instead of scanning and
    re-assigning the corpus.  Returns the trained centroids."""
    spark = embeddings.sparkSession
    cent = ivf_train(embeddings, n_centroids, iters, seed)
    ivf_assign(embeddings, cent).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(f"{out_dir}/vectors")
    spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(cent)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    return cent


def ivf_query(
    spark,
    out_dir: str,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Top-k over a persisted IVF layout: load the (k x dim) centroid
    sidecar driver-side, pick the nprobe nearest clusters, and scan ONLY
    those partitions (`cluster IN (...)` prunes at the directory level —
    verify with .explain(): PartitionFilters on the vectors scan)."""
    import numpy as np

    rows = sorted(
        spark.read.parquet(f"{out_dir}/centroids").collect(),
        key=lambda r: r.cluster,
    )
    cent = np.array([r.centroid for r in rows], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(cent @ q))[: max(1, nprobe)]]
    cand = spark.read.parquet(f"{out_dir}/vectors").where(
        F.col("cluster").isin(probes)
    )
    return cosine_topk_bruteforce(cand, query_vec, k)


def near_dup_pairs_cosine(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    bits: int = HLSH_BITS,
    seed: int = HLSH_SEED,
    max_bucket: int = NEAR_DUP_MAX_BUCKET,
) -> DataFrame:
    """(vec_a, vec_b, score) with vec_a < vec_b and cosine >= threshold.

    Default blocking is the seeded hyperplane-LSH bucket with a
    ``max_bucket`` skew guard (blocks larger than the guard are dropped —
    a degenerate boilerplate cluster would otherwise go quadratic, the
    same guard as dedup.minhash_candidate_pairs).  Pass ``block_col`` to
    block on a metadata column instead (e.g. the gate's ``label``), in
    which case blocks are assumed bounded by construction."""
    if block_col is not None:
        # no cast: a string block column must block on its raw value (a
        # numeric cast would NULL it out and the self-join would match
        # nothing, silently)
        e = embeddings.select(
            F.col("vec_id"),
            F.col(block_col).alias("blk"),
            F.col("embedding"),
            _norm(F.col("embedding")).alias("nrm"),
        )
    else:
        dim = len(embeddings.select("embedding").head().embedding)
        planes = hyperplanes(dim, bits, seed, 0)
        e = embeddings.select(
            F.col("vec_id"),
            hyperplane_bucket(F.col("embedding"), planes).alias("blk"),
            F.col("embedding"),
            _norm(F.col("embedding")).alias("nrm"),
        )
        ok = (
            e.groupBy("blk")
            .agg(F.count(F.lit(1)).alias("n"))
            .where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
            .select("blk")
        )
        e = e.join(ok, "blk")
    a = e.select(
        F.col("blk"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("blk"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    score = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    return (
        a.join(b, "blk")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", score.alias("score"))
        .where(F.col("score") >= threshold)
    )


SEMDEDUP_T = 0.9
SEMDEDUP_MAX_CLUSTER = 4096


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = SEMDEDUP_T,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
    seed: int = HLSH_SEED,
    centroids=None,
    max_cluster: int = SEMDEDUP_MAX_CLUSTER,
) -> DataFrame:
    """SemDeDup-style embedding-level deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means coarse clustering bounds the pairwise
    stage, then WITHIN each cluster a vector is a duplicate iff its
    cosine to some LOWER-vec_id vector in the same cluster is >=
    ``threshold`` (6-dp rounded, the near_dup convention).

    Keep rule is greedy-independent ("dup of any earlier vector", not
    "dup of an earlier KEPT vector"): it needs no sequential scan, is a
    pure join, and is deterministic — the deviation from the paper's
    sequential sweep only matters for chains a-b-c where sim(a,b) and
    sim(b,c) pass but sim(a,c) does not, where it drops strictly more
    (both b and c); at near-dup thresholds such chains are rare and
    dropping more near-dups is the conservative direction for training
    data.

    Scale shape: clustering is the IVF trainer (driver holds only the
    k x dim centroid matrix), assignment is one map-side matmul, and the
    quadratic stage is confined to within-cluster blocks — at corpus
    scale pick ``n_centroids ~ N / target_cluster_size`` (the paper uses
    ~100k clusters at web scale).  ``max_cluster`` is the skew guard:
    clusters larger than it skip the pairwise stage entirely (their
    members are all kept and flagged via ``paired=false``) instead of
    going quadratic — same policy as the LSH ``max_bucket`` guard.

    Returns one row PER INPUT VECTOR:
      (vec_id, cluster, n_cluster, max_sim_lower, is_kept, paired)
    with max_sim_lower = best >=threshold cosine to a lower-id
    cluster-mate (0.0 when none), is_kept = no such mate, and
    paired = whether the vector's cluster actually ran the pairwise
    stage (n_cluster <= max_cluster) — paired=false rows are kept by
    the skew guard, not verified unique.
    """
    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, iters, seed)
    assigned = ivf_assign(
        embeddings.select("vec_id", "embedding"), centroids
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_cluster")
    )
    small = sizes.where(F.col("n_cluster") <= max_cluster).select("cluster")
    pairs = near_dup_pairs_cosine(
        assigned.join(small, "cluster"), threshold, block_col="cluster"
    )
    dup = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.max("score").alias("max_sim_lower")
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(sizes, "cluster")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "n_cluster",
            F.coalesce(F.col("max_sim_lower"), F.lit(0.0)).alias(
                "max_sim_lower"
            ),
            F.col("max_sim_lower").isNull().alias("is_kept"),
            (F.col("n_cluster") <= F.lit(max_cluster)).alias("paired"),
        )
    )
