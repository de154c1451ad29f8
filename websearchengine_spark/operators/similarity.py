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

LSH_SIGN_DIMS = [0, 7, 14, 21, 28, 35, 42, 49]  # fixed, documented contract


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


def near_dup_pairs_cosine(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
) -> DataFrame:
    """(vec_a, vec_b, score) with vec_a < vec_b and cosine >= threshold,
    blocked on ``block_col`` so the self-join is per-block, not all-pairs."""
    e = embeddings.select(
        F.col("vec_id"),
        F.col(block_col).alias("blk"),
        F.col("embedding"),
        _norm(F.col("embedding")).alias("nrm"),
    )
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
