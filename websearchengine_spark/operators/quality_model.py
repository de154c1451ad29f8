"""fastText-style hashed-feature linear classifier — the MODEL-BASED
quality/language filter of web-scale training-data pipelines (the stage
CCNet runs after line dedup, and the "quality classifier" of the GPT-3 /
LLaMA data recipes).  The reference engine has no learned filter; this is
a training-data extension alongside dedup / PII / LM-perplexity
(operators/corpus_stats.py), built Spark-first:

- **features** — an L1-normalized hashed bag of words per document plus a
  constant bias feature: ``fid = md5_60(term) % dim`` (the repo's
  cross-engine 60-bit hash, operators/dedup.py:md5_60), ``x = tf /
  doc_len``.  One map-side projection + one ``(doc_id, fid)`` groupBy;
  the feature table is built ONCE and persisted across all training
  iterations, so the tokenizer never reruns.
- **training** — full-batch logistic-regression gradient descent.  The
  weight vector lives on the driver (``dim + 1`` floats — bounded by the
  hash width, NOT the corpus) and enters each iteration's plan as a
  broadcast join; the gradient comes back as ONE aggregation whose
  exchange is capped at ``dim + 1`` rows regardless of corpus size.  At
  100 TB each iteration is two bounded shuffles (margins keyed by doc,
  gradient keyed by fid) over the persisted feature table — the same
  aggregation shape MLlib's distributed LBFGS uses, with no per-row
  Python anywhere.
- **trajectory rounding** — gradients and weights are rounded to 1e-9
  after every step, absorbing float-sum-order noise so the distributed
  trainer walks a bit-identical trajectory to the sequential numpy twin
  (oracle/quality_lr.py).  Same pattern as the IVF coarse quantizer
  (operators/similarity.py:ivf_train), which lets the DuckDB gate embed
  the trained weights as SQL literals and re-verify scoring end to end.
- **scoring** — pure codegen: broadcast weight join, one sum, a sigmoid.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators.corpus_stats import _bind, _toks_clean
from websearchengine_spark.operators.dedup import md5_60

CLF_DIM = 256       # hash buckets; gate-sized (the 100 TB setting is 2^18+)
CLF_ITERS = 15
CLF_LR = 5.0
CLF_BETA = 0.92     # heavy-ball momentum — ~8x fewer iterations than GD;
                    # each iteration is one Spark job, so iters IS the cost
CLF_ROUND = 9       # dp — absorbs float-sum-order noise (IVF pattern)
BIAS_FID = -1       # the constant feature's id; weight stored at w[dim]


# token layer: the ONE shared SQL-expressible tokenizer
# (dedup.tokens_col via corpus_stats._toks_clean) — the oracle-equality
# design requires every consumer to use the same expression, so no local
# copy is kept here.


def hashed_features(docs: DataFrame, dim: int = CLF_DIM) -> DataFrame:
    """(doc_id, fid, x) — L1-normalized hashed bag of words plus one bias
    row (fid=-1, x=1.0) per document, so zero-token documents still score
    (their margin is exactly the bias).

    ``x = tf / doc_len`` where doc_len counts kept tokens; the division is
    long/long -> double on both engines, so features are bit-identical to
    the oracle's."""
    tok = docs.select(
        "doc_id", F.explode(_toks_clean()).alias("term")
    ).select("doc_id", (md5_60(F.col("term")) % F.lit(dim)).alias("fid"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    tf = tok.groupBy("doc_id", "fid").agg(F.count(F.lit(1)).alias("tf"))
    feat = tf.join(dl, "doc_id").select(
        "doc_id", "fid", (F.col("tf") / F.col("doc_len")).alias("x")
    )
    bias = docs.select(
        "doc_id",
        F.lit(BIAS_FID).cast("long").alias("fid"),
        F.lit(1.0).alias("x"),
    )
    return feat.unionAll(bias)


def _weights_df(spark, w: np.ndarray, dim: int) -> DataFrame:
    """Driver weight vector -> (fid, wt) rows; dim+1 rows, always tiny."""
    rows = [(f, float(w[f])) for f in range(dim)] + [
        (BIAS_FID, float(w[dim]))
    ]
    return spark.createDataFrame(rows, "fid long, wt double")


# widest weight vector worth inlining into the per-iteration plan as an
# array literal; beyond it (the 2^18+ production dims) the plan-size and
# codegen cost of the literal outweigh the saved exchanges and training
# falls back to the broadcast-join loop
CLF_INLINE_MAX_DIM = 4096


def train_lr(
    feats: DataFrame,
    labels: DataFrame,
    dim: int = CLF_DIM,
    iters: int = CLF_ITERS,
    lr: float = CLF_LR,
    beta: float = CLF_BETA,
) -> np.ndarray:
    """Full-batch logistic regression (heavy-ball momentum) over hashed
    features; returns the (dim+1,) weight vector (bias last).

    labels: (doc_id, y double in {0,1}).  Deterministic in (data,
    hyperparameters): gradient, velocity, and weights are all rounded to
    1e-9 every step, so two runs — and the sequential numpy twin
    (oracle/quality_lr.py:train_local) — produce bit-identical vectors.

    Two physical strategies, one trajectory (the rounded gradient is the
    ONLY thing an iteration feeds forward, so the plan shape is free):

    - ``dim <= CLF_INLINE_MAX_DIM``: features are rolled up ONCE into a
      per-doc sorted (fid, x) array joined with the label and persisted;
      each iteration is then a single job — margin and residual computed
      inline per doc with the weights as an array literal
      (``F.aggregate``, pure codegen), explode, and one fid-keyed groupBy
      whose partial aggregation caps the exchange at <= dim+1 rows per
      partition.  No per-iteration broadcast, no doc-keyed shuffle.
    - wider dims: the rolled-up array would carry a plan-sized weight
      literal, so each iteration instead runs the broadcast weight join
      + doc-keyed margin groupBy + residual join + fid-keyed gradient
      groupBy over a persisted flat feature table — MLlib's distributed
      LBFGS aggregation shape, still only <= dim+1 rows of driver
      traffic per iteration."""
    spark = feats.sparkSession
    labels = labels.persist()
    n = float(labels.count())
    if n == 0:
        # degenerate supervision: no labeled docs -> the zero model (the
        # numpy twin short-circuits identically instead of dividing by 0)
        labels.unpersist()
        return np.zeros(dim + 1, dtype=np.float64)
    w = np.zeros(dim + 1, dtype=np.float64)
    v = np.zeros(dim + 1, dtype=np.float64)

    if dim <= CLF_INLINE_MAX_DIM:
        # per-doc rollup: sorted so the margin's fold order is
        # deterministic (bias fid=-1 first, then fid asc; (doc, fid)
        # pairs are unique).  The inner label join both restricts to the
        # clear-band training set and attaches y.
        train = (
            feats.join(labels, "doc_id")
            .groupBy("doc_id", "y")
            .agg(
                F.sort_array(F.collect_list(F.struct("fid", "x"))).alias(
                    "fx"
                )
            )
            .persist()
        )
        labels.unpersist()
        try:
            for _ in range(iters):
                # index map into the literal: bias fid=-1 -> 1 (w[dim]),
                # feature fid f -> f+2 (element_at is 1-based)
                warr = F.array(
                    F.lit(float(w[dim])),
                    *[F.lit(float(w[f])) for f in range(dim)],
                )
                m = F.aggregate(
                    F.col("fx"),
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s["x"]
                    * F.element_at(warr, s["fid"].cast("int") + 2),
                )
                resid = (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-m)) - F.col("y")
                ).alias("r")
                grad_rows = (
                    train.select(resid, F.explode("fx").alias("s"))
                    .groupBy(F.col("s.fid").alias("fid"))
                    .agg(
                        (F.sum(F.col("s.x") * F.col("r")) / F.lit(n)).alias(
                            "g"
                        )
                    )
                    .collect()
                )
                g = np.zeros(dim + 1, dtype=np.float64)
                for row in grad_rows:
                    g[dim if row["fid"] == BIAS_FID else row["fid"]] = row[
                        "g"
                    ]
                g = np.round(g, CLF_ROUND)
                v = np.round(beta * v + g, CLF_ROUND)
                w = np.round(w - lr * v, CLF_ROUND)
        finally:
            train.unpersist()
        return w

    # production-width path — the training set may be a small labeled
    # subset of the corpus (rule_labels' clear band): restrict the
    # feature table once, before the loop, so every iteration scans only
    # labeled docs
    feats = feats.join(
        labels.select("doc_id"), "doc_id", "left_semi"
    ).persist()
    try:
        for _ in range(iters):
            wdf = _weights_df(spark, w, dim)
            marg = (
                feats.join(F.broadcast(wdf), "fid")
                .groupBy("doc_id")
                .agg(F.sum(F.col("x") * F.col("wt")).alias("m"))
            )
            resid = labels.join(marg, "doc_id").select(
                "doc_id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                    - F.col("y")
                ).alias("r"),
            )
            grad_rows = (
                feats.join(resid, "doc_id")
                .groupBy("fid")
                .agg((F.sum(F.col("x") * F.col("r")) / F.lit(n)).alias("g"))
                .collect()
            )
            g = np.zeros(dim + 1, dtype=np.float64)
            for row in grad_rows:
                g[dim if row["fid"] == BIAS_FID else row["fid"]] = row["g"]
            g = np.round(g, CLF_ROUND)
            v = np.round(beta * v + g, CLF_ROUND)
            w = np.round(w - lr * v, CLF_ROUND)
    finally:
        feats.unpersist()
        labels.unpersist()
    return w


def score_lr(
    feats: DataFrame, w: np.ndarray, dim: int = CLF_DIM
) -> DataFrame:
    """(doc_id, score, pred) — sigmoid of the hashed-feature margin.
    Pure codegen: broadcast weight join + one sum; score rounded to 6 dp
    for cross-engine hash stability."""
    spark = feats.sparkSession
    wdf = _weights_df(spark, w, dim)
    marg = (
        feats.join(F.broadcast(wdf), "fid")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("wt")).alias("m"))
    )
    return marg.select(
        "doc_id",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 6
        ).alias("score"),
        (F.col("m") > 0).cast("int").alias("pred"),
    )


# Heuristic weak supervision for the gate corpus (whose lang tags are
# independent of its shared synthetic vocabulary): label only the CLEAR
# cases of a marker-term density rule — docs at or above MARKER_HI are
# positives, at or below MARKER_LO negatives, and the ambiguous middle
# band is excluded from training.  This is the GPT-3/CCNet shape exactly
# (train on a trusted positive corpus vs a clear negative corpus, then
# score everything), and it gives logistic regression a real margin
# instead of a knife-edge decision boundary at the corpus median.
MARKER_TERMS = ["scan", "join", "query", "sort"]
MARKER_LO = 0.10
MARKER_HI = 0.16


def rule_labels(
    docs: DataFrame,
    terms: list[str] | None = None,
    lo: float = MARKER_LO,
    hi: float = MARKER_HI,
) -> DataFrame:
    """(doc_id, y) for the CLEARLY labeled docs only: y=1.0 where the
    marker-term density (count of tokens in ``terms`` / token count) is
    >= hi, y=0.0 where <= lo; the (lo, hi) band is excluded.  Pure
    map-side projection; the density is int/int on both engines, so the
    oracle's label set is bit-identical by construction."""
    terms = MARKER_TERMS if terms is None else terms

    def density(ts):
        n = F.greatest(F.size(ts), F.lit(1))
        m = F.size(F.filter(ts, lambda x: x.isin(*terms)))
        return m / n

    # _bind evaluates the token split ONCE (Catalyst re-evaluates HOF
    # lambda references per use otherwise — corpus_stats._bind docstring)
    d = docs.select(
        "doc_id", _bind(_toks_clean(), density).alias("dens")
    )
    return d.where(
        (F.col("dens") >= hi) | (F.col("dens") <= lo)
    ).select(
        "doc_id", (F.col("dens") >= hi).cast("double").alias("y")
    )


def score_text_expr(w: np.ndarray, dim: int = CLF_DIM):
    """Map-side scoring COLUMN over ``text`` — the deployment scorer.

    The margin identity makes the feature table unnecessary at apply
    time: sum_f w_f * tf_f / n + b == (sum over tokens of w[fid(tok)])
    / n + b, so with the trained weights folded in as an array literal
    the whole score is one higher-order-function expression — zero
    shuffle, zero state, which is what lets the SAME expression filter
    a structured stream (streaming/stream.py:quality_filter_stream) and
    scan a 100 TB corpus at read speed.  ``score_lr`` (join-based) stays
    for training-time reuse of the persisted feature table."""
    warr = F.array(*[F.lit(float(w[f])) for f in range(dim)])

    def margin(ts):
        tok_sum = F.aggregate(
            ts,
            F.lit(0.0),
            lambda acc, t: acc
            + F.element_at(
                warr, ((md5_60(t) % dim) + 1).cast("int")
            ),
        )
        return tok_sum / F.greatest(F.size(ts), F.lit(1)) + F.lit(
            float(w[dim])
        )

    m = _bind(_toks_clean(), margin)  # token split evaluated once
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6)
