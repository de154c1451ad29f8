"""IR evaluation metrics (SURVEY.md §2.7, E1-E8).

Input contract: a results DataFrame ``(qid, doc_id, rank)`` with rank
1-based in retrieval order, and a qrels DataFrame ``(qid, doc_id, grade)``
with grade in {Perfect, Excellent, Good, Fair, Bad}.

All metrics are window/aggregate expressions — one shuffle keyed by qid;
at scale each query's result list is tiny so qid-partitioned windows are
skew-free.

Semantics follow hw1/instructor Evaluator.java:
- binary relevance: Perfect/Excellent/Good -> 1.0 else 0 (:61-93);
- graded gains: Perfect 10, Excellent 7, Good 5, Fair 1 (:318-354);
- R@k = relevant-retrieved@k / relevant-retrieved(full list) (:214-316);
- NDCG ideal from sorted-desc RETRIEVED gains, not full qrels (:385-454,
  nonstandard — documented reference behavior, replicated);
- DCG formula gain[0] + Σ_{i>=1} gain[i]/log2(i+1), positions 0-based;
- MRR = 1/rank of first relevant (:356-383);
- MAP = Σ(prec at each relevant hit)/total relevant retrieved (:130-156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KS = (1, 5, 10)


def binary_rel() -> F.Column:
    return (
        F.when(F.col("grade").isin("Perfect", "Excellent", "Good"), 1.0)
        .otherwise(0.0)
    )


def graded_gain() -> F.Column:
    return (
        F.when(F.col("grade") == "Perfect", 10.0)
        .when(F.col("grade") == "Excellent", 7.0)
        .when(F.col("grade") == "Good", 5.0)
        .when(F.col("grade") == "Fair", 1.0)
        .otherwise(0.0)
    )


def _joined(results: DataFrame, qrels: DataFrame) -> DataFrame:
    return (
        results.join(qrels, ["qid", "doc_id"], "left")
        .withColumn("rel", F.coalesce(binary_rel(), F.lit(0.0)))
        .withColumn("gain", F.coalesce(graded_gain(), F.lit(0.0)))
    )


def metrics_reference_line(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """The reference Evaluator's exact 25-column row per query
    (hw1/instructor Evaluator.java main flow :44-57), quirks preserved:

    - NDCG@1 and NDCG@5 use graded gains, NDCG@10 uses BINARY relevance
      (main passes ``relevance`` not ``relevance_gain`` for k=10, :54);
    - IDCG sorts the RETRIEVED top-k gains, not the full qrels (:425-441);
    - 11-pt interpolated precision's recall denominator is the count of
      relevant docs in the QRELS (retrieved or not, :163-168);
    - R@k divides by relevant-retrieved over the FULL result list;
    - F@k from unrounded P/R; zero-guards exactly as the reference.

    Verified value-identical to the reference's own golden hw1.3 outputs
    (tests/test_reference_goldens.py)."""
    j = _joined(results, qrels)
    w = Window.partitionBy("qid").orderBy("rank")
    j = j.withColumn("cum_rel", F.sum("rel").over(w)).withColumn(
        "prec_at", F.col("cum_rel") / F.col("rank")
    )
    def _idcg_k(k: int, col: str, alias: str):
        # the reference's IDCG sorts ONLY the first k RETRIEVED gains
        # (DCG array = positions 0..k-1, then Arrays.sort, :425-441)
        sub = j.where(F.col("rank") <= k).select(
            "qid", F.col(col).alias("g"), "rank"
        )
        ranked = sub.withColumn(
            "ir",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("g"), F.asc("rank"))
            ),
        )
        return ranked.groupBy("qid").agg(
            F.sum(
                F.col("g") / F.greatest(F.lit(1.0), F.log2(F.col("ir")))
            ).alias(alias)
        )
    dcg = F.col("gain") / F.greatest(F.lit(1.0), F.log2(F.col("rank")))
    dcg_bin = F.col("rel") / F.greatest(F.lit(1.0), F.log2(F.col("rank")))
    base = j.groupBy("qid").agg(
        F.sum("rel").alias("rr"),
        *[
            F.sum(F.when(F.col("rank") <= k, F.col("rel")).otherwise(0.0)).alias(
                f"rr{k}"
            )
            for k in KS
        ],
        F.sum(F.when(F.col("rel") > 0, F.col("prec_at"))).alias("sum_prec"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(F.when(F.col("rank") <= 1, dcg)).alias("dcg1"),
        F.sum(F.when(F.col("rank") <= 5, dcg)).alias("dcg5"),
        F.sum(F.when(F.col("rank") <= 10, dcg_bin)).alias("dcg10"),
    )
    idcg = (
        _idcg_k(1, "gain", "idcg1")
        .join(_idcg_k(5, "gain", "idcg5"), "qid")
        .join(_idcg_k(10, "rel", "idcg10"), "qid")
    )

    # 11-pt with QRELS-relevant denominator, pivoted to pr0..pr10
    total_rel_qrels = qrels.withColumn("rel", binary_rel()).groupBy("qid").agg(
        F.sum("rel").alias("qrels_rr")
    )
    pr = (
        j.join(total_rel_qrels, "qid")
        .withColumn("recall_at", F.col("cum_rel") / F.col("qrels_rr"))
    )
    levels = results.sparkSession.createDataFrame(
        [(round(i / 10.0, 1),) for i in range(11)], "lvl double"
    )
    pr11 = (
        pr.crossJoin(F.broadcast(levels))
        .where((F.col("recall_at") >= F.col("lvl")) & (F.col("rel") > 0))
        .groupBy("qid")
        .pivot("lvl", [round(i / 10.0, 1) for i in range(11)])
        .agg(F.max("prec_at"))
    )
    pr_cols = [
        F.coalesce(F.col(f"`{round(i / 10.0, 1)}`"), F.lit(0.0)).alias(f"pr{i}")
        for i in range(11)
    ]

    out = base.join(idcg, "qid").join(pr11, "qid", "left")
    p = {k: F.col(f"rr{k}") / k for k in KS}
    # quirk: evaluatePRF breaks out at rank 10, so R@k's denominator is
    # relevant-retrieved within the TOP 10, not the full list (:236-258)
    r = {
        k: F.when(F.col("rr10") > 0, F.col(f"rr{k}") / F.col("rr10")).otherwise(
            0.0
        )
        for k in KS
    }
    f = {
        k: F.when(
            (p[k] + r[k]) != 0, 2 * p[k] * r[k] / (p[k] + r[k])
        ).otherwise(0.0)
        for k in KS
    }
    return out.select(
        "qid",
        *[p[k].alias(f"p{k}") for k in KS],
        *[r[k].alias(f"r{k}") for k in KS],
        *[f[k].alias(f"f{k}") for k in KS],
        *pr_cols,
        F.when(F.col("rr") > 0, F.col("sum_prec") / F.col("rr"))
        .otherwise(0.0)
        .alias("map"),
        F.when(F.col("idcg1") > 0, F.col("dcg1") / F.col("idcg1"))
        .otherwise(0.0)
        .alias("ndcg1"),
        F.when(F.col("idcg5") > 0, F.col("dcg5") / F.col("idcg5"))
        .otherwise(0.0)
        .alias("ndcg5"),
        F.when(F.col("idcg10") > 0, F.col("dcg10") / F.col("idcg10"))
        .otherwise(0.0)
        .alias("ndcg10"),
        F.when(F.col("first_rel").isNotNull(), 1.0 / F.col("first_rel"))
        .otherwise(0.0)
        .alias("mrr"),
    )


def interpolated_precision_11pt(
    results: DataFrame, qrels: DataFrame
) -> DataFrame:
    """E4 — (qid, recall_level, interp_prec): max precision at any rank
    whose recall reaches the level, levels {0.0, 0.1, ..., 1.0}
    (hw1 Evaluator.java:158-211).  Recall denominator = relevant
    RETRIEVED (consistent with the reference's R@k convention)."""
    j = _joined(results, qrels)
    w = Window.partitionBy("qid").orderBy("rank")
    per_rank = (
        j.withColumn("cum_rel", F.sum("rel").over(w))
        .withColumn("prec_at", F.col("cum_rel") / F.col("rank"))
        .withColumn(
            "recall_at",
            F.col("cum_rel")
            / F.sum("rel").over(Window.partitionBy("qid")),
        )
    )
    spark = results.sparkSession
    levels = spark.createDataFrame(
        [(round(i / 10.0, 1),) for i in range(11)], "recall_level double"
    )
    return (
        per_rank.crossJoin(F.broadcast(levels))
        .where(F.col("recall_at") >= F.col("recall_level"))
        .groupBy("qid", "recall_level")
        .agg(F.round(F.max("prec_at"), 6).alias("interp_prec"))
    )


def metrics_per_query(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """One row per qid with P@k, R@k, F1@k, MAP, NDCG@k, MRR, accuracy."""
    j = _joined(results, qrels)
    w = Window.partitionBy("qid").orderBy("rank")
    j = j.withColumn("cum_rel", F.sum("rel").over(w)).withColumn(
        "prec_at", F.col("cum_rel") / F.col("rank")
    )
    total_rel = F.sum("rel")
    aggs = [
        total_rel.alias("rel_ret"),
        F.count(F.lit(1)).cast("long").alias("n_ret"),
    ]
    for k in KS:
        aggs.append(
            (F.sum(F.when(F.col("rank") <= k, F.col("rel"))) / k).alias(f"p_at_{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("rank") <= k, F.col("rel"))).alias(f"relret_{k}")
        )
    aggs.append(
        F.sum(F.when(F.col("rel") > 0, F.col("prec_at"))).alias("sum_prec_at_rel")
    )
    aggs.append(
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel_rank")
    )
    # DCG@k with 0-based positions: gain/ max(1, log2(pos+1)) where pos = rank-1
    dcg_term = F.col("gain") / F.greatest(F.lit(1.0), F.log2(F.col("rank")))
    for k in KS:
        aggs.append(F.sum(F.when(F.col("rank") <= k, dcg_term)).alias(f"dcg_{k}"))
    # ideal DCG from retrieved gains sorted desc (reference nonstandard)
    ideal_term = F.col("gain_sorted") / F.greatest(
        F.lit(1.0), F.log2(F.col("ideal_rank"))
    )

    # build ideal ranks via a second pass: sort gains desc per qid
    gains_sorted = j.select(
        "qid",
        F.col("gain").alias("gain_sorted"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("gain"), F.asc("rank")))
        .alias("ideal_rank"),
    )
    idcg_aggs = [
        F.sum(F.when(F.col("ideal_rank") <= k, ideal_term)).alias(f"idcg_{k}")
        for k in KS
    ]
    idcg = gains_sorted.groupBy("qid").agg(*idcg_aggs)

    base = j.groupBy("qid").agg(*aggs)
    out = base.join(idcg, "qid")
    cols = [F.col("qid")]
    for k in KS:
        p = F.round(F.col(f"p_at_{k}"), 6)
        r = F.round(
            F.when(F.col("rel_ret") > 0, F.col(f"relret_{k}") / F.col("rel_ret"))
            .otherwise(0.0),
            6,
        )
        f1 = F.round(
            F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(0.0), 6
        )
        cols += [p.alias(f"p{k}"), r.alias(f"r{k}"), f1.alias(f"f1_{k}")]
    cols.append(
        F.round(
            F.when(
                F.col("rel_ret") > 0, F.col("sum_prec_at_rel") / F.col("rel_ret")
            ).otherwise(0.0),
            6,
        ).alias("map")
    )
    for k in KS:
        cols.append(
            F.round(
                F.when(F.col(f"idcg_{k}") > 0, F.col(f"dcg_{k}") / F.col(f"idcg_{k}"))
                .otherwise(0.0),
                6,
            ).alias(f"ndcg{k}")
        )
    cols.append(
        F.round(
            F.when(
                F.col("first_rel_rank").isNotNull(), 1.0 / F.col("first_rel_rank")
            ).otherwise(0.0),
            6,
        ).alias("mrr")
    )
    cols.append(
        F.round(F.col("rel_ret") / F.col("n_ret"), 6).alias("accuracy")
    )
    return out.select(*cols)
