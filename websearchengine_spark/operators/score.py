"""Ranking/scoring operators (SURVEY.md §2.5) — all Catalyst-native column
expressions over the token-postings relation; no Python in the hot path.

- BM25 (k1=1.2, b=0.75, Lucene idf) — the engine's primary ranker per
  BASELINE.json north_star.
- Reference-parity QL (Jelinek-Mercer β=0.5, RankerComprehensive.java:43-53)
  with the product computed as exp(sum(log ...)), duplicates in the query
  handled by per-token multiplicity weights.
- Top-k via orderBy().limit(k) — Spark plans TakeOrderedAndProject, the
  distributed analogue of the reference's bounded heap
  (RankerConjunctive.java:26-35).
- Comprehensive cascade (RankerComprehensive.java:66-87): the reference's
  three stable re-sorts compose into lexicographic sort keys, so each stage
  is a single TakeOrdered: stage orderings extend the previous comparator.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators import query as Q

BM25_K1 = 1.2
BM25_B = 0.75
QL_BETA = 0.5


def _qcount_df(spark, tokens: list[str]) -> DataFrame:
    """Query-token multiplicities (QL multiplies per occurrence,
    RankerComprehensive.java:49; BM25 sums per occurrence)."""
    counts = Counter(tokens)
    return spark.createDataFrame(
        [(t, int(c)) for t, c in counts.items()], "token string, qcount int"
    )


def bm25_scores(
    tok_postings: DataFrame,
    tokens: list[str],
    num_docs: int,
    avgdl: float,
    mode: str = "conjunctive",
) -> DataFrame:
    """(doc_id, score) — BM25 summed over query tokens (×multiplicity).

    Conjunctive filters to docs holding ALL distinct tokens; disjunctive
    scores any match.  df per token comes from the pruned relation itself
    (correct for phrases too)."""
    spark = tok_postings.sparkSession
    n_distinct = len(set(tokens))
    stats = Q.token_stats(tok_postings)
    qc = _qcount_df(spark, tokens)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(num_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    w = (
        F.col("qcount")
        * idf
        * F.col("tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        tok_postings.join(F.broadcast(stats), "token")
        .join(F.broadcast(qc), "token")
        .groupBy("doc_id")
        .agg(
            F.sum(w).alias("score"),
            F.count_distinct("token").alias("n_hit"),
        )
    )
    if mode == "conjunctive":
        scored = scored.where(F.col("n_hit") == n_distinct)
    return scored.select("doc_id", "score")


def ql_scores(
    tok_postings: DataFrame,
    tokens: list[str],
    total_terms: int,
) -> DataFrame:
    """(doc_id, score) — reference QL over CONJUNCTIVE matches:
    score = Π_tokens [(1-β)·tf/dl + β·ctf/|C|], |C| int-truncated
    (RankerComprehensive.java:43-53).  Product via exp(Σ qcount·ln(term))
    — every factor > 0 on conjunctive matches."""
    spark = tok_postings.sparkSession
    n_distinct = len(set(tokens))
    stats = Q.token_stats(tok_postings)
    qc = _qcount_df(spark, tokens)
    c = int(total_terms)
    factor = (
        F.lit(1.0 - QL_BETA) * F.col("tf") / F.col("dl")
        + F.lit(QL_BETA) * F.col("ctf") / F.lit(float(c))
    )
    return (
        tok_postings.join(F.broadcast(stats), "token")
        .join(F.broadcast(qc), "token")
        .groupBy("doc_id")
        .agg(
            F.exp(F.sum(F.col("qcount") * F.log(factor))).alias("score"),
            F.count_distinct("token").alias("n_hit"),
        )
        .where(F.col("n_hit") == n_distinct)
        .select("doc_id", "score")
    )


def topk(scored: DataFrame, k: int = 10) -> DataFrame:
    """R12/R13 — desc score, doc_id tiebreak, limit k
    (TakeOrderedAndProject; ScoredDocument.java:46-52 + our stable-tiebreak
    contract)."""
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def rank_bm25(
    postings: DataFrame,
    query: str,
    num_docs: int,
    avgdl: float,
    k: int = 10,
    mode: str = "conjunctive",
) -> DataFrame:
    tokens, _, _ = Q.split_tokens(query)
    if not tokens:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    tp = Q.token_postings(postings, query)
    return topk(bm25_scores(tp, tokens, num_docs, avgdl, mode), k)


def rank_ql(
    postings: DataFrame,
    query: str,
    total_terms: int,
    k: int = 10,
) -> DataFrame:
    tokens, _, _ = Q.split_tokens(query)
    if not tokens:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    tp = Q.token_postings(postings, query)
    return topk(ql_scores(tp, tokens, total_terms), k)


def rank_comprehensive(
    postings: DataFrame,
    docs: DataFrame,
    query: str,
    total_terms: int,
    k: int = 10,
) -> DataFrame:
    """R7 — QL desc (doc_id tiebreak) -> top 5k -> stable PageRank desc ->
    top 3k -> stable NumViews desc -> top k (RankerComprehensive.java:66-87).

    A stable re-sort of an ordering O by key K equals one sort by (K, O), so
    each stage is a TakeOrdered with an extended lexicographic key — no
    driver-side collection, correct at any scale."""
    tokens, _, _ = Q.split_tokens(query)
    tp = Q.token_postings(postings, query)
    scored = ql_scores(tp, tokens, total_terms).join(
        docs.select("doc_id", "url", "page_rank", "num_views"), "doc_id"
    )
    s1 = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k * 5)
    s2 = s1.orderBy(
        F.desc("page_rank"), F.desc("score"), F.asc("doc_id")
    ).limit(k * 3)
    return s2.orderBy(
        F.desc("num_views"), F.desc("page_rank"), F.desc("score"), F.asc("doc_id")
    ).limit(k)
