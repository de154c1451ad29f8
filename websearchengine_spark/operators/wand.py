"""Block-max WAND top-k over compressed segments (north_star: "top-k ...
via distributed posting-list intersection with block-max WAND pruning").

The reference's DAAT skip machinery (galloping nextDoc,
IndexerInvertedCompressed.java:404-553) minimizes per-query work on one
machine; the set-at-a-time analogue here prunes whole doc-ranges before
ever touching compressed bytes:

1. **metadata pass (no decode)** — for the query's terms, read only the
   segment METADATA columns (term, chunk, block_max_weight, n_docs).  A
   doc in chunk c can score at most
   ``chunk_ub(c) = Σ_t max_blocks(idf_t · (k1+1) · block_max_weight)`` —
   the sum of per-term maxima over c's blocks (terms absent from c
   contribute 0, so the bound is sound).
2. **probe** — exactly score the few chunks with the highest upper
   bounds; the k-th best probe score is the threshold θ (a LOWER bound on
   the final k-th score).
3. **prune + final** — decode and score only chunks with
   ``chunk_ub ≥ θ``; every skipped chunk provably contains no top-k doc.
   Inside surviving chunks, individual blocks are skipped the same way:
   ``block_ub(t, blk) + (chunk_ub − chunk_max_t) < θ`` ⇒ no doc whose
   term-t postings sit in blk can reach θ via that block... (conservative
   per-block refinement using the chunk residual).

Everything stays relational until the decode UDF; the segment scan reads
only metadata columns for pruned-away chunks (Parquet column pruning), so
the prune saves both decode CPU and byte I/O.  Conjunctive mode
additionally drops chunks that lack any query term before probing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.functions import codec

BM25_K1 = 1.2
BM25_B = 0.75

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("partial", T.DoubleType(), False),
        T.StructField("term", T.StringType(), False),
    ]
)


def _idf_map(term_df: dict[str, int], num_docs: int) -> dict[str, float]:
    return {
        t: float(np.log(1.0 + (num_docs - df + 0.5) / (df + 0.5)))
        for t, df in term_df.items()
    }


def _decode_score_udf(idfs: dict[str, float], avgdl: float, theta: float):
    """mapInPandas kernel: varint-decode blocks, per-block ub skip, emit
    (doc_id, partial, term) BM25 partials."""
    k1, b = BM25_K1, BM25_B

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bdf in batches:
            docs_out, part_out, term_out = [], [], []
            # zip over column arrays (one iteration per 128-posting block;
            # no pandas row objects in the hot decode path)
            for term, bmw, residual, gaps, tfb, dlb in zip(
                bdf["term"], bdf["block_max_weight"], bdf["residual"],
                bdf["doc_gap_bytes"], bdf["tf_bytes"], bdf["dl_bytes"],
            ):
                idf = idfs[term]
                block_ub = idf * (k1 + 1.0) * bmw
                # conservative per-block skip: this block's best possible
                # total = its own ub + best the OTHER terms can add in the
                # chunk (residual precomputed relationally)
                if block_ub + residual < theta:
                    continue
                doc_ids = codec.delta_decode(codec.decode_varints(gaps))
                tfs = codec.decode_varints(tfb).astype(np.float64)
                dls = codec.decode_varints(dlb).astype(np.float64)
                w = idf * (k1 + 1.0) * tfs / (
                    tfs + k1 * (1.0 - b + b * dls / avgdl)
                )
                docs_out.extend(doc_ids.tolist())
                part_out.extend(w.tolist())
                term_out.extend([term] * len(doc_ids))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(docs_out, dtype="int64"),
                    "partial": pd.array(part_out, dtype="float64"),
                    "term": term_out,
                }
            )

    return _gen


def _score_chunks(
    segs: DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    theta: float,
) -> DataFrame:
    """(doc_id, score, n_hit) for the given segment rows (must carry a
    ``residual`` column for block-level pruning; pass residual=inf to
    disable)."""
    spark = segs.sparkSession
    partials = segs.select(
        "term",
        "block_max_weight",
        "residual",
        "doc_gap_bytes",
        "tf_bytes",
        "dl_bytes",
    ).mapInPandas(_decode_score_udf(idfs, avgdl, theta), _SCORE_SCHEMA)
    return partials.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
        F.count_distinct("term").alias("n_hit"),
    )


def bm25_topk_segments(
    segments: DataFrame,
    query_terms: list[str],
    num_docs: int,
    avgdl: float,
    k: int = 10,
    mode: str = "disjunctive",
    probe_chunks: int = 2,
    prune: bool = True,
    stats: dict | None = None,
    term_df: dict[str, int] | None = None,
    eager: bool = False,
    term_chunks: dict[str, int] | None = None,
    prune_min_chunks: int = 16,
) -> DataFrame:
    """(doc_id, score) top-k BM25 from compressed segments with block-max
    chunk/block pruning.  ``stats`` (optional dict) receives
    {n_chunks, probed, survivors, theta} for observability/tests.
    ``term_df`` (optional) supplies precomputed {term: df} serve-mode
    stats (the reference's in-memory maps), skipping the per-query
    metadata aggregation job.  ``eager=True`` is the serve mode: the
    probe scores are cached for reuse between the theta pass and the
    final pass, the (<= k)-row result is materialized, and the cache is
    dropped before returning — lowest latency with no cached-plan leak
    across queries.

    ``term_chunks`` (optional {term: n_chunks} from the build-time
    sidecar) drives a COST-BASED plan choice: the pruned plan is three
    sequential jobs (probe-id TakeOrdered, theta pass, pruned final) —
    pure win when the terms span many chunks, pure job-scheduling
    overhead when they span a handful.  If the query's summed chunk
    count is <= ``prune_min_chunks``, scoring everything in ONE pass is
    strictly cheaper and the prune is skipped; results are identical by
    the pruned == unpruned invariant.  At web scale hot terms have
    thousands of chunks and the threshold never triggers."""
    terms = sorted(set(query_terms))
    segs = segments.where(F.col("term").isin(terms))
    if prune and term_chunks is not None:
        if sum(term_chunks.get(t, 0) for t in terms) <= prune_min_chunks:
            prune = False

    # --- metadata pass (Parquet reads only the narrow columns) ---
    if term_df is not None:
        term_df = {t: term_df[t] for t in terms if term_df.get(t, 0) > 0}
        # a stale stats map may lack a term whose segments exist (e.g. a
        # delta appended after the sidecar was written): keep the segment
        # scan and the idf map consistent so the decode kernel never sees
        # a term without an idf entry
        segs = segs.where(F.col("term").isin(list(term_df)))
    else:
        term_df = {
            r.term: r.df
            for r in segs.groupBy("term")
            .agg(F.sum("n_docs").alias("df"))
            .collect()
        }
    if not term_df:
        return segments.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    idfs = _idf_map(term_df, num_docs)
    idf_df = F.create_map(
        *[x for t in term_df for x in (F.lit(t), F.lit(idfs[t]))]
    )
    meta = segs.select(
        "term",
        "chunk",
        (
            idf_df[F.col("term")]
            * F.lit(BM25_K1 + 1.0)
            * F.col("block_max_weight")
        ).alias("ub"),
    )
    per_term = meta.groupBy("chunk", "term").agg(F.max("ub").alias("tub"))
    chunk_meta = per_term.groupBy("chunk").agg(
        F.sum("tub").alias("chunk_ub"),
        F.count(F.lit(1)).alias("n_terms_present"),
    )
    if mode == "conjunctive":
        chunk_meta = chunk_meta.where(
            F.col("n_terms_present") == len(terms)
        )

    # residual per (chunk, term) = chunk_ub - that term's chunk max
    residual = per_term.join(chunk_meta.select("chunk", "chunk_ub"), "chunk").select(
        "chunk", "term", (F.col("chunk_ub") - F.col("tub")).alias("residual")
    )
    segs_r = segs.join(residual, ["chunk", "term"])

    def _materialize(df: DataFrame) -> DataFrame:
        rows = df.collect()
        return segments.sparkSession.createDataFrame(rows, df.schema)

    if not prune:
        scored = _score_chunks(
            segs_r.withColumn("residual", F.lit(float("inf"))),
            idfs,
            avgdl,
            float("-inf"),
        )
        if stats is not None:
            n_chunks = chunk_meta.count()
            stats.update(
                n_chunks=n_chunks, probed=n_chunks, survivors=0,
                theta=float("-inf"),
            )
        out = _finalize(scored, mode, len(terms), k)
        return _materialize(out) if eager else out

    # --- probe: exact scores for the top-ub chunks -> theta ---
    # TakeOrderedAndProject keeps the selection distributed; the driver
    # materializes only the <= probe_chunks winning ids (bounded by the
    # PARAMETER, not the data — at 10^12 docs the per-chunk metadata is
    # ~15M rows per query and never leaves the executors) plus the
    # scalar theta.  Collecting the probe ids ONCE also pins the probe
    # set: chunk_ub is a float sum whose accumulation order is not
    # guaranteed stable across re-executions, so near-equal upper bounds
    # could otherwise swap in/out of the limit between the probe pass
    # and the survivor anti-filter.
    probe_ids = [
        r.chunk
        for r in chunk_meta.select("chunk", "chunk_ub")
        .orderBy(F.desc("chunk_ub"), F.asc("chunk"))
        .limit(probe_chunks)
        .collect()
    ]
    probe_scored = _score_chunks(
        segs_r.where(F.col("chunk").isin(probe_ids)),
        idfs,
        avgdl,
        float("-inf"),
    )
    if eager:
        # serve mode: reuse the probe scores between the theta pass and
        # the final union, dropping the cache before returning
        probe_scored = probe_scored.cache()
    eligible = probe_scored
    if mode == "conjunctive":
        eligible = probe_scored.where(F.col("n_hit") == len(terms))
    # theta is one scalar: the ONLY probe data the driver sees (<= k rows)
    kth = eligible.orderBy(F.desc("score")).limit(k).collect()
    theta = kth[k - 1].score if len(kth) >= k else float("-inf")

    # --- prune + final pass over surviving chunks: drop the probed ids
    # (a bounded literal), keep chunk_ub >= theta ---
    survivors_df = (
        chunk_meta.select("chunk", "chunk_ub")
        .where(~F.col("chunk").isin(probe_ids))
        .where(F.col("chunk_ub") >= F.lit(theta))
        .select("chunk")
    )
    if stats is not None:
        stats.update(
            n_chunks=chunk_meta.count(),
            probed=len(probe_ids),
            survivors=survivors_df.count(),
            theta=theta,
        )
    surv_scored = _score_chunks(
        segs_r.join(survivors_df, "chunk"),
        idfs,
        avgdl,
        theta,
    )
    scored = probe_scored.unionByName(surv_scored)
    # block-level skips can drop SOME partials of a below-theta doc, so
    # re-aggregate and keep docs whose retained score clears theta OR that
    # came from the probe (probe is exact)
    out = _finalize(scored, mode, len(terms), k)
    if eager:
        out = _materialize(out)
        probe_scored.unpersist()
    return out


def _finalize(scored: DataFrame, mode: str, n_terms: int, k: int) -> DataFrame:
    out = scored
    if mode == "conjunctive":
        out = out.where(F.col("n_hit") == n_terms)
    return (
        out.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
