"""Composed training-data pipeline — the `cli pipeline` command as a
library operator, so the end-to-end composition (not just the stages)
sits under the driver's oracle gate (plans/registry_pipeline.py).

Stage order (each stage is one of the individually-gated operators):

    extract-ready corpus (doc_id, text [, carry cols])
      -> 1. CCNet boilerplate line removal     (corpus_stats.line_dedup)
      -> 2. PII redaction                      (pii.pii_redact)
      -> 3. exact dedup, keep lowest doc_id    (dedup.exact_fp_col)
      -> 4. near-dup cluster dedup             (dedup.dedup_clusters)
      -> 5. quality filters (repetition / token count / optional LM ppl)
      -> 6. token-budget sequence packing      (corpus_stats.sequence_pack)

Scale shape: every stage keeps its own gate-audited plan (key-bounded
groupBys, bucketed LSH with skew guards, component iteration confined to
the verified-pair subgraph, percentile-bucketed prefix sums); the driver
only ever sees the per-stage attrition COUNTS.  Each stage boundary
persists its survivors and unpersists the previous generation so the
lineage never re-runs an upstream stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators import corpus_stats, dedup
from websearchengine_spark.operators import pii as pii_op

# report keys in stage order (the gate emits them as (stage, n) rows)
STAGES = [
    "docs_in",
    "docs_with_pii",
    "after_exact_dedup",
    "after_near_dedup",
    "after_quality",
    "n_bins",
]


def run_pipeline(
    docs: DataFrame,
    *,
    boilerplate_min_docs: int = 5,
    minhash_threshold: float = 0.7,
    max_bucket: int = 64,
    max_rep: float = 0.2,
    min_tokens: int = 5,
    max_ppl: float | None = None,
    budget: int = 2048,
    gopher: bool = False,
    gopher_min_words: int = 20,
    gopher_min_stops: int = 2,
    classifier_threshold: float | None = None,
    bpe_report: bool = False,
    split: bool = False,
    report: dict | None = None,
) -> DataFrame:
    """Run the composed pipeline over ``docs`` (doc_id, text, plus any
    carry-through columns, e.g. url).  Returns the surviving corpus
    (doc_id, *carry, text, n_tokens, bin_id); ``report`` (optional
    dict) receives the per-stage attrition counts — bounded scalars,
    never row data.

    Optional round-5 quality stages (all default off, so the gated
    default composition is unchanged): ``gopher`` adds the static rule
    battery to the stage-5 filter; ``classifier_threshold`` trains the
    hashed linear classifier on the surviving corpus's rule labels
    (CCNet-style per-snapshot weak supervision) and keeps docs scoring
    at or above the threshold; ``bpe_report`` trains BPE merges on the
    final corpus and reports its subword token budget; ``split`` stamps
    the leak-safe train/val/test assignment (dataset_split) onto the
    output so downstream rebuilds keep doc membership stable."""
    if report is None:
        report = {}
    carry = [c for c in docs.columns if c not in ("doc_id", "text")]
    docs = docs.persist()
    report["docs_in"] = docs.count()

    # 1. boilerplate line removal (CCNet line dedup)
    clean = corpus_stats.line_dedup(docs, boilerplate_min_docs)
    docs1 = docs.select("doc_id", *carry).join(
        clean.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )

    # 2. PII scrub (map-side; rides the same pass as the dedup below)
    red = pii_op.pii_redact(docs1)
    docs1 = (
        docs1.drop("text")
        .join(
            red.select(
                "doc_id", F.col("redacted").alias("text"), "n_pii"
            ),
            "doc_id",
        )
        .persist()
    )
    report["docs_with_pii"] = docs1.where(F.col("n_pii") > 0).count()
    docs.unpersist()

    # 3. exact dedup (normalized-text md5, keep lowest doc_id) — the
    # canonical-pick rule lives in ONE place (dedup.exact_dup_groups)
    docs2 = (
        docs1.join(
            dedup.exact_dup_groups(docs1).select(
                F.col("canonical_doc_id").alias("doc_id")
            ),
            "doc_id",
        )
        .select("doc_id", *carry, "text")
        .persist()
    )
    report["after_exact_dedup"] = docs2.count()
    docs1.unpersist()

    # 4. near-dup cluster dedup (MinHash-LSH -> verify -> components)
    nd = dedup.dedup_clusters(docs2, minhash_threshold, max_bucket)
    docs3 = docs2.join(
        nd.where(F.col("is_kept")).select("doc_id"), "doc_id"
    ).persist()
    report["after_near_dedup"] = docs3.count()
    docs2.unpersist()

    # 5. quality filters
    rep = corpus_stats.repetition_scores(docs3)
    qual = docs3.join(rep.select("doc_id", "rep_score"), "doc_id").withColumn(
        "n_tokens", F.size(corpus_stats._toks_clean()).cast("long")
    )
    cond = (F.col("rep_score") <= max_rep) & (
        F.col("n_tokens") >= min_tokens
    )
    if max_ppl is not None:
        lm = corpus_stats.bigram_lm_scores(docs3)
        qual = qual.join(lm.select("doc_id", "ppl"), "doc_id")
        cond = cond & (F.col("ppl") <= max_ppl)
    if gopher:
        gf = corpus_stats.gopher_quality_flags(
            docs3, min_words=gopher_min_words, min_stops=gopher_min_stops
        )
        qual = qual.join(
            gf.select("doc_id", F.col("keep").alias("gopher_keep")),
            "doc_id",
        )
        cond = cond & F.col("gopher_keep")
    if classifier_threshold is not None:
        from websearchengine_spark.operators import quality_model as qm

        labels = qm.rule_labels(docs3)
        n_pos, n_neg = (
            labels.agg(
                F.sum("y").alias("p"),
                F.sum(F.lit(1.0) - F.col("y")).alias("n"),
            ).head()[:2]
        )
        if not n_pos or not n_neg:
            # single-class weak supervision on this corpus — a trained
            # filter would be the constant function; skip rather than
            # silently drop everything (or nothing)
            report["classifier_skipped"] = True
        else:
            feats = qm.hashed_features(docs3)
            w = qm.train_lr(feats, labels)
            qual = qual.join(
                qm.score_lr(feats, w).select("doc_id", "score"),
                "doc_id",
            )
            cond = cond & (F.col("score") >= classifier_threshold)
    docs4 = (
        qual.where(cond)
        .select("doc_id", *carry, "text", "n_tokens")
        .persist()
    )
    report["after_quality"] = docs4.count()
    docs3.unpersist()

    # 6. token-budget packing
    packed = corpus_stats.sequence_pack(
        docs4.select("doc_id", "text"), budget
    )
    out = docs4.join(packed.select("doc_id", "bin_id"), "doc_id")
    if split:
        out = out.join(
            corpus_stats.dataset_split(out.select("doc_id")).select(
                "doc_id", "split"
            ),
            "doc_id",
        )
    out = out.persist()
    report["n_bins"] = out.select("bin_id").distinct().count()
    if bpe_report:
        from websearchengine_spark.operators import bpe as bpe_op

        merges = bpe_op.train_merges(out.select("doc_id", "text"))
        report["bpe_subword_tokens"] = int(
            bpe_op.bpe_token_counts(out.select("doc_id", "text"), merges)
            .agg(F.sum("n_subwords").alias("s"))
            .head()["s"]
            or 0
        )
    docs4.unpersist()
    return out  # persisted; caller unpersists when done
