"""Corpus analytics (SURVEY.md §2.6, G1-G6).

- G1 link-graph build from raw HTML (regex target extraction + in-corpus
  join) and a deterministic synthetic generator for test tables that have
  no hyperlinks;
- G2 PageRank: λ=0.9, 2 iterations, init 1.0, NO dangling-mass
  redistribution — the reference's configuration
  (CorpusAnalyzerPagerank.java:44-46, :100-131).  The reference updates
  in place (Gauss-Seidel); Spark iterations are synchronous (Jacobi) —
  the variance is documented in SURVEY.md §2.6 G2 and our oracle uses the
  same synchronous semantics on both engines.
- G3 NumViews log mining (last-match-wins per title,
  LogMinerNumviews.java:57-107);
- G4 Spearman rank correlation (correct formula; the reference's buggy
  denominator is noted at Spearman.java:34-135 — we implement textbook
  Spearman as the SURVEY G4 contract);
- G5 pseudo-relevance feedback query representation
  (QueryRepresentation.java:50-119);
- G6 Bhattacharyya coefficient between two query representations
  (Bhattacharyya.java:36-55, per-pair sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_LAMBDA = 0.9
PR_ITERS = 2
LINK_RE = r'<[aA][^>]*?href="([^ /#"]*)"'


def extract_links(corpus: DataFrame, html_col: str = "html") -> DataFrame:
    """G1/T8 — (src_url, target) pairs from raw HTML via the reference's
    regex (CorpusAnalyzer.java:36-37), first capture group per anchor."""
    return corpus.select(
        F.col("url").alias("src_url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col).cast("string"), F.lit(LINK_RE), F.lit(1))
        ).alias("target"),
    )


def build_edges(corpus_with_ids: DataFrame, links: DataFrame) -> DataFrame:
    """G1 — keep in-corpus targets (join on url), dedupe parallel edges
    (CorpusAnalyzerPagerank.java:162-199 uses in-link Sets)."""
    ids = corpus_with_ids.select("url", "doc_id")
    return (
        links.join(ids.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("doc_id", "src_id")
        .join(
            ids.select(F.col("url").alias("target"), F.col("doc_id").alias("dst_id")),
            "target",
        )
        .select("src_id", "dst_id")
        .distinct()
    )


def synthetic_edges(docs: DataFrame, fanout: int = 3) -> DataFrame:
    """Deterministic synthetic link graph over any docs table (the driver
    test tables carry no hyperlinks): doc i links to (i*31 + 7*j) % N for
    j in 1..fanout, self-loops dropped.  Both engines can construct this
    exactly, so PageRank is fully oracle-checkable."""
    n = docs.select(F.count(F.lit(1))).head()[0]
    base = docs.select(F.col("doc_id").alias("src_id"))
    edges = None
    for j in range(1, fanout + 1):
        e = base.select(
            "src_id",
            ((F.col("src_id") * 31 + 7 * j) % F.lit(int(n))).alias("dst_id"),
        )
        edges = e if edges is None else edges.unionByName(e)
    return edges.where(F.col("src_id") != F.col("dst_id")).distinct()


def pagerank(
    docs: DataFrame,
    edges: DataFrame,
    lam: float = PR_LAMBDA,
    iters: int = PR_ITERS,
) -> DataFrame:
    """G2 — synchronous (Jacobi) iterations of
    PR(j) = λ·Σ_{i→j} PR(i)/outdeg(i) + (1−λ)/N over deduped edges,
    init 1.0, no dangling redistribution — reference parameters with the
    synchronous-parity caveat.  Each iteration is one join + one groupBy;
    ranks are re-joined to ALL docs so nodes without in-links keep the
    (1−λ)/N floor."""
    n = docs.select(F.count(F.lit(1))).head()[0]
    out_deg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("out_deg"))
    contrib_edges = edges.join(out_deg, "src_id")  # every src has out_deg >= 1
    ranks = docs.select(F.col("doc_id"), F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("doc_id", "src_id"), "src_id"
            )
            .groupBy("dst_id")
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("mass"))
        )
        ranks = (
            docs.select("doc_id")
            .join(contribs.withColumnRenamed("dst_id", "doc_id"), "doc_id", "left")
            .fillna({"mass": 0.0})
            .select(
                "doc_id",
                (F.lit(lam) * F.col("mass") + F.lit((1.0 - lam) / n)).alias("pr"),
            )
        )
    return ranks.select("doc_id", F.round("pr", 9).alias("page_rank"))


def parse_view_log(lines: DataFrame) -> DataFrame:
    """S5 — raw log lines (value string, line_no long) -> (lang, article,
    views, line_no): keep exactly-3-field lines with numeric views,
    URL-decode article (LogMinerNumviews.java:68-104)."""
    parts = F.split(F.col("value"), " ")
    return (
        lines.select("line_no", parts.alias("p"))
        .where(
            (F.size("p") == 3)
            & F.element_at("p", 3).rlike("^[0-9]+$")
        )
        .select(
            F.element_at("p", 1).alias("lang"),
            F.try_url_decode(F.element_at("p", 2)).alias("article"),
            F.element_at("p", 3).cast("long").alias("views"),
            "line_no",
        )
        .where(F.col("article").isNotNull())
    )


def numviews_from_log(view_log: DataFrame, docs: DataFrame) -> DataFrame:
    """G3 — view_log(lang, article, views, line_no) -> per-title last
    matching line's count (overwrite semantics, LogMinerNumviews.java:107);
    docs without a log line get 0."""
    last = view_log.groupBy("article").agg(
        F.max_by("views", "line_no").alias("num_views")
    )
    return (
        docs.select("doc_id", "url")
        .join(last.withColumnRenamed("article", "url"), "url", "left")
        .fillna({"num_views": 0})
        .select("doc_id", F.col("num_views").cast("long").alias("num_views"))
    )


def spearman(metrics: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """G4 — textbook Spearman ρ between two per-doc metrics: rank desc with
    doc_id-asc tiebreak (the reference's comparator contract), then Pearson
    corr of the ranks.  Returns a 1-row (rho) DataFrame."""
    wx = Window.orderBy(F.desc(col_x), F.asc("doc_id"))
    wy = Window.orderBy(F.desc(col_y), F.asc("doc_id"))
    ranked = metrics.select(
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    return ranked.agg(F.round(F.corr("rx", "ry"), 9).alias("rho"))


def prf_representation(
    topdocs: DataFrame,
    postings: DataFrame,
    num_terms: int = 10,
) -> DataFrame:
    """G5 — sum tf over the top docs' terms, keep top ``num_terms`` by
    (freq desc, term asc), then normalize over the RETAINED mass
    (QueryRepresentation.java:50-119's two-step normalization reduces to
    this for the returned terms).  Returns (term, prob)."""
    summed = (
        postings.join(topdocs.select("doc_id"), "doc_id")
        .groupBy("term")
        .agg(F.sum("tf").alias("freq"))
    )
    top = summed.orderBy(F.desc("freq"), F.asc("term")).limit(num_terms)
    total = Window.partitionBy()
    return top.select(
        "term",
        F.round(F.col("freq") / F.sum("freq").over(total), 9).alias("prob"),
    )


def bhattacharyya(rep_a: DataFrame, rep_b: DataFrame) -> DataFrame:
    """G6 — Σ_w sqrt(p_a(w)·p_b(w)) over shared terms (per-pair sum; the
    reference's accumulator bug is documented, spec is per-pair)."""
    return (
        rep_a.select("term", F.col("prob").alias("pa"))
        .join(rep_b.select("term", F.col("prob").alias("pb")), "term")
        .agg(F.round(F.sum(F.sqrt(F.col("pa") * F.col("pb"))), 9).alias("bc"))
    )
