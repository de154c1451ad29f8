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
  Spearman as the SURVEY G4 contract).  Ranks are computed DISTRIBUTED
  (``_global_ranks``: strictly-greater-count over the distinct-value
  frame + within-tie doc_id rank, literal-boundary bucketing) — never a
  single-partition global window;
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


def _global_ranks(
    metrics: DataFrame,
    col: str,
    out: str,
    id_bounds: list[int],
    heavy_thresh: int,
    n_parts: int,
    n_total: int | None = None,
) -> DataFrame:
    """Exact dense rank 1..N of every row by (``col`` desc, doc_id asc)
    WITHOUT a single-partition window: rank(d) decomposes into

        (# rows with value strictly greater)            [cum_gt, per VALUE]
      + (# rows tied on value with doc_id <= d's)       [within-tie id rank]

    cum_gt runs over the DISTINCT-value frame, range-bucketed by literal
    percentile boundaries (the sequence_pack pattern: boundaries are
    collected once and embedded as literals so every job agrees), with a
    driver-side exclusive prefix over the <= n_parts bucket totals — no
    unbounded task ever sorts more than ~distinct/n_parts rows.  Tie
    groups larger than ``heavy_thresh`` (e.g. num_views == 0 over most of
    a crawl) are additionally split by the shared doc_id percentile
    boundaries, with per-(value, id-bucket) offsets computed exactly from
    bounded counts (<= |heavy| * n_parts rows collected).  Null metric
    values rank LAST ordered by doc_id (the global window's
    DESC NULLS LAST), via the same id-bucket machinery.  Exactness never
    depends on the boundaries — they only balance tasks; a heavy group
    whose doc_ids all fall in one id-bucket (metric correlated with
    doc_id) can still skew a task, but the result stays correct.

    ``indexer.assign_doc_ids`` solves the no-tie special case of this
    problem with repartitionByRange; it is deliberately NOT reused here:
    RangePartitioner re-samples with an RDD-id-dependent seed per
    execution (the sequence_pack hazard), and a composite (value desc,
    doc_id asc) sort key cannot be expressed as literal boundaries that
    both the offsets pass and the rank pass are guaranteed to share."""
    spark = metrics.sparkSession
    x = F.col(col)
    dt = metrics.schema[col].dataType
    m = metrics.select("doc_id", col)
    mn = m.where(x.isNotNull())

    # the distinct-value frame feeds THREE consumers (boundary/heavy agg,
    # bucket totals, and the final cum_gt window); persist it across the
    # two bounded driver collects so the groupBy shuffle runs once, and
    # release it before returning — the final plan recomputes it once at
    # execution instead of holding cache behind the caller's back
    vals = mn.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt")).persist()
    qs = [i / n_parts for i in range(1, n_parts)]
    vrow = vals.agg(
        F.percentile_approx(col, qs).alias("b"),
        # collect_list drops the nulls of non-heavy values; bounded at
        # n_rows / heavy_thresh entries by construction
        F.collect_list(
            F.when(F.col("__cnt") > heavy_thresh, x)
        ).alias("heavy"),
    ).head()
    heavy = list(vrow.heavy or []) if vrow else []
    vbounds = sorted({v for v in ((vrow.b if vrow else None) or [])})
    if vbounds:
        barr = F.array(*[F.lit(b).cast(dt) for b in vbounds])
        vpid = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(x < b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        vpid = F.lit(0)
    valsp = vals.withColumn("__vpid", vpid.cast("int"))

    # exclusive prefix of bucket totals in DESC value order (vpid 0 holds
    # the LARGEST values, so desc order == ascending vpid)
    tot = {
        r["__vpid"]: int(r.s)
        for r in valsp.groupBy("__vpid")
        .agg(F.sum("__cnt").alias("s"))
        .collect()
    }
    vals.unpersist()
    voff, acc = {}, 0
    for p in sorted(tot):
        voff[p] = acc
        acc += tot[p]
    n_nonnull = acc
    if voff:
        voff_expr = F.element_at(
            F.create_map(
                *[F.lit(v) for kv in sorted(voff.items()) for v in kv]
            ),
            F.col("__vpid"),
        )
    else:
        voff_expr = F.lit(0)
    wv = (
        Window.partitionBy("__vpid")
        .orderBy(F.desc(col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_gt = valsp.select(
        col,
        (F.coalesce(F.sum("__cnt").over(wv), F.lit(0)) + voff_expr).alias(
            "__n_gt"
        ),
    )

    if id_bounds:
        ibarr = F.array(*[F.lit(b).cast("long") for b in id_bounds])
        id_bucket = F.aggregate(
            ibarr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("doc_id") > b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        id_bucket = F.lit(0)
    idb_expr = (
        F.when(x.isin(heavy), id_bucket).otherwise(F.lit(0))
        if heavy
        else F.lit(0)
    )
    mm = mn.withColumn("__idb", idb_expr.cast("int"))

    if heavy:
        gcnt = (
            mm.filter(x.isin(heavy))
            .groupBy(col, "__idb")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        rows, by_val = [], {}
        for r in gcnt:
            by_val.setdefault(r[0], []).append((r["__idb"], int(r.n)))
        for v, lst in by_val.items():
            run = 0
            for idb, n in sorted(lst):
                rows.append((v, idb, run))
                run += n
        goff = spark.createDataFrame(
            rows,
            schema=mm.select(col, "__idb").schema.add("__goff", "long"),
        )
        mm = mm.join(F.broadcast(goff), [col, "__idb"], "left")
    else:
        mm = mm.withColumn("__goff", F.lit(None).cast("long"))

    wid = Window.partitionBy(col, "__idb").orderBy(F.asc("doc_id"))
    ranked = (
        mm.withColumn("__r_in", F.row_number().over(wid))
        .join(cum_gt, col)
        .select(
            "doc_id",
            (
                F.col("__n_gt") + F.coalesce(F.col("__goff"), F.lit(0))
                + F.col("__r_in")
            ).cast("long").alias(out),
        )
    )

    # null metric values: rank after every non-null row, ordered by
    # doc_id, split over the shared id buckets exactly like a heavy tie
    # group (one bounded <= n_parts+1-row collect for the offsets).
    # When the caller knows the frame's total row count (``n_total``)
    # and it equals the non-null count, the whole stage — a full scan
    # of the metrics frame — is skipped: the common all-non-null corpus
    # pays nothing for null support.
    if n_total is not None and n_total == n_nonnull:
        return ranked
    mz = m.where(x.isNull()).withColumn("__idb", id_bucket.cast("int"))
    zcnt = sorted(
        (int(r["__idb"]), int(r.n))
        for r in mz.groupBy("__idb").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if zcnt:
        zoff, run = {}, n_nonnull
        for idb, n in zcnt:
            zoff[idb] = run
            run += n
        zoff_expr = F.element_at(
            F.create_map(
                *[F.lit(v) for kv in sorted(zoff.items()) for v in kv]
            ),
            F.col("__idb"),
        )
        wz = Window.partitionBy("__idb").orderBy(F.asc("doc_id"))
        ranked = ranked.unionByName(
            mz.select(
                "doc_id",
                (F.row_number().over(wz) + zoff_expr)
                .cast("long")
                .alias(out),
            )
        )
    return ranked


def _spearman_plan(
    m: DataFrame, col_x: str, col_y: str, n_parts: int
) -> DataFrame:
    """Lazy rho plan over a (doc_id, col_x, col_y) frame — split out so
    the plan-audit tool can ``explain`` the rank machinery (the public
    ``spearman`` returns an eagerly-computed local relation)."""
    qs = [i / n_parts for i in range(1, n_parts)]
    row = m.select(
        F.percentile_approx("doc_id", qs).alias("ib"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    n_rows = int(row.n) if row else 0
    id_bounds = sorted({int(v) for v in ((row.ib if row else None) or [])})
    heavy_thresh = max(2 * n_rows // n_parts, 1024)
    rx = _global_ranks(
        m, col_x, "rx", id_bounds, heavy_thresh, n_parts, n_total=n_rows
    )
    ry = _global_ranks(
        m, col_y, "ry", id_bounds, heavy_thresh, n_parts, n_total=n_rows
    )
    ranked = rx.join(ry, "doc_id")
    return ranked.agg(F.round(F.corr("rx", "ry"), 9).alias("rho"))


def spearman(
    metrics: DataFrame, col_x: str, col_y: str, n_parts: int | None = None
) -> DataFrame:
    """G4 — textbook Spearman ρ between two per-doc metrics: rank desc with
    doc_id-asc tiebreak (the reference's comparator contract), then Pearson
    corr of the ranks.  Returns a 1-row (rho) DataFrame.

    Contract: ``doc_id`` must be UNIQUE (it is the tiebreak; duplicate
    ids would make the ranking ill-defined).  Null metric values rank
    last, ordered by doc_id — the global window's ``DESC NULLS LAST``.

    Ranks are computed distributed (``_global_ranks``): per-column exact
    ranks, never a single-partition global window, so the operator holds
    at corpus scale; the rank join on doc_id and the value joins are
    plain equi-joins (AQE skew-splittable).  The statistic is computed
    EAGERLY under a scoped persist of the projected input — the metrics
    plan (often a full tokenize+aggregate) is executed once instead of
    once per boundary/offset job — and returned as a 1-row local
    relation."""
    spark = metrics.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    m = metrics.select("doc_id", col_x, col_y).persist()
    try:
        ranked = _spearman_plan(m, col_x, col_y, n_parts)
        row = ranked.head()
    finally:
        m.unpersist()
    return spark.createDataFrame([row] if row else [], ranked.schema)


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
