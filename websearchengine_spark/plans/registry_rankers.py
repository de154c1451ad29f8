"""Driver gates for the hw1 ranker family (SURVEY §2.5 R3/R4/R5).

R3 (phrase-count ranker, hw1 Ranker.java:133-181), R4 (numviews ranker,
:183-185), and R5 (the linear blend 0.6·cosine + 0.39·QL + 0.0099·phrase
+ 0.0001·numviews, :189-192) were pytest-verified only through round 3;
these gates put the same semantics under the independent DuckDB oracle
over the gate tokenization (the reference-exact stemmed path remains
tests/test_rankers.py territory, same split as every other gate).

numviews source: the driver fixture has no view-log table, so views are
MINED from ``events`` with the deterministic doc mapping
``doc_id = event_id % num_docs`` — the same shape as the reference's
LogMinerNumviews join (G3), expressible identically in both engines.

R3 uses a THREE-token phrase (two-way adjacency is already gated by
``phrase_match``); a doc with two runs of the sequence exists at sf0.01,
so multi-run counting is exercised.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from websearchengine_spark.plans import registry as R

PHRASE3 = ("slow", "hash", "batch")
BLEND_BETAS = (0.6, 0.39, 0.0099, 0.0001)  # hw1 Ranker.java:189-192
QL_BETA = R.QL_BETA


def _phrase3_counts(spark, sf_dir):
    """(doc_id, tf) — adjacent runs of the full PHRASE3 sequence."""
    t = R._tok(spark, sf_dir)
    a = t.where(F.col("term") == PHRASE3[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    b = t.where(F.col("term") == PHRASE3[1]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    c = t.where(F.col("term") == PHRASE3[2]).select(
        "doc_id", F.col("pos").alias("p2")
    )
    return (
        a.join(b, "doc_id")
        .where(F.col("p1") == F.col("p0") + 1)
        .join(c, "doc_id")
        .where(F.col("p2") == F.col("p0") + 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def q_phrase_count_topk(spark, sf_dir):
    """R3 — score = number of adjacent runs of the full query sequence;
    all matching docs (no limit cut: the hash then covers every score)."""
    return _phrase3_counts(spark, sf_dir).select(
        "doc_id", F.col("tf").cast("double").alias("score")
    )


_P3 = PHRASE3
SQL_PHRASE_COUNT_TOPK = f"""WITH {R._SQL_TOK_CTE}
SELECT a.doc_id, count(*)::DOUBLE AS score
FROM tok a
JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
WHERE a.term = '{_P3[0]}' AND b.term = '{_P3[1]}' AND c.term = '{_P3[2]}'
GROUP BY a.doc_id"""


def _numviews(spark, sf_dir):
    """(doc_id, nv) — mined views per doc: count of events mapped by
    event_id % num_docs (every doc present, zero-filled)."""
    docs = R._docs(spark, sf_dir)
    n = docs.count()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    nv = e.groupBy((F.col("event_id") % n).alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    return (
        docs.select("doc_id")
        .join(nv, "doc_id", "left")
        .fillna({"nv": 0})
    )


def q_numviews_topk(spark, sf_dir):
    """R4 — score = numViews; full table (rank cut covered by pytest)."""
    return _numviews(spark, sf_dir).select(
        "doc_id", F.col("nv").cast("double").alias("score")
    )


SQL_NUMVIEWS_TOPK = """WITH nv AS (
  SELECT event_id % (SELECT count(*) FROM documents) AS doc_id,
         count(*)::BIGINT AS nv
  FROM events GROUP BY 1
)
SELECT d.doc_id, coalesce(nv.nv, 0)::DOUBLE AS score
FROM documents d LEFT JOIN nv USING (doc_id)"""


def q_linear_blend_topk(spark, sf_dir):
    """R5 — 0.6·cosine + 0.39·QL + 0.0099·phrase + 0.0001·numviews for
    the gate query, every doc scored (hw1 scores the full corpus: docs
    with no match take cosine 0, the QL collection-prior product, phrase
    0, and their views); top-20 by (rounded score desc, doc_id asc)."""
    b1, b2, b3, b4 = BLEND_BETAS
    docs = R._docs(spark, sf_dir)
    n = docs.count()
    p = R._postings(spark, sf_dir)
    dl = R._doclen(spark, sf_dir)
    total_terms = int(
        R._tok(spark, sf_dir).agg(F.count(F.lit(1))).head()[0]
    )

    # cosine component (idf = 1 + log2(N/df), qtf = 1) — q_cosine_topk's
    # math, unrounded until the final blend
    ts = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.lit(1.0) + F.log2(F.lit(float(n)) / F.col("df"))
    weighted = p.join(ts, "term").select(
        "term", "doc_id", (F.col("tf") * idf).alias("w")
    )
    norm = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm")
    )
    qnorm = float(len(R.QUERY_TERMS)) ** 0.5
    cos = (
        weighted.where(F.col("term").isin(R.QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("dot"))
        .join(norm, "doc_id")
        .select(
            "doc_id",
            (F.col("dot") / (F.col("dnorm") * F.lit(qnorm))).alias("s_cos"),
        )
    )

    # disjunctive QL: every doc scores; missing tokens take the prior
    import math

    qp = p.where(F.col("term").isin(R.QUERY_TERMS))
    ctf_rows = (
        qp.groupBy("term").agg(F.sum("tf").cast("double").alias("ctf"))
    ).collect()
    ctf_map = {r.term: r.ctf for r in ctf_rows}
    log_prior = sum(
        math.log(QL_BETA * ctf_map[t] / total_terms)
        for t in R.QUERY_TERMS
        if t in ctf_map
    )
    spark_ctf = spark.createDataFrame(
        [(t, float(c)) for t, c in ctf_map.items()], "term string, ctf double"
    )
    prior = F.lit(QL_BETA) * F.col("ctf") / F.lit(float(total_terms))
    factor = (
        F.lit(1.0 - QL_BETA) * F.col("tf") / F.col("doc_len") + prior
    )
    ql = (
        qp.join(dl, "doc_id")
        .join(F.broadcast(spark_ctf), "term")
        .groupBy("doc_id")
        .agg(
            F.exp(
                F.sum(F.log(factor) - F.log(prior)) + F.lit(float(log_prior))
            ).alias("s_ql")
        )
    )

    ph = _phrase3_counts(spark, sf_dir).select(
        "doc_id", F.col("tf").cast("double").alias("s_ph")
    )
    nv = _numviews(spark, sf_dir).select(
        "doc_id", F.col("nv").cast("double").alias("s_nv")
    )
    out = (
        nv.join(cos, "doc_id", "left")
        .join(ql, "doc_id", "left")
        .join(ph, "doc_id", "left")
        .fillna({"s_cos": 0.0, "s_ql": float(math.exp(log_prior)),
                 "s_ph": 0.0})
        .select(
            "doc_id",
            F.round(
                F.lit(b1) * F.col("s_cos")
                + F.lit(b2) * F.col("s_ql")
                + F.lit(b3) * F.col("s_ph")
                + F.lit(b4) * F.col("s_nv"),
                6,
            ).alias("score"),
        )
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


_terms_sql = ",".join(f"'{t}'" for t in R.QUERY_TERMS)
_b1, _b2, _b3, _b4 = BLEND_BETAS
SQL_LINEAR_BLEND_TOPK = f"""WITH {R._SQL_POSTINGS_CTE},
doclen AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM postings GROUP BY doc_id),
tot AS (SELECT sum(tf)::DOUBLE AS c FROM postings),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY term),
weighted AS (
  SELECT p.term, p.doc_id, p.tf * (1.0 + log2(n.n / ts.df)) AS w
  FROM postings p JOIN ts USING (term), n
),
norm AS (SELECT doc_id, sqrt(sum(w*w)) AS dnorm FROM weighted GROUP BY doc_id),
cos AS (
  SELECT w.doc_id, sum(w.w) / (norm.dnorm * sqrt({float(len(R.QUERY_TERMS))!r})) AS s_cos
  FROM weighted w JOIN norm USING (doc_id)
  WHERE w.term IN ({_terms_sql}) GROUP BY w.doc_id, norm.dnorm
),
qterms AS (SELECT unnest([{_terms_sql}]) AS term),
ctf AS (
  SELECT qterms.term, sum(p.tf)::DOUBLE AS ctf
  FROM qterms JOIN postings p USING (term) GROUP BY 1
),
ql AS (
  SELECT d.doc_id,
         exp(sum(ln(
           {1.0 - QL_BETA} * coalesce(p.tf, 0) / d.doc_len
           + {QL_BETA} * ctf.ctf / tot.c
         ))) AS s_ql
  FROM doclen d CROSS JOIN ctf
  LEFT JOIN postings p ON p.term = ctf.term AND p.doc_id = d.doc_id,
  tot
  GROUP BY d.doc_id
),
ph AS (
  SELECT a.doc_id, count(*)::DOUBLE AS s_ph
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  WHERE a.term = '{_P3[0]}' AND b.term = '{_P3[1]}' AND c.term = '{_P3[2]}'
  GROUP BY a.doc_id
),
nv AS (
  SELECT event_id % (SELECT count(*) FROM documents) AS doc_id,
         count(*)::DOUBLE AS s_nv
  FROM events GROUP BY 1
)
SELECT d.doc_id,
       round({_b1!r} * coalesce(cos.s_cos, 0.0)
             + {_b2!r} * ql.s_ql
             + {_b3!r} * coalesce(ph.s_ph, 0.0)
             + {_b4!r} * coalesce(nv.s_nv, 0.0), 6) AS score
FROM documents d
JOIN ql USING (doc_id)
LEFT JOIN cos USING (doc_id)
LEFT JOIN ph USING (doc_id)
LEFT JOIN nv USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 20"""


RANKERS_REGISTRY = {
    "phrase_count_topk": (q_phrase_count_topk, SQL_PHRASE_COUNT_TOPK),
    "numviews_topk": (q_numviews_topk, SQL_NUMVIEWS_TOPK),
    "linear_blend_topk": (q_linear_blend_topk, SQL_LINEAR_BLEND_TOPK),
}
