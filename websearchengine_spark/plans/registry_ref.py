"""Driver gates over the reference's SHIPPED hw3 index (real data).

These gates are the strongest reference-parity evidence obtainable from the
checkout: the Spark side parses the reference's real on-disk index text
format (sources/refindex.py) and runs QL / BM25 / comprehensive-cascade
ranking over 2.55M real term occurrences with the reference's real doc
lengths, PageRank and NumViews; the DuckDB oracle re-parses the SAME files
independently in SQL (read_text + string splits) and recomputes each
ranking.  Unlike every other gate these ignore ``sf_dir`` — the input is
the reference checkout itself (read-only).

Gate query is "york university" -> stems (york, universiti): the shipped
index is partial (only terms starting with " ' ( . 0-9 j k q u v x y z
æ œ α were shipped), and the reference's own 5-query set all starts with
unshipped letters, so parity is gated on high-frequency shipped terms
instead (york: df 4,508 / ctf 28,520; universiti: df 3,926 / ctf 27,620 —
real Wikipedia heavy hitters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from websearchengine_spark.operators import score as S
from websearchengine_spark.sources import refindex as RI

BM25_K1 = 1.2
BM25_B = 0.75
QL_BETA = 0.5

REF_QUERY = "york university"
REF_TERMS = ("york", "universiti")  # parse_query stems of REF_QUERY

_IDX_GLOB = f"{RI.REF_INDEX_DIR}/*.idx"
_DOCS_JSON = f"{RI.REF_INDEX_DIR}/documents"
_DOCURL = f"{RI.REF_INDEX_DIR}/docURL"

# Independent SQL re-parse of the .idx text format (readAll semantics:
# term = before FIRST ':', data = after LAST ':'; ';' posting groups of
# [docid, absolute positions...]).  DuckDB's read_text glob, unlike
# Spark's file index, already includes the hidden '..idx' dot-file.
# ``refgrp`` keeps the parsed number list so ``refpost`` (tf) and
# ``refpos`` (exploded absolute positions, for the phrase gate) derive
# from one parse.
_SQL_REF_CTES = f"""refgrp AS (
  SELECT split_part(line, ':', 1) AS term,
         list_transform(
           list_filter(string_split(grp, ','), x -> length(x) > 0),
           x -> CAST(x AS BIGINT)) AS nums
  FROM (
    SELECT line,
           unnest(string_split(list_extract(string_split(line, ':'), -1), ';')) AS grp
    FROM (SELECT unnest(string_split(content, chr(10))) AS line
          FROM read_text('{_IDX_GLOB}'))
    WHERE contains(line, ':')
  ) WHERE length(grp) > 0
),
refpost AS (
  SELECT term, nums[1] AS doc_id, len(nums) - 1 AS tf
  FROM refgrp WHERE len(nums) > 1
),
refpos AS (
  SELECT term, nums[1] AS doc_id, unnest(nums[2:]) AS pos
  FROM refgrp WHERE len(nums) > 1
),
refdocs AS (
  SELECT docID::BIGINT AS doc_id, totalTerms::BIGINT AS dl,
         "_pageRank"::DOUBLE AS page_rank, "_numViews"::BIGINT AS num_views
  FROM read_json('{_DOCS_JSON}', format='array')
),
refconsts AS (
  SELECT CAST(json_extract(content, '$._numDocs') AS DOUBLE) AS n,
         CAST(json_extract(content, '$._totalTermFrequency') AS DOUBLE) AS c
  FROM read_text('{_DOCURL}')
)"""

_ref_terms_sql = ",".join(f"'{t}'" for t in REF_TERMS)


def q_ref_idx_term_stats(spark, sf_dir):
    """S8 — parse the shipped index; top-100 real terms by collection term
    frequency (ctf desc, term asc): the heavy-hitter profile the A10
    salting strategy is sized against."""
    p = RI.ref_postings(spark)
    return (
        p.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("ctf"),
        )
        .orderBy(F.desc("ctf"), F.asc("term"))
        .limit(100)
    )


SQL_REF_IDX_TERM_STATS = f"""WITH {_SQL_REF_CTES}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ctf
FROM refpost GROUP BY term
ORDER BY ctf DESC, term ASC LIMIT 100"""


def q_ref_idx_bm25(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75, Lucene idf) conjunctive top-10 for
    "york university" over the REAL index: real positions-derived tf, real
    doc lengths (documents.totalTerms), real corpus sentinels."""
    postings, _docs, n, tot = RI.ref_index_tables(spark)
    out = S.rank_bm25(postings, REF_QUERY, n, tot / n, k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


SQL_REF_IDX_BM25 = f"""WITH {_SQL_REF_CTES},
qp AS (SELECT * FROM refpost WHERE term IN ({_ref_terms_sql})),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM qp GROUP BY term),
scored AS (
  SELECT qp.doc_id,
         round(sum(
           ln(1.0 + (refconsts.n - ts.df + 0.5) / (ts.df + 0.5))
           * qp.tf * {BM25_K1 + 1.0}
           / (qp.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * refdocs.dl / (refconsts.c / refconsts.n)))
         ), 6) AS score,
         count(DISTINCT qp.term) AS n_hit
  FROM qp JOIN refdocs USING (doc_id), refconsts
  JOIN ts ON qp.term = ts.term
  GROUP BY qp.doc_id
)
SELECT doc_id, score FROM scored WHERE n_hit = {len(REF_TERMS)}
ORDER BY score DESC, doc_id ASC LIMIT 10"""


def q_ref_idx_ql(spark, sf_dir):
    """Reference QL (Jelinek-Mercer β=0.5, RankerComprehensive.java:43-53)
    conjunctive top-10 over the real index."""
    postings, _docs, _n, tot = RI.ref_index_tables(spark)
    out = S.rank_ql(postings, REF_QUERY, tot, k=10)
    return out.select("doc_id", F.round("score", 12).alias("score"))


_SQL_REF_QL_SCORED = f"""qp AS (SELECT * FROM refpost WHERE term IN ({_ref_terms_sql})),
cstats AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM qp GROUP BY term),
scored AS (
  SELECT qp.doc_id,
         exp(sum(ln(
           (1.0 - {QL_BETA}) * qp.tf / refdocs.dl
           + {QL_BETA} * cstats.ctf / refconsts.c
         ))) AS score,
         count(DISTINCT qp.term) AS n_hit
  FROM qp JOIN refdocs USING (doc_id), refconsts
  JOIN cstats ON qp.term = cstats.term
  GROUP BY qp.doc_id
),
conj AS (SELECT doc_id, score FROM scored WHERE n_hit = {len(REF_TERMS)})"""

SQL_REF_IDX_QL = f"""WITH {_SQL_REF_CTES},
{_SQL_REF_QL_SCORED}
SELECT doc_id, round(score, 12) AS score FROM conj
ORDER BY score DESC, doc_id ASC LIMIT 10"""


def q_ref_idx_comprehensive(spark, sf_dir):
    """R7 cascade over the real index with the reference's REAL mined
    PageRank and NumViews (documents._pageRank/_numViews): QL desc -> top
    50 -> stable PageRank desc -> top 30 -> stable NumViews desc -> top
    10, with the final ordering exported as an explicit rank column (the
    driver hash is order-insensitive)."""
    from pyspark.sql import Window

    postings, docs, _n, tot = RI.ref_index_tables(spark)
    out = S.rank_comprehensive(postings, docs, REF_QUERY, tot, k=10)
    w = Window.orderBy(
        F.desc("num_views"), F.desc("page_rank"), F.desc("score"),
        F.asc("doc_id"),
    )
    return out.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("score", 12).alias("ql_score"),
        "num_views",
    )


SQL_REF_IDX_COMPREHENSIVE = f"""WITH {_SQL_REF_CTES},
{_SQL_REF_QL_SCORED},
s1 AS (SELECT * FROM conj ORDER BY score DESC, doc_id ASC LIMIT 50),
s2 AS (SELECT s1.doc_id, s1.score, d.page_rank, d.num_views
       FROM s1 JOIN refdocs d USING (doc_id)
       ORDER BY d.page_rank DESC, s1.score DESC, s1.doc_id ASC LIMIT 30)
SELECT row_number() OVER (ORDER BY num_views DESC, page_rank DESC,
                          score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, round(score, 12) AS ql_score, num_views
FROM s2
ORDER BY num_views DESC, page_rank DESC, score DESC, doc_id ASC LIMIT 10"""


def q_ref_idx_phrase(spark, sf_dir):
    """Q4/Q5 over the REAL shipped index: the phrase "york universiti"
    (stems of the gate query) verified by the positions-adjacency path —
    conjunctive pre-join on both terms, then the adjacency-count Arrow UDF
    (phrase_count_udf, IndexerInvertedCompressed.java:520-564) as
    phrase_tf over the reference's real absolute token positions.  Output
    carries the real doc length so the gate also pins the dl join."""
    from websearchengine_spark.operators import query as Q

    postings, _docs, _n, _tot = RI.ref_index_tables(spark)
    out = Q.phrase_token_postings(postings, " ".join(REF_TERMS))
    return out.select("doc_id", F.col("tf").cast("long").alias("phrase_tf"), "dl")


SQL_REF_IDX_PHRASE = f"""WITH {_SQL_REF_CTES},
w0 AS (SELECT doc_id, pos FROM refpos WHERE term = '{REF_TERMS[0]}'),
w1 AS (SELECT doc_id, pos FROM refpos WHERE term = '{REF_TERMS[1]}'),
adj AS (
  SELECT w0.doc_id, count(*)::BIGINT AS phrase_tf
  FROM w0 JOIN w1 ON w1.doc_id = w0.doc_id AND w1.pos = w0.pos + 1
  GROUP BY w0.doc_id
)
SELECT adj.doc_id, adj.phrase_tf, d.dl FROM adj JOIN refdocs d USING (doc_id)"""


def q_ref_idx_cosine(spark, sf_dir):
    """R2 cosine/VSM over the REAL index (hw1 Ranker.java:57-114
    semantics: doc tf-idf over ALL doc terms with idf = 1 + log2(N/df),
    query vector = raw token counts, dot > 0 filter).  Scores are rounded
    to 6 dp BEFORE the top-10 sort on both engines so the selected row
    set is identical despite log2/sqrt float noise."""
    from websearchengine_spark.operators import score as S2

    postings, _docs, n, _tot = RI.ref_index_tables(spark)
    scored = S2.cosine_scores(postings, REF_QUERY, n)
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_REF_IDX_COSINE = f"""WITH {_SQL_REF_CTES},
ts AS (SELECT term, count(*)::DOUBLE AS df FROM refpost GROUP BY term),
wt AS (
  SELECT refpost.term, refpost.doc_id,
         refpost.tf * (1.0 + log2(refconsts.n / ts.df)) AS w
  FROM refpost JOIN ts USING (term), refconsts
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM wt GROUP BY doc_id),
dt AS (
  SELECT doc_id, sum(w) AS dot
  FROM wt WHERE term IN ({_ref_terms_sql})
  GROUP BY doc_id HAVING sum(w) > 0
)
SELECT dt.doc_id, round(dt.dot / (nrm.dnorm * sqrt(2.0)), 6) AS score
FROM dt JOIN nrm USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10"""


def q_ref_idx_wand(spark, sf_dir):
    """Block-max WAND over the REAL shipped index: parse the reference's
    postings, compress them into delta-gap varint segments with block-max
    metadata (the engine's own build path), then answer the gate query
    through the pruned two-pass WAND serve path.  The oracle is plain
    BM25 SQL over the same parse — the pruned == unpruned == relational
    invariant, enforced by the driver on 2.55M real occurrences."""
    from websearchengine_spark.operators import indexer as IDX
    from websearchengine_spark.operators import wand as W

    postings, _docs, n, tot = RI.ref_index_tables(spark)
    avgdl = tot / n
    segs = IDX.build_segments(
        postings, avgdl=avgdl, chunk_docs=1024
    )
    out = W.bm25_topk_segments(
        segs, list(REF_TERMS), n, avgdl, k=10, mode="conjunctive"
    )
    return out.select("doc_id", F.round("score", 6).alias("score"))


REF_REGISTRY = {
    "ref_idx_term_stats": (q_ref_idx_term_stats, SQL_REF_IDX_TERM_STATS),
    "ref_idx_phrase": (q_ref_idx_phrase, SQL_REF_IDX_PHRASE),
    "ref_idx_cosine": (q_ref_idx_cosine, SQL_REF_IDX_COSINE),
    "ref_idx_wand": (q_ref_idx_wand, SQL_REF_IDX_BM25),
    "ref_idx_bm25": (q_ref_idx_bm25, SQL_REF_IDX_BM25),
    "ref_idx_ql": (q_ref_idx_ql, SQL_REF_IDX_QL),
    "ref_idx_comprehensive": (q_ref_idx_comprehensive, SQL_REF_IDX_COMPREHENSIVE),
}
