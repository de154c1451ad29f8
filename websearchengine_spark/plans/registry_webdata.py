"""Registry extension: web-data pipeline gates — near-dup CLUSTERS
(connected components over verified MinHash pairs), chunk-level exact
dedup, and URL canonicalization.

Each Spark query calls the real engine modules (operators/dedup.py,
operators/corpus_stats.py, functions/urlnorm.py); each oracle is an
independent DuckDB formulation — the components oracle is a recursive
CTE computing min-reachable-id transitive closure, checking the
engine's alternating large-star/small-star iteration against a
different algorithm entirely.

The URL gate synthesizes deterministic messy URLs from doc_id (the
fixture tables carry no URL column); the SAME construction expression
string runs on both engines so inputs are identical by construction and
only the canonicalization under test differs in implementation.
"""

from __future__ import annotations

from websearchengine_spark.operators import corpus_stats, dedup
from websearchengine_spark.plans import registry as R
from websearchengine_spark.plans import registry_ext as RX

CLUSTER_T = 0.7   # exact-Jaccard verify threshold for cluster edges
CHUNK_W = 10      # tokens per exact-dedup chunk

# ---------------------------------------------------------------------------
# dedup_clusters
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark, sf_dir):
    """Full near-dup dedup decision: MinHash-LSH candidates -> exact
    3-gram Jaccard >= 0.7 -> connected components (large-star/small-star)
    -> (doc_id, cluster_id, cluster_size, is_kept) for every doc."""
    return dedup.dedup_clusters(
        RX._docs(spark, sf_dir), CLUSTER_T, RX.MAX_BUCKET
    )


# the verified-pair CTEs reuse the ngram_jaccard oracle fragments; the
# closure itself is a recursive CTE — min label reachable from each node
SQL_DEDUP_CLUSTERS = f"""WITH RECURSIVE {RX._SQL_BANDS_CTE},
shset AS (SELECT DISTINCT doc_id, shingle FROM shingles),
szs AS (SELECT doc_id, count(*) AS n FROM shset GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shset sa ON sa.doc_id = c.doc_a
  JOIN shset sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         round(coalesce(inter.n_inter, 0)
               / (na.n + nb.n - coalesce(inter.n_inter, 0))::DOUBLE, 6)
           AS jaccard
  FROM cand c
  LEFT JOIN inter ON inter.doc_a = c.doc_a AND inter.doc_b = c.doc_b
  JOIN szs na ON na.doc_id = c.doc_a
  JOIN szs nb ON nb.doc_id = c.doc_b
),
dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {CLUSTER_T}),
edge AS (
  SELECT doc_a AS u, doc_b AS v FROM dup
  UNION
  SELECT doc_b AS u, doc_a AS v FROM dup
),
reach (node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, r.lab FROM edge e JOIN reach r ON r.node = e.v
),
comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
sizes AS (
  SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM comp GROUP BY 1
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       (c.doc_id = c.cluster_id) AS is_kept
FROM comp c JOIN sizes s USING (cluster_id)"""


# ---------------------------------------------------------------------------
# chunk_dedup
# ---------------------------------------------------------------------------


def q_chunk_dedup(spark, sf_dir):
    """Chunk-level exact dedup stats: non-overlapping 10-token chunks,
    a chunk occurrence is duplicated when its text appears in >= 2
    distinct docs."""
    return corpus_stats.chunk_dedup(RX._docs(spark, sf_dir), CHUNK_W)


SQL_CHUNK_DEDUP = f"""WITH {R._SQL_TOK_CTE},
ftok AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS fpos
  FROM tok WHERE term <> ''
),
chunk AS (
  SELECT doc_id, CAST(floor(fpos / {CHUNK_W}) AS INT) AS cid,
         string_agg(term, ' ' ORDER BY fpos) AS chunk
  FROM ftok GROUP BY doc_id, 2
),
fp AS (SELECT doc_id, md5(chunk) AS fp FROM chunk),
cnt AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM fp GROUP BY fp),
per AS (
  SELECT f.doc_id, count(*)::BIGINT AS n_chunks,
         sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
  FROM fp f JOIN cnt c USING (fp) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_chunks, 0) AS n_chunks,
       coalesce(p.n_dup_chunks, 0) AS n_dup_chunks,
       CASE WHEN coalesce(p.n_chunks, 0) > 0
            THEN round(coalesce(p.n_dup_chunks, 0) / p.n_chunks::DOUBLE, 6)
            ELSE 0.0 END AS dup_chunk_frac
FROM documents d LEFT JOIN per p USING (doc_id)"""


# ---------------------------------------------------------------------------
# url_canonical
# ---------------------------------------------------------------------------

# deterministic messy-URL synthesis from doc_id — runs VERBATIM on both
# engines (Spark selectExpr and DuckDB), so the inputs are identical and
# only the canonicalization differs in implementation.  Variants cover:
# case-folding, default port (80/443), non-default port kept, fragment,
# tracking params, unsorted params, duplicate + trailing slashes.
URL_EXPR = """CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/cat/' || (doc_id % 40)
           || '/?utm_source=feed&b=2&a=1#frag'
  WHEN 1 THEN 'http://www.example.com/cat/' || (doc_id % 40) || '?a=1&b=2'
  WHEN 2 THEN 'https://Example.COM:443//cat//' || (doc_id % 40) || '/'
  WHEN 3 THEN 'https://example.com/cat/' || (doc_id % 40)
  ELSE 'http://example.com:8080/cat/' || (doc_id % 40)
           || '/?z=9&utm_campaign=x'
END"""


def q_url_canonical(spark, sf_dir):
    """URL canonicalization + canonical-key dup groups over synthesized
    messy URLs (functions/urlnorm.canonical_url, zero-UDF codegen)."""
    pages = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({URL_EXPR}) AS url"
    )
    return corpus_stats.url_dedup(pages)


SQL_URL_CANONICAL = f"""WITH pages AS (
  SELECT doc_id, ({URL_EXPR}) AS url FROM documents
),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM pages),
parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)', 1))
      AS hostport,
    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)', 1)
      AS rawpath,
    regexp_extract(u, '\\?(.*)$', 1) AS rawq
  FROM s1
),
p2 AS (
  SELECT *,
    regexp_replace(hostport, ':[0-9]+$', '') AS host,
    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
    regexp_replace(rawpath, '//+', '/', 'g') AS cpath0
  FROM parts
),
p3 AS (
  SELECT *,
    CASE WHEN cpath0 = '' THEN '/'
         WHEN length(cpath0) > 1 THEN regexp_replace(cpath0, '/$', '')
         ELSE cpath0 END AS cpath,
    CASE WHEN port <> ''
              AND NOT ((scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443'))
         THEN ':' || port ELSE '' END AS cport,
    array_to_string(list_sort(list_filter(string_split(rawq, '&'),
        x -> x <> '' AND NOT starts_with(x, 'utm_')
             AND NOT starts_with(x, 'fbclid=')
             AND NOT starts_with(x, 'gclid='))), '&') AS cq
  FROM p2
),
canon AS (
  SELECT doc_id, url,
    scheme || '://' || host || cport || cpath ||
    CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS canonical_url
  FROM p3
),
sizes AS (
  SELECT canonical_url, count(*)::BIGINT AS n_same_canon,
         min(doc_id) AS cd
  FROM canon GROUP BY 1
)
SELECT c.doc_id, c.url, c.canonical_url, s.n_same_canon,
       (c.doc_id = s.cd) AS is_kept
FROM canon c JOIN sizes s USING (canonical_url)"""


WEBDATA_REGISTRY = {
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "chunk_dedup": (q_chunk_dedup, SQL_CHUNK_DEDUP),
    "url_canonical": (q_url_canonical, SQL_URL_CANONICAL),
}
