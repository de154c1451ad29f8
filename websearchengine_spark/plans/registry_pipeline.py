"""Registry extension: the END-TO-END pipeline gate.

Every stage of ``operators/pipeline.run_pipeline`` already has its own
oracle gate; this gate puts the COMPOSITION under the oracle — the
per-stage attrition report (stage, n) of the full
line-dedup -> PII -> exact-dedup -> cluster-dedup -> quality -> packing
chain, where each stage consumes the previous stage's REWRITTEN text.
A bug in stage wiring (running dedup on pre-redaction text, counting
the wrong generation, packing unfiltered docs) shifts a count and
hash-mismatches even when every stage passes its own gate.

Input construction (one deterministic expression, run verbatim on both
engines, same pattern as the other planted gates): every fixture doc
gains a corpus-wide boilerplate line (stripped by stage 1) and a
per-doc PII-bearing trailer line (redacted by stage 2); EXACT copies of
every ``doc_id % 13 == 0`` doc are planted at ``doc_id + 200000``
(removed by stage 3), and NEAR copies of every ``doc_id % 17 == 0``
doc — the same text plus a short token tail — at ``doc_id + 300000``
(removed by stage 4 for docs long enough that the tail keeps Jaccard
over the threshold).  Copies are built FROM the already-constructed
text (never re-deriving the doc_id-dependent trailer), so an exact copy
is exact by construction.

The oracle re-derives all six counts in one DuckDB statement whose
near-dup stage is the recursive-CTE closure (a different algorithm from
the engine's large-star/small-star iteration, per the dedup_clusters
gate convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from websearchengine_spark.operators import dedup, pii, pipeline
from websearchengine_spark.plans import registry as R
from websearchengine_spark.plans import registry_ext as RX

PIPE_MIN_DOCS = 5       # boilerplate line threshold
PIPE_T = 0.7            # near-dup Jaccard verify threshold
PIPE_MAX_REP = 0.5      # Gopher repetition cap
PIPE_MIN_TOKENS = 5     # minimum surviving doc length
PIPE_BUDGET = 512       # packing token budget
EXACT_OFF = 200000
NEAR_OFF = 300000
EXACT_MOD = 13
NEAR_MOD = 17
NEAR_TAIL = " zz near dup tail token zz"

# per-doc construction: boilerplate line + PII trailer (variants cover
# email / IP / phone / clean) — evaluated ONCE per base doc; copies take
# the computed text verbatim
PIPE_TEXT_EXPR = """text || chr(10) || 'please accept all cookies'
  || chr(10) || CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN 'contact user' || CAST(doc_id % 50 AS STRING)
           || '@mail.example.com now'
  WHEN 1 THEN 'served from 10.0.0.' || CAST(doc_id % 256 AS STRING)
           || ' tonight'
  WHEN 2 THEN 'call +1-555-' || CAST(1000 + doc_id % 9000 AS STRING)
           || ' today'
  ELSE 'ref ' || CAST(doc_id AS STRING)
END"""


def q_pipeline_report(spark, sf_dir):
    """(stage, n) attrition report of the composed pipeline over the
    planted corpus — runs operators/pipeline.run_pipeline end to end."""
    base0 = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({PIPE_TEXT_EXPR}) AS text"
    )
    aug = (
        base0.unionAll(
            base0.where(F.col("doc_id") % EXACT_MOD == 0).select(
                (F.col("doc_id") + F.lit(EXACT_OFF)).alias("doc_id"),
                "text",
            )
        ).unionAll(
            base0.where(F.col("doc_id") % NEAR_MOD == 0).select(
                (F.col("doc_id") + F.lit(NEAR_OFF)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text"),
            )
        )
    )
    report: dict = {}
    out = pipeline.run_pipeline(
        aug,
        boilerplate_min_docs=PIPE_MIN_DOCS,
        minhash_threshold=PIPE_T,
        max_bucket=RX.MAX_BUCKET,
        max_rep=PIPE_MAX_REP,
        min_tokens=PIPE_MIN_TOKENS,
        budget=PIPE_BUDGET,
        report=report,
    )
    out.unpersist()
    return spark.createDataFrame(
        [(k, int(report[k])) for k in pipeline.STAGES],
        "stage string, n long",
    )


_M61 = dedup.MERSENNE_61
_ROWS_PER_BAND = RX.N_MINHASH // RX.N_BANDS
_SEEDS = ",".join(str(s) for s in range(RX.N_MINHASH))
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

SQL_PIPELINE_REPORT = f"""WITH RECURSIVE base0 AS (
  SELECT doc_id, ({PIPE_TEXT_EXPR}) AS text FROM documents
),
base AS (
  SELECT doc_id, text FROM base0
  UNION ALL
  SELECT doc_id + {EXACT_OFF}, text FROM base0
  WHERE doc_id % {EXACT_MOD} = 0
  UNION ALL
  SELECT doc_id + {NEAR_OFF}, text || '{NEAR_TAIL}' FROM base0
  WHERE doc_id % {NEAR_MOD} = 0
),
-- stage 1: boilerplate line removal
l AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS ln
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base)
),
lf AS (SELECT doc_id, pos, ln, md5(ln) AS fp FROM l),
lfreq AS (
  SELECT fp FROM lf GROUP BY fp
  HAVING count(DISTINCT doc_id) >= {PIPE_MIN_DOCS}
),
lagg AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text_clean
  FROM lf WHERE fp NOT IN (SELECT fp FROM lfreq) GROUP BY 1
),
clean AS (
  SELECT b.doc_id, coalesce(a.text_clean, '') AS text
  FROM base b LEFT JOIN lagg a USING (doc_id)
),
-- stage 2: PII redaction (counts on the stage-1 text)
red AS (
  SELECT doc_id,
    (len(regexp_extract_all(text, '{pii.PII_EMAIL}'))
     + len(regexp_extract_all(text, '{pii.PII_IPV4}'))
     + len(regexp_extract_all(text, '{pii.PII_PHONE}')))::BIGINT AS n_pii,
    regexp_replace(regexp_replace(regexp_replace(text,
        '{pii.PII_EMAIL}', '<EMAIL>', 'g'),
        '{pii.PII_IPV4}', '<IP>', 'g'),
        '{pii.PII_PHONE}', '<PHONE>', 'g') AS text
  FROM clean
),
-- stage 3: exact dedup on the redacted text (normalized md5, keep min)
wf AS (SELECT doc_id, text, md5({_NORM}) AS fp FROM red),
keep1 AS (SELECT fp, min(doc_id) AS keep_id FROM wf GROUP BY fp),
d3 AS (
  SELECT w.doc_id, w.text FROM wf w
  JOIN keep1 k ON w.fp = k.fp AND w.doc_id = k.keep_id
),
-- stage 4: near-dup cluster dedup over d3 (MinHash-LSH -> Jaccard
-- verify -> recursive-CTE closure)
tok3 AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM (SELECT doc_id, {R._SQL_TOKS} AS toks FROM d3)
),
sh0 AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
           AS shingle
  FROM tok3 WHERE term <> ''
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shingles AS (SELECT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
hs AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle),1,14)) AS BIGINT) AS h
  FROM shingles
),
seeds AS (SELECT unnest([{_SEEDS}]) AS seed),
mh AS (
  SELECT doc_id, seed,
         min((h * (seed + 2) + (seed * 1000003 + 12289)) % {_M61}) AS minhash
  FROM hs, seeds GROUP BY doc_id, seed
),
band AS (
  SELECT doc_id, CAST(floor(seed / {_ROWS_PER_BAND}.0) AS INT) AS band_id,
         string_agg(minhash::VARCHAR, ',' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, 2
),
bh AS (
  SELECT doc_id, band_id,
         CAST(('0x' || substr(md5(band_key),1,15)) AS BIGINT) AS band_hash
  FROM band
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_id, band_hash) AS bn FROM bh
),
bkt AS (SELECT * FROM sized WHERE bn <= {RX.MAX_BUCKET}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bkt a JOIN bkt b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
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
dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {PIPE_T}),
edge AS (
  SELECT doc_a AS u, doc_b AS v FROM dup
  UNION
  SELECT doc_b AS u, doc_a AS v FROM dup
),
reach (node, lab) AS (
  SELECT doc_id, doc_id FROM d3
  UNION
  SELECT e.u, r.lab FROM edge e JOIN reach r ON r.node = e.v
),
comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
d4 AS (
  SELECT d3.doc_id, d3.text FROM d3
  JOIN comp ON comp.doc_id = d3.doc_id AND comp.cluster_id = d3.doc_id
),
-- stage 5: quality filters (trigram repetition + token count)
t4 AS (
  SELECT doc_id, list_filter({R._SQL_TOKS}, x -> x <> '') AS toks FROM d4
),
g3 AS (
  SELECT doc_id, unnest({RX._sql_ngram_list(3)}) AS g
  FROM t4 WHERE len(toks) >= 3
),
repagg AS (
  SELECT doc_id, count(*)::BIGINT AS n_ngrams,
         count(DISTINCT g)::BIGINT AS nd
  FROM g3 GROUP BY 1
),
q AS (
  SELECT t4.doc_id, len(toks)::BIGINT AS n_tokens,
         coalesce(round(1.0 - r.nd / r.n_ngrams::DOUBLE, 6), 0.0)
           AS rep_score
  FROM t4 LEFT JOIN repagg r USING (doc_id)
),
d5 AS (
  SELECT doc_id, n_tokens FROM q
  WHERE rep_score <= {PIPE_MAX_REP} AND n_tokens >= {PIPE_MIN_TOKENS}
),
-- stage 6: token-budget packing (exclusive prefix sum in doc_id order)
bins AS (
  SELECT doc_id,
         CAST(floor(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {PIPE_BUDGET}) AS BIGINT) AS bin_id
  FROM d5
)
SELECT 'docs_in' AS stage, (SELECT count(*) FROM base)::BIGINT AS n
UNION ALL
SELECT 'docs_with_pii', (SELECT count(*) FROM red WHERE n_pii > 0)::BIGINT
UNION ALL
SELECT 'after_exact_dedup', (SELECT count(*) FROM d3)::BIGINT
UNION ALL
SELECT 'after_near_dedup', (SELECT count(*) FROM d4)::BIGINT
UNION ALL
SELECT 'after_quality', (SELECT count(*) FROM d5)::BIGINT
UNION ALL
SELECT 'n_bins', (SELECT count(DISTINCT bin_id) FROM bins)::BIGINT"""


PIPELINE_REGISTRY = {
    "pipeline_report": (q_pipeline_report, SQL_PIPELINE_REPORT),
}
