"""Driver gate for the ads auction (SURVEY §2.5 R9/R10) — DuckDB oracle.

The reference's ads ranking (AdsRanker.java:460-467: per-keyword quality
score ``QS = 0.3·(QL + title_cosine) + 0.7·CTR``, per-ad mean QS times
the summed bid prices, with the preserved title-cosine parenthesization
bug at AdsRanker.java:412-450) runs over the SHIPPED 27-row
``advertisement.tsv``.  Both engines rebuild the whole pipeline
independently from that file:

- tables: gate tokenization (lower + non-alnum split — SQL-expressible;
  the reference-exact stemmed path is pytest-gated in tests/test_ads.py);
- bids: derived deterministically from the ads themselves — one bid per
  ad on its first title token priced at ``length(title)``, plus one bid
  on 'science' for every other ad priced at ``length(body) % 40 + 5``
  (exercises multi-keyword ads: mean-QS over keywords, summed prices);
- recorded CTR: ads with ``length(body) % 3 == 0`` carry a CTR of
  ``(length(body) % 10 + 1) / 20`` under their first-title-token
  keyword, so the effective-CTR lookup exercises all three branches —
  recorded, company-mean fallback, and the 0.1 prior
  (QueryHandler.java:236-257 order);
- query: ``cheap science advertising`` (every token has ctf > 0 in the
  ads corpus, so the QL path is non-degenerate).

The Spark side runs the REAL operator (operators/ads.rank_ads) over
these inputs; the SQL below recomputes every stage from scratch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from websearchengine_spark.operators import ads

ADS_QUERY = ["cheap", "science", "advertising"]
_Q_SQL = ",".join(f"'{t}'" for t in ADS_QUERY)


def _gate_bids_ctr(ads_df):
    """(bids, ctr) derived from the gate ads table with the exact
    expressions mirrored in SQL_ADS_RANK (see module docstring)."""
    kw1 = F.element_at(
        F.split(
            F.trim(F.regexp_replace(F.lower("title"), "[^a-z0-9]+", " ")),
            " ",
        ),
        1,
    )
    base = ads_df.select(
        "ad_key", "company", "ad_id",
        kw1.alias("kw1"),
        F.length("title").alias("tlen"),
        F.length("body").alias("blen"),
    )
    bid_a = base.select(
        F.col("kw1").alias("keyword"), "company", "ad_id",
        F.col("tlen").cast("double").alias("price"),
    )
    bid_b = base.where(F.col("kw1") != "science").select(
        F.lit("science").alias("keyword"), "company", "ad_id",
        (F.col("blen") % 40 + 5).cast("double").alias("price"),
    )
    bids = bid_a.unionByName(bid_b)
    ctr = base.where(F.col("blen") % 3 == 0).select(
        F.col("kw1").alias("keyword"),
        "ad_key",
        ((F.col("blen") % 10 + 1) / F.lit(20.0)).alias("ctr"),
    )
    return bids, ctr


def q_ads_rank(spark, sf_dir):
    """R9/R10 — the full auction blend over the shipped ads corpus; k
    covers every ad so the gate hashes ALL scores, not just the top 3
    (the top-3 cut is covered by tests/test_ads.py rank parity)."""
    ads_df, postings, title_tf = ads.ads_tables_gate(spark)
    bids, ctr = _gate_bids_ctr(ads_df)
    out = ads.rank_ads(
        ads_df, postings, title_tf, bids, ctr,
        query=" ".join(ADS_QUERY), k=100, tokens=list(ADS_QUERY),
    )
    return out.select("ad_key", F.round("score", 6).alias("score"))


SQL_ADS_RANK = f"""WITH raw AS (
  SELECT * FROM read_csv('{ads.ADS_TSV}', delim='\t', header=false,
                         quote='', names=['ad_key','title','body'])
),
tt AS (
  SELECT ad_key,
         regexp_replace(ad_key, '_[^_]*$', '') AS company,
         title, body,
         string_split(trim(regexp_replace(lower(title),'[^a-z0-9]+',' ','g')),' ') AS ttoks,
         string_split(trim(regexp_replace(lower(title||' '||body),'[^a-z0-9]+',' ','g')),' ') AS dtoks
  FROM raw
),
a AS (
  SELECT ad_key, company, len(dtoks)::INT AS doc_len, ttoks[1] AS kw1,
         length(title) AS tlen, length(body) AS blen
  FROM tt
),
p AS (
  SELECT term, ad_key, count(*)::INT AS tf
  FROM (SELECT ad_key, unnest(dtoks) AS term FROM tt) GROUP BY 1, 2
),
ttf AS (
  SELECT term, ad_key, count(*)::INT AS tf
  FROM (SELECT ad_key, unnest(ttoks) AS term FROM tt) GROUP BY 1, 2
),
q AS (SELECT unnest([{_Q_SQL}]) AS term),
c AS (SELECT sum(tf)::DOUBLE AS c FROM p),
ctf AS (SELECT q.term, sum(p.tf)::DOUBLE AS ctf FROM q JOIN p USING (term) GROUP BY 1),
ql AS (
  SELECT a.ad_key,
         exp(sum(ln(0.5 * coalesce(p.tf, 0) / a.doc_len + 0.5 * ctf.ctf / c.c))) AS ql
  FROM a CROSS JOIN ctf
  LEFT JOIN p ON p.term = ctf.term AND p.ad_key = a.ad_key, c
  GROUP BY a.ad_key
),
tnorm AS (SELECT ad_key, sum(tf * tf)::DOUBLE AS tm FROM ttf GROUP BY 1),
dot AS (
  SELECT ad_key, sum(tf)::DOUBLE AS dot FROM ttf
  WHERE term IN ({_Q_SQL}) GROUP BY 1
),
tcos AS (
  SELECT t.ad_key, d.dot / sqrt({float(len(ADS_QUERY))!r}) * sqrt(t.tm) AS tcos
  FROM dot d JOIN tnorm t USING (ad_key)
),
rel AS (
  SELECT a.ad_key, ql.ql + coalesce(tcos.tcos, 0.0) AS relevance
  FROM a JOIN ql USING (ad_key) LEFT JOIN tcos USING (ad_key)
),
bids AS (
  SELECT kw1 AS keyword, ad_key, company, tlen::DOUBLE AS price FROM a
  UNION ALL
  SELECT 'science', ad_key, company, (blen % 40 + 5)::DOUBLE FROM a
  WHERE kw1 <> 'science'
),
qbids AS (SELECT * FROM bids WHERE keyword IN ({_Q_SQL})),
ctr AS (
  SELECT kw1 AS keyword, ad_key, ((blen % 10) + 1) / 20.0 AS ctr
  FROM a WHERE blen % 3 = 0
),
cmean AS (
  SELECT a.company, avg(ctr.ctr) AS mean_ctr
  FROM ctr JOIN a USING (ad_key) GROUP BY 1
),
eff AS (
  SELECT b.keyword, b.ad_key,
         coalesce(ctr.ctr, cmean.mean_ctr, 0.1) AS ctr_eff
  FROM qbids b
  LEFT JOIN ctr ON ctr.keyword = b.keyword AND ctr.ad_key = b.ad_key
  LEFT JOIN cmean ON cmean.company = b.company
),
perkw AS (
  SELECT e.keyword, e.ad_key, 0.3 * rel.relevance + 0.7 * e.ctr_eff AS qs
  FROM eff e JOIN rel USING (ad_key)
),
agg AS (
  SELECT pk.ad_key, avg(pk.qs) * sum(b.price) AS score
  FROM perkw pk
  JOIN qbids b ON b.keyword = pk.keyword AND b.ad_key = pk.ad_key
  GROUP BY 1
)
SELECT ad_key, round(score, 6) AS score FROM agg WHERE score > 0"""


ADS_REGISTRY = {
    "ads_rank": (q_ads_rank, SQL_ADS_RANK),
}
