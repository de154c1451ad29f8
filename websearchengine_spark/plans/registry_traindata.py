"""Registry extension: round-4 training-data pipeline gates —
semantic (embedding-level) dedup, PII redaction, bigram-LM perplexity
scoring, and the WARC round-trip.

Conventions follow the existing gate modules: each Spark query calls the
real engine operators; each oracle is an independent DuckDB formulation.
Where an input column the semantics need does not exist in the fixture
tables (near-duplicate embeddings, PII strings, web-archive files), the
gate synthesizes it with ONE deterministic expression string that runs
verbatim on both engines (the ``URL_EXPR`` pattern from
registry_webdata), so inputs are identical by construction and only the
operator under test differs in implementation.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from websearchengine_spark.operators import corpus_stats, pii, similarity
from websearchengine_spark.plans import registry_ext as RX
from websearchengine_spark.sources import warc

# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup-style k-means + within-cluster cosine
# ---------------------------------------------------------------------------
# The fixture embeddings carry no near-duplicates (max pairwise cosine
# ~0.51), so the gate plants them: exact copies of every vec_id % 7 == 0
# vector at vec_id + 10000 — same construction on both engines.  The
# copies MUST come out is_kept=false with max_sim_lower=1.0 and their
# originals is_kept=true; every other vector is untouched by the dup
# rule, so the gate exercises assignment, cluster sizes, the lower-id
# keep rule, and the no-dup path in one result.

SEM_COPY_MOD = 7
SEM_COPY_OFF = 10000


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup over the fixture embeddings + planted exact-copy twins.

    Centroids are trained on the ORIGINAL corpus (deterministic
    ivf_train, seed 42) and passed in, so the oracle can embed the
    sequential numpy twin's bit-identical matrix as SQL literals."""
    emb = RX._emb(spark, sf_dir).select("vec_id", "embedding")
    aug = emb.unionAll(
        emb.where(F.col("vec_id") % SEM_COPY_MOD == 0).select(
            (F.col("vec_id") + F.lit(SEM_COPY_OFF)).alias("vec_id"),
            "embedding",
        )
    )
    cent = similarity.ivf_train(emb)
    return similarity.semantic_dedup(aug, centroids=cent)


def _sql_semantic_dedup() -> str | None:
    """Generate the gate SQL at oracle-collection time: train the
    sequential twin (oracle/ivf.py) over the gate corpus and embed the
    centroid matrix as literal lists — the exact pattern of
    ``_sql_ann_ivf_topk``.  Returns None (rows-only fallback) if the
    corpus is unreadable here."""
    from websearchengine_spark.oracle import ivf as oracle_ivf

    path = os.path.join(
        os.environ.get("WSE_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
        "embeddings.parquet",
    )
    try:
        cent, _ = oracle_ivf.train_from_parquet(
            path,
            similarity.IVF_CENTROIDS,
            similarity.IVF_ITERS,
            similarity.HLSH_SEED,
        )
    except Exception:
        return None
    sims = ",\n           ".join(
        "list_dot_product(emb, ["
        + ",".join(repr(float(v)) for v in row)
        + "]::DOUBLE[]) / nrm"
        for row in cent
    )
    return f"""WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + {SEM_COPY_OFF}, embedding::DOUBLE[]
  FROM embeddings WHERE vec_id % {SEM_COPY_MOD} = 0
),
e AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM base
),
a AS (
  SELECT vec_id, emb, nrm,
         list_position(sims, list_max(sims)) - 1 AS cluster
  FROM (SELECT vec_id, emb, nrm, list_value(
           {sims}) AS sims FROM e)
),
sz AS (SELECT cluster, count(*)::BIGINT AS n_cluster FROM a GROUP BY 1),
pair AS (
  SELECT y.vec_id AS vec_id,
         round(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm), 6) AS s
  FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
),
dup AS (
  SELECT vec_id, max(s) AS max_sim_lower FROM pair
  WHERE s >= {similarity.SEMDEDUP_T} GROUP BY 1
)
SELECT a.vec_id, a.cluster, sz.n_cluster,
       coalesce(d.max_sim_lower, 0.0) AS max_sim_lower,
       (d.vec_id IS NULL) AS is_kept,
       (sz.n_cluster <= {similarity.SEMDEDUP_MAX_CLUSTER}) AS paired
FROM a JOIN sz USING (cluster) LEFT JOIN dup d USING (vec_id)"""


# ---------------------------------------------------------------------------
# pii_redact — email / IPv4 / phone scrub
# ---------------------------------------------------------------------------
# The fixture text carries no PII, so the gate plants it: a deterministic
# per-doc suffix (emails, dotted quads, an international phone number, or
# nothing at all for the no-op branch) appended by ONE expression string
# run verbatim on both engines.  Redaction itself — pattern matching,
# placeholder substitution, per-class counts — is implemented
# independently per engine (Spark regexp_* vs DuckDB regexp_* on RE2).

PII_TEXT_EXPR = """CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN text || ' contact user' || CAST(doc_id % 50 AS STRING)
           || '@mail' || CAST(doc_id % 3 AS STRING)
           || '.example.com for details'
  WHEN 1 THEN text || ' served from ' || CAST(doc_id % 223 + 1 AS STRING)
           || '.' || CAST(doc_id % 250 AS STRING) || '.0.'
           || CAST(doc_id % 100 AS STRING) || ' and 10.0.0.'
           || CAST(doc_id % 256 AS STRING) || ' tonight'
  WHEN 2 THEN text || ' call +1-555-' || CAST(1000 + doc_id % 9000 AS STRING)
           || ' or mail ops@example.org.'
  ELSE text
END"""


def q_pii_redact(spark, sf_dir):
    """PII scrub over fixture text + planted per-doc PII suffixes."""
    docs = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({PII_TEXT_EXPR}) AS text"
    )
    return pii.pii_redact(docs)


SQL_PII_REDACT = f"""WITH docs2 AS (
  SELECT doc_id, ({PII_TEXT_EXPR}) AS text FROM documents
),
c AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '{pii.PII_EMAIL}'))::BIGINT AS n_email,
    len(regexp_extract_all(text, '{pii.PII_IPV4}'))::BIGINT AS n_ip,
    len(regexp_extract_all(text, '{pii.PII_PHONE}'))::BIGINT AS n_phone
  FROM docs2
)
SELECT doc_id, n_email, n_ip, n_phone,
       (n_email + n_ip + n_phone) AS n_pii,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{pii.PII_EMAIL}', '<EMAIL>', 'g'),
           '{pii.PII_IPV4}', '<IP>', 'g'),
           '{pii.PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM c"""


# ---------------------------------------------------------------------------
# lm_perplexity — add-one bigram LM self-perplexity (CCNet-style filter)
# ---------------------------------------------------------------------------


def q_lm_perplexity(spark, sf_dir):
    """Per-doc perplexity under the corpus's own add-one bigram LM."""
    return corpus_stats.bigram_lm_scores(RX._docs(spark, sf_dir))


SQL_LM_PERPLEXITY = f"""WITH {RX._SQL_TOKS_CTE_DOCS},
g AS (
  SELECT doc_id, unnest({RX._sql_ngram_list(2)}) AS bg
  FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT bg, count(*)::BIGINT AS c_bg FROM g GROUP BY bg),
ctx AS (
  SELECT string_split(bg, ' ')[1] AS u, sum(c_bg)::BIGINT AS c_u
  FROM bgc GROUP BY 1
),
voc AS (
  SELECT count(DISTINCT tk)::BIGINT AS v
  FROM (SELECT unnest(toks) AS tk FROM t)
),
pr AS (
  SELECT bg, ln((c_bg + 1.0) / (c_u + 1.0 * v)) AS logp
  FROM bgc JOIN ctx ON string_split(bg, ' ')[1] = u CROSS JOIN voc
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(logp) AS s
  FROM g JOIN pr USING (bg) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       CASE WHEN p.doc_id IS NULL THEN 0.0
            ELSE round(p.s / p.n_bigrams, 6) END AS avg_logprob,
       CASE WHEN p.doc_id IS NULL THEN 0.0
            ELSE round(exp(-p.s / p.n_bigrams), 4) END AS ppl
FROM documents d LEFT JOIN per p USING (doc_id)"""


# ---------------------------------------------------------------------------
# warc_roundtrip — Common-Crawl-layout WARC sink + distributed source
# ---------------------------------------------------------------------------
# The only gate whose subject is a FILE FORMAT: the Spark side writes the
# fixture docs as per-record-gzip WARC response records and reads them
# back through the distributed parser; the oracle is simply the identity
# projection over `documents` — any framing, encoding, or HTTP-envelope
# bug shows up as a hash mismatch against text that never left DuckDB.

WARC_URL_EXPR = "'https://example.com/doc/' || CAST(doc_id AS STRING)"


def q_warc_roundtrip(spark, sf_dir):
    """documents -> WARC files (response records, per-record gzip) ->
    distributed parse -> (doc_id, url, text, n_payload_bytes,
    http_status)."""
    import hashlib
    import shutil

    d = (
        "/tmp/wse_warc_gate_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    shutil.rmtree(d, ignore_errors=True)
    docs = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({WARC_URL_EXPR}) AS url", "text"
    )
    # 4-way hash repartition: the sink writes one file per partition, so
    # the read side exercises the multi-file scan (and the small-file
    # single-partition parquet scan doesn't serialize 5k gzip calls)
    warc.write_warc(docs.repartition(4, "doc_id"), d).collect()
    rec = warc.read_warc(spark, d)
    return rec.select(
        F.regexp_extract("record_id", "urn:wse:doc:([0-9]+)", 1)
        .cast("long")
        .alias("doc_id"),
        "url",
        F.col("payload_text").alias("text"),
        "n_payload_bytes",
        "http_status",
    )


SQL_WARC_ROUNDTRIP = f"""SELECT doc_id,
       ({WARC_URL_EXPR}) AS url,
       text,
       octet_length(encode(text))::BIGINT AS n_payload_bytes,
       CAST(200 AS INT) AS http_status
FROM documents"""


# ---------------------------------------------------------------------------
# line_dedup — CCNet-style line-level boilerplate removal
# ---------------------------------------------------------------------------
# Planted structure via one shared expression: every doc gains a global
# boilerplate line ("please accept all cookies", df = corpus), a third
# gain a second one, and every doc keeps a unique trailer — so the gate
# covers drop-everywhere, drop-subset, keep-unique, and ordered
# reassembly in one result.  chr(10) is the newline on both engines
# (a literal '\n' escape is dialect-dependent).

LINE_MIN_DOCS = 5
LINE_TEXT_EXPR = """text || chr(10) || 'please accept all cookies'
  || chr(10)
  || CASE WHEN doc_id % 3 = 0
          THEN 'subscribe to our newsletter' || chr(10) ELSE '' END
  || 'ref ' || CAST(doc_id AS STRING)"""


def q_line_dedup(spark, sf_dir):
    """Boilerplate-line strip over fixture text + planted line layers."""
    docs = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({LINE_TEXT_EXPR}) AS text"
    )
    return corpus_stats.line_dedup(docs, LINE_MIN_DOCS)


SQL_LINE_DEDUP = f"""WITH src AS (
  SELECT doc_id, ({LINE_TEXT_EXPR}) AS text FROM documents
),
l AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS ln
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM src)
),
lf AS (SELECT doc_id, pos, ln, md5(ln) AS fp FROM l),
freq AS (
  SELECT fp FROM lf GROUP BY fp
  HAVING count(DISTINCT doc_id) >= {LINE_MIN_DOCS}
),
kept AS (
  SELECT doc_id, pos, ln FROM lf
  WHERE fp NOT IN (SELECT fp FROM freq)
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lf GROUP BY 1),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(ln, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY 1
)
SELECT t.doc_id, t.n_lines,
       (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_dropped,
       coalesce(a.text_clean, '') AS text_clean
FROM tot t LEFT JOIN agg a USING (doc_id)"""


# ---------------------------------------------------------------------------
# domain_cap — per-host contribution cap
# ---------------------------------------------------------------------------
# Reuses the url_canonical gate's messy-URL synthesis (registry_webdata
# URL_EXPR): its five variants collapse to two hosts with a 40/60 doc
# split, so a cap of 50 exercises kept, capped-out, and rank/count
# columns on both hosts.

DOMAIN_CAP = 50


def q_domain_cap(spark, sf_dir):
    from websearchengine_spark.plans import registry_webdata as RW

    pages = RX._docs(spark, sf_dir).selectExpr(
        "doc_id", f"({RW.URL_EXPR}) AS url"
    )
    return corpus_stats.domain_cap(pages, DOMAIN_CAP)


def _sql_domain_cap() -> str:
    from websearchengine_spark.plans import registry_webdata as RW

    return f"""WITH pages AS (
  SELECT doc_id, ({RW.URL_EXPR}) AS url FROM documents
),
h AS (
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
             ':[0-9]+$', '') AS host
  FROM pages
),
r AS (
  SELECT doc_id, url, host,
         (row_number() OVER (PARTITION BY host ORDER BY doc_id))::BIGINT
           AS host_rank,
         (count(*) OVER (PARTITION BY host))::BIGINT AS host_docs
  FROM h
)
SELECT doc_id, url, host, host_docs, host_rank,
       (host_rank <= {DOMAIN_CAP}) AS is_kept
FROM r"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters — count-min sketch point estimates vs exact counts
# ---------------------------------------------------------------------------
# The sketch path for heavy-hitter stats whose exact key space explodes
# at corpus scale.  Gate: build the depth x width sketch over the token
# stream, estimate the TRUE top-20 terms (exact top-k is the shared
# candidate rule, ngram_counts tie convention), and emit
# (term, exact_cnt, est, overcount) — the CMS guarantee est >= exact is
# hash-checked via overcount, and every md5-salted bucket index must
# agree across engines.

CMS_TOPK = 20


def q_cms_heavy_hitters(spark, sf_dir):
    docs = RX._docs(spark, sf_dir)
    toks = docs.select(
        F.explode(corpus_stats._toks_clean()).alias("term")
    )
    cand = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(CMS_TOPK)
    )
    sk = corpus_stats.cms_build(docs)
    est = corpus_stats.cms_estimate(sk, cand.select("term"))
    return cand.join(est, "term").select(
        "term",
        "exact_cnt",
        "est",
        (F.col("est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


def _sql_cms_heavy_hitters() -> str:
    w, dep = corpus_stats.CMS_WIDTH, corpus_stats.CMS_DEPTH

    def bucket(expr: str, d: int) -> str:
        return (
            f"CAST(('0x' || substr(md5({expr} || '|{d}'), 1, 15)) AS BIGINT)"
            f" % {w}"
        )

    probe_rows = "\n  UNION ALL\n".join(
        f"  SELECT {d} AS row, {bucket('term', d)} AS bucket FROM tok"
        for d in range(dep)
    )
    est_rows = "\n  UNION ALL\n".join(
        f"  SELECT term, {d} AS row, {bucket('term', d)} AS bucket FROM cand"
        for d in range(dep)
    )
    return f"""WITH {RX._SQL_TOKS_CTE_DOCS},
tok AS (SELECT unnest(toks) AS term FROM t),
exact AS (SELECT term, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY term),
cand AS (
  SELECT term, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, term ASC LIMIT {CMS_TOPK}
),
probe AS (
{probe_rows}
),
sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt FROM probe GROUP BY 1, 2),
ep AS (
{est_rows}
),
est AS (
  SELECT ep.term, min(coalesce(sk.cnt, 0))::BIGINT AS est
  FROM ep LEFT JOIN sk USING (row, bucket) GROUP BY ep.term
)
SELECT c.term, c.exact_cnt, e.est,
       (e.est - c.exact_cnt)::BIGINT AS overcount
FROM cand c JOIN est e USING (term)"""


# ---------------------------------------------------------------------------
# hll_distinct — HyperLogLog distinct-token estimate vs exact
# ---------------------------------------------------------------------------


def q_hll_distinct(spark, sf_dir):
    toks = RX._docs(spark, sf_dir).select(
        F.explode(corpus_stats._toks_clean()).alias("term")
    )
    est = corpus_stats.hll_distinct(toks)
    exact = toks.agg(
        F.count_distinct("term").cast("long").alias("n_exact")
    )
    return exact.crossJoin(est)


def _sql_hll_distinct() -> str:
    p = corpus_stats.HLL_P
    m = 1 << p
    window = 60 - p
    alpha = corpus_stats.hll_alpha(m)
    return f"""WITH {RX._SQL_TOKS_CTE_DOCS},
tok AS (SELECT unnest(toks) AS term FROM t),
hh AS (
  SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tok
),
r AS (
  SELECT h & {m - 1} AS b,
         CASE WHEN (h >> {p}) = 0 THEN {window + 1}
              ELSE {window} - length(bin(h >> {p})) + 1 END AS rho
  FROM hh
),
regs AS (SELECT b, max(rho) AS mx FROM r GROUP BY b),
agg AS (
  SELECT sum(power(2.0, -mx)) AS s, count(*)::BIGINT AS nz FROM regs
),
e0 AS (
  SELECT {alpha!r}::DOUBLE * {m} * {m} / (s + ({m} - nz)) AS e,
         ({m} - nz) AS v
  FROM agg
)
SELECT (SELECT count(DISTINCT term) FROM tok)::BIGINT AS n_exact,
       round(CASE WHEN e <= 2.5 * {m} AND v > 0
                  THEN {m} * ln({m}::DOUBLE / v) ELSE e END, 4) AS n_est
FROM e0"""


# ---------------------------------------------------------------------------
# bloom_seen_filter — bloom-filter incremental-crawl seen-set
# ---------------------------------------------------------------------------
# The third bounded-exchange sketch (after CMS and HLL): a recrawl batch
# is filtered against the HISTORICAL corpus without ever shuffling the
# history — the filter is m/64 packed-long rows, broadcast to the probe.
# Gate construction: history = every doc_id % 3 == 0 doc; the new batch
# is everything else PLUS exact copies of every history doc planted at
# doc_id + 500000.  Every planted copy must come back maybe_seen=true
# (the no-false-negative guarantee), and any false positives among the
# genuinely-new docs are deterministic (seeded md5 double hashing), so
# the oracle — which re-derives the SET-BIT POSITIONS relationally
# rather than packing words — hash-matches row for row.

BLOOM_COPY_OFF = 500000


def q_bloom_seen_filter(spark, sf_dir):
    """history bloom -> probe (new batch + planted copies) ->
    (doc_id, maybe_seen, is_kept)."""
    docs = RX._docs(spark, sf_dir).select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0).unionAll(
        hist.select(
            (F.col("doc_id") + F.lit(BLOOM_COPY_OFF)).alias("doc_id"),
            "text",
        )
    )
    return corpus_stats.bloom_seen_filter(new, hist)


def _sql_bloom_seen_filter() -> str:
    m, k = corpus_stats.BLOOM_M, corpus_stats.BLOOM_K
    h1 = f"CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) % {m}"
    h2 = (
        f"(CAST(('0x' || substr(md5(key || '|b'), 1, 15)) AS BIGINT)"
        f" % {m}) | 1"
    )
    return f"""WITH hist AS (
  SELECT text AS key FROM documents WHERE doc_id % 3 = 0
),
newb AS (
  SELECT doc_id, text AS key FROM documents WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + {BLOOM_COPY_OFF}, text FROM documents
  WHERE doc_id % 3 = 0
),
seeds AS (SELECT unnest(range({k})) AS i),
hh AS (SELECT {h1} AS h1, {h2} AS h2 FROM hist),
hpos AS (SELECT DISTINCT (h1 + i * h2) % {m} AS pos FROM hh, seeds),
nh AS (SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM newb),
npos AS (SELECT doc_id, (h1 + i * h2) % {m} AS pos FROM nh, seeds),
flag AS (
  SELECT doc_id, bool_and(pos IN (SELECT pos FROM hpos)) AS maybe_seen
  FROM npos GROUP BY doc_id
)
SELECT doc_id, maybe_seen, NOT maybe_seen AS is_kept FROM flag"""


# SQL entries may be zero-arg generator callables (resolved lazily by
# registry.oracle_sql, exactly like ann_ivf_topk's).
TRAINDATA_REGISTRY = {
    "semantic_dedup": (q_semantic_dedup, _sql_semantic_dedup),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "domain_cap": (q_domain_cap, _sql_domain_cap),
    "cms_heavy_hitters": (q_cms_heavy_hitters, _sql_cms_heavy_hitters),
    "hll_distinct": (q_hll_distinct, _sql_hll_distinct),
    "bloom_seen_filter": (q_bloom_seen_filter, _sql_bloom_seen_filter),
}
