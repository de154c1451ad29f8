"""Registry extension: dedup / similarity / mining / text-analysis gate
queries, each paired with DuckDB oracle SQL (same conventions as
plans/registry.py — md5-derived 60-bit hashes for cross-engine identity,
floats rounded on both sides, deterministic (score DESC, id ASC) top-k).

Spark sides call the real engine modules (operators/dedup.py,
operators/similarity.py, operators/mining.py) so the driver gate exercises
engine code, not inline reimplementations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from websearchengine_spark.operators import corpus_stats, dedup, mining, similarity
from websearchengine_spark.plans import registry as R

N_MINHASH = dedup.N_MINHASH
N_BANDS = dedup.N_BANDS
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_K = dedup.SHINGLE_K
MAX_BUCKET = 64
SIMHASH_BITS = 16
ANN_K = 20
NEAR_DUP_T = 0.35
PR_FANOUT = 3

_H = "CAST(('0x' || substr(md5({x}),1,15)) AS BIGINT)"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# shared SQL CTE fragments
# --------------------------------------------------------------------------

# shingles via lead() — identical set to the engine's array-transform path
_SQL_SHINGLE_CTE = (
    R._SQL_TOK_CTE
    + f""",
sh0 AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
           AS shingle
  FROM tok WHERE term <> ''
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shingles AS (SELECT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL)"""
)

_seeds = ",".join(str(s) for s in range(N_MINHASH))
_M61 = dedup.MERSENNE_61
# one md5 per shingle (56-bit base), seeds derived arithmetically —
# mirrors dedup._derive exactly
_SQL_MINHASH_CTE = (
    _SQL_SHINGLE_CTE
    + f""",
hs AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle),1,14)) AS BIGINT) AS h
  FROM shingles
),
seeds AS (SELECT unnest([{_seeds}]) AS seed),
mh AS (
  SELECT doc_id, seed,
         min((h * (seed + 2) + (seed * 1000003 + 12289)) % {_M61}) AS minhash
  FROM hs, seeds GROUP BY doc_id, seed
)"""
)

_SQL_BANDS_CTE = (
    _SQL_MINHASH_CTE
    + f""",
band AS (
  SELECT doc_id, CAST(floor(seed / {ROWS_PER_BAND}.0) AS INT) AS band_id,
         string_agg(minhash::VARCHAR, ',' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, 2
),
bh AS (
  SELECT doc_id, band_id, {_H.format(x="band_key")} AS band_hash FROM band
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_id, band_hash) AS bn FROM bh
),
bkt AS (SELECT * FROM sized WHERE bn <= {MAX_BUCKET}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*)::BIGINT AS n_shared_bands
  FROM bkt a JOIN bkt b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)"""
)


# --------------------------------------------------------------------------
# dedup family
# --------------------------------------------------------------------------


def q_minhash_signature(spark, sf_dir):
    """MinHash signatures (doc_id, seed, minhash) — map-side array
    transforms, no shuffle until downstream banding."""
    return dedup.minhash_signatures(_docs(spark, sf_dir))


SQL_MINHASH_SIGNATURE = f"""WITH {_SQL_MINHASH_CTE}
SELECT doc_id, seed, minhash FROM mh"""


def q_dedup_minhash(spark, sf_dir):
    """LSH band-bucket candidate pairs (doc_a, doc_b, n_shared_bands)."""
    sig = dedup.minhash_signatures(_docs(spark, sf_dir))
    return dedup.minhash_candidate_pairs(dedup.lsh_bands(sig), MAX_BUCKET)


SQL_DEDUP_MINHASH = f"""WITH {_SQL_BANDS_CTE}
SELECT doc_a, doc_b, n_shared_bands FROM cand"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard verification over the MinHash candidates."""
    docs = _docs(spark, sf_dir)
    sig = dedup.minhash_signatures(docs)
    pairs = dedup.minhash_candidate_pairs(dedup.lsh_bands(sig), MAX_BUCKET)
    return dedup.ngram_jaccard(docs, pairs)


SQL_NGRAM_JACCARD = f"""WITH {_SQL_BANDS_CTE},
shset AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, count(*) AS n FROM shset GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shset sa ON sa.doc_id = c.doc_a
  JOIN shset sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(coalesce(inter.n_inter, 0)
             / (na.n + nb.n - coalesce(inter.n_inter, 0))::DOUBLE, 6)
         AS jaccard
FROM cand c
LEFT JOIN inter ON inter.doc_a = c.doc_a AND inter.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b"""


def q_simhash_fp(spark, sf_dir):
    """tf-weighted 16-bit SimHash fingerprints."""
    return dedup.simhash(_docs(spark, sf_dir), SIMHASH_BITS)


_sim_sums = ",\n         ".join(
    f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN tf ELSE -tf END) AS s{b}"
    for b in range(SIMHASH_BITS)
)
_sim_out = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
)
SQL_SIMHASH_FP = f"""WITH {R._SQL_POSTINGS_CTE},
hp AS (
  SELECT doc_id, tf, {_H.format(x="term")} AS h FROM postings
),
bits AS (
  SELECT doc_id,
         {_sim_sums}
  FROM hp GROUP BY doc_id
)
SELECT doc_id, CAST({_sim_out} AS BIGINT) AS simhash FROM bits"""


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------


def _query_vec(spark, sf_dir):
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).head()
    return [float(v) for v in row.embedding]


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-20 to the vec_id=0 embedding — JVM-side
    zip_with/aggregate dot product, TakeOrderedAndProject top-k."""
    return similarity.cosine_topk_bruteforce(
        _emb(spark, sf_dir), _query_vec(spark, sf_dir), ANN_K
    )


_SQL_COS = """round(
    list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
    / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
       * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)"""

SQL_ANN_COSINE_TOPK = f"""WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id, {_SQL_COS} AS score
FROM embeddings e, q
ORDER BY score DESC, vec_id ASC LIMIT {ANN_K}"""

EMB_DIM = 64  # testdata embeddings.parquet vector width
_HL_TABLES, _HL_PROBE = 2, 1
_ND_BITS = 4  # near-dup gate bucket width (16 buckets at sf0.01 scale)


def _plane_bucket_sql(planes: list[list[float]]) -> str:
    """DuckDB twin of similarity.hyperplane_bucket over the SAME rounded
    literal planes."""
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ",".join(repr(v) for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[])"
            f" >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def q_ann_lsh_topk(spark, sf_dir):
    """Seeded random-hyperplane sign-LSH ANN with multi-table Hamming-1
    probing (similarity.cosine_topk_hlsh): a row survives if any table
    puts it within 1 bit of the query's bucket; brute-force cosine over
    survivors.  On a stored table bucketed by table-0's bucket this scan
    prunes like the postings term-bucket — the scale path for 100 TB
    embeddings."""
    return similarity.cosine_topk_hlsh(
        _emb(spark, sf_dir),
        _query_vec(spark, sf_dir),
        ANN_K,
        n_tables=_HL_TABLES,
        probe_hamming=_HL_PROBE,
    )


_t0_sql = _plane_bucket_sql(
    similarity.hyperplanes(EMB_DIM, similarity.HLSH_BITS, similarity.HLSH_SEED, 0)
)
_t1_sql = _plane_bucket_sql(
    similarity.hyperplanes(EMB_DIM, similarity.HLSH_BITS, similarity.HLSH_SEED, 1)
)

SQL_ANN_LSH_TOPK = f"""WITH b AS (
  SELECT *, {_t0_sql} AS b0, {_t1_sql} AS b1 FROM embeddings
),
q AS (SELECT embedding AS qv, b0 AS q0, b1 AS q1 FROM b WHERE vec_id = 0)
SELECT e.vec_id, {_SQL_COS} AS score
FROM b e, q
WHERE bit_count(xor(e.b0, q.q0)) <= {_HL_PROBE}
   OR bit_count(xor(e.b1, q.q1)) <= {_HL_PROBE}
ORDER BY score DESC, vec_id ASC LIMIT {ANN_K}"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer (seeded distributed
    TakeOrdered init, driver-size centroid matrix, 6-dp rounded
    trajectory) + nprobe cluster scan + brute-force cosine inside.

    Oracle: training is deterministic in (data, seed), so
    ``_sql_ann_ivf_topk`` trains the sequential numpy twin
    (oracle/ivf.py) over the same parquet and embeds the centroid matrix
    as literal lists — assignment (argmax of k literal dot products),
    nprobe filter, and cosine top-k are then pure SQL, the same
    literal-constant pattern as the hyperplane-LSH gate.  Twin ==
    distributed-train equality is separately pytest-gated."""
    return similarity.cosine_topk_ivf(
        _emb(spark, sf_dir), _query_vec(spark, sf_dir), ANN_K
    )


def _sql_ann_ivf_topk() -> str | None:
    """Generate the IVF gate SQL at oracle-collection time (it embeds
    centroids trained from the gate corpus, so it cannot be a static
    module literal).  The driver compares at sf0.01; override
    ``WSE_ORACLE_SF_DIR`` to retarget.  Returns None (-> rows-only
    fallback) if the corpus is unreadable here."""
    import os

    import numpy as np

    from websearchengine_spark.oracle import ivf as oracle_ivf

    path = os.path.join(
        os.environ.get("WSE_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
        "embeddings.parquet",
    )
    try:
        cent, q = oracle_ivf.train_from_parquet(
            path,
            similarity.IVF_CENTROIDS,
            similarity.IVF_ITERS,
            similarity.HLSH_SEED,
        )
    except Exception:
        return None
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [
        int(c)
        for c in np.argsort(-(cent @ qn))[: max(1, similarity.IVF_NPROBE)]
    ]
    sims = ",\n           ".join(
        "list_dot_product(emb, ["
        + ",".join(repr(float(v)) for v in row)
        + "]::DOUBLE[]) / nrm"
        for row in cent
    )
    return f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
a AS (
  SELECT vec_id, emb, nrm,
         list_position(sims, list_max(sims)) - 1 AS cluster
  FROM (SELECT vec_id, emb, nrm, list_value(
           {sims}) AS sims FROM e)
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_dot_product(e.emb, q.qv)
             / (e.nrm * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
FROM a e, q
WHERE e.cluster IN ({",".join(str(p) for p in probes)})
ORDER BY score DESC, vec_id ASC LIMIT {ANN_K}"""


def q_near_dup_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, label-blocked (never all-pairs)."""
    return similarity.near_dup_pairs_cosine(
        _emb(spark, sf_dir), NEAR_DUP_T, "label"
    )


def q_near_dup_lsh(spark, sf_dir):
    """Near-dup pairs with the engine's DEFAULT blocking: seeded
    hyperplane-LSH bucket + max_bucket skew guard (never all-pairs, never
    quadratic in a hot block — the 100 TB-safe variant of
    near_dup_cosine)."""
    return similarity.near_dup_pairs_cosine(
        _emb(spark, sf_dir), NEAR_DUP_T, None, bits=_ND_BITS
    )


_nd_bucket_sql = _plane_bucket_sql(
    similarity.hyperplanes(EMB_DIM, _ND_BITS, similarity.HLSH_SEED, 0)
)

SQL_NEAR_DUP_LSH = f"""WITH e0 AS (
  SELECT vec_id, {_nd_bucket_sql} AS blk, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
ok AS (SELECT blk FROM e0 GROUP BY blk
       HAVING count(*) >= 2 AND count(*) <= {similarity.NEAR_DUP_MAX_BUCKET}),
e AS (SELECT e0.* FROM e0 JOIN ok USING (blk))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS score
FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= {NEAR_DUP_T}"""


SQL_NEAR_DUP_COSINE = f"""WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS score
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= {NEAR_DUP_T}"""


# --------------------------------------------------------------------------
# mining family
# --------------------------------------------------------------------------


def q_pagerank_synth(spark, sf_dir):
    """G2 PageRank (λ=0.9, 2 synchronous iterations, init 1.0, no dangling
    redistribution) over the deterministic synthetic link graph."""
    docs = _docs(spark, sf_dir)
    edges = mining.synthetic_edges(docs, PR_FANOUT)
    return mining.pagerank(docs, edges)


_edge_union = "\n  UNION\n".join(
    f"  SELECT doc_id AS src_id, (doc_id*31 + {7 * j}) % (SELECT count(*) FROM documents) AS dst_id FROM documents"
    for j in range(1, PR_FANOUT + 1)
)
SQL_PAGERANK_SYNTH = f"""WITH e AS (
  SELECT DISTINCT src_id, dst_id FROM (
{_edge_union}
  ) WHERE src_id <> dst_id
),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
od AS (SELECT src_id, count(*)::DOUBLE AS out_deg FROM e GROUP BY 1),
c1 AS (
  SELECT e.dst_id, sum(1.0 / od.out_deg) AS mass
  FROM e JOIN od USING (src_id) GROUP BY 1
),
r1 AS (
  SELECT d.doc_id, 0.9 * coalesce(c1.mass, 0) + 0.1 / nn.n AS pr
  FROM documents d LEFT JOIN c1 ON c1.dst_id = d.doc_id, nn
),
c2 AS (
  SELECT e.dst_id, sum(r1.pr / od.out_deg) AS mass
  FROM e JOIN od USING (src_id) JOIN r1 ON r1.doc_id = e.src_id GROUP BY 1
),
r2 AS (
  SELECT d.doc_id, 0.9 * coalesce(c2.mass, 0) + 0.1 / nn.n AS pr
  FROM documents d LEFT JOIN c2 ON c2.dst_id = d.doc_id, nn
)
SELECT doc_id, round(pr, 9) AS page_rank FROM r2"""


def q_top_terms_prf(spark, sf_dir):
    """G5 PRF: top-10 BM25 docs -> summed term tfs -> top-10 terms with
    retained-mass normalization (term, prob)."""
    top = R.q_bm25_topk(spark, sf_dir).select("doc_id")
    postings = R._postings(spark, sf_dir)
    return mining.prf_representation(top, postings, 10)


SQL_TOP_TERMS_PRF = f"""WITH {R._SQL_POSTINGS_CTE},
doclen AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM postings GROUP BY doc_id),
consts AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(tf) FROM postings)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
qp AS (SELECT * FROM postings WHERE term IN ({R._terms_sql})),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM qp GROUP BY term),
scored AS (
  SELECT qp.doc_id,
         round(sum(
           ln(1.0 + (consts.n - ts.df + 0.5) / (ts.df + 0.5))
           * qp.tf * {R.BM25_K1 + 1.0}
           / (qp.tf + {R.BM25_K1} * (1.0 - {R.BM25_B} + {R.BM25_B} * doclen.doc_len / consts.avgdl))
         ), 6) AS score,
         count(DISTINCT qp.term) AS n_hit
  FROM qp JOIN doclen USING (doc_id) JOIN ts USING (term), consts
  GROUP BY qp.doc_id
),
topd AS (
  SELECT doc_id FROM scored WHERE n_hit = {len(R.QUERY_TERMS)}
  ORDER BY score DESC, doc_id ASC LIMIT 10
),
summed AS (
  SELECT term, sum(tf) AS freq FROM postings JOIN topd USING (doc_id)
  GROUP BY term
),
topt AS (SELECT term, freq FROM summed ORDER BY freq DESC, term ASC LIMIT 10)
SELECT term, round(freq / (sum(freq) OVER ()), 9) AS prob FROM topt"""


def q_bhattacharyya(spark, sf_dir):
    """G6: Bhattacharyya coefficient between two PRF query
    representations — the bm25 query's top-10-doc representation vs a
    background representation over the 10 lowest doc_ids.  Single-row
    (bc) output; probs are the same round-9 ratios as the PRF gate on
    both engines."""
    top = R.q_bm25_topk(spark, sf_dir).select("doc_id")
    postings = R._postings(spark, sf_dir)
    rep_a = mining.prf_representation(top, postings, 10)
    base = _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(10)
    rep_b = mining.prf_representation(base, postings, 10)
    return mining.bhattacharyya(rep_a, rep_b)


# reuse the whole PRF pipeline (shared CTE prefix through `topt`), add
# the background representation, overlap-join, per-pair sum
SQL_BHATTACHARYYA = SQL_TOP_TERMS_PRF.rsplit("\nSELECT", 1)[0] + """,
repa AS (
  SELECT term, round(freq / (sum(freq) OVER ()), 9) AS pa FROM topt
),
base AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 10),
summedb AS (
  SELECT term, sum(tf) AS freq FROM postings JOIN base USING (doc_id)
  GROUP BY term
),
toptb AS (
  SELECT term, freq FROM summedb ORDER BY freq DESC, term ASC LIMIT 10
),
repb AS (
  SELECT term, round(freq / (sum(freq) OVER ()), 9) AS pb FROM toptb
)
SELECT round(sum(sqrt(pa * pb)), 9) AS bc FROM repa JOIN repb USING (term)"""


def q_spearman_rank(spark, sf_dir):
    """G4 Spearman ρ between per-doc token count and n_chars (desc ranks,
    doc_id tiebreak), textbook formula via corr of ranks."""
    t = R._tok(spark, sf_dir)
    m = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    metrics = docs.join(m, "doc_id")
    out = mining.spearman(metrics, "n_tokens", "n_chars")
    return out.select(F.round("rho", 6).alias("rho"))


SQL_SPEARMAN_RANK = f"""WITH {R._SQL_TOK_CTE},
m AS (
  SELECT doc_id, count(*) AS n_tokens FROM tok WHERE term <> ''
  GROUP BY doc_id
),
j AS (
  SELECT d.doc_id, m.n_tokens, d.n_chars
  FROM documents d JOIN m USING (doc_id)
),
r AS (
  SELECT row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rx,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS ry
  FROM j
)
SELECT round(corr(rx, ry), 6) AS rho FROM r"""


# --------------------------------------------------------------------------
# text analysis / events
# --------------------------------------------------------------------------

_BPE_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def q_token_count(spark, sf_dir):
    """BPE-ish token counting: word runs + isolated punctuation marks."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_raw"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_BPE_RE}'))::BIGINT AS n_bpe_tokens,
       length(text)::BIGINT AS n_chars_raw
FROM documents"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via lag + running sum —
    the batch equivalent of the streaming stateful session operator."""
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    x = e.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_s").over(w))
    return x.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.min(sec), 3).alias("start_ts"),
        F.round(F.max(sec), 3).alias("end_ts"),
    )


SQL_EVENTS_SESSIONIZE = """WITH x AS (
  SELECT user_id, event_id, ts, epoch(ts)::DOUBLE AS sec,
         CASE WHEN lag(epoch(ts)::DOUBLE) OVER w IS NULL
                   OR epoch(ts)::DOUBLE - lag(epoch(ts)::DOUBLE) OVER w > 1800.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM x
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       round(min(sec), 3) AS start_ts, round(max(sec), 3) AS end_ts
FROM y GROUP BY 1, 2"""


def q_ctr_fold(spark, sf_dir):
    """R11 sequential CTR replay as an ordered per-key fold (the
    reference updates serving CTR impression-by-impression;
    AdsRanker.java:345-377).  Impressions derived from the events table:
    keyword = event_type, ad_key = user_id, clicked = value > 0, event
    order = (ts, event_id)."""
    from websearchengine_spark.operators import ads

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    imps = e.select(
        F.col("event_type").alias("keyword"),
        F.col("user_id").cast("string").alias("ad_key"),
        (F.col("value") > 0).alias("clicked"),
        "ts",
        "event_id",
    )
    out = ads.ctr_fold(imps)
    return out.select(
        "keyword", "ad_key", F.round("ctr", 9).alias("ctr"), "n_impressions"
    )


SQL_CTR_FOLD = """WITH imp AS (
  SELECT event_type AS keyword, user_id::VARCHAR AS ad_key,
         CASE WHEN value > 0 THEN 1.0 ELSE 0.0 END AS flag, ts, event_id
  FROM events
),
g AS (
  SELECT keyword, ad_key,
         list_prepend(0.1::DOUBLE, list(flag ORDER BY ts, event_id)) AS chain,
         count(*)::BIGINT AS n_impressions
  FROM imp GROUP BY 1, 2
)
SELECT keyword, ad_key,
       round(list_reduce(chain, (acc, x) ->
             least(1.0, CASE WHEN x > 0.5
                             THEN acc + acc/10 ELSE acc - acc/10 END)), 9) AS ctr,
       n_impressions
FROM g"""


def q_wand_bm25_topk(spark, sf_dir):
    """End-to-end segment path under the SQL oracle: gate postings ->
    compressed block-max segments -> WAND-pruned top-10 BM25 — must equal
    the relational BM25 oracle exactly (same SQL as bm25_topk)."""
    from websearchengine_spark.operators import indexer, wand

    p = R._postings(spark, sf_dir)
    dl = R._doclen(spark, sf_dir).withColumnRenamed("doc_len", "dl")
    full = p.join(dl, "doc_id")
    num_docs = R._docs(spark, sf_dir).count()
    total_tf = full.agg(F.sum("tf")).head()[0]
    avgdl = float(total_tf) / num_docs
    segs = indexer.build_segments(
        full, avgdl=avgdl, chunk_docs=64, with_positions=False
    )
    res = wand.bm25_topk_segments(
        segs, R.QUERY_TERMS, num_docs, avgdl, k=30, mode="conjunctive"
    )
    # re-round then re-rank so boundary ties resolve exactly like the
    # oracle's round-then-sort
    return (
        res.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SQL_WAND_BM25_TOPK = R.SQL_BM25_TOPK


# --------------------------------------------------------------------------
# evaluation metrics (E1-E8) over the BM25 run with synthetic qrels
# --------------------------------------------------------------------------


def q_eval_metrics(spark, sf_dir):
    """P/R/F1@{1,5,10}, MAP, NDCG@{1,5,10}, MRR, accuracy for the gate
    BM25 top-10 against deterministic synthetic qrels (grade from
    doc_id mod 5) — exercises operators/evaluate.py end to end."""
    from pyspark.sql import Window

    from websearchengine_spark.operators import evaluate

    top = R.q_bm25_topk(spark, sf_dir)
    results = top.select(
        F.lit("q1").alias("qid"),
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    grade = (
        F.when(F.col("doc_id") % 5 == 0, "Perfect")
        .when(F.col("doc_id") % 5 == 1, "Excellent")
        .when(F.col("doc_id") % 5 == 2, "Good")
        .when(F.col("doc_id") % 5 == 3, "Fair")
        .otherwise("Bad")
    )
    qrels = _docs(spark, sf_dir).select(
        F.lit("q1").alias("qid"), "doc_id", grade.alias("grade")
    )
    return evaluate.metrics_per_query(results, qrels)


_eval_ks = (1, 5, 10)
_p_cols = ",\n       ".join(
    f"round(sum(CASE WHEN rank <= {k} THEN rel END) / {k}, 6) AS p{k}"
    for k in _eval_ks
)
_dcg_cols = ",\n       ".join(
    f"sum(CASE WHEN rank <= {k} THEN gain / greatest(1.0, log2(rank)) END) AS dcg_{k}"
    for k in _eval_ks
)
_idcg_cols = ",\n       ".join(
    f"sum(CASE WHEN ideal_rank <= {k} THEN gain / greatest(1.0, log2(ideal_rank)) END) AS idcg_{k}"
    for k in _eval_ks
)
_relret_cols = ",\n       ".join(
    f"sum(CASE WHEN rank <= {k} THEN rel END) AS relret_{k}" for k in _eval_ks
)
_pr_out = []
for k in _eval_ks:
    _pr_out.append(f"round(b.p{k}, 6) AS p{k}")
    _pr_out.append(
        f"round(CASE WHEN b.rel_ret > 0 THEN b.relret_{k} / b.rel_ret ELSE 0 END, 6) AS r{k}"
    )
    _pr_out.append(
        f"round(CASE WHEN round(b.p{k}, 6) + round(CASE WHEN b.rel_ret > 0 THEN b.relret_{k} / b.rel_ret ELSE 0 END, 6) > 0 "
        f"THEN 2 * round(b.p{k}, 6) * round(CASE WHEN b.rel_ret > 0 THEN b.relret_{k} / b.rel_ret ELSE 0 END, 6) "
        f"/ (round(b.p{k}, 6) + round(CASE WHEN b.rel_ret > 0 THEN b.relret_{k} / b.rel_ret ELSE 0 END, 6)) ELSE 0 END, 6) AS f1_{k}"
    )
_ndcg_out = ",\n       ".join(
    f"round(CASE WHEN i.idcg_{k} > 0 THEN b.dcg_{k} / i.idcg_{k} ELSE 0 END, 6) AS ndcg{k}"
    for k in _eval_ks
)
_pr_out_sql = ",\n       ".join(_pr_out)

SQL_EVAL_METRICS = f"""WITH {R._SQL_POSTINGS_CTE},
doclen AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM postings GROUP BY doc_id),
consts AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(tf) FROM postings)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
qp AS (SELECT * FROM postings WHERE term IN ({R._terms_sql})),
tstats AS (SELECT term, count(*)::DOUBLE AS df FROM qp GROUP BY term),
scored AS (
  SELECT qp.doc_id,
         round(sum(
           ln(1.0 + (consts.n - tstats.df + 0.5) / (tstats.df + 0.5))
           * qp.tf * {R.BM25_K1 + 1.0}
           / (qp.tf + {R.BM25_K1} * (1.0 - {R.BM25_B} + {R.BM25_B} * doclen.doc_len / consts.avgdl))
         ), 6) AS score,
         count(DISTINCT qp.term) AS n_hit
  FROM qp JOIN doclen USING (doc_id) JOIN tstats USING (term), consts
  GROUP BY qp.doc_id
),
topd AS (
  SELECT doc_id, score FROM scored WHERE n_hit = {len(R.QUERY_TERMS)}
  ORDER BY score DESC, doc_id ASC LIMIT 10
),
results AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM topd
),
j AS (
  SELECT r.rank, r.doc_id,
         CASE WHEN d.doc_id % 5 IN (0, 1, 2) THEN 1.0 ELSE 0.0 END AS rel,
         CASE d.doc_id % 5 WHEN 0 THEN 10.0 WHEN 1 THEN 7.0 WHEN 2 THEN 5.0
              WHEN 3 THEN 1.0 ELSE 0.0 END AS gain
  FROM results r JOIN documents d USING (doc_id)
),
jj AS (
  SELECT *,
         sum(rel) OVER (ORDER BY rank) / rank AS prec_at,
         row_number() OVER (ORDER BY gain DESC, rank ASC) AS ideal_rank
  FROM j
),
b AS (
  SELECT sum(rel) AS rel_ret, count(*)::DOUBLE AS n_ret,
       {_p_cols},
       {_relret_cols},
       {_dcg_cols},
       sum(CASE WHEN rel > 0 THEN prec_at END) AS sum_prec_at_rel,
       min(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank
  FROM jj
),
i AS (
  SELECT {_idcg_cols} FROM jj
)
SELECT 'q1' AS qid,
       {_pr_out_sql},
       round(CASE WHEN b.rel_ret > 0 THEN b.sum_prec_at_rel / b.rel_ret ELSE 0 END, 6) AS map,
       {_ndcg_out},
       round(CASE WHEN b.first_rel_rank IS NOT NULL THEN 1.0 / b.first_rel_rank ELSE 0 END, 6) AS mrr,
       round(b.rel_ret / b.n_ret, 6) AS accuracy
FROM b, i"""


# --------------------------------------------------------------------------
# corpus-level training-data statistics (operators/corpus_stats.py)
# --------------------------------------------------------------------------

NGRAM_N = 2
REP_N = 3
CONTAM_N = 5
CONTAM_PROBE_DOC = 0

# DuckDB n-gram list from the shared gate tokenizer: 1-based list indexing,
# generate_series(1, 0) is empty so short docs fall out naturally
def _sql_ngram_list(n: int) -> str:
    join = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, len(toks) - {n - 1}), i -> {join})"
    )


_SQL_TOKS_CTE_DOCS = f"""t AS (
  SELECT doc_id, source, n_chars,
         list_filter({R._SQL_TOKS}, x -> x <> '') AS toks
  FROM documents
)"""


def q_ngram_counts(spark, sf_dir):
    """Global n-gram frequencies (tokenizer training / vocabulary
    curricula): map-side bigram generation from the token array, one
    key-bounded groupBy — the term_stats shuffle shape."""
    return corpus_stats.ngram_counts(_docs(spark, sf_dir), NGRAM_N, 100)


SQL_NGRAM_COUNTS = f"""WITH {_SQL_TOKS_CTE_DOCS},
g AS (
  SELECT doc_id, unnest({_sql_ngram_list(NGRAM_N)}) AS ngram
  FROM t WHERE len(toks) >= {NGRAM_N}
)
SELECT ngram, count(*)::BIGINT AS cnt, count(DISTINCT doc_id)::BIGINT AS df
FROM g GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 100"""


def q_repetition_score(spark, sf_dir):
    """Gopher/MassiveText repetition filter: per-doc duplicate-trigram
    fraction; short docs score 0."""
    return corpus_stats.repetition_scores(_docs(spark, sf_dir), REP_N)


SQL_REPETITION_SCORE = f"""WITH {_SQL_TOKS_CTE_DOCS},
g AS (
  SELECT doc_id, unnest({_sql_ngram_list(REP_N)}) AS g
  FROM t WHERE len(toks) >= {REP_N}
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_ngrams,
         count(DISTINCT g)::BIGINT AS n_distinct
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_ngrams, 0) AS n_ngrams,
       coalesce(a.n_distinct, 0) AS n_distinct,
       coalesce(round(1.0 - a.n_distinct / a.n_ngrams::DOUBLE, 6), 0.0)
         AS rep_score
FROM documents d LEFT JOIN agg a USING (doc_id)"""


def q_contamination_check(spark, sf_dir):
    """Benchmark-decontamination screen: docs sharing any 5-gram with the
    probe set (doc 0's distinct 5-grams stand in for a held-out
    benchmark).  The probe set is driver-size by construction and
    broadcasts into an isin filter below the aggregation."""
    docs = _docs(spark, sf_dir)
    probes = corpus_stats.probe_ngrams_of_doc(docs, CONTAM_PROBE_DOC, CONTAM_N)
    return corpus_stats.contamination_overlap(docs, probes, CONTAM_N)


SQL_CONTAMINATION_CHECK = f"""WITH {_SQL_TOKS_CTE_DOCS},
g AS (
  SELECT doc_id, unnest({_sql_ngram_list(CONTAM_N)}) AS ngram
  FROM t WHERE len(toks) >= {CONTAM_N}
),
p AS (SELECT DISTINCT ngram AS probe FROM g WHERE doc_id = {CONTAM_PROBE_DOC}),
hits AS (SELECT g.doc_id, g.ngram FROM g JOIN p ON g.ngram = p.probe)
SELECT doc_id, count(*)::BIGINT AS n_hits,
       count(DISTINCT ngram)::BIGINT AS n_probes_hit
FROM hits GROUP BY doc_id"""


SAMPLE_RATES = {"src0": 0.9, "src1": 0.5, "src2": 0.25, "src3": 1.0,
                "src4": 0.1}
SAMPLE_SEED = 42
PACK_BUDGET = 512


def q_stratified_sample(spark, sf_dir):
    """Mixture reweighting: per-source md5-threshold downsampling
    (sources without a rate drop entirely) — the step a training run
    applies after reading source_mix."""
    return corpus_stats.stratified_sample(
        _docs(spark, sf_dir), SAMPLE_RATES, SAMPLE_SEED
    ).select("doc_id", "source")


_rate_cases = " ".join(
    f"WHEN '{s}' THEN {r!r}" for s, r in sorted(SAMPLE_RATES.items())
)
SQL_STRATIFIED_SAMPLE = f"""SELECT doc_id, source FROM (
  SELECT doc_id, source,
         {_H.format(x=f"doc_id::VARCHAR || '|{SAMPLE_SEED}'")} / {float(1 << 60)!r} AS u,
         CASE source {_rate_cases} ELSE NULL END AS rate
  FROM documents
) WHERE rate IS NOT NULL AND u < rate"""


def q_sequence_pack(spark, sf_dir):
    """Token-budget sequence packing: bin_id = floor(exclusive prefix-sum
    of token counts in doc_id order / budget) — the distributable packing
    rule (pure window prefix sum; greedy first-fit is sequential and
    cannot run at corpus scale)."""
    return corpus_stats.sequence_pack(_docs(spark, sf_dir), PACK_BUDGET)


SQL_SEQUENCE_PACK = f"""WITH {_SQL_TOKS_CTE_DOCS},
b AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t)
SELECT doc_id, n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) / {PACK_BUDGET}) AS BIGINT) AS bin_id
FROM b"""


def q_source_mix(spark, sf_dir):
    """Per-source data-mixture report (docs/tokens/chars) — the table a
    training run's sampling weights are configured from."""
    return corpus_stats.source_mix(_docs(spark, sf_dir))


SQL_SOURCE_MIX = f"""WITH {_SQL_TOKS_CTE_DOCS}
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(toks))::BIGINT AS n_tokens,
       sum(n_chars)::BIGINT AS n_chars,
       round(avg(n_chars), 6) AS avg_chars
FROM t GROUP BY source"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

EXT_REGISTRY = {
    "minhash_signature": (q_minhash_signature, SQL_MINHASH_SIGNATURE),
    "dedup_minhash": (q_dedup_minhash, SQL_DEDUP_MINHASH),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "simhash_fp": (q_simhash_fp, SQL_SIMHASH_FP),
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "near_dup_cosine": (q_near_dup_cosine, SQL_NEAR_DUP_COSINE),
    "near_dup_lsh": (q_near_dup_lsh, SQL_NEAR_DUP_LSH),
    "ann_ivf_topk": (q_ann_ivf_topk, _sql_ann_ivf_topk),
    "pagerank_synth": (q_pagerank_synth, SQL_PAGERANK_SYNTH),
    "top_terms_prf": (q_top_terms_prf, SQL_TOP_TERMS_PRF),
    "bhattacharyya": (q_bhattacharyya, SQL_BHATTACHARYYA),
    "spearman_rank": (q_spearman_rank, SQL_SPEARMAN_RANK),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "ctr_fold": (q_ctr_fold, SQL_CTR_FOLD),
    "eval_metrics": (q_eval_metrics, SQL_EVAL_METRICS),
    "wand_bm25_topk": (q_wand_bm25_topk, SQL_WAND_BM25_TOPK),
    "ngram_counts": (q_ngram_counts, SQL_NGRAM_COUNTS),
    "repetition_score": (q_repetition_score, SQL_REPETITION_SCORE),
    "contamination_check": (q_contamination_check, SQL_CONTAMINATION_CHECK),
    "source_mix": (q_source_mix, SQL_SOURCE_MIX),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "sequence_pack": (q_sequence_pack, SQL_SEQUENCE_PACK),
}
