"""Ads subsystem (SURVEY.md §2.5 R9-R11; project/ AdsIndex + AdsRanker).

Semantics re-expressed Spark-first over small broadcastable tables:

- ads corpus ``(company_ads, title, body)`` with ``company_ads =
  company + "_" + ad_id`` (AdsIndex.java:101, :149-180); indexed doconly
  (term, ad_key, tf) over title+body with the reference tokenization.
- R9 quality score (AdsRanker.java:38-255): for each bid whose keyword
  appears in the query, ``relevance = QL(ad doc) + title_cosine``;
  ``QS = 0.3·relevance + 0.7·CTR``; per-ad mean QS across its matching
  keywords; ``final = meanQS · Σ bid_price``; drop non-positive; top 3
  (AdsRanker QS :460-463, final :465-467).
- R10 title cosine preserves the reference's parenthesization bug
  (AdsRanker.java:412-450): ``dot / sqrt(q_norm2) * sqrt(t_norm2)`` binds
  as ``(dot / sqrt(q_norm2)) · sqrt(t_norm2)`` — NOT a true cosine.
- R11 CTR update (AdsRanker.java:345-377): after an impression,
  ``ctr += ctr/10`` on click else ``ctr -= ctr/10``, clamped to <= 1.0;
  a new ad's prior CTR is its company's mean CTR, else 0.1
  (QueryHandler.java:236-257).

Everything here is dimension-table scale (thousands of ads), so every
join marks the ads side broadcast; the design point is correctness of the
blend, not shuffle strategy.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.functions.textnorm import normalize_token, parse_query

QL_BETA = 0.5
QS_REL_W = 0.3
QS_CTR_W = 0.7
DEFAULT_CTR = 0.1
TOP_ADS = 3

ADS_TSV = "/root/reference/project/data/ads/advertisement.tsv"


def ad_tokens(title: str, body: str = "") -> list[str]:
    """AdsIndex.processDocument:149-167 + readTerms:184-214: title tokens
    then body tokens, each whitespace-split -> stem -> lowercase ->
    stopword-filtered.  Unlike the web indexer there is NO boilerplate
    strip and NO non-alphanumeric scrub — ad text is indexed raw."""
    out = []
    for raw in (*title.split(), *body.split()):
        t = normalize_token(raw)
        if t is not None:
            out.append(t)
    return out


def ads_tables_from_tsv(spark, path: str = ADS_TSV):
    """S4 — the reference's SHIPPED ads corpus.  AdsIndex.constructIndex
    (:97-123) reads ``advertisement.tsv`` line by line and
    processDocument scans the first three tab fields as
    (company_ads, title, body); extra fields are ignored.  The corpus is
    dimension-table scale by design (the reference pins hot posting lists
    in memory, AdsIndex.java:321-323), so rows pass through the driver
    into the same broadcastable tables as synthetic input."""
    with open(path, encoding="utf-8") as fh:
        rows = []
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) >= 3:
                rows.append((parts[0], parts[1], parts[2]))
    return ads_tables(spark, rows)


def ads_tables_gate(spark, path: str = ADS_TSV):
    """(ads, postings, title_tf) under the GATE tokenization (lower +
    non-alphanumeric split — SQL-expressible so the DuckDB driver oracle
    can rebuild the same tables independently); the reference-exact
    stemmed pipeline stays in ``ads_tables``/``ads_tables_from_tsv``
    (pytest parity).  Everything is Spark column expressions over the
    TSV scan, shared with the oracle SQL in plans/registry_ads.py."""
    raw = (
        spark.read.option("sep", "\t").option("quote", "").csv(path)
        .select(
            F.col("_c0").alias("ad_key"),
            F.col("_c1").alias("title"),
            F.col("_c2").alias("body"),
        )
    )

    def toks(col):
        return F.split(
            F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " "
        )

    tt = raw.select(
        "ad_key",
        F.regexp_replace("ad_key", "_[^_]*$", "").alias("company"),
        F.substring_index("ad_key", "_", -1).alias("ad_id"),
        "title",
        "body",
        toks(F.col("title")).alias("ttoks"),
        toks(F.concat_ws(" ", "title", "body")).alias("dtoks"),
    )
    ads = tt.select(
        "ad_key", "company", "ad_id", "title", "body",
        F.size("dtoks").cast("int").alias("doc_len"),
    )
    postings = (
        tt.select("ad_key", F.explode("dtoks").alias("term"))
        .groupBy("term", "ad_key")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    title_tf = (
        tt.select("ad_key", F.explode("ttoks").alias("term"))
        .groupBy("term", "ad_key")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    return ads, postings, title_tf


def ads_tables(spark, ads_rows: list[tuple[str, str, str]]):
    """(ads, postings, title_tf) from (company_ads, title, body) rows.
    Ad doc = title tokens ++ body tokens per ``ad_tokens`` (the faithful
    AdsIndex tokenization: company_ads is a lookup key, never indexed)."""
    ads_data = []
    post_rows = []
    title_rows = []
    for ad_key, title, body in ads_rows:
        company, _, ad_id = ad_key.rpartition("_")
        toks = ad_tokens(title, body)
        title_toks = ad_tokens(title)
        ads_data.append((ad_key, company, ad_id, title, body, len(toks)))
        for t, c in Counter(toks).items():
            post_rows.append((t, ad_key, c))
        for t, c in Counter(title_toks).items():
            title_rows.append((t, ad_key, c))
    ads = spark.createDataFrame(
        ads_data,
        "ad_key string, company string, ad_id string, title string, "
        "body string, doc_len int",
    )
    postings = spark.createDataFrame(
        post_rows, "term string, ad_key string, tf int"
    )
    title_tf = spark.createDataFrame(
        title_rows, "term string, ad_key string, tf int"
    )
    return ads, postings, title_tf


def ads_ql(
    ads: DataFrame, postings: DataFrame, query_tokens: list[str]
) -> DataFrame:
    """(ad_key, ql) — QL β=0.5 over the ads collection (R1 semantics on
    the ads index; docs missing a token take the collection prior)."""
    total = postings.agg(F.sum("tf")).head()[0] or 0
    c = float(int(total))
    qc = Counter(query_tokens)
    spark = ads.sparkSession
    qdf = spark.createDataFrame(
        [(t, int(n)) for t, n in qc.items()], "term string, qcount int"
    )
    ctf = postings.join(F.broadcast(qdf), "term").groupBy("term").agg(
        F.sum("tf").cast("double").alias("ctf")
    )
    ctf_map = {r.term: r.ctf for r in ctf.collect()}
    if any(t not in ctf_map for t in qc):
        return ads.select("ad_key", F.lit(0.0).alias("ql"))
    import math

    log_prior = sum(
        n * math.log(QL_BETA * ctf_map[t] / c) for t, n in qc.items()
    )
    qp = postings.join(F.broadcast(qdf), "term").join(
        F.broadcast(ctf), "term"
    ).join(ads.select("ad_key", "doc_len"), "ad_key")
    prior = F.lit(QL_BETA) * F.col("ctf") / F.lit(c)
    factor = F.lit(1.0 - QL_BETA) * F.col("tf") / F.col("doc_len") + prior
    matched = qp.groupBy("ad_key").agg(
        F.exp(
            F.sum(F.col("qcount") * (F.log(factor) - F.log(prior)))
            + F.lit(float(log_prior))
        ).alias("ql")
    )
    import math as _m

    return (
        ads.select("ad_key")
        .join(matched, "ad_key", "left")
        .fillna({"ql": float(_m.exp(log_prior))})
    )


def title_cosine(
    title_tf: DataFrame, query_tokens: list[str]
) -> DataFrame:
    """(ad_key, tcos) — R10 with the preserved parenthesization bug:
    (Σ qtf·ttf / sqrt(Σ qtf²)) · sqrt(Σ ttf²)."""
    qc = Counter(query_tokens)
    qnorm = float(sum(v * v for v in qc.values())) ** 0.5
    spark = title_tf.sparkSession
    qdf = spark.createDataFrame(
        [(t, float(n)) for t, n in qc.items()], "term string, qv double"
    )
    tnorm2 = title_tf.groupBy("ad_key").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("double").alias("tm")
    )
    dot = (
        title_tf.join(F.broadcast(qdf), "term")
        .groupBy("ad_key")
        .agg(F.sum(F.col("tf") * F.col("qv")).alias("dot"))
    )
    return (
        dot.join(tnorm2, "ad_key")
        .select(
            "ad_key",
            (F.col("dot") / F.lit(qnorm) * F.sqrt(F.col("tm"))).alias("tcos"),
        )
    )


def effective_ctr(
    ctr: DataFrame, bids: DataFrame, ads: DataFrame
) -> DataFrame:
    """(keyword, ad_key, ctr_eff) for every bid: recorded CTR if present,
    else the company's mean recorded CTR, else 0.1."""
    bid_keys = bids.select(
        "keyword",
        F.concat_ws("_", "company", "ad_id").alias("ad_key"),
        "company",
    )
    company_mean = (
        ctr.join(ads.select("ad_key", "company"), "ad_key")
        .groupBy("company")
        .agg(F.avg("ctr").alias("mean_ctr"))
    )
    return (
        bid_keys.join(ctr, ["keyword", "ad_key"], "left")
        .join(company_mean, "company", "left")
        .select(
            "keyword",
            "ad_key",
            F.coalesce("ctr", "mean_ctr", F.lit(DEFAULT_CTR)).alias("ctr_eff"),
        )
    )


def rank_ads(
    ads: DataFrame,
    postings: DataFrame,
    title_tf: DataFrame,
    bids: DataFrame,
    ctr: DataFrame,
    query: str,
    k: int = TOP_ADS,
    tokens: list[str] | None = None,
) -> DataFrame:
    """(ad_key, score) — the R9 auction blend, top-k (default 3).
    ``tokens`` overrides the reference query tokenization (stem +
    stopword) with pre-tokenized terms — the driver gate passes
    gate-tokenized terms so the DuckDB oracle stays in lockstep."""
    if tokens is None:
        tokens = [t for t in parse_query(query.lower()) if " " not in t]
    if not tokens:
        return ads.sparkSession.createDataFrame([], "ad_key string, score double")
    qbids = bids.where(F.col("keyword").isin(tokens))
    rel = (
        ads_ql(ads, postings, tokens)
        .join(title_cosine(title_tf, tokens), "ad_key", "left")
        .fillna({"tcos": 0.0})
        .select("ad_key", (F.col("ql") + F.col("tcos")).alias("relevance"))
    )
    eff = effective_ctr(ctr, qbids, ads)
    per_kw = eff.join(F.broadcast(rel), "ad_key").select(
        "keyword",
        "ad_key",
        (
            F.lit(QS_REL_W) * F.col("relevance")
            + F.lit(QS_CTR_W) * F.col("ctr_eff")
        ).alias("qs"),
    )
    prices = qbids.select(
        "keyword",
        F.concat_ws("_", "company", "ad_id").alias("ad_key"),
        "price",
    )
    agg = (
        per_kw.join(prices, ["keyword", "ad_key"])
        .groupBy("ad_key")
        .agg(
            F.avg("qs").alias("mean_qs"),
            F.sum("price").alias("total_price"),
        )
        .select(
            "ad_key",
            (F.col("mean_qs") * F.col("total_price")).alias("score"),
        )
        .where(F.col("score") > 0)
    )
    return agg.orderBy(F.desc("score"), F.asc("ad_key")).limit(k)


def ctr_fold(impressions: DataFrame, prior: float = DEFAULT_CTR) -> DataFrame:
    """R11 sequential form — the reference updates CTR impression by
    impression during serving (AdsRanker.java:345-377 + the
    QueryHandler click loop), so the batch replay is an ORDERED fold per
    (keyword, ad_key): ctr_{i} = min(1.0, ctr_{i-1} ± ctr_{i-1}/10),
    starting from the 0.1 prior, impressions ordered by (ts, event_id).

    One groupBy, then the fold runs as a JVM higher-order ``aggregate``
    over the key's time-sorted impression array — whole-stage codegen, no
    Python (an applyInPandas version was 10x slower on many small
    groups).  The per-key array is the state a sequential fold inherently
    needs; a deployment with unbounded per-key impression counts
    pre-aggregates by time slice first.  The streaming twin (same math,
    live state) is streaming.stream.ctr_state_stream."""
    chain = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "clicked"))
    )
    folded = F.aggregate(
        chain,
        F.lit(float(prior)),
        lambda acc, x: F.least(
            F.lit(1.0),
            F.when(x["clicked"], acc + acc / 10).otherwise(acc - acc / 10),
        ),
    )
    return impressions.groupBy("keyword", "ad_key").agg(
        folded.alias("ctr"),
        F.count(F.lit(1)).cast("long").alias("n_impressions"),
    )


def ctr_update(ctr: DataFrame, impressions: DataFrame) -> DataFrame:
    """R11 — impressions (keyword, ad_key, clicked bool); new ctr =
    clamp(ctr ± ctr/10, <= 1.0).  Rows without an impression pass through
    unchanged; impressions for unseen (keyword, ad_key) initialize at the
    0.1 prior BEFORE the update (QueryHandler.java:236-257 order)."""
    base = ctr.join(impressions, ["keyword", "ad_key"], "full").select(
        "keyword",
        "ad_key",
        F.coalesce("ctr", F.lit(DEFAULT_CTR)).alias("ctr0"),
        "clicked",
    )
    updated = F.when(
        F.col("clicked").isNull(), F.col("ctr0")
    ).otherwise(
        F.least(
            F.lit(1.0),
            F.when(
                F.col("clicked"), F.col("ctr0") + F.col("ctr0") / 10
            ).otherwise(F.col("ctr0") - F.col("ctr0") / 10),
        )
    )
    return base.select("keyword", "ad_key", updated.alias("ctr"))
