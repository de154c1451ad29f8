"""Corpus-level statistics operators for LLM training-data pipelines.

Beyond per-doc filters (lang_id / quality_score / token_count in the
registry), a data pipeline needs corpus-shape statistics before training:

- ``ngram_counts`` — global n-gram frequencies (vocabulary curricula,
  tokenizer training, heavy-hitter analysis).  Map-side n-gram generation
  from the token array (one ``transform`` over slice offsets — no join,
  no window), then ONE groupBy; the same (key-bounded aggregation)
  shuffle shape as term_stats, so it scales the same way.
- ``repetition_scores`` — per-doc duplicate n-gram fraction, the Gopher /
  MassiveText repetition filter: score = 1 - distinct/total n-grams.
  Explode + one groupBy(doc); no cross-doc state.
- ``contamination_overlap`` — benchmark-decontamination screen: flag docs
  sharing n-grams with a probe set (the standard train/test overlap
  check).  The probe set is driver-size by construction (a benchmark is
  tiny next to a corpus); it broadcasts into an ``isin`` filter that
  prunes BEFORE the aggregation, so the shuffle carries only hits.
- ``source_mix`` — per-source doc/token/char mixture report (the data-mix
  table every training run is configured from).  One groupBy(source).

All are pure Catalyst column expressions over the SQL-expressible gate
tokenizer (dedup.tokens_col) — no UDFs — and each has a DuckDB oracle in
plans/registry_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import tokens_col


def _toks_clean() -> F.Column:
    return F.filter(tokens_col(), lambda x: x != F.lit(""))


def _bind(expr: F.Column, fn) -> F.Column:
    """Evaluate ``expr`` ONCE and pass the result to ``fn`` as a lambda
    variable.  Catalyst does not share common subexpressions across the
    body of a higher-order-function lambda: an expensive array expression
    (the regex token split) referenced k times inside a ``transform``
    lambda is re-evaluated k times PER ELEMENT — measured 25x slowdown on
    the trigram builder.  ``element_at(transform(array(e), fn), 1)``
    binds e to a lambda variable, which IS shared; everything stays a
    pure codegen column expression."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def ngrams_col(n: int) -> F.Column:
    """array<string> of space-joined word n-grams — map-side transform
    over slice offsets of the token array (no explode-join).  The
    short-doc branch must be explicit: ``sequence(0, -1)`` would count
    DOWN ([0, -1]), not produce an empty array.  The token array is
    bound once (``_bind``) so the regex split is NOT re-run per
    element_at."""

    def grams_of(toks: F.Column) -> F.Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
            ),
        )
        return F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return _bind(_toks_clean(), grams_of)


def ngram_counts(docs: DataFrame, n: int = 2, k: int = 100) -> DataFrame:
    """(ngram, cnt, df) — top-k corpus n-grams by total count (ties:
    ngram asc).  df = number of docs containing the n-gram."""
    grams = docs.select(
        "doc_id", F.explode(ngrams_col(n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.count_distinct("doc_id").cast("long").alias("df"),
        )
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def repetition_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, rep_score) — duplicate n-gram
    fraction per doc (Gopher repetition filter); docs shorter than n
    tokens score 0 with n_ngrams = 0.

    Pure map-side projection: the score depends only on each doc's own
    gram array (already materialized by ``ngrams_col``), so both counts
    are column expressions — ``size(grams)`` / ``size(array_distinct(
    grams))`` — with zero explode and zero shuffle.  At corpus scale an
    explode + groupBy formulation would shuffle O(total tokens) rows to
    recompute a per-row fact."""
    grams = F.explode(F.array(ngrams_col(n)))
    base = docs.select("doc_id", grams.alias("grams")).select(
        "doc_id",
        F.size("grams").cast("long").alias("n_ngrams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
    )
    score = F.when(
        F.col("n_ngrams") > 0,
        F.round(1.0 - F.col("n_distinct") / F.col("n_ngrams"), 6),
    ).otherwise(F.lit(0.0))
    return base.select("doc_id", "n_ngrams", "n_distinct",
                       score.alias("rep_score"))


def chunks_col(width: int) -> F.Column:
    """array<string> of NON-OVERLAPPING ``width``-token chunks (the last
    chunk may be short) — map-side slice transform over the token array,
    no explode until the caller needs rows.  Same empty-doc guard as
    ``ngrams_col``: ``sequence(0, -1)`` counts DOWN, so the zero-token
    branch must return an empty array explicitly; same ``_bind`` guard:
    the token split evaluates once, not once per slice."""

    def chunks_of(toks: F.Column) -> F.Column:
        n = F.size(toks)
        chunks = F.transform(
            F.sequence(F.lit(0), F.floor((n - 1) / width).cast("int")),
            lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
        )
        return F.when(n > 0, chunks).otherwise(
            F.array().cast("array<string>")
        )

    return _bind(_toks_clean(), chunks_of)


def chunk_dedup(docs: DataFrame, width: int = 10) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_chunk_frac) — chunk-level
    exact dedup stats: the token stream splits into non-overlapping
    ``width``-token chunks; a chunk occurrence is duplicated when its
    text appears in >= 2 DISTINCT docs (the RefinedWeb / CCNet
    line-dedup analogue for text without line structure; boilerplate —
    headers, navigation, license blocks — shows up as high
    ``dup_chunk_frac`` even when whole-doc dedup misses it).

    Scale shape: chunk fingerprints are md5 (cross-engine stable), the
    cross-corpus count is one key-bounded groupBy with partial
    aggregation (hot boilerplate chunks combine map-side), and the
    per-doc rollup joins fingerprint counts back before a second
    key-bounded groupBy — two shuffles total, both on bounded keys,
    never a window over the corpus."""
    ch = docs.select(
        "doc_id", F.explode(chunks_col(width)).alias("chunk")
    ).select("doc_id", F.md5(F.col("chunk").cast("binary")).alias("fp"))
    counts = ch.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_doc = (
        ch.join(counts, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
    )
    frac = F.when(
        F.col("n_chunks") > 0,
        F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6),
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .fillna({"n_chunks": 0, "n_dup_chunks": 0})
        .select(
            "doc_id", "n_chunks", "n_dup_chunks",
            frac.alias("dup_chunk_frac"),
        )
    )


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, url, canonical_url, n_same_canon, is_kept) — URL-level
    dedup, the cheap pass BEFORE any content dedup in a crawl pipeline:
    the same page crawled under `HTTP://WWW.x.COM:80/a/?b=2&a=1` and
    `http://www.x.com/a?a=1&b=2` collapses to one canonical key
    (functions/urlnorm.canonical_url — pure codegen expressions, no
    UDF).  ``is_kept`` marks the min-doc_id row per canonical URL.
    One key-bounded groupBy on the canonical key + one join back —
    at crawl scale the groupBy partial-aggregates the (hot) duplicate
    keys map-side."""
    from websearchengine_spark.functions.urlnorm import canonical_url

    base = pages.select(
        "doc_id",
        F.col(url_col).alias("url"),
        canonical_url(url_col).alias("canonical_url"),
    )
    sizes = base.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_same_canon"),
        F.min("doc_id").alias("_canon_doc"),
    )
    return base.join(sizes, "canonical_url").select(
        "doc_id",
        "url",
        "canonical_url",
        "n_same_canon",
        (F.col("doc_id") == F.col("_canon_doc")).alias("is_kept"),
    )


def contamination_overlap(
    docs: DataFrame, probes: list[str], n: int = 5, isin_max: int = 256
) -> DataFrame:
    """(doc_id, n_hits, n_probes_hit) — docs sharing any probe n-gram.
    ``probes`` is the benchmark's n-gram set (driver-size by
    construction).  Small sets compile into an ``isin`` filter pushed
    below the aggregation; larger ones become a broadcast-hash semi-side
    join instead — thousands of In-literals bloat the codegen'd predicate,
    while a broadcast hash lookup costs O(1) per gram.  Either way
    non-hits never reach the shuffle."""
    grams = docs.select("doc_id", F.explode(ngrams_col(n)).alias("g"))
    if len(probes) <= isin_max:
        hits = grams.where(F.col("g").isin(probes))
    else:
        spark = docs.sparkSession
        pdf = spark.createDataFrame([(p,) for p in probes], "g string")
        hits = grams.join(F.broadcast(pdf), "g", "left_semi")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.count_distinct("g").cast("long").alias("n_probes_hit"),
    )


def probe_ngrams_of_doc(docs: DataFrame, doc_id: int, n: int = 5) -> list[str]:
    """Deterministic probe set: the distinct n-grams of one document
    (stands in for a held-out benchmark; bounded by that doc's length)."""
    row = (
        docs.where(F.col("doc_id") == doc_id)
        .select(F.array_distinct(ngrams_col(n)).alias("g"))
        .head()
    )
    return sorted(row.g) if row else []


def stratified_sample(
    docs: DataFrame, rates: dict[str, float], seed: int = 42
) -> DataFrame:
    """Deterministic per-source downsampling — the mixture-reweighting
    step a training run applies after reading the ``source_mix`` report.
    A doc survives iff md5(doc_id|seed)'s 60-bit prefix falls under its
    source's rate: exact, seed-stable, order-independent, and identical
    in any engine (md5 is the cross-engine hash used by every gate —
    xxhash64 differs between Spark and DuckDB).  Unlisted sources drop.
    One map-side filter; no shuffle, no sampling state."""
    from websearchengine_spark.operators.dedup import md5_60

    u = md5_60(
        F.concat(F.col("doc_id").cast("string"), F.lit(f"|{seed}"))
    ) / F.lit(float(1 << 60))
    rate = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(float(r)))]
    )[F.col("source")]
    return docs.where(rate.isNotNull() & (u < rate))


def sequence_pack(
    docs: DataFrame, budget: int = 2048, n_parts: int | None = None
) -> DataFrame:
    """(doc_id, n_tokens, bin_id) — token-budget packing for LM training:
    docs in doc_id order accumulate into ``budget``-token bins with
    bin_id = floor(exclusive_prefix_sum / budget).

    This is the SCALABLE packing rule rather than greedy first-fit: a
    doc whose tokens straddle a boundary is charged to the bin where its
    prefix starts, so bins can overflow by at most one doc — the
    standard approximation when packing 10^12 docs, where a sequential
    greedy pass cannot run.  The global prefix sum is distributed over
    DETERMINISTIC doc_id range buckets: the bucket boundaries are
    computed once (percentile sketch), collected, and embedded as
    LITERALS in both downstream jobs, so the totals pass and the
    assignment pass are guaranteed to see identical bucket contents.
    (``repartitionByRange`` would NOT guarantee that: RangePartitioner
    re-samples with an RDD-id-dependent seed on each execution, so two
    jobs over the same uncached plan can disagree on boundaries and
    silently mis-bin.)  The totals pass is an exact ``groupBy(pid)``
    (n_parts driver rows); assignment is one ``applyInPandas`` per
    bucket computing the local exclusive prefix against its broadcast
    offset — never a single-partition window."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = docs.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    toks = _toks_clean()
    sized = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))

    # bucket boundaries: any split works as long as BOTH passes use the
    # same one, so approx percentiles are fine — they become literals.
    qs = [i / n_parts for i in range(1, n_parts)]
    brow = sized.select(
        F.percentile_approx("doc_id", qs).alias("b")
    ).head()
    bounds = sorted({int(b) for b in (brow.b if brow and brow.b else [])})
    if bounds:
        barr = F.array(*[F.lit(b).cast("long") for b in bounds])
        pid = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("doc_id") > b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        pid = F.lit(0)
    sized = sized.withColumn("pid", pid.cast("int"))

    totals = sorted(
        sized.groupBy("pid").agg(F.sum("n_tokens").alias("total")).collect(),
        key=lambda r: r.pid,
    )
    offsets = {}
    acc = 0
    for r in totals:
        offsets[r.pid] = acc
        acc += int(r.total or 0)
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("n_tokens", T.LongType()),
         T.StructField("bin_id", T.LongType())]
    )

    def _assign(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("doc_id")
        n = pdf["n_tokens"].to_numpy()
        run = boff.value.get(int(pdf["pid"].iloc[0]), 0)
        prefix = run + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "n_tokens": pdf["n_tokens"],
             "bin_id": (prefix // budget).astype("int64")}
        )

    return sized.groupBy("pid").applyInPandas(_assign, out_schema)


def source_mix(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens, n_chars, avg_chars) — the per-domain
    mixture table a training run's sampling weights are set from."""
    toks = _toks_clean()
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style LM quality scoring: per-doc perplexity under an
    add-``alpha``-smoothed bigram language model trained on
    ``train_docs`` (default: the scored corpus itself — the standard
    self-perplexity outlier filter; pass a clean reference corpus for
    CCNet's "score against Wikipedia" variant).

    Model: P(v|u) = (C(u,v) + alpha) / (C(u) + alpha * V), with C from
    the training corpus, C(u) = sum_v C(u,v), and V = training vocabulary
    size.  Held-out scoring honors the add-alpha model exactly: a bigram
    absent from training whose context u IS in training scores
    ln(alpha / (C(u) + alpha*V)) (the smoothed unseen-pair mass — so
    P(.|u) still normalizes); only a bigram whose context never occurs
    in training falls back to the uniform ln(1/V).  Doc score = mean
    ln P over its bigrams; ppl = exp(-mean).  Returns (doc_id,
    n_bigrams, avg_logprob, ppl) for EVERY doc (short docs: 0 bigrams,
    0.0 scores).

    Scale shape: bigram generation is the map-side ``ngrams_col``
    transform; model counts are two key-bounded aggregations (distinct
    bigrams / distinct contexts — Zipf-bounded, the term_stats shape);
    V rides along as a broadcast 1-row cross join, never a driver
    scalar.  The scoring join keys on the bigram string — hot function
    words skew it, which is exactly the AQE skew-join case (the prob
    side is small per key: one row), and the per-doc reduce combines
    map-side.  Rounding: avg_logprob at 6 dp, ppl at 4 dp — the sum of
    ~1e2 logs carries ~1e-12 float-order noise, far below both grids.
    """
    self_scoring = train_docs is None
    if train_docs is None:
        train_docs = docs
    grams_t = train_docs.select(F.explode(ngrams_col(2)).alias("bg"))
    bgc = grams_t.groupBy("bg").agg(
        F.count(F.lit(1)).cast("long").alias("c_bg")
    )
    ctx = (
        bgc.groupBy(F.split(F.col("bg"), " ")[0].alias("u"))
        .agg(F.sum("c_bg").alias("c_u"))
    )
    voc = (
        train_docs.select(F.explode(_toks_clean()).alias("tk"))
        .agg(F.count_distinct("tk").cast("long").alias("v"))
    )
    probs = (
        bgc.join(ctx, F.split(F.col("bg"), " ")[0] == F.col("u"))
        .crossJoin(F.broadcast(voc))
        .select(
            "bg",
            F.log(
                (F.col("c_bg") + F.lit(alpha))
                / (F.col("c_u") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    grams = docs.select("doc_id", F.explode(ngrams_col(2)).alias("bg"))
    # two-level fallback: (1) seen bigram -> its smoothed logp; (2) unseen
    # bigram, seen context -> ln(alpha/(C(u)+alpha*V)) via a second left
    # join on the context token (null middle arm falls through coalesce);
    # (3) unseen context -> uniform ln(1/V).  Self-scoring can never
    # leave level 1 (every scored bigram is in the model), so the extra
    # context join — a second shuffle of the largest intermediate — is
    # built only for the held-out variant.
    scored = grams.join(probs, "bg", "left")
    if self_scoring:
        fallback = [-F.log(F.col("v"))]  # unreachable, keeps types fixed
    else:
        scored = scored.join(
            ctx.withColumnRenamed("u", "_ctx_u"),
            F.split(F.col("bg"), " ")[0] == F.col("_ctx_u"),
            "left",
        )
        fallback = [
            F.log(
                F.lit(alpha) / (F.col("c_u") + F.lit(alpha) * F.col("v"))
            ),
            -F.log(F.col("v")),
        ]
    per = (
        scored.crossJoin(F.broadcast(voc))
        .select(
            "doc_id",
            F.coalesce(F.col("logp"), *fallback).alias("logp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("logp").alias("s"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.round(F.col("s") / F.col("n_bigrams"), 6),
            ).otherwise(F.lit(0.0)).alias("avg_logprob"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.round(F.exp(-F.col("s") / F.col("n_bigrams")), 4),
            ).otherwise(F.lit(0.0)).alias("ppl"),
        )
    )


def line_dedup(docs: DataFrame, min_docs: int = 5) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a LINE (newline-split)
    that occurs in >= ``min_docs`` distinct documents is boilerplate
    ("accept all cookies", nav bars, copyright footers) and is stripped
    from every document; the cleaned text preserves the surviving lines
    in original order.

    Returns (doc_id, n_lines, n_dropped, text_clean) for every doc
    (fully-boilerplate docs come back with text_clean = '').

    Scale shape: lines shuffle once keyed by their md5 fingerprint (the
    16-byte key, not the line text, rides the wire for the frequency
    pass), the frequent-fp set is the anti-join side (bounded above by
    total_lines / min_docs and in practice tiny — that is what makes a
    line "boilerplate"), and reassembly is one groupBy(doc_id) with a
    map-side-combined collect_list.  This is the chunk_dedup shuffle
    shape with a rewrite stage on top."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
    ).withColumn("fp", F.md5(F.col("line")))
    freq = (
        lines.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("fp")
    )
    kept = lines.join(freq, "fp", "left_anti")
    tot = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    return (
        tot.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (
                F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_dropped"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def domain_cap(
    pages: DataFrame,
    cap: int = 100,
    url_col: str = "url",
    n_parts: int | None = None,
) -> DataFrame:
    """Per-domain contribution cap: keep at most ``cap`` docs per host
    (lowest doc_id first — deterministic), the standard guard against a
    single crawler-trap domain dominating a training mix.

    Returns (doc_id, url, host, host_docs, host_rank, is_kept) for every
    page.

    Skew shape: a host window CANNOT be AQE-skew-split (AQE splits
    skewed JOIN partitions; a window partition is atomic), so a naive
    ``Window.partitionBy(host)`` turns a crawler-trap host with 10^8
    pages into one straggler task.  This implementation bounds every
    per-task group instead:

    - hosts at or under the cap (the overwhelming majority) rank via a
      host window whose partitions are <= ``cap`` rows BY CONSTRUCTION —
      no mega-partition can exist on this side;
    - over-cap hosts rank via a two-level prefix scheme (the
      sequence_pack pattern): doc_ids bucket by global percentile
      boundaries computed once and embedded as LITERALS (both passes see
      identical buckets), per-(host, bucket) counts roll up into
      exclusive prefix offsets through a window whose partitions are
      <= ``n_parts`` rows per host, and the final rank is that offset
      plus a row_number over (host, bucket) — a group bounded by the
      GLOBAL bucket size ~N/n_parts regardless of how big the host is.

    Everything stays JVM-side codegen; the only driver traffic is the
    percentile-boundary literal list (n_parts - 1 longs)."""
    from pyspark.sql import Window

    from websearchengine_spark.functions.urlnorm import host_of

    spark = pages.sparkSession
    # NULL hosts (null/unparseable url) coalesce to one '' group: the
    # count equi-join below would silently drop NULL keys, breaking the
    # every-page contract
    base = pages.select("doc_id", url_col).withColumn(
        "host", F.coalesce(host_of(url_col), F.lit(""))
    )
    counts = base.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("host_docs")
    )
    j = base.join(counts, "host")
    under = j.where(F.col("host_docs") <= cap)
    over = j.where(F.col("host_docs") > cap)

    # under-cap hosts: window partitions bounded by cap
    w_small = Window.partitionBy("host").orderBy("doc_id")
    small = under.withColumn(
        "host_rank", F.row_number().over(w_small).cast("long")
    )

    # over-cap hosts: percentile-bucketed distributed prefix rank
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    qs = [i / n_parts for i in range(1, n_parts)]
    brow = over.select(F.percentile_approx("doc_id", qs).alias("b")).head()
    bounds = sorted(
        {int(b) for b in (brow.b or []) if b is not None}
    ) if brow else []
    if bounds:
        barr = F.array(*[F.lit(b).cast("long") for b in bounds])
        pid = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("doc_id") > b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        pid = F.lit(0)
    overp = over.withColumn("pid", pid.cast("int"))
    cnts = overp.groupBy("host", "pid").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        Window.partitionBy("host")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.select(
        "host",
        "pid",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off"),
    )
    w_loc = Window.partitionBy("host", "pid").orderBy("doc_id")
    big = (
        overp.join(offs, ["host", "pid"])
        .withColumn(
            "host_rank",
            (F.col("off") + F.row_number().over(w_loc)).cast("long"),
        )
        .drop("pid", "off")
    )

    return small.unionByName(big).select(
        "doc_id",
        url_col,
        "host",
        "host_docs",
        "host_rank",
        (F.col("host_rank") <= cap).alias("is_kept"),
    )


CMS_WIDTH = 1024
CMS_DEPTH = 4


def _cms_buckets(term_col: F.Column, width: int, depth: int) -> F.Column:
    """array<long> of the term's counter index per sketch row — md5-based
    (the repo's cross-engine-stable hash family), one independent hash
    per row via the '|d' salt."""
    from websearchengine_spark.operators.dedup import md5_60

    return F.array(
        *[
            F.pmod(
                md5_60(F.concat(term_col, F.lit(f"|{d}"))), F.lit(width)
            )
            for d in range(depth)
        ]
    )


def cms_build(
    docs: DataFrame, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream: (row, bucket, cnt) with depth x width counters.

    The scale point: exact term counting shuffles one key per DISTINCT
    term (unbounded vocabulary — at web scale the n-gram key space
    explodes), while the sketch's shuffle is capped at depth x width
    rows REGARDLESS of corpus size, with the classic eps = e/width
    overcount bound.  Build is one explode + one bounded groupBy; the
    counters are additive, so per-partition sketches merge by summing —
    the same segment-merge property as the posting pipeline."""
    toks = docs.select(F.explode(_toks_clean()).alias("term"))
    return (
        toks.select(
            F.posexplode(
                _cms_buckets(F.col("term"), width, depth)
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(term, est) point estimates: min over the term's depth counters
    (0 when a counter row is absent).  est >= true count always; the
    join side is the bounded sketch, broadcastable at any corpus."""
    probes = terms.select(
        "term",
        F.posexplode(_cms_buckets(F.col("term"), width, depth)).alias(
            "row", "bucket"
        ),
    )
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


HLL_P = 12  # 4096 registers -> ~1.6% standard error


def hll_alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007) for m >= 128."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame, col: str = "term", p: int = HLL_P
) -> DataFrame:
    """HyperLogLog distinct-count estimate over a string column: one row
    (n_est).  The CMS companion for the other unbounded-key statistic —
    distinct tokens / urls / fingerprints at corpus scale without a
    count_distinct's full key shuffle.

    Layout on the repo's 60-bit md5 hash: low p bits pick the register,
    the remaining 60-p bits feed rho = leading-zero-count + 1 (bit
    length via base-2 string conv — minimal-form on both engines, so the
    DuckDB oracle is expression-for-expression identical).  Shuffle is
    capped at 2^p register rows; absent registers enter the harmonic
    sum as 2^0 and drive the small-range linear-counting branch.
    Registers merge by max, so per-partition sketches compose like the
    CMS counters.  Estimate is rounded to 4 dp (the double noise of a
    4096-term power-of-two sum is ~1e-13 relative)."""
    from websearchengine_spark.operators.dedup import md5_60

    m = 1 << p
    window = 60 - p
    h = md5_60(F.col(col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(window + 1)).otherwise(
        F.lit(window) - F.length(F.conv(w.cast("string"), 10, 2)) + 1
    )
    regs = (
        df.select(h.bitwiseAND(F.lit(m - 1)).alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("mx"))
    )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    e = F.lit(hll_alpha(m) * m * m) / (F.col("s") + (F.lit(m) - F.col("nz")))
    v = F.lit(m) - F.col("nz")
    est = F.when(
        (e <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(float(m)) / v)
    ).otherwise(e)
    return agg.select(F.round(est, 4).alias("n_est"))


BLOOM_M = 1 << 18  # bits (power of two; 256 Kbit -> 4096 packed longs)
BLOOM_K = 5        # hash functions


def bloom_size_for(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bit width sized to the history: at 16 bits/key and
    k=5 the false-positive rate is ~0.1%, vs ~44% if 100k keys were
    crammed into the fixed 256 Kbit default — callers that know their
    history count (cli --seen-history does a count anyway) should size
    the filter instead of trusting BLOOM_M."""
    m = BLOOM_M
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def _bloom_positions(key_col: F.Column, m: int, k: int) -> F.Column:
    """array<long> of the key's k bloom bit positions — Kirsch &
    Mitzenmacher (2006) double hashing pos_i = (h1 + i*h2) mod m with
    h2 forced odd (so it generates the whole power-of-two ring), both
    legs md5-derived (the repo's cross-engine-stable hash family).
    Operands are reduced mod m BEFORE the combine, so every
    intermediate stays < 8m and 64-bit arithmetic cannot overflow."""
    from websearchengine_spark.operators.dedup import md5_60

    h1 = F.pmod(md5_60(key_col), F.lit(m))
    h2 = F.pmod(md5_60(F.concat(key_col, F.lit("|b"))), F.lit(m)).bitwiseOR(
        F.lit(1)
    )
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]
    )


def bloom_build(
    keys: DataFrame, col: str = "key", m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Bloom filter over a key column as a DataFrame of packed 64-bit
    words: (word, bits), word = bit_position >> 6 — the seen-set sketch
    for incremental recrawl dedup (has this url/doc fingerprint been
    ingested before?) where an exact seen-set join would shuffle one row
    per HISTORICAL key.

    Scale shape (the CMS/HLL argument): the build is one map-side
    position explode + one groupBy(word) bit_or whose exchange is
    capped at m/64 rows REGARDLESS of history size; words with no set
    bit are simply absent.  Filters for different history shards merge
    by bit_or on word — the same additive-merge property as the CMS
    counters and HLL registers.  No false negatives ever; false
    positives at the classic (1 - e^(-kn/m))^k rate, all of them
    deterministic here because the hash family is seeded md5."""
    pos = keys.select(
        F.explode(_bloom_positions(F.col(col), m, k)).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    docs: DataFrame,
    col: str = "key",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """(doc_id, maybe_seen): probe every doc's key against a built
    filter.  maybe_seen = all k bit positions set — guaranteed true for
    any key the filter was built from.

    The probe side joins the BOUNDED filter (≤ m/64 rows, broadcast) on
    the packed-word index and folds per doc with bool_and — one
    broadcast hash join + one key-bounded aggregation, no shuffle of
    the history."""
    probes = docs.select(
        "doc_id",
        F.explode(_bloom_positions(F.col(col), m, k)).alias("pos"),
    ).select(
        "doc_id",
        F.shiftright(F.col("pos"), 6).alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        .alias("mask"),
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select("doc_id", hit.alias("hit"))
        .groupBy("doc_id")
        .agg(F.bool_and("hit").alias("maybe_seen"))
    )


def bloom_seen_filter(
    new_docs: DataFrame,
    hist_docs: DataFrame,
    key_expr: F.Column | None = None,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Incremental-crawl seen filter: (doc_id, maybe_seen, is_kept) for
    every row of ``new_docs``, where is_kept = the doc's key (default:
    raw text; pass e.g. a normalized-url column for url-seen) is
    definitely NOT in ``hist_docs``.  Docs whose key was seen are
    dropped with certainty (no false negatives); a deterministic
    (1-e^(-kn/m))^k sliver of genuinely-new docs is over-dropped — the
    standard bloom trade accepted by crawl frontiers in exchange for
    never shuffling the history."""
    if key_expr is None:
        key_expr = F.col("text")
    bloom = bloom_build(
        hist_docs.select(key_expr.alias("key")), m=m, k=k
    )
    probed = bloom_probe(
        bloom, new_docs.select("doc_id", key_expr.alias("key")), m=m, k=k
    )
    return probed.select(
        "doc_id",
        "maybe_seen",
        (~F.col("maybe_seen")).alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, MassiveText appendix A1.1)
# ---------------------------------------------------------------------------

GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPS = 2


def gopher_quality_flags(
    docs: DataFrame,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_stops: int = GOPHER_MIN_STOPS,
) -> DataFrame:
    """The Gopher / MassiveText document-quality rule battery as one
    map-side projection — zero shuffle, scan-speed at any corpus size
    (the same plan shape as repetition_scores/pii_redact).

    Per doc: word count in [min_words, max_words]; mean word length in
    [3, 10]; (hash + ellipsis)-to-word ratio <= 0.1; <= 90% of lines
    bullet-initial; <= 30% of lines ellipsis-final; >= 80% of words
    contain an alphabetic character; >= 2 of 8 common English stopwords
    present.  Words are whitespace tokens of the RAW text (punctuation
    kept — the symbol rules need it), unlike the index tokenizer.

    Every ratio is computed from the same integer operands on both
    engines and rounded to 6 dp, so the DuckDB oracle hashes identically.
    Thresholds for the repetition rule live separately in
    ``repetition_scores`` (this battery is the static-rule half)."""
    # explicit whitespace class: Java's \s and DuckDB/RE2's \s disagree
    # on vertical tab (\x0B), so both engines spell the class out
    words = F.filter(
        F.split(
            F.trim(
                F.regexp_replace(
                    F.col("text"), "[ \\t\\n\\x0B\\f\\r]+", " "
                )
            ),
            " ",
        ),
        lambda x: x != "",
    )
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda x: F.trim(x) != ""
    )
    n_words = F.size(words)
    nw_safe = F.greatest(n_words, F.lit(1))  # zero-word doc: ratios 0, not null
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wl = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / nw_safe
    n_hash = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "#", "")
    )
    n_ell = (
        F.length(F.col("text"))
        - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ell) / nw_safe
    bullet_ratio = F.size(
        F.filter(
            lines,
            lambda x: F.substring(F.trim(x), 1, 1).isin("-", "*", "•"),
        )
    ) / n_lines
    ellipsis_ratio = F.size(
        F.filter(lines, lambda x: F.trim(x).endswith("..."))
    ) / n_lines
    alpha_frac = F.size(
        F.filter(words, lambda x: x.rlike("[a-zA-Z]"))
    ) / nw_safe
    n_stops = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPS]),
        )
    )
    flags = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stops.cast("long").alias("n_stops"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WL, GOPHER_MAX_MEAN_WL
        )
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_ratio") <= GOPHER_MAX_BULLET_RATIO)
        & (F.col("ellipsis_ratio") <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("n_stops") >= min_stops)
    )
    return flags.select("*", keep.alias("keep"))


# ---------------------------------------------------------------------------
# dataset assembly: deterministic split + weighted source sampling
# ---------------------------------------------------------------------------

SPLIT_FRACS = (("train", 0.9), ("val", 0.05), ("test", 0.05))
_H60_RANGE = float(1 << 60)


def _unit_hash(key_col: F.Column, salt: str) -> F.Column:
    """Deterministic u in [0, 1): md5-60bit of (key || salt) scaled by
    2^60 — cross-engine identical (the md5_60 family), reshuffled by
    changing the salt, and independent of row order / partitioning (the
    property rand(seed) does NOT have on a cluster)."""
    from websearchengine_spark.operators.dedup import md5_60

    return md5_60(
        F.concat(key_col.cast("string"), F.lit("|" + salt))
    ) / F.lit(_H60_RANGE)


def dataset_split(
    docs: DataFrame,
    fracs: tuple = SPLIT_FRACS,
    salt: str = "split",
) -> DataFrame:
    """(doc_id, u, split) — deterministic train/val/test assignment by
    hashed doc_id against cumulative fractions.  Pure map-side
    projection; membership is a property of the doc_id alone, so a doc
    keeps its split across reruns, corpus growth, and repartitioning —
    the invariant that prevents silent train/test leakage when the
    corpus is rebuilt."""
    u = F.round(_unit_hash(F.col("doc_id"), salt), 9)
    expr = None
    acc = 0.0
    for name, frac in fracs:
        acc += frac
        cond = u < F.lit(acc)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return docs.select(
        "doc_id", u.alias("u"), expr.otherwise(fracs[-1][0]).alias("split")
    )


def source_weighted_sample(
    docs: DataFrame,
    weights: dict[str, float],
    temperature: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """(doc_id, source, keep_p, is_kept) — deterministic Bernoulli
    sampling with per-source rates, the data-mixing step that turns
    ``source_mix`` percentages into an actual training blend.

    keep_p = (w_source ** (1/temperature)) normalized by the max so the
    heaviest source keeps everything; temperature > 1 flattens the mix
    toward uniform (the multilingual-sampling trick).  The decision is
    a hash of doc_id — map-side, reproducible, order-independent."""
    t = max(temperature, 1e-9)
    powed = {s: w ** (1.0 / t) for s, w in weights.items()}
    mx = max(powed.values()) if powed else 1.0
    rates = {s: p / mx for s, p in powed.items()}
    keep_p = None
    for s, p in sorted(rates.items()):
        lit_p = F.lit(float(round(p, 9)))
        keep_p = (
            F.when(F.col("source") == s, lit_p)
            if keep_p is None
            else keep_p.when(F.col("source") == s, lit_p)
        )
    keep_p = (
        keep_p.otherwise(F.lit(0.0)) if keep_p is not None else F.lit(0.0)
    )
    u = F.round(_unit_hash(F.col("doc_id"), salt), 9)
    return docs.select(
        "doc_id",
        "source",
        keep_p.alias("keep_p"),
        (u < keep_p).alias("is_kept"),
    )
