"""Corpus-level training-data statistics (operators/corpus_stats.py):
hand-computed n-gram/repetition/contamination/mixture values on crafted
docs; the sf-scale DuckDB oracles live in the driver gate registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators import corpus_stats as CS


@pytest.fixture(scope="module")
def crafted(spark):
    rows = [
        (0, "a b c a b", "web", 9),
        (1, "a b a b a b", "web", 11),     # heavy bigram repetition
        (2, "x", "books", 1),               # shorter than any n-gram
        (3, "", "books", 0),                # empty text
        (4, "c a b c", "code", 7),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_ngrams_col_edges(spark, crafted):
    got = {
        r.doc_id: r.g
        for r in crafted.select(
            "doc_id", CS.ngrams_col(2).alias("g")
        ).collect()
    }
    assert got[0] == ["a b", "b c", "c a", "a b"]
    assert got[2] == []  # 1 token -> no bigrams (NOT a [0,-1] sequence)
    assert got[3] == []  # empty text
    assert got[4] == ["c a", "a b", "b c"]


def test_ngram_counts_values(spark, crafted):
    rows = {r.ngram: (r.cnt, r.df) for r in CS.ngram_counts(crafted, 2, 10).collect()}
    # "a b": doc0 x2, doc1 x3, doc4 x1 -> cnt 6, df 3
    assert rows["a b"] == (6, 3)
    assert rows["b a"] == (2, 1)
    assert rows["b c"] == (2, 2)


def test_repetition_scores_values(spark, crafted):
    got = {r.doc_id: r for r in CS.repetition_scores(crafted, 3).collect()}
    # doc1 trigrams: aba bab aba bab -> 4 total, 2 distinct -> 0.5
    assert (got[1].n_ngrams, got[1].n_distinct) == (4, 2)
    assert got[1].rep_score == pytest.approx(0.5)
    # short/empty docs present with zero score
    assert got[2].n_ngrams == 0 and got[2].rep_score == 0.0
    assert got[3].n_ngrams == 0 and got[3].rep_score == 0.0
    # doc0 trigrams: abc bca cab -> all distinct -> 0
    assert got[0].rep_score == 0.0


def test_contamination_overlap_planted(spark, crafted):
    probes = CS.probe_ngrams_of_doc(crafted, 0, 2)  # doc0's distinct bigrams
    assert probes == ["a b", "b c", "c a"]
    got = {r.doc_id: r for r in CS.contamination_overlap(crafted, probes, 2).collect()}
    assert got[0].n_hits == 4  # itself
    assert got[1].n_hits == 3 and got[1].n_probes_hit == 1   # "a b" x3
    assert got[4].n_hits == 3 and got[4].n_probes_hit == 3
    assert 2 not in got and 3 not in got  # no n-grams -> never flagged


def test_source_mix_values(spark, crafted):
    got = {r.source: r for r in CS.source_mix(crafted).collect()}
    assert got["web"].n_docs == 2 and got["web"].n_tokens == 11
    assert got["books"].n_docs == 2 and got["books"].n_tokens == 1
    assert got["web"].n_chars == 20
    assert got["code"].avg_chars == pytest.approx(7.0)


def test_stratified_sample_deterministic(spark, crafted):
    import hashlib

    got1 = {r.doc_id for r in CS.stratified_sample(
        crafted, {"web": 1.0, "books": 0.0}, seed=7).collect()}
    # rate 1.0 keeps every web doc, 0.0 drops all books, unlisted drops
    assert got1 == {0, 1}
    # threshold math matches the python oracle at a mid rate
    rates = {"web": 0.5, "books": 0.5, "code": 0.5}
    got = {r.doc_id for r in CS.stratified_sample(crafted, rates, seed=7).collect()}
    want = set()
    for doc_id, _t, src, _n in [(r.doc_id, r.text, r.source, r.n_chars)
                                for r in crafted.collect()]:
        u = int(hashlib.md5(f"{doc_id}|7".encode()).hexdigest()[:15], 16) / (1 << 60)
        if u < rates[src]:
            want.add(doc_id)
    assert got == want
    # seed-stable
    again = {r.doc_id for r in CS.stratified_sample(crafted, rates, seed=7).collect()}
    assert got == again


def test_sequence_pack_bins(spark, crafted):
    got = {r.doc_id: (r.n_tokens, r.bin_id)
           for r in CS.sequence_pack(crafted, budget=6).collect()}
    # token counts: doc0=5, doc1=6, doc2=1, doc3=0, doc4=4
    # exclusive prefix: 0, 5, 11, 12, 12 -> bins 0, 0, 1, 2, 2
    assert got == {0: (5, 0), 1: (6, 0), 2: (1, 1), 3: (0, 2), 4: (4, 2)}


def test_contamination_broadcast_path(spark, crafted):
    """A probe set above isin_max must switch to the broadcast semi-join
    and return identical results."""
    probes = CS.probe_ngrams_of_doc(crafted, 0, 2)
    small = {(r.doc_id, r.n_hits, r.n_probes_hit)
             for r in CS.contamination_overlap(crafted, probes, 2).collect()}
    big = {(r.doc_id, r.n_hits, r.n_probes_hit)
           for r in CS.contamination_overlap(crafted, probes, 2, isin_max=1).collect()}
    assert small == big and small


def test_sequence_pack_multi_bucket_matches_global_cumsum(spark, crafted):
    """With several range buckets the distributed exclusive prefix must
    equal the single global cumsum in doc_id order (the two-pass bucket
    boundaries are literals, so totals and assignment see identical
    buckets by construction)."""
    got = {r.doc_id: r.bin_id
           for r in CS.sequence_pack(crafted, budget=6, n_parts=3).collect()}
    rows = sorted(
        (r.doc_id, r.n_tokens)
        for r in CS.sequence_pack(crafted, budget=6, n_parts=1)
        .select("doc_id", "n_tokens").collect()
    )
    acc = 0
    want = {}
    for doc_id, n in rows:
        want[doc_id] = acc // 6
        acc += n
    assert got == want


def test_repetition_scores_plan_is_shuffle_free(spark, crafted):
    """The repetition filter is a per-row fact; its plan must contain no
    Exchange (a groupBy formulation would shuffle O(tokens) rows)."""
    plan = CS.repetition_scores(crafted, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bigram_lm_hand_case(spark):
    """Add-one bigram LM self-perplexity on a 3-doc corpus, hand math:
    V=4, C(a b)=3, C(b a)=1, C(b c)=1, C(a)=3, C(b)=2."""
    import math

    from websearchengine_spark.operators import corpus_stats

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in corpus_stats.bigram_lm_scores(docs).collect()}
    p_ab, p_ba, p_bc = 4 / 7, 2 / 6, 2 / 6
    m0 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    m1 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[0].n_bigrams == 3
    assert abs(out[0].avg_logprob - round(m0, 6)) < 1e-9
    assert abs(out[0].ppl - round(math.exp(-m0), 4)) < 1e-9
    assert out[1].n_bigrams == 2
    assert abs(out[1].ppl - round(math.exp(-m1), 4)) < 1e-9
    assert (out[2].n_bigrams, out[2].avg_logprob, out[2].ppl) == (0, 0.0, 0.0)


def test_bigram_lm_heldout_oov_fallback(spark):
    """Scoring a doc against a model trained elsewhere: a bigram whose
    context never occurs in training scores the uniform ln(1/V)."""
    import math

    from websearchengine_spark.operators import corpus_stats

    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame([(9, "q r")], "doc_id long, text string")
    r = corpus_stats.bigram_lm_scores(score, train_docs=train).collect()[0]
    assert r.n_bigrams == 1
    assert abs(r.avg_logprob - round(math.log(1 / 4), 6)) < 1e-9
    assert abs(r.ppl - 4.0) < 1e-9


def test_bigram_lm_heldout_seen_context_unseen_bigram(spark):
    """Held-out add-alpha semantics: an unseen bigram whose CONTEXT is in
    training scores ln(alpha/(C(u)+alpha*V)), not the uniform ln(1/V) —
    train corpus: V=4, C(a)=3, C(b)=2 (test_bigram_lm_hand_case counts).
    Doc 'a x b q' has bigrams (a x): unseen pair, seen context a ->
    ln(1/(3+4)); (x b): context x unseen in training? x IS in training
    vocab but never as a context (doc 'x' has no bigrams) -> ln(1/4);
    (b q): unseen pair, seen context b -> ln(1/(2+4))."""
    import math

    from websearchengine_spark.operators import corpus_stats

    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(9, "a x b q")], "doc_id long, text string"
    )
    r = corpus_stats.bigram_lm_scores(score, train_docs=train).collect()[0]
    assert r.n_bigrams == 3
    m = (math.log(1 / 7) + math.log(1 / 4) + math.log(1 / 6)) / 3
    assert abs(r.avg_logprob - round(m, 6)) < 1e-9
    assert abs(r.ppl - round(math.exp(-m), 4)) < 1e-9


def test_bigram_lm_heldout_conditional_normalizes(spark):
    """P(.|u) sums to 1 over the training vocabulary for a seen context:
    sum over seen pairs of (C(u,v)+1)/(C(u)+V) plus (V - n_seen) copies
    of 1/(C(u)+V) == 1.  Checked numerically via the engine's scores for
    context 'a' (seen pairs: only 'a b', C=3): a doc enumerating every
    (a, v) bigram must have exp(logp) summing to 1."""
    import math

    from websearchengine_spark.operators import corpus_stats

    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    # one doc per (a, v) bigram so each row's avg_logprob IS that
    # bigram's logp (vocab = a b c x)
    score = spark.createDataFrame(
        [(10, "a a"), (11, "a b"), (12, "a c"), (13, "a x")],
        "doc_id long, text string",
    )
    out = corpus_stats.bigram_lm_scores(score, train_docs=train).collect()
    total = sum(math.exp(r.avg_logprob) for r in out)
    assert abs(total - 1.0) < 1e-5


def test_bigram_lm_self_scores_repetitive_low(spark):
    """The filter's point: a repetitive doc is more predictable under
    the corpus LM than a token-soup doc of the same length."""
    from websearchengine_spark.operators import corpus_stats

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)]
        + [(100, "zebra quark mat the of plasma")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in corpus_stats.bigram_lm_scores(docs).collect()}
    assert out[0].ppl < out[100].ppl


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    """CMS guarantee: est >= exact for every term; with width >> distinct
    terms and 4 rows, the min over rows is exact on this corpus."""
    from websearchengine_spark.operators import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    exact = (
        docs.select(F.explode(corpus_stats._toks_clean()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    sk = corpus_stats.cms_build(docs)
    est = corpus_stats.cms_estimate(sk, exact.select("term"))
    joined = exact.join(est, "term").collect()
    assert joined
    assert all(r.est >= r.exact_cnt for r in joined)
    # sketch size is bounded by depth x width regardless of corpus
    assert sk.count() <= corpus_stats.CMS_WIDTH * corpus_stats.CMS_DEPTH


def test_cms_collisions_overcount_small_width(spark):
    """Width 2 forces collisions: totals are conserved per row and some
    term must overcount (pigeonhole on >2 distinct terms)."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    docs = spark.createDataFrame(
        [(0, "aa bb cc dd aa"), (1, "aa ee ff gg")],
        "doc_id long, text string",
    )
    sk = corpus_stats.cms_build(docs, width=2, depth=2)
    per_row = {
        r.row: r.total
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("total")).collect()
    }
    assert per_row == {0: 9, 1: 9}  # 9 tokens, conserved per sketch row
    exact = (
        docs.select(F.explode(corpus_stats._toks_clean()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    est = corpus_stats.cms_estimate(
        sk, exact.select("term"), width=2, depth=2
    )
    joined = exact.join(est, "term").collect()
    assert all(r.est >= r.exact_cnt for r in joined)
    assert any(r.est > r.exact_cnt for r in joined)


def test_hll_distinct_accuracy_and_determinism(spark):
    """HLL estimate within ~5 standard errors (4096 registers -> 1.6%)
    of the exact distinct count, and bit-identical across runs."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(corpus_stats._toks_clean()).alias("term"))
    exact = toks.agg(F.count_distinct("term")).head()[0]
    e1 = corpus_stats.hll_distinct(toks).head().n_est
    e2 = corpus_stats.hll_distinct(toks).head().n_est
    assert e1 == e2
    assert abs(e1 - exact) / exact < 0.08


def test_hll_registers_bounded_and_mergeable(spark):
    """The register relation never exceeds 2^p rows, and the union of
    two halves' registers max-merges to the full corpus's registers —
    the property that lets per-partition sketches compose."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats
    from websearchengine_spark.operators.dedup import md5_60

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(corpus_stats._toks_clean()).alias("term")
    )
    p = 6
    m = 1 << p

    def regs_of(df):
        h = md5_60(F.col("term"))
        w = F.shiftright(h, p)
        rho = F.when(w == 0, F.lit(60 - p + 1)).otherwise(
            F.lit(60 - p) - F.length(F.conv(w.cast("string"), 10, 2)) + 1
        )
        return (
            df.select(h.bitwiseAND(F.lit(m - 1)).alias("b"), rho.alias("r"))
            .groupBy("b")
            .agg(F.max("r").alias("mx"))
        )

    full = {r.b: r.mx for r in regs_of(toks).collect()}
    assert len(full) <= m
    a = {r.b: r.mx for r in regs_of(toks.where("doc_id % 2 = 0")).collect()}
    b = {r.b: r.mx for r in regs_of(toks.where("doc_id % 2 != 0")).collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == full


def test_bloom_no_false_negatives(spark):
    """Every key the filter was built from probes maybe_seen=true —
    the bloom guarantee the seen-filter's correctness rests on."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    keys = spark.range(200).select(
        F.concat(F.lit("doc body "), F.col("id")).alias("key")
    )
    bloom = corpus_stats.bloom_build(keys)
    probes = keys.select(
        F.monotonically_increasing_id().alias("doc_id"), "key"
    )
    out = corpus_stats.bloom_probe(bloom, probes).collect()
    assert len(out) == 200 and all(r.maybe_seen for r in out)


def test_bloom_bounded_and_fp_rate(spark):
    """The filter is <= m/64 rows regardless of history size, and at a
    deliberately small m the deterministic false-positive rate over
    unseen keys stays near the (1-e^(-kn/m))^k theory value."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    m, k, n = 4096, 5, 500
    hist = spark.range(n).select(
        F.concat(F.lit("seen "), F.col("id")).alias("key")
    )
    bloom = corpus_stats.bloom_build(hist, m=m, k=k)
    assert bloom.count() <= m // 64
    fresh = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("id")).alias("key"),
    )
    out = corpus_stats.bloom_probe(bloom, fresh, m=m, k=k).collect()
    fp = sum(1 for r in out if r.maybe_seen) / n
    # theory ~ (1-e^(-5*500/4096))^5 ~ 0.018; deterministic seeded md5
    assert fp < 0.1


def test_bloom_shard_merge_equals_union_build(spark):
    """Per-shard filters merged by bit_or(word) are EXACTLY the filter
    built over the union — the additive-merge property that lets a
    historical corpus build its seen-set incrementally."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    keys = spark.range(300).select(
        F.concat(F.lit("kk "), F.col("id")).alias("key"), "id"
    )
    a = corpus_stats.bloom_build(keys.where(F.col("id") % 2 == 0))
    b = corpus_stats.bloom_build(keys.where(F.col("id") % 2 == 1))
    merged = (
        a.unionAll(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    full = corpus_stats.bloom_build(keys)
    got = {(r.word, r.bits) for r in merged.collect()}
    want = {(r.word, r.bits) for r in full.collect()}
    assert got == want


def test_bloom_seen_filter_drops_planted_copies(spark):
    """End-to-end seen filter: planted exact copies of history docs are
    dropped with certainty; the output covers every new-batch row."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    hist = spark.createDataFrame(
        [(i, f"history document {i}") for i in range(50)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"brand new doc {i}") for i in range(50)]
        + [(200 + i, f"history document {i}") for i in range(0, 50, 5)],
        "doc_id long, text string",
    )
    out = corpus_stats.bloom_seen_filter(new, hist).collect()
    assert len(out) == 60
    by_id = {r.doc_id: r for r in out}
    for i in range(0, 50, 5):
        assert by_id[200 + i].maybe_seen and not by_id[200 + i].is_kept
