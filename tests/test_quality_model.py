"""Hashed linear quality classifier + Gopher rule battery.

The load-bearing test is twin lockstep: the distributed trainer
(operators/quality_model.train_lr) and the sequential numpy twin
(oracle/quality_lr.train_local) must produce bit-identical weight
vectors — that equality is what lets the driver gate embed twin-trained
weights as oracle-SQL literals (plans/registry_quality.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from websearchengine_spark.oracle import quality_lr
from websearchengine_spark.operators import corpus_stats, quality_model

SF001 = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(SF001).cache()


@pytest.fixture(scope="module")
def trained(spark, docs):
    feats = quality_model.hashed_features(docs)
    w = quality_model.train_lr(feats, quality_model.rule_labels(docs))
    return feats, w


def test_distributed_train_equals_numpy_twin(trained):
    _, w = trained
    w_twin = quality_lr.train_from_parquet(
        SF001,
        quality_model.CLF_DIM,
        quality_model.CLF_ITERS,
        quality_model.CLF_LR,
        quality_model.CLF_ROUND,
    )
    assert w.shape == w_twin.shape
    assert np.array_equal(w, w_twin), (
        f"max abs diff {np.max(np.abs(w - w_twin))}"
    )


def test_train_is_deterministic_across_runs(docs, trained):
    feats2 = quality_model.hashed_features(docs)
    w2 = quality_model.train_lr(
        feats2, quality_model.rule_labels(docs)
    )
    assert np.array_equal(trained[1], w2)


def test_train_join_path_matches_inline_path(docs, trained, monkeypatch):
    """The two physical strategies (single-job inline iterations vs the
    production-width broadcast-join loop) must walk one trajectory:
    force the join path at the gate dim and require bit-identical
    weights."""
    monkeypatch.setattr(quality_model, "CLF_INLINE_MAX_DIM", 0)
    w_join = quality_model.train_lr(
        quality_model.hashed_features(docs), quality_model.rule_labels(docs)
    )
    assert np.array_equal(trained[1], w_join)


def test_classifier_learns_the_label_rule(docs, trained):
    feats, w = trained
    scored = quality_model.score_lr(feats, w)
    joined = scored.join(quality_model.rule_labels(docs), "doc_id")
    acc = joined.select(
        F.avg(
            ((F.col("pred") == 1) == (F.col("y") == 1.0)).cast("double")
        ).alias("acc")
    ).head()["acc"]
    # the rule is a linear threshold over the marker terms' hash
    # buckets, so LR should recover it almost exactly (collision noise)
    assert acc >= 0.9, f"train accuracy {acc}"


def test_score_matches_manual_numpy(docs, trained):
    feats, w = trained
    rows = feats.collect()
    ids = sorted({r["doc_id"] for r in rows})
    pos = {d: i for i, d in enumerate(ids)}
    dim = quality_model.CLF_DIM
    X = np.zeros((len(ids), dim + 1))
    for r in rows:
        f = dim if r["fid"] == quality_model.BIAS_FID else r["fid"]
        X[pos[r["doc_id"]], f] = r["x"]
    expect = np.round(1.0 / (1.0 + np.exp(-(X @ w))), 6)
    got = {
        r["doc_id"]: r["score"]
        for r in quality_model.score_lr(feats, w).collect()
    }
    assert all(got[d] == expect[pos[d]] for d in ids)


def test_bias_feature_present_for_every_doc(docs):
    feats = quality_model.hashed_features(docs)
    n_docs = docs.count()
    n_bias = feats.where(
        F.col("fid") == quality_model.BIAS_FID
    ).count()
    assert n_bias == n_docs
    # token features are L1-normalized: sum of x per doc = 1 (+1 bias)
    sums = (
        feats.groupBy("doc_id")
        .agg(F.round(F.sum("x"), 9).alias("s"))
        .select(F.min("s").alias("lo"), F.max("s").alias("hi"))
        .head()
    )
    assert sums["lo"] == sums["hi"] == 2.0


def test_gopher_flags_on_crafted_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs back to "
        "the barn with great speed that nobody could have expected from "
        "such a small animal on this fine morning in the countryside"
    )
    df = spark.createDataFrame(
        [
            (0, good),  # passes every rule (33 words with min_words=20)
            (1, "short text"),  # word count floor
            (2, "\n".join(f"- the item {i} of that" for i in range(8))),  # bullets
            (3, good + " ###### ##### #### ### ## #"),  # symbol ratio
            (4, "za zb zc " * 20),  # no stopwords, mean_wl < 3
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in corpus_stats.gopher_quality_flags(
            df, min_words=20
        ).collect()
    }
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["bullet_ratio"] == 1.0 and out[2]["keep"] is False
    assert out[3]["symbol_ratio"] > 0.1 and out[3]["keep"] is False
    assert out[4]["n_stops"] == 0 and out[4]["keep"] is False
    assert out[0]["n_stops"] >= 2 and out[0]["alpha_frac"] == 1.0


def test_gopher_ellipsis_and_alpha_rules(spark):
    lines_ell = "\n".join(["this line trails off..."] * 8 + ["plain"])
    numeric = ("12 34 " * 30) + "the of and that"
    df = spark.createDataFrame(
        [(0, lines_ell), (1, numeric)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in corpus_stats.gopher_quality_flags(
            df, min_words=2
        ).collect()
    }
    assert out[0]["ellipsis_ratio"] > 0.3 and out[0]["keep"] is False
    assert out[1]["alpha_frac"] < 0.8 and out[1]["keep"] is False


def test_pipeline_optional_quality_stages(spark, docs):
    from websearchengine_spark.operators import pipeline as pl

    report = {}
    out = pl.run_pipeline(
        docs.select("doc_id", "text"),
        gopher=True,
        gopher_min_words=5,
        gopher_min_stops=0,  # the synthetic vocab carries only 'the'
        classifier_threshold=0.2,
        bpe_report=True,
        report=report,
    )
    n_out = out.count()
    out.unpersist()
    # the extra stages filter but must not empty the corpus, and the
    # BPE budget covers every surviving token at least once
    assert 0 < n_out <= report["after_near_dedup"]
    assert report["after_quality"] <= report["after_near_dedup"]
    assert report["bpe_subword_tokens"] > 0
    # defaults-off path unchanged: no optional keys leak into STAGES
    assert set(pl.STAGES).issubset(report.keys() | {"n_bins"})


def test_mapside_scorer_matches_join_scorer(docs, trained):
    feats, w = trained
    joined = quality_model.score_lr(feats, w).join(
        docs.select(
            "doc_id",
            quality_model.score_text_expr(w).alias("score2"),
        ),
        "doc_id",
    )
    rows = joined.select(
        F.max(F.abs(F.col("score") - F.col("score2"))).alias("d")
    ).head()
    # identical up to float-sum order inside the 6-dp rounding
    assert rows["d"] <= 1e-6


def test_dataset_split_deterministic_and_leak_safe(spark, docs):
    out1 = corpus_stats.dataset_split(docs).collect()
    got = {r["doc_id"]: r["split"] for r in out1}
    n = len(got)
    from collections import Counter

    c = Counter(got.values())
    assert set(c) <= {"train", "val", "test"} and c["train"] > c["val"]
    # membership is a pure function of doc_id: a doc keeps its split
    # when the corpus around it changes (the anti-leak invariant)
    half = docs.where(F.col("doc_id") % 2 == 0)
    got_half = {
        r["doc_id"]: r["split"]
        for r in corpus_stats.dataset_split(half).collect()
    }
    assert all(got[d] == s for d, s in got_half.items())
    assert n == docs.count()


def test_source_weighted_sample_rates_and_temperature(spark):
    rows = [(i, f"src{i % 2}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"src0": 1.0, "src1": 0.25}
    cold = corpus_stats.source_weighted_sample(df, w, temperature=1.0)
    kept = {
        r["source"]: r["k"]
        for r in cold.groupBy("source")
        .agg(F.sum(F.col("is_kept").cast("int")).alias("k"))
        .collect()
    }
    # heaviest source keeps everything; the other thins at ~w ratio
    assert kept["src0"] == 1000
    assert 180 <= kept["src1"] <= 320
    hot = corpus_stats.source_weighted_sample(df, w, temperature=4.0)
    kept_hot = {
        r["source"]: r["k"]
        for r in hot.groupBy("source")
        .agg(F.sum(F.col("is_kept").cast("int")).alias("k"))
        .collect()
    }
    # temperature flattens the mix toward uniform: 0.25^(1/4) ~ 0.707
    assert kept_hot["src1"] > kept["src1"]
