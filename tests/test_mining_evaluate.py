"""Unit tests for operators/mining.py (G1-G6) and operators/evaluate.py
(E1-E8) against pure-Python/numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [(i, f"Doc_{i:03d}") for i in range(20)], "doc_id long, url string"
    )


def test_pagerank_matches_numpy_jacobi(spark, tiny_docs):
    from websearchengine_spark.operators import mining

    edges = mining.synthetic_edges(tiny_docs, fanout=3)
    got = {r.doc_id: r.page_rank for r in mining.pagerank(tiny_docs, edges).collect()}

    n = 20
    e = {
        (s, (s * 31 + 7 * j) % n)
        for s in range(n)
        for j in range(1, 4)
        if s != (s * 31 + 7 * j) % n
    }
    out_deg = {}
    for s, _ in e:
        out_deg[s] = out_deg.get(s, 0) + 1
    pr = np.ones(n)
    for _ in range(2):
        nxt = np.full(n, 0.1 / n)
        for s, d in e:
            nxt[d] += 0.9 * pr[s] / out_deg[s]
        pr = nxt
    for i in range(n):
        assert got[i] == pytest.approx(round(pr[i], 9), abs=1e-9)


def test_extract_links_and_edges(spark):
    from websearchengine_spark.operators import mining

    corpus = spark.createDataFrame(
        [
            ("A", b'<html><a href="B">x</a> <A class="z" href="C">y</A> '
                  b'<a href="http://ext/z">ext</a></html>'),
            ("B", b'<html><a href="A">back</a><a href="A">again</a></html>'),
            ("C", b"<html>no links</html>"),
        ],
        "url string, html binary",
    )
    ids = spark.createDataFrame(
        [("A", 0), ("B", 1), ("C", 2)], "url string, doc_id long"
    )
    links = mining.extract_links(corpus)
    edges = {(r.src_id, r.dst_id) for r in mining.build_edges(ids, links).collect()}
    # href="http://ext/z" contains '/' so the reference regex rejects it
    assert edges == {(0, 1), (0, 2), (1, 0)}  # parallel B->A deduped


def test_numviews_last_match_wins(spark):
    from websearchengine_spark.operators import mining

    log = spark.createDataFrame(
        [("en", "A", 5, 0), ("en", "A", 9, 2), ("en", "B", 3, 1)],
        "lang string, article string, views long, line_no long",
    )
    docs = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "C")], "doc_id long, url string"
    )
    got = {r.doc_id: r.num_views for r in mining.numviews_from_log(log, docs).collect()}
    assert got == {0: 9, 1: 3, 2: 0}


def test_spearman_perfect_and_inverse(spark):
    from websearchengine_spark.operators import mining

    m = spark.createDataFrame(
        [(i, float(i), float(i * 2), float(-i)) for i in range(10)],
        "doc_id long, x double, y double, z double",
    )
    assert mining.spearman(m, "x", "y").head().rho == pytest.approx(1.0)
    assert mining.spearman(m, "x", "z").head().rho == pytest.approx(-1.0)


def test_global_ranks_heavy_ties_match_window(spark):
    """The distributed rank decomposition (value buckets + heavy-tie
    id-bucket splitting) must reproduce row_number over
    (value desc, doc_id asc) exactly, including when most rows tie on one
    value and thresholds force every branch (heavy set, id buckets,
    tiny n_parts) to engage."""
    import random

    from pyspark.sql import Window

    from websearchengine_spark.operators import mining

    rng = random.Random(11)
    rows = [
        (
            i * 7 % 9973,
            0.0 if rng.random() < 0.7 else round(rng.uniform(-3, 3), 2),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, x double")
    ib = sorted(
        int(v)
        for v in df.select(
            F.percentile_approx("doc_id", [0.25, 0.5, 0.75]).alias("b")
        ).head().b
    )
    got = mining._global_ranks(
        df, "x", "r", ib, heavy_thresh=20, n_parts=4
    )
    want = df.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("x"), F.asc("doc_id")))
        .alias("r0"),
    )
    assert got.join(want, "doc_id").filter("r <> r0").count() == 0


def test_global_ranks_adversarial_shapes(spark):
    """Degenerate frames that stress each branch of the decomposition:
    all rows tied (one mega-group), all values distinct (no ties at all),
    heavy group whose doc_ids cluster inside ONE id-bucket (boundaries
    can't balance it — exactness must still hold), value equal to a
    bucket boundary, and negative doubles."""
    from pyspark.sql import Window

    from websearchengine_spark.operators import mining

    frames = {
        "all_tied": [(i, 1.0) for i in range(60)],
        "all_distinct": [(i, float(i % 7) * 10 + i) for i in range(60)],
        "heavy_ids_clustered": (
            # heavy value 0.0 lives entirely in doc_id range [0, 30)
            [(i, 0.0) for i in range(30)]
            + [(i + 1000, float(i + 1)) for i in range(30)]
        ),
        "negatives_and_bounds": [
            (i, [-2.5, -1.0, 0.0, 1.0, 1.0, 2.5][i % 6]) for i in range(48)
        ],
    }
    for name, rows in frames.items():
        df = spark.createDataFrame(rows, "doc_id long, x double")
        ib_row = df.select(
            F.percentile_approx("doc_id", [1 / 3, 2 / 3]).alias("b")
        ).head()
        ib = sorted(int(v) for v in ib_row.b)
        got = mining._global_ranks(
            df, "x", "r", ib, heavy_thresh=8, n_parts=3
        )
        want = df.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("x"), F.asc("doc_id")))
            .alias("r0"),
        )
        bad = got.join(want, "doc_id").filter("r <> r0").count()
        assert bad == 0, f"{name}: {bad} rank mismatches"


def test_global_ranks_nulls_rank_last(spark):
    """Null metric values must rank after every non-null row ordered by
    doc_id — the replaced global window's DESC NULLS LAST — and spearman
    over a frame with nulls must equal the window formula, not silently
    drop the null rows."""
    from pyspark.sql import Window

    from websearchengine_spark.operators import mining

    rows = [
        (i, None if i % 3 == 0 else float(i % 5), float(i % 7))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, x double, y double")
    ib_row = df.select(
        F.percentile_approx("doc_id", [0.25, 0.5, 0.75]).alias("b")
    ).head()
    ib = sorted(int(v) for v in ib_row.b)
    got = mining._global_ranks(df, "x", "r", ib, heavy_thresh=10, n_parts=3)
    want = df.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("x"), F.asc("doc_id")))
        .alias("r0"),
    )
    joined = got.join(want, "doc_id")
    assert joined.count() == 90
    assert joined.filter("r <> r0").count() == 0

    wx = Window.orderBy(F.desc("x"), F.asc("doc_id"))
    wy = Window.orderBy(F.desc("y"), F.asc("doc_id"))
    old = (
        df.select(
            F.row_number().over(wx).alias("rx"),
            F.row_number().over(wy).alias("ry"),
        )
        .agg(F.round(F.corr("rx", "ry"), 9).alias("rho"))
        .head()
        .rho
    )
    assert mining.spearman(df, "x", "y").head().rho == old


def test_prf_and_bhattacharyya(spark):
    from websearchengine_spark.operators import mining

    postings = spark.createDataFrame(
        [("a", 0, 4), ("b", 0, 2), ("a", 1, 2), ("c", 1, 2), ("d", 2, 9)],
        "term string, doc_id long, tf long",
    )
    top = spark.createDataFrame([(0,), (1,)], "doc_id long")
    rep = {r.term: r.prob for r in
           mining.prf_representation(top, postings, num_terms=2).collect()}
    # freqs: a=6, b=2, c=2 -> top2 by (freq desc, term asc) = a, b
    assert set(rep) == {"a", "b"}
    assert rep["a"] == pytest.approx(0.75)
    assert rep["b"] == pytest.approx(0.25)

    ra = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "term string, prob double")
    rb = spark.createDataFrame([("a", 0.5), ("c", 0.5)], "term string, prob double")
    bc = mining.bhattacharyya(ra, rb).head().bc
    assert bc == pytest.approx(0.5)


def test_eval_metrics_hand_computed(spark):
    from websearchengine_spark.operators import evaluate

    # one query, 5 retrieved; relevant at ranks 1 (Perfect) and 3 (Good);
    # Fair at rank 2 counts for gain but not binary relevance
    results = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3), ("q", 13, 4), ("q", 14, 5)],
        "qid string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 10, "Perfect"), ("q", 11, "Fair"), ("q", 12, "Good"),
         ("q", 99, "Excellent")],
        "qid string, doc_id long, grade string",
    )
    m = evaluate.metrics_per_query(results, qrels).head()
    assert m.p1 == pytest.approx(1.0)
    assert m.p5 == pytest.approx(2 / 5)
    # R@k = relret@k / relret(full) = 1/2, 2/2
    assert m.r1 == pytest.approx(0.5)
    assert m.r5 == pytest.approx(1.0)
    # MAP = (1/1 + 2/3) / 2
    assert m.map == pytest.approx(round((1 + 2 / 3) / 2, 6))
    assert m.mrr == pytest.approx(1.0)
    # DCG@5 = 10 + 1/log2(2) + 5/log2(3); IDCG from retrieved gains sorted
    # desc: 10 + 5/log2(2) + 1/log2(3)
    dcg = 10 + 1 / np.log2(2) + 5 / np.log2(3)
    idcg = 10 + 5 / np.log2(2) + 1 / np.log2(3)
    assert m.ndcg5 == pytest.approx(round(dcg / idcg, 6), abs=1e-6)
    assert m.accuracy == pytest.approx(2 / 5)


def test_eval_metrics_no_relevant(spark):
    from websearchengine_spark.operators import evaluate

    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "qid string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 99, "Perfect")], "qid string, doc_id long, grade string"
    )
    m = evaluate.metrics_per_query(results, qrels).head()
    assert m.p1 == 0.0 and m.map == 0.0 and m.mrr == 0.0 and m.ndcg10 == 0.0


def test_interpolated_precision_11pt(spark):
    from websearchengine_spark.operators import evaluate

    # rel pattern by rank: 1,0,1,0,0 -> rel_ret=2
    results = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3), ("q", 13, 4), ("q", 14, 5)],
        "qid string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 10, "Perfect"), ("q", 12, "Good")],
        "qid string, doc_id long, grade string",
    )
    got = {
        r.recall_level: r.interp_prec
        for r in evaluate.interpolated_precision_11pt(results, qrels).collect()
    }
    # recall_at: r1=0.5, r2=0.5, r3=1.0...; prec_at: 1, .5, 2/3, .5, .4
    # levels <= 0.5 -> max prec among ranks with recall >= level = 1.0
    # levels > 0.5 -> max prec among ranks 3..5 = 2/3
    for lvl in [0.0, 0.1, 0.2, 0.3, 0.4, 0.5]:
        assert got[lvl] == 1.0
    for lvl in [0.6, 0.7, 0.8, 0.9, 1.0]:
        assert got[lvl] == round(2 / 3, 6)


def test_dynamic_stopwords(spark):
    from websearchengine_spark.operators import query as Q

    postings = spark.createDataFrame(
        [("a", d, 1) for d in range(5)]
        + [("b", d, 1) for d in range(3)]
        + [("c", d, 1) for d in range(3)]
        + [("d", 0, 1)],
        "term string, doc_id long, tf int",
    )
    got = [(r.term, r.df) for r in Q.dynamic_stopwords(postings, k=2).collect()]
    assert got == [("a", 5), ("b", 3)]  # tie b/c broken by term asc
