"""Mining end-to-end on the HTML fixture: link extraction, PageRank
(synchronous parity vs oracle Jacobi), view-log mining, and the full
comprehensive-cascade ranker with mined PR/views columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators import mining, score
from websearchengine_spark.oracle import engine as oracle_eng
from websearchengine_spark.sources import fixture


@pytest.fixture(scope="module")
def mined(spark, small_corpus, spark_index):
    rows, idx = small_corpus
    corpus = spark_index["corpus_ids"]
    links = mining.extract_links(corpus)
    edges = mining.build_edges(corpus, links).cache()

    in_links, out_deg = oracle_eng.link_graph(rows)
    return corpus, edges, in_links, out_deg, idx


def test_edges_match_oracle(spark, mined):
    corpus, edges, in_links, out_deg, idx = mined
    got = {(r.src_id, r.dst_id) for r in edges.collect()}
    want = {
        (src, dst)
        for dst, srcs in enumerate(in_links)
        for src in srcs
    }
    assert got == want
    d = {
        r.src_id: r["count"]
        for r in edges.groupBy("src_id").count().collect()
    }
    for i, deg in enumerate(out_deg):
        assert d.get(i, 0) == deg


def test_pagerank_matches_oracle_jacobi(spark, mined, spark_index):
    corpus, edges, in_links, out_deg, idx = mined
    docs = spark_index["docs"]
    got = {
        r.doc_id: r.page_rank
        for r in mining.pagerank(docs, edges).collect()
    }
    want = oracle_eng.pagerank_jacobi(in_links, out_deg)
    for i, pr in enumerate(want):
        assert got[i] == pytest.approx(round(pr, 9), abs=1e-8)


def test_numviews_log_pipeline(spark, mined, spark_index):
    corpus, edges, in_links, out_deg, idx = mined
    lines = fixture.synth_view_log(idx.urls)
    df = spark.createDataFrame(
        [(l, i) for i, l in enumerate(lines)], "value string, line_no long"
    )
    parsed = mining.parse_view_log(df)
    docs = spark_index["docs"]
    got = {
        r.doc_id: r.num_views
        for r in mining.numviews_from_log(parsed, docs).collect()
    }
    want = oracle_eng.mine_numviews(idx.urls, lines)
    assert got == {i: v for i, v in enumerate(want)}


@pytest.mark.parametrize("query", ["web search", "data mining", "salsa"])
def test_comprehensive_cascade_parity(spark, mined, spark_index, query):
    corpus, edges, in_links, out_deg, idx = mined
    docs = spark_index["docs"]
    # attach mined PR (Jacobi on BOTH sides — the documented parity
    # variant) and numviews
    pr = mining.pagerank(docs, edges)
    lines = fixture.synth_view_log(idx.urls)
    parsed = mining.parse_view_log(
        spark.createDataFrame(
            [(l, i) for i, l in enumerate(lines)], "value string, line_no long"
        )
    )
    nv = mining.numviews_from_log(parsed, docs)
    docs_full = docs.join(pr, "doc_id").join(nv, "doc_id")

    got = score.rank_comprehensive(
        spark_index["postings"],
        docs_full,
        query,
        total_terms=spark_index["total_terms"],
        k=5,
    ).collect()

    idx.page_rank = [
        round(p, 9) for p in oracle_eng.pagerank_jacobi(in_links, out_deg)
    ]
    idx.num_views = oracle_eng.mine_numviews(idx.urls, lines)
    want = oracle_eng.rank_comprehensive(idx, query, k=5)
    assert [r.doc_id for r in got] == [d for d, _ in want]
