"""CLI surface: build -> query (WAND path and phrase path) -> merge."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from websearchengine_spark import cli
from websearchengine_spark.sources import fixture


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli_corpus"))
    fixture.corpus_df(spark, 48).write.mode("overwrite").parquet(path)
    return path


def test_build_and_query(spark, corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "idx")
    cli.main(["build", "--corpus", corpus_dir, "--out", out,
              "--docs-per-part", "16"])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["num_docs"] > 0 and built["committed_total"] >= 1
    assert os.path.exists(os.path.join(out, "stats.json"))
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))

    cli.main(["query", "--index", out, "--q", "web search", "--k", "5"])
    lines = [
        l for l in capsys.readouterr().out.strip().splitlines() if "\t" in l
    ]
    assert 0 < len(lines) <= 5
    # hw1 output format: query \t docid \t title \t score
    # (ScoredDocument.java:15-18)
    query, doc_id, title, score = lines[0].split("\t")
    assert query == "web search"
    assert int(doc_id) >= 0 and float(score) > 0
    assert title  # fixture urls (Doc_NNNNNN_*) serve as titles

    # phrase query goes down the positional decode path
    cli.main(["query", "--index", out, "--q", '"data mining"', "--k", "5"])
    plines = [
        l for l in capsys.readouterr().out.strip().splitlines() if "\t" in l
    ]
    assert len(plines) <= 5


@pytest.fixture(scope="module")
def http_index(spark, corpus_dir, tmp_path_factory, capsys=None):
    out = str(tmp_path_factory.mktemp("http_idx"))
    cli.main(["build", "--corpus", corpus_dir, "--out", out,
              "--docs-per-part", "16"])
    return out


def test_http_serving_endpoint(spark, http_index):
    """S10: the resident HTTP endpoint must serve /search with the
    reference's CGI-arg semantics (QueryHandler.java:85-128 — invalid
    ranker/num ignored, format=text|html) and return exactly the results
    of the underlying serve path."""
    from urllib.request import urlopen

    from websearchengine_spark.serving import IndexServer, serve

    srv = IndexServer(spark, http_index, preload_stats=True)
    httpd = serve(srv, port=0, background=True)
    port = httpd.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        body = urlopen(f"{base}/search?query=web+search&num=5").read().decode()
        lines = [l for l in body.splitlines() if l]
        assert 0 < len(lines) <= 5
        q, doc_id, title, score = lines[0].split("\t")
        assert q == "web search" and int(doc_id) >= 0 and float(score) > 0
        assert title
        # identical to the direct serve path
        want = srv.query("web search", k=5)
        assert [
            (int(l.split("\t")[1]), float(l.split("\t")[3])) for l in lines
        ] == [(d, round(s, 6)) for d, _, s in want]
        # invalid ranker and num are IGNORED, never an error
        body2 = urlopen(
            f"{base}/search?query=web+search&ranker=bogus&num=notanint"
        ).read().decode()
        assert body2.splitlines()[0].split("\t")[1] == lines[0].split("\t")[1]
        # phrase query through HTTP exercises the pruned positional path
        body3 = urlopen(
            f"{base}/search?query=%22data+mining%22&num=5"
        ).read().decode()
        assert all(
            l.split("\t")[0] == '"data mining"'
            for l in body3.splitlines() if l
        )
        # html format
        html_body = urlopen(
            f"{base}/search?query=web+search&num=2&format=html"
        ).read().decode()
        assert html_body.startswith("<!DOCTYPE html>") and "<li>" in html_body
        # unknown path -> 404
        import urllib.error
        try:
            urlopen(f"{base}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_http_prf_route(spark, http_index):
    """/prf mirrors QueryHandler.java:565-583: term \t prob lines sorted
    by prob desc, numdocs/numterms CGI args, probs normalized over the
    retained mass."""
    from urllib.request import urlopen

    from websearchengine_spark.serving import IndexServer, serve

    srv = IndexServer(spark, http_index, preload_stats=True)
    httpd = serve(srv, port=0, background=True)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        body = urlopen(
            f"{base}/prf?query=web+search&numdocs=5&numterms=6"
        ).read().decode()
        lines = [l for l in body.splitlines() if l]
        assert 0 < len(lines) <= 6
        probs = [float(l.split("\t")[1]) for l in lines]
        assert probs == sorted(probs, reverse=True)
        assert sum(probs) == pytest.approx(1.0, abs=1e-6)
        # direct API equality
        want = srv.prf("web search", num_docs=5, num_terms=6)
        assert [(l.split("\t")[0], float(l.split("\t")[1])) for l in lines] == [
            (t, p) for t, p in want
        ]
        # invalid numeric args ignored, not an error
        ok = urlopen(f"{base}/prf?query=web+search&numterms=zzz").read().decode()
        assert ok.splitlines()
    finally:
        httpd.shutdown()


def test_index_server_close_restores_shuffle_conf(spark, http_index):
    """The resident serve pin is scoped: close() must restore the
    session's previous shuffle-partition width."""
    from websearchengine_spark import serving

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    srv = serving.IndexServer(spark, http_index, serve_partitions=4)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert srv.term_df is not None  # stats sidecar preloaded
    srv.close()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
