"""S3 — hw1 corpus.tsv reader: line-rank docids, 3-field parse, e2e index."""

from __future__ import annotations

import pytest

from websearchengine_spark.sources import corpus_tsv, fixture


@pytest.fixture(scope="module")
def tsv_path(spark, tmp_path_factory):
    """A corpus.tsv in the reference's format, derived from the fixture
    corpus (title \\t body \\t numviews, one line per doc)."""
    rows = [r for r in fixture.synth_corpus(40) if r.lang == "en"]
    path = tmp_path_factory.mktemp("tsv") / "corpus.tsv"
    with open(path, "w", encoding="utf-8") as fh:
        for i, r in enumerate(rows):
            body = " ".join(r.text.split())  # single-line body
            fh.write(f"{r.url}\t{body}\t{i * 3 % 17}\n")
    return str(path), rows


def test_line_rank_docids_and_fields(spark, tsv_path):
    path, rows = tsv_path
    df = corpus_tsv.read_corpus_tsv(spark, path).orderBy("doc_id")
    got = df.collect()
    assert [r.doc_id for r in got] == list(range(len(got)))
    assert len(got) == len(rows)
    for i, r in enumerate(got):
        assert r.title == rows[i].url
        assert r.num_views == i * 3 % 17
        assert r.text  # body survived


def test_extra_tab_fields_ignored(spark, tmp_path):
    p = tmp_path / "c.tsv"
    p.write_text("T1\tbody one\t5\textra\tfields\nT2\tbody two\t7\n")
    got = corpus_tsv.read_corpus_tsv(spark, str(p)).orderBy("doc_id").collect()
    assert [(r.title, r.num_views) for r in got] == [("T1", 5), ("T2", 7)]
    assert got[0].text == "body one"


def test_end_to_end_index_over_tsv(spark, tsv_path):
    """The tsv corpus drops into the standard pipeline: postings parity
    with the oracle built from the same rows."""
    from websearchengine_spark.operators import indexer
    from websearchengine_spark.oracle import engine as ENG

    path, rows = tsv_path
    corpus = corpus_tsv.corpus_tsv_as_corpus(spark, path)
    postings = indexer.build_postings(corpus.select("url", "text", "doc_id"))

    class R:
        def __init__(self, url, text):
            self.url, self.text = url, text

    # oracle docid contract = url rank; the tsv contract = line rank.
    # The fixture writes lines in synth order, so re-rank by url for the
    # oracle and map line-docids through the same permutation.
    srt = sorted(range(len(rows)), key=lambda i: rows[i].url)
    line_to_url_rank = {line: rank for rank, line in enumerate(srt)}
    oidx = ENG.build_index(
        [R(r.url, " ".join(r.text.split())) for r in rows]
    )
    got = {
        (r.term, line_to_url_rank[r.doc_id]): (r.tf, list(r.positions))
        for r in postings.collect()
    }
    want = {
        (t, d): (len(pl), pl)
        for t, docs in oidx.postings.items()
        for d, pl in docs.items()
    }
    assert got == want
