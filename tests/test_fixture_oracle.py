"""Fixture determinism + extraction byte-identity + oracle sanity."""

from websearchengine_spark.functions.textnorm import extract_text
from websearchengine_spark.oracle import engine as oracle
from websearchengine_spark.sources import fixture


class TestFixture:
    def test_deterministic(self):
        a = fixture.synth_corpus(50)
        b = fixture.synth_corpus(50)
        assert [(r.url, r.html, r.text, r.lang) for r in a] == [
            (r.url, r.html, r.text, r.lang) for r in b
        ]

    def test_extract_byte_identity(self):
        """The hard gate from BASELINE.json input_hint: extract_text(html)
        must equal the corpus ``text`` column byte-for-byte, per url."""
        for r in fixture.synth_corpus(200):
            assert extract_text(r.html) == r.text, r.url

    def test_has_heavy_hitters_and_phrases(self):
        rows = fixture.synth_corpus(200)
        joined = " ".join(r.text for r in rows)
        assert "data mining" in joined
        assert "web search" in joined

    def test_some_non_english(self):
        langs = {r.lang for r in fixture.synth_corpus(300)}
        assert "en" in langs and len(langs) > 1


class TestOracle:
    def setup_method(self):
        self.rows = [r for r in fixture.synth_corpus(120) if r.lang == "en"]
        self.idx = oracle.build_index(self.rows)

    def test_stats_consistency(self):
        assert self.idx.num_docs == len(self.rows)
        assert self.idx.total_terms == sum(self.idx.doc_len.values())
        # ctf == sum of tf; df == number of docs
        for t in ["data", "web", "search"]:
            assert self.idx.ctf(t) == sum(
                len(p) for p in self.idx.postings[t].values()
            )
            assert self.idx.df(t) > 0

    def test_stopwords_absent(self):
        for sw in ["the", "and", "of"]:
            assert sw not in self.idx.postings

    def test_conjunctive_subset_of_disjunctive(self):
        c = oracle.match(self.idx, "web search", "conjunctive")
        d = oracle.match(self.idx, "web search", "disjunctive")
        assert c <= d and len(d) > 0

    def test_phrase_stricter_than_conjunctive(self):
        c = oracle.match(self.idx, "data mining", "conjunctive")
        p = oracle.match(self.idx, '"data mining"', "conjunctive")
        assert p <= c
        assert len(p) > 0  # fixture plants the phrase

    def test_phrase_tf_counts_adjacent_runs(self):
        idx = oracle.build_index(
            [
                type(
                    "R",
                    (),
                    {
                        "url": "X_1",
                        "html": b"",
                        "text": "data mining data mining zzz data",
                        "lang": "en",
                    },
                )()
            ]
        )
        # phrase words arrive pre-stemmed from parse_query: mining -> min
        assert idx.phrase_tf(["data", "min"], 0) == 2

    def test_bm25_ranking_sane(self):
        top = oracle.rank_bm25(self.idx, "web search", k=10)
        assert len(top) > 0
        scores = [s for _, s in top]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

    def test_ql_product_semantics(self):
        # one-term query: score = 0.5*tf/D + 0.5*ctf/C
        top = oracle.rank_ql(self.idx, "salsa", k=5)
        for d, s in top:
            tf = self.idx.tf("salsa", d)
            expect = 0.5 * tf / self.idx.doc_len[d] + 0.5 * self.idx.ctf(
                "salsa"
            ) / int(self.idx.total_terms)
            assert abs(s - expect) < 1e-12


class TestMiningOracle:
    def test_pagerank_sweeps(self):
        rows = [r for r in fixture.synth_corpus(60)]
        in_links, out_deg = oracle.link_graph(rows)
        pr = oracle.pagerank_gauss_seidel(in_links, out_deg)
        assert len(pr) == len(rows)
        assert all(p > 0 for p in pr)

    def test_numviews_last_wins_and_malformed_skipped(self):
        urls = ["A_1", "B_2"]
        lines = ["en A_1 5", "en A_1 7", "en B_2 notanum", "en B_2"]
        assert oracle.mine_numviews(urls, lines) == [7, 0]
