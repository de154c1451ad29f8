"""Literal pure-Python oracle of the reference engine.

Reimplements — faithfully, including quirks — the indexing and ranking math
of /root/reference so Spark results can be asserted rank-identical:

- index build incl. positions and doc lengths
  (IndexerInvertedCompressed.java:160-253)
- conjunctive/disjunctive matching with phrase adjacency
  (IndexerInvertedCompressed.java:404-553)
- QL ranker β=0.5 with int-truncated |C| (RankerComprehensive.java:43-53)
- BM25 (k1=1.2, b=0.75 per BASELINE.json; Robertson/Lucene idf)
- comprehensive cascade: QL desc -> top 5k by PageRank -> top 3k by
  NumViews -> top k, stable sorts (RankerComprehensive.java:66-87)
- cosine/VSM with idf = 1 + log2(N/df) (hw1 Ranker.java:57-114)
- PageRank λ=0.9, 2 IN-PLACE Gauss-Seidel sweeps, no dangling mass
  (CorpusAnalyzerPagerank.java:100-131)
- numviews log mining with last-match-wins (LogMinerNumviews.java:57-107)
"""

from __future__ import annotations

import math
import urllib.parse
from collections import defaultdict
from dataclasses import dataclass, field

from websearchengine_spark.functions.textnorm import (
    extract_links,
    extract_text,
    parse_query,
    tokenize_document,
)

BM25_K1 = 1.2
BM25_B = 0.75


@dataclass
class OracleIndex:
    # term -> {doc_id: [positions]}
    postings: dict[str, dict[int, list[int]]] = field(
        default_factory=lambda: defaultdict(dict)
    )
    doc_len: dict[int, int] = field(default_factory=dict)
    urls: list[str] = field(default_factory=list)
    num_docs: int = 0
    total_terms: int = 0
    page_rank: list[float] = field(default_factory=list)
    num_views: list[int] = field(default_factory=list)

    # ---- stats (IndexerInvertedCompressed.java:621-747) ----
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def ctf(self, term: str) -> int:
        return sum(len(p) for p in self.postings.get(term, {}).values())

    def tf(self, term: str, doc_id: int) -> int:
        return len(self.postings.get(term, {}).get(doc_id, ()))

    def avgdl(self) -> float:
        return self.total_terms / self.num_docs if self.num_docs else 0.0

    # ---- phrase ops (Q4/Q5: :520-618) ----
    def phrase_tf(self, words: list[str], doc_id: int) -> int:
        """Count of adjacent runs: positions of word i+1 == pos(word i)+1."""
        plists = []
        for w in words:
            pl = self.postings.get(w, {}).get(doc_id)
            if not pl:
                return 0
            plists.append(set(pl))
        count = 0
        for p0 in sorted(plists[0]):
            if all((p0 + k) in plists[k] for k in range(1, len(plists))):
                count += 1
        return count

    def phrase_ctf(self, words: list[str]) -> int:
        first = self.postings.get(words[0], {})
        return sum(self.phrase_tf(words, d) for d in first)

    def phrase_df(self, words: list[str]) -> int:
        first = self.postings.get(words[0], {})
        return sum(1 for d in first if self.phrase_tf(words, d) > 0)

    # ---- token-level accessors that treat multi-word tokens as phrases ----
    def token_tf(self, token: str, doc_id: int) -> int:
        if " " in token:
            return self.phrase_tf(token.split(), doc_id)
        return self.tf(token, doc_id)

    def token_ctf(self, token: str) -> int:
        if " " in token:
            return self.phrase_ctf(token.split())
        return self.ctf(token)

    def token_df(self, token: str) -> int:
        if " " in token:
            return self.phrase_df(token.split())
        return self.df(token)

    def token_matches(self, token: str) -> set[int]:
        if " " in token:
            words = token.split()
            first = self.postings.get(words[0], {})
            return {d for d in first if self.phrase_tf(words, d) > 0}
        return set(self.postings.get(token, {}).keys())


def build_index(corpus_rows) -> OracleIndex:
    """corpus rows: objects with .url/.html/.text/.lang — docs sorted by url,
    doc_id = 0-based rank (the docid contract, SURVEY.md §1.2)."""
    idx = OracleIndex()
    rows = sorted(corpus_rows, key=lambda r: r.url)
    idx.urls = [r.url for r in rows]
    idx.num_docs = len(rows)
    for doc_id, r in enumerate(rows):
        tokens = tokenize_document(r.url, r.text)
        idx.doc_len[doc_id] = len(tokens)
        idx.total_terms += len(tokens)
        for pos, term in enumerate(tokens):
            idx.postings[term].setdefault(doc_id, []).append(pos)
    return idx


# --------------------------------------------------------------------------
# Matching
# --------------------------------------------------------------------------


def match(idx: OracleIndex, query: str, mode: str = "conjunctive") -> set[int]:
    tokens = parse_query(query.lower())
    if not tokens:
        return set()
    sets = [idx.token_matches(t) for t in tokens]
    if mode == "conjunctive":
        out = sets[0].copy()
        for s in sets[1:]:
            out &= s
        return out
    return set().union(*sets)


# --------------------------------------------------------------------------
# Rankers
# --------------------------------------------------------------------------


def ql_score(idx: OracleIndex, tokens: list[str], doc_id: int) -> float:
    """RankerComprehensive.java:43-53 — product over tokens (duplicates
    kept), β=0.5, |C| int-truncated (no-op here: counts are ints)."""
    beta = 0.5
    score = 1.0
    d = idx.doc_len[doc_id]
    c = int(idx.total_terms)
    for t in tokens:
        fqi = idx.token_tf(t, doc_id)
        cqi = idx.token_ctf(t)
        score *= (1.0 - beta) * fqi / d + beta * cqi / c
    return score


def bm25_score(idx: OracleIndex, tokens: list[str], doc_id: int) -> float:
    """BM25 k1=1.2 b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)) (Lucene form),
    summed over query tokens including duplicates."""
    dl = idx.doc_len[doc_id]
    avgdl = idx.avgdl()
    n = idx.num_docs
    s = 0.0
    for t in tokens:
        tf = idx.token_tf(t, doc_id)
        if tf == 0:
            continue
        df = idx.token_df(t)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        s += idf * tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )
    return s


def rank_bm25(idx, query, k=10, mode="conjunctive"):
    tokens = parse_query(query.lower())
    cands = match(idx, query, mode)
    scored = [(d, bm25_score(idx, tokens, d)) for d in cands]
    scored.sort(key=lambda x: (-x[1], x[0]))  # tiebreak: doc_id asc
    return scored[:k]


def rank_ql(idx, query, k=10, mode="conjunctive"):
    tokens = parse_query(query.lower())
    cands = match(idx, query, mode)
    scored = [(d, ql_score(idx, tokens, d)) for d in cands]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def rank_comprehensive(idx, query, k=10):
    """QL over conjunctive matches -> desc sort -> top 5k -> stable sort by
    PageRank desc -> top 3k -> stable sort by NumViews desc -> top k
    (RankerComprehensive.java:66-87).  Our stable-tiebreak contract: initial
    sort tie-breaks by doc_id asc; the cascade sorts are stable."""
    tokens = parse_query(query.lower())
    cands = match(idx, query, "conjunctive")
    scored = [(d, ql_score(idx, tokens, d)) for d in cands]
    scored.sort(key=lambda x: (-x[1], x[0]))
    top = scored[: k * 5]
    top = sorted(top, key=lambda x: -idx.page_rank[x[0]])
    top = top[: k * 3]
    top = sorted(top, key=lambda x: -idx.num_views[x[0]])
    return top[:k]


def rank_fullscan(titles: list[str], query: str, k: int = 10):
    """R8 literal oracle (RankerFullScan.java:25-61): title terms are the
    indexed (stem -> lowercase -> stopword-filtered) title tokens; query
    tokens are the RAW whitespace split (Query.processQuery:24-33 — no
    stemming); score 1.0 on any equality, else 0.0; stable reverse sort =
    (-score, doc_id)."""
    from websearchengine_spark.functions.textnorm import normalize_token

    qtokens = set(query.lower().split())
    scored = []
    for doc_id, title in enumerate(titles):
        terms = {
            t
            for t in (normalize_token(w) for w in title.split())
            if t is not None
        }
        scored.append((doc_id, 1.0 if terms & qtokens else 0.0))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def cosine_scores(idx: OracleIndex, query: str) -> dict[int, float]:
    """hw1 Ranker.java:57-114 — tf-idf doc vector over ALL doc terms with
    idf = 1 + log2(N/df); query vector is raw tf; cosine."""
    tokens = parse_query(query.lower())
    n = idx.num_docs
    qtf: dict[str, int] = defaultdict(int)
    for t in tokens:
        qtf[t] += 1
    qnorm = math.sqrt(sum(v * v for v in qtf.values()))
    # per-doc norm over all terms
    doc_norm2: dict[int, float] = defaultdict(float)
    for term, plist in idx.postings.items():
        df = len(plist)
        idf = 1.0 + math.log2(n / df)
        for d, poss in plist.items():
            w = len(poss) * idf
            doc_norm2[d] += w * w
    out: dict[int, float] = {}
    for d in doc_norm2:
        dot = 0.0
        for t, qv in qtf.items():
            tf = idx.token_tf(t, d)
            if tf and " " not in t:
                df = idx.df(t)
                dot += (tf * (1.0 + math.log2(n / df))) * qv
        if dot > 0:
            out[d] = dot / (math.sqrt(doc_norm2[d]) * qnorm)
    return out


# --------------------------------------------------------------------------
# Mining (G1-G3)
# --------------------------------------------------------------------------


def link_graph(corpus_rows) -> tuple[list[set[int]], list[int]]:
    """In-links per doc (deduped) + out-degree on deduped edges
    (CorpusAnalyzerPagerank.java:162-199)."""
    rows = sorted(corpus_rows, key=lambda r: r.url)
    url2id = {r.url: i for i, r in enumerate(rows)}
    n = len(rows)
    in_links: list[set[int]] = [set() for _ in range(n)]
    out_sets: list[set[int]] = [set() for _ in range(n)]
    for src, r in enumerate(rows):
        for target in extract_links(r.html):
            dst = url2id.get(target)
            if dst is not None:
                in_links[dst].add(src)
                out_sets[src].add(dst)
    out_deg = [len(s) for s in out_sets]
    return in_links, out_deg


def pagerank_gauss_seidel(
    in_links: list[set[int]], out_deg: list[int], lam: float = 0.9, iters: int = 2
) -> list[float]:
    """IN-PLACE sweeps exactly as CorpusAnalyzerPagerank.java:100-131 —
    doc j sees already-updated scores of docs i<j within the same sweep."""
    n = len(in_links)
    pr = [1.0] * n
    for _ in range(iters):
        for j in range(n):
            s = sum(pr[i] / out_deg[i] for i in in_links[j])
            pr[j] = lam * s + (1 - lam) / n
    return pr


def pagerank_jacobi(
    in_links: list[set[int]], out_deg: list[int], lam: float = 0.9, iters: int = 2
) -> list[float]:
    """Classic synchronous iteration — the semantics our distributed Spark
    job implements (SURVEY.md G2 parity caveat)."""
    n = len(in_links)
    pr = [1.0] * n
    for _ in range(iters):
        new = [0.0] * n
        for j in range(n):
            s = sum(pr[i] / out_deg[i] for i in in_links[j])
            new[j] = lam * s + (1 - lam) / n
        pr = new
    return pr


def mine_numviews(urls: list[str], log_lines: list[str]) -> list[int]:
    """LogMinerNumviews.java:57-107: keep lines with exactly 3 fields and
    numeric views; URL-decode article; LAST matching line wins."""
    views = [0] * len(urls)
    url2id = {u: i for i, u in enumerate(urls)}
    for line in log_lines:
        parts = line.split(" ")
        if len(parts) != 3 or not parts[2].isdigit():
            continue
        try:
            article = urllib.parse.unquote(parts[1], errors="strict")
        except Exception:
            continue
        i = url2id.get(article)
        if i is not None:
            views[i] = int(parts[2])
    return views
