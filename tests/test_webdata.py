"""Web-data pipeline operators: connected-components dedup clusters,
chunk-level exact dedup, URL canonicalization.

The components tests prove BOTH correctness (labels == an independent
pure-Python union-find) and the scale property that justifies the
algorithm choice: alternating large-star/small-star converges in
O(log n) rounds on a path graph where naive label propagation needs
O(diameter) rounds.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from websearchengine_spark.operators import corpus_stats, dedup


def _uf_components(n_nodes, edges):
    """Independent oracle: union-find over explicit node list."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {}
    for x in range(n_nodes):
        r = find(x)
        while parent[r] != r:
            r = parent[r]
        labels[x] = r
    return labels


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long")
    out = dedup.connected_components(df, **kw)
    return {r.node: r.component for r in out.collect()}


def test_cc_path_graph_log_rounds(spark):
    """A 64-node path (diameter 63): every node lands in component 0,
    and the star-contraction converges in O(log n) rounds — the reason
    this algorithm and not naive propagation (63 rounds) runs at
    web-graph scale."""
    edges = [(i, i + 1) for i in range(63)]
    rounds = []
    got = _cc(spark, edges, rounds_out=rounds)
    assert got == {i: 0 for i in range(64)}
    assert rounds[0] <= 10, rounds  # log2(64)=6 + convergence detection


def test_cc_multiple_components_and_star(spark):
    edges = [(5, 3), (3, 9), (20, 21), (40, 41), (41, 42), (40, 42)]
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20,
                   40: 40, 41: 40, 42: 40}
    # only nodes appearing in edges are labeled
    assert 0 not in got


def test_cc_matches_union_find_random(spark):
    import random

    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc(spark, edges)
    want = _uf_components(n, edges)
    touched = {x for e in edges for x in e}
    assert got == {x: want[x] for x in touched}


def test_cc_empty_and_self_loops(spark):
    assert _cc(spark, [], ) == {}
    # self-loops are dropped; a lone self-loop labels nothing
    assert _cc(spark, [(4, 4)]) == {}
    assert _cc(spark, [(4, 4), (4, 7)]) == {4: 4, 7: 4}


def test_dedup_clusters_transitive_chain(spark):
    """A~B and B~C near-dup (but A and C farther apart) must land in ONE
    cluster with min-id canonical; unrelated docs stay singletons."""
    base = ["w%d" % i for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:38] + ["x1", "x2"])          # ~A
    c = " ".join(base[:36] + ["x1", "x2", "y1", "y2"])  # ~B, farther from A
    other = " ".join("z%d" % i for i in range(40))
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, other)], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_kept)
        for r in dedup.dedup_clusters(docs, threshold=0.5).collect()
    }
    assert out[0] == (0, 3, True)
    assert out[1] == (0, 3, False)
    assert out[2] == (0, 3, False)
    assert out[3] == (3, 1, True)


def test_chunk_dedup_hand_case(spark):
    shared = " ".join("s%d" % i for i in range(10))  # one exact chunk
    uniq1 = " ".join("a%d" % i for i in range(10))
    uniq2 = " ".join("b%d" % i for i in range(7))  # short tail chunk
    docs = spark.createDataFrame(
        [
            (0, shared + " " + uniq1),   # chunks: [shared, uniq1]
            (1, shared + " " + uniq2),   # chunks: [shared, uniq2(7)]
            (2, "lonely doc"),           # one short chunk, unique
            (3, ""),                     # no tokens -> 0 chunks
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_chunk_frac)
        for r in corpus_stats.chunk_dedup(docs, width=10).collect()
    }
    assert out[0] == (2, 1, 0.5)
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (1, 0, 0.0)
    assert out[3] == (0, 0, 0.0)


def test_chunk_dedup_within_doc_repeat_not_cross_doc(spark):
    """The same chunk twice in ONE doc is not 'duplicated' — the
    definition is >= 2 distinct docs."""
    ch = " ".join("r%d" % i for i in range(10))
    docs = spark.createDataFrame(
        [(0, ch + " " + ch)], "doc_id long, text string"
    )
    row = corpus_stats.chunk_dedup(docs, width=10).head()
    assert (row.n_chunks, row.n_dup_chunks) == (2, 0)


CANON_CASES = [
    # case-fold scheme+host, drop default port, sort params, drop utm_*
    ("HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&a=1#f",
     "http://www.ex.com/a?a=1&b=2"),
    ("https://Ex.COM:443//a//b/", "https://ex.com/a/b"),
    # non-default port kept
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    # empty path -> "/", root slash kept
    ("http://ex.com", "http://ex.com/"),
    ("http://ex.com/", "http://ex.com/"),
    # fragment-only and empty query dropped
    ("http://ex.com/p#sec", "http://ex.com/p"),
    ("http://ex.com/p?", "http://ex.com/p"),
    ("http://ex.com/p?utm_campaign=x&fbclid=1&gclid=2",
     "http://ex.com/p"),
    # param order normalized, values untouched
    ("http://ex.com/p?z=26&m=13&a=1", "http://ex.com/p?a=1&m=13&z=26"),
]


def test_canonical_url_cases(spark):
    from websearchengine_spark.functions.urlnorm import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)],
        "i long, url string",
    )
    got = [
        r.c
        for r in df.orderBy("i")
        .select(canonical_url("url").alias("c"))
        .collect()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_url_dedup_groups_and_kept(spark):
    pages = spark.createDataFrame(
        [
            (10, "HTTP://A.com:80/x/?b=2&a=1"),
            (11, "http://a.com/x?a=1&b=2"),
            (12, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.canonical_url, r.n_same_canon, r.is_kept)
        for r in corpus_stats.url_dedup(pages).collect()
    }
    assert out[10] == ("http://a.com/x?a=1&b=2", 2, True)
    assert out[11] == ("http://a.com/x?a=1&b=2", 2, False)
    assert out[12] == ("http://a.com/y", 1, True)


def test_line_dedup_hand_case(spark):
    """Lines in >= min_docs docs are stripped; survivors keep order;
    fully-boilerplate docs come back empty."""
    from websearchengine_spark.operators import corpus_stats

    rows = [(i, "COOKIES\nunique line %d\nFOOTER" % i) for i in range(4)]
    rows.append((9, "COOKIES\nFOOTER"))  # nothing unique
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in corpus_stats.line_dedup(docs, min_docs=3).collect()
    }
    for i in range(4):
        assert out[i].n_lines == 3 and out[i].n_dropped == 2
        assert out[i].text_clean == f"unique line {i}"
    assert out[9].n_lines == 2 and out[9].n_dropped == 2
    assert out[9].text_clean == ""


def test_line_dedup_preserves_order_of_kept_lines(spark):
    from websearchengine_spark.operators import corpus_stats

    docs = spark.createDataFrame(
        [(0, "z last\nBOILER\na first\nBOILER\nm mid"),
         (1, "BOILER"), (2, "BOILER")],
        "doc_id long, text string",
    )
    r = {
        x.doc_id: x
        for x in corpus_stats.line_dedup(docs, min_docs=3).collect()
    }[0]
    assert r.text_clean == "z last\na first\nm mid"


def test_domain_cap_hand_case(spark):
    """Cap 2: third+ docs of a host are dropped, rank follows doc_id."""
    from websearchengine_spark.operators import corpus_stats

    pages = spark.createDataFrame(
        [
            (3, "https://big.example/3"),
            (1, "https://big.example/1"),
            (2, "HTTP://Big.Example:443/2"),
            (7, "https://small.example/7"),
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: r for r in corpus_stats.domain_cap(pages, cap=2).collect()
    }
    assert out[1].host == "big.example" and out[2].host == "big.example"
    assert [out[i].host_rank for i in (1, 2, 3)] == [1, 2, 3]
    assert [out[i].is_kept for i in (1, 2, 3)] == [True, True, False]
    assert all(out[i].host_docs == 3 for i in (1, 2, 3))
    assert out[7].host == "small.example" and out[7].is_kept


def test_domain_cap_skewed_host_bucketed_rank(spark):
    """The over-cap path must produce exact global ranks even when one
    host dominates and its rows span many percentile buckets — and the
    plan must not contain a window partitioned by host ALONE over the
    over-cap rows (the straggler shape the two-level scheme exists to
    avoid; host windows only appear bounded: under-cap rows <= cap, the
    offset roll-up <= n_parts rows per host)."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import corpus_stats

    rows = [(i, f"https://trap.example/{i}") for i in range(0, 500, 1)]
    rows += [(1000 + i, f"https://ok.example/{i}") for i in range(3)]
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    out = corpus_stats.domain_cap(pages, cap=10, n_parts=8)
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 503
    # exact dense ranks on the skewed host, in doc_id order
    for i in range(500):
        assert got[i].host_rank == i + 1
        assert got[i].is_kept == (i < 10)
        assert got[i].host_docs == 500
    for i in range(3):
        assert got[1000 + i].host_rank == i + 1 and got[1000 + i].is_kept
    # kept set == the cap lowest doc_ids per host
    kept = out.where("is_kept").groupBy("host").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert {r.host: r.n for r in kept.collect()} == {
        "trap.example": 10, "ok.example": 3,
    }
