"""Unit tests for operators/dedup.py and operators/similarity.py against
pure-Python oracles (hashlib md5 / numpy)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


M61 = (1 << 61) - 1


def _minhash(s: str, seed: int) -> int:
    h = int(hashlib.md5(s.encode()).hexdigest()[:14], 16)
    return (h * (seed + 2) + (seed * 1000003 + 12289)) % M61


def _shingles(text: str, k: int = 3) -> list[str]:
    t = _toks(text)
    return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # near dup (superset)
    (3, "completely different content about spark query engines and joins"),
    (4, "spark query engines process joins with hash partitioning at scale"),
    (5, "tiny doc"),  # < 3 tokens -> no shingles
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_matches_python_oracle(spark, docs_df):
    from websearchengine_spark.operators import dedup

    got = {
        (r.doc_id, r.seed): r.minhash
        for r in dedup.minhash_signatures(docs_df).collect()
    }
    for doc_id, text in DOCS:
        sh = _shingles(text)
        if not sh:
            assert not any(k[0] == doc_id for k in got)
            continue
        for seed in range(dedup.N_MINHASH):
            want = min(_minhash(s, seed) for s in sh)
            assert got[(doc_id, seed)] == want, (doc_id, seed)


def test_minhash_candidates_find_planted_dups(spark, docs_df):
    from websearchengine_spark.operators import dedup

    sig = dedup.minhash_signatures(docs_df)
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in dedup.minhash_candidate_pairs(dedup.lsh_bands(sig)).collect()
    }
    # exact dup pair shares every band
    assert pairs[(0, 1)] == dedup.N_BANDS
    # near dup (1-token difference) shares at least one band
    assert (0, 2) in pairs or (1, 2) in pairs


def test_ngram_jaccard_values(spark, docs_df):
    from websearchengine_spark.operators import dedup

    sig = dedup.minhash_signatures(docs_df)
    pairs = dedup.minhash_candidate_pairs(dedup.lsh_bands(sig))
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard(docs_df, pairs).collect()
    }
    assert jac[(0, 1)] == 1.0
    for (a, b), v in jac.items():
        sa, sb = set(_shingles(DOCS[a][1])), set(_shingles(DOCS[b][1]))
        want = round(len(sa & sb) / len(sa | sb), 6)
        assert v == pytest.approx(want, abs=1e-9)


def test_simhash_oracle_and_dup_property(spark, docs_df):
    from websearchengine_spark.operators import dedup

    got = {r.doc_id: r.simhash for r in dedup.simhash(docs_df).collect()}
    assert got[0] == got[1]  # identical docs -> identical fingerprint
    for doc_id, text in DOCS:
        tf: dict[str, int] = {}
        for t in _toks(text):
            tf[t] = tf.get(t, 0) + 1
        sums = [0] * 16
        for t, n in tf.items():
            h = _h60(t)
            for b in range(16):
                sums[b] += n if (h >> b) & 1 else -n
        want = sum(1 << b for b in range(16) if sums[b] > 0)
        assert got[doc_id] == want


VECS = np.array(
    [
        [1.0, 0.0, 0.2, -0.3],
        [0.9, 0.1, 0.2, -0.2],
        [-1.0, 0.5, 0.0, 0.3],
        [0.0, 1.0, -0.5, 0.1],
        [0.1, 0.9, -0.4, 0.0],
    ]
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [(i, [float(x) for x in VECS[i]], int(i % 2)) for i in range(len(VECS))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_bruteforce_cosine_topk(spark, emb_df):
    from websearchengine_spark.operators import similarity

    q = [float(x) for x in VECS[0]]
    got = [(r.vec_id, r.score) for r in
           similarity.cosine_topk_bruteforce(emb_df, q, k=3).collect()]
    # float32 storage: compare against the float32-rounded vectors
    v32 = VECS.astype(np.float32).astype(np.float64)
    want = sorted(
        ((i, round(_cos(v32[i], np.array(q)), 6)) for i in range(len(VECS))),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-6)


def test_lsh_topk_is_subset_of_bucket(spark, emb_df):
    from websearchengine_spark.operators import similarity

    dims = [0, 1]
    q = [float(x) for x in VECS[0]]
    got = similarity.cosine_topk_lsh(emb_df, q, k=5, dims=dims).collect()
    v32 = VECS.astype(np.float32)
    qb = sum(1 << i for i, d in enumerate(dims) if q[d] >= 0)
    bucket = {
        i for i in range(len(VECS))
        if sum(1 << j for j, d in enumerate(dims) if v32[i][d] >= 0) == qb
    }
    assert {r.vec_id for r in got} <= bucket
    assert 0 in {r.vec_id for r in got}


def test_near_dup_pairs_blocked(spark, emb_df):
    from websearchengine_spark.operators import similarity

    got = {
        (r.vec_a, r.vec_b): r.score
        for r in similarity.near_dup_pairs_cosine(emb_df, 0.9, "label").collect()
    }
    v32 = VECS.astype(np.float32).astype(np.float64)
    for (a, b), s in got.items():
        assert a < b and a % 2 == b % 2  # same label block
        assert s == pytest.approx(round(_cos(v32[a], v32[b]), 6), abs=1e-9)
        assert s >= 0.9
    # the planted near-identical pair (0,2? different label) -> check (1,3)?
    # vecs 0 and 2 are dissimilar; the near pair with same label parity is
    # (1,3)? compute expected membership directly:
    expect = {
        (a, b)
        for a in range(len(VECS))
        for b in range(a + 1, len(VECS))
        if a % 2 == b % 2 and round(_cos(v32[a], v32[b]), 6) >= 0.9
    }
    assert set(got) == expect


# --------------------------------------------------------------------------
# random-hyperplane LSH (seeded, multi-table) — planted-near-dup recall
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted(spark):
    """Real testdata embeddings + 50 planted near-duplicates (small seeded
    perturbations, cosine >= ~0.995 to their base vector)."""
    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    rng = np.random.default_rng(7)
    rows = [(r.vec_id, [float(x) for x in r.embedding], 0) for r in base]
    planted_pairs = []
    for i in range(50):
        src = base[i * 7 % len(base)]
        v = np.asarray(src.embedding, dtype=np.float64)
        noise = rng.standard_normal(v.shape)
        v2 = v + noise * (0.02 * np.linalg.norm(v) / np.linalg.norm(noise))
        dup_id = 100000 + i
        rows.append((dup_id, [float(x) for x in v2], 0))
        planted_pairs.append((int(src.vec_id), dup_id))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    df.count()
    return df, planted_pairs


def test_near_dup_lsh_recall_on_planted(spark, planted):
    """Default (hyperplane-LSH-blocked, skew-guarded) near-dup must find
    >= 90% of planted near-identical pairs without any all-pairs join."""
    from websearchengine_spark.operators import similarity

    df, pairs = planted
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.near_dup_pairs_cosine(df, 0.98).collect()
    }
    found = sum(1 for p in pairs if p in got)
    assert found / len(pairs) >= 0.9, (found, len(pairs))


def test_hlsh_topk_recall_on_planted(spark, planted):
    """For a perturbed query, multi-table Hamming-probe LSH must surface
    the true base neighbor in its candidate top-k almost always, while
    scanning only a fraction of the corpus."""
    from websearchengine_spark.operators import similarity

    df, pairs = planted
    emb = {r.vec_id: list(r.embedding) for r in df.collect()}
    hits = 0
    n_queries = 12
    for base_id, dup_id in pairs[:n_queries]:
        got = [
            r.vec_id
            for r in similarity.cosine_topk_hlsh(
                df, emb[dup_id], k=3
            ).collect()
        ]
        if base_id in got:
            hits += 1
    assert hits / n_queries >= 0.9, hits
    # and the candidate filter really prunes: a single bucket holds far
    # fewer than the full corpus
    from pyspark.sql import functions as F

    planes = similarity.hyperplanes(64)
    bucketed = df.select(
        similarity.hyperplane_bucket(F.col("embedding"), planes).alias("b")
    )
    biggest = bucketed.groupBy("b").count().agg(F.max("count")).head()[0]
    assert biggest < df.count() / 2


def test_hlsh_tables_are_independent():
    from websearchengine_spark.operators import similarity

    t0 = similarity.hyperplanes(64, table=0)
    t1 = similarity.hyperplanes(64, table=1)
    assert t0 != t1
    assert t0 == similarity.hyperplanes(64, table=0)  # deterministic


def test_ivf_topk_recall_on_planted(spark, planted):
    """IVF (k-means coarse quantizer + nprobe) must place a perturbed
    query's true base neighbor in its probed top-k, scanning only the
    probed clusters."""
    from websearchengine_spark.operators import similarity

    df, pairs = planted
    emb = {r.vec_id: list(r.embedding) for r in df.collect()}
    cent = similarity.ivf_train(df, n_centroids=8, iters=3)
    assert cent.shape[1] == 64
    # deterministic training
    cent2 = similarity.ivf_train(df, n_centroids=8, iters=3)
    assert np.allclose(cent, cent2)
    hits = 0
    n_queries = 10
    for base_id, dup_id in pairs[:n_queries]:
        got = [
            r.vec_id
            for r in similarity.cosine_topk_ivf(
                df, emb[dup_id], k=3, nprobe=2, centroids=cent
            ).collect()
        ]
        if base_id in got:
            hits += 1
    assert hits / n_queries >= 0.9, hits
    # the probe really prunes: cluster sizes partition the corpus
    sizes = (
        similarity.ivf_assign(df, cent).groupBy("cluster").count().collect()
    )
    assert sum(r["count"] for r in sizes) == df.count()
    assert len(sizes) >= 4  # vectors spread over multiple clusters


def test_ivf_train_matches_sequential_twin(spark, planted):
    """The distributed trainer and the sequential numpy twin that
    generates the gate's DuckDB oracle SQL (oracle/ivf.py) must produce
    BIT-IDENTICAL centroids: the 6-dp per-iteration rounding is designed
    to absorb float-sum-order differences between the two, and the
    ann_ivf_topk hash gate depends on it."""
    from websearchengine_spark.operators import similarity
    from websearchengine_spark.oracle import ivf as oracle_ivf

    df, _ = planted
    rows = sorted(
        df.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.array([list(r.embedding) for r in rows], dtype=np.float32)
    cent_d = similarity.ivf_train(df, n_centroids=8, iters=3)
    cent_s = oracle_ivf.train_centroids_local(
        ids, vecs, 8, 3, similarity.HLSH_SEED
    )
    assert np.array_equal(cent_d, cent_s)


def test_ivf_oracle_sql_generates(spark):
    """The gate SQL generator embeds trained centroid literals and the
    nprobe filter; it must emit runnable SQL when the gate corpus is
    readable (the driver's sf0.01 layout)."""
    import os

    from websearchengine_spark.plans import registry_ext

    if not os.path.exists("/root/testdata/sf0.01/embeddings.parquet"):
        pytest.skip("driver testdata not present")
    sql = registry_ext._sql_ann_ivf_topk()
    assert sql is not None and "list_position" in sql and "cluster IN" in sql


def test_near_dup_string_label_blocking(spark):
    """A STRING block column must block on its raw value (regression: a
    numeric cast nulled it out and silently returned zero pairs)."""
    from websearchengine_spark.operators import similarity

    v = [1.0, 0.0, 0.0]
    rows = [
        (0, v, "news"), (1, v, "news"),            # same block, identical
        (2, v, "sports"), (3, [0.0, 1.0, 0.0], "sports"),  # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.near_dup_pairs_cosine(df, 0.9, "label").collect()
    }
    assert got == {(0, 1)}


def test_ivf_persisted_layout_partition_pruned(spark, planted, tmp_path):
    """ivf_build/ivf_query: the stored layout must return exactly the
    in-memory IVF results, and the query's scan must be PARTITION-PRUNED
    to the probed clusters (directory-level pruning on cluster=...)."""
    from websearchengine_spark.operators import similarity

    df, _ = planted
    out = str(tmp_path / "ivf")
    cent = similarity.ivf_build(df, out, n_centroids=8, iters=3)
    qv = [float(x) for x in df.where(F.col("vec_id") == 1).head().embedding]
    got = similarity.ivf_query(spark, out, qv, k=5, nprobe=2).collect()
    want = similarity.cosine_topk_ivf(
        df, qv, k=5, nprobe=2, centroids=cent
    ).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ]
    # pruning evidence: the physical plan carries a partition filter on
    # cluster, and the pruned scan reads fewer partition dirs than exist
    plan = (
        similarity.ivf_query(spark, out, qv, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "cluster" in plan


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style)
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted(spark, planted):
    """Planted near-identical vectors (cos >= ~0.995) must be dropped as
    duplicates of their lower-id base; the originals (max mutual cosine
    ~0.51) must all be kept.  One output row per input vector."""
    from websearchengine_spark.operators import similarity

    df, pairs = planted
    out = similarity.semantic_dedup(df, threshold=0.95).collect()
    assert len(out) == df.count()
    by_id = {r.vec_id: r for r in out}
    # every original is kept (no lower-id near-dup exists among them)
    assert all(by_id[i].is_kept for i in by_id if i < 100000)
    # >= 90% of planted dups are dropped (a dup can escape only when the
    # perturbation pushes it across a cluster boundary away from its base)
    dropped = [d for _, d in pairs if not by_id[d].is_kept]
    assert len(dropped) >= 0.9 * len(pairs)
    for d in dropped:
        assert by_id[d].max_sim_lower >= 0.95
    # kept rows report no qualifying neighbor
    for r in out:
        if r.is_kept:
            assert r.max_sim_lower == 0.0


def test_semantic_dedup_max_cluster_guard(spark, planted):
    """Clusters over the guard skip the quadratic stage: everything is
    kept rather than the job going O(n^2) on a degenerate cluster."""
    from websearchengine_spark.operators import similarity

    df, _ = planted
    out = similarity.semantic_dedup(df, threshold=0.95, max_cluster=1)
    assert out.where("NOT is_kept").count() == 0
    assert out.count() == df.count()


def test_semantic_dedup_matches_numpy_twin(spark, planted):
    """Row-exact parity with a sequential numpy implementation driven by
    the oracle twin's centroids (same keep rule, same 6-dp rounding)."""
    import numpy as np

    from websearchengine_spark.operators import similarity
    from websearchengine_spark.oracle import ivf as oracle_ivf

    df, _ = planted
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([list(r.embedding) for r in rows], dtype=np.float32)
    cent = oracle_ivf.train_centroids_local(
        ids, V, similarity.IVF_CENTROIDS, similarity.IVF_ITERS,
        similarity.HLSH_SEED,
    )
    Vd = V.astype(np.float64)
    nrm = np.maximum(np.linalg.norm(Vd, axis=1), 1e-12)
    cl = ((Vd / nrm[:, None]) @ cent.T).argmax(axis=1)
    thr = 0.95
    expect = {}
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]  # ids ascending within cluster
        S = (Vd[idx] @ Vd[idx].T) / np.outer(nrm[idx], nrm[idx])
        for p, i in enumerate(idx):
            sims = np.round(S[p, :p], 6)
            best = float(sims.max()) if len(sims) else 0.0
            ms = best if best >= thr else 0.0
            expect[int(ids[i])] = (int(c), len(idx), ms, ms == 0.0)
    got = similarity.semantic_dedup(
        df, threshold=thr,
        centroids=similarity.ivf_train(df),
    ).collect()
    assert len(got) == len(expect)
    for r in got:
        ec, en, ems, ekept = expect[r.vec_id]
        assert (r.cluster, r.n_cluster, r.is_kept) == (ec, en, ekept)
        assert abs(r.max_sim_lower - ems) <= 2e-6
