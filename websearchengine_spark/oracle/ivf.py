"""Sequential numpy twin of operators/similarity.ivf_train — the IVF gate
oracle.

``ivf_train`` is deterministic in (data, seed): seeded md5 init, Lloyd's
iterations, and a 6-dp centroid rounding after every update that absorbs
float-sum-order noise.  That determinism lets the DuckDB gate SQL embed the
trained centroid matrix as literal lists (the same pattern as the
hyperplane-LSH gate's literal planes) and express assignment + nprobe +
cosine top-k in pure SQL — restoring the full rows+schema+hash check for
``ann_ivf_topk`` instead of the weaker rows-only fallback.

This module trains WITHOUT Spark (plain numpy over the parquet file read
via DuckDB), so gate-SQL generation never needs a SparkSession; equality
of these centroids with the distributed ``ivf_train`` output is itself a
pytest gate (tests/test_dedup_similarity.py) — the sequential twin and the
distributed trainer must walk bit-identical trajectories.
"""

from __future__ import annotations

import hashlib

import numpy as np


def train_centroids_local(
    vec_ids: np.ndarray,
    vecs: np.ndarray,
    n_centroids: int,
    iters: int,
    seed: int,
) -> np.ndarray:
    """Bit-identical twin of similarity.ivf_train (see its docstring for
    the trajectory-lockstep argument)."""
    ranked = sorted(
        range(len(vec_ids)),
        key=lambda i: (
            hashlib.md5(f"{vec_ids[i]}|{seed}".encode()).hexdigest(),
            int(vec_ids[i]),
        ),
    )[:n_centroids]
    chosen = sorted(ranked, key=lambda i: int(vec_ids[i]))
    cent = vecs[chosen].astype(np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    cent = np.round(cent, 6)
    v = vecs.astype(np.float64)
    vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cl = (vn @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in np.unique(cl):
            vec = v[cl == c].mean(axis=0)
            nrm = np.linalg.norm(vec)
            if nrm > 1e-12:
                new[c] = vec / nrm
        cent = np.round(new, 6)
    return cent


def train_from_parquet(
    parquet_path: str, n_centroids: int, iters: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, query_vec) from an embeddings parquet file — no Spark.
    query_vec is the vec_id=0 row (the gate's standing query)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) ORDER BY vec_id",
        [parquet_path],
    ).fetchall()
    con.close()
    vec_ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float32)
    cent = train_centroids_local(vec_ids, vecs, n_centroids, iters, seed)
    q = vecs[vec_ids == 0][0].astype(np.float64)
    return cent, q
