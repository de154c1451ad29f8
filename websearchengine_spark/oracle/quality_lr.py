"""Sequential numpy twin of operators/quality_model.train_lr — the
classifier gate's oracle trainer.

Training is deterministic in (data, hyperparameters): both sides round
every gradient and weight vector to 1e-9, which absorbs float-sum-order
noise (Spark partial-aggregation order vs numpy's), so this twin and the
distributed trainer walk bit-identical trajectories — the same
lockstep argument as oracle/ivf.py.  That determinism lets the DuckDB
gate SQL embed the trained weights as literal VALUES rows and re-verify
the scoring path (hashing + normalization + sigmoid) in pure SQL.

Features are produced by DuckDB itself (the same md5-prefix hash and
lower/non-alnum tokenizer as the Spark side and the gate SQL), so the
twin's inputs are identical to both by construction.  No Spark needed —
gate-SQL generation stays sessionless.

Equality of this twin with the distributed ``train_lr`` is itself a
pytest gate (tests/test_quality_model.py).
"""

from __future__ import annotations

import numpy as np

_FEATURE_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text),
                '[^a-z0-9]+',' ','g')),' ')) AS term
  FROM read_parquet(?)
),
t2 AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(term),1,15)) AS BIGINT) % {dim} AS fid
  FROM tok WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY doc_id),
tf AS (SELECT doc_id, fid, count(*) AS tf FROM t2 GROUP BY doc_id, fid)
SELECT tf.doc_id, fid, tf::DOUBLE / dl.dl AS x
FROM tf JOIN dl USING (doc_id)
ORDER BY doc_id, fid
"""


def train_local(
    doc_ids: np.ndarray,
    fids: np.ndarray,
    xs: np.ndarray,
    label_doc_ids: np.ndarray,
    ys: np.ndarray,
    dim: int,
    iters: int,
    lr: float,
    round_dp: int,
    beta: float,
) -> np.ndarray:
    """Bit-identical twin of quality_model.train_lr (see its docstring
    for the trajectory-lockstep argument).  Inputs are the token feature
    triples (doc_id, fid, x) — the bias column is added here, exactly as
    hashed_features appends its fid=-1 rows."""
    order = {int(d): i for i, d in enumerate(label_doc_ids)}
    n = len(label_doc_ids)
    if n == 0:
        # mirror train_lr's degenerate-supervision short-circuit (no
        # labeled docs -> the zero model, never 0/0)
        return np.zeros(dim + 1, dtype=np.float64)
    rows = np.array([order[int(d)] for d in doc_ids], dtype=np.int64)
    X = np.zeros((n, dim + 1), dtype=np.float64)
    X[rows, fids.astype(np.int64)] = xs  # (doc,fid) pairs are unique
    X[:, dim] = 1.0  # bias feature
    y = ys.astype(np.float64)
    w = np.zeros(dim + 1, dtype=np.float64)
    v = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        m = X @ w
        r = 1.0 / (1.0 + np.exp(-m)) - y
        g = np.round((X.T @ r) / float(n), round_dp)
        v = np.round(beta * v + g, round_dp)
        w = np.round(w - lr * v, round_dp)
    return w


_LABEL_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text),
                '[^a-z0-9]+',' ','g')),' ')) AS term
  FROM read_parquet(?)
),
r AS (
  SELECT doc_id, sum((term IN ({terms}))::INT) AS m, count(*) AS n
  FROM t WHERE term <> '' GROUP BY doc_id
),
d AS (
  SELECT dd.doc_id,
         coalesce(m, 0) / greatest(coalesce(n, 0), 1) AS dens
  FROM (SELECT doc_id FROM read_parquet(?)) dd LEFT JOIN r USING (doc_id)
)
SELECT doc_id, (dens >= {hi})::INT AS y
FROM d WHERE dens >= {hi} OR dens <= {lo}
ORDER BY doc_id
"""


def train_from_parquet(
    parquet_path: str,
    dim: int,
    iters: int,
    lr: float,
    round_dp: int,
    marker_terms: list[str] | None = None,
    lo: float | None = None,
    hi: float | None = None,
    beta: float | None = None,
) -> np.ndarray:
    """Trained (dim+1,) weight vector (bias last) from a documents
    parquet file — no Spark.  Labels are the clear band of the
    marker-term density rule, matching quality_model.rule_labels
    (int/int density on both engines, so the label SET is identical by
    construction); features are restricted to the labeled docs exactly
    as train_lr's left-semi join does."""
    import duckdb

    from websearchengine_spark.operators import quality_model as qm

    marker_terms = (
        qm.MARKER_TERMS if marker_terms is None else marker_terms
    )
    lo = qm.MARKER_LO if lo is None else lo
    hi = qm.MARKER_HI if hi is None else hi
    beta = qm.CLF_BETA if beta is None else beta
    con = duckdb.connect()
    feats = con.execute(
        _FEATURE_SQL.format(dim=dim), [parquet_path]
    ).fetchall()
    labels = con.execute(
        _LABEL_SQL.format(
            terms=",".join(f"'{t}'" for t in marker_terms),
            lo=repr(float(lo)),
            hi=repr(float(hi)),
        ),
        [parquet_path, parquet_path],
    ).fetchall()
    con.close()
    labeled = {int(r[0]) for r in labels}
    feats = [r for r in feats if int(r[0]) in labeled]
    return train_local(
        np.array([r[0] for r in feats], dtype=np.int64),
        np.array([r[1] for r in feats], dtype=np.int64),
        np.array([r[2] for r in feats], dtype=np.float64),
        np.array([r[0] for r in labels], dtype=np.int64),
        np.array([r[1] for r in labels], dtype=np.float64),
        dim,
        iters,
        lr,
        round_dp,
        beta,
    )
