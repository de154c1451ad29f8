"""Registry extension: round-5 quality-filter gates — the Gopher static
rule battery and the fastText-style learned quality/language classifier.

Conventions follow the existing gate modules (registry_traindata): each
Spark query calls the real engine operators; each oracle is an
independent DuckDB formulation.  The classifier oracle embeds the
sequential numpy twin's trained weights as SQL literals (the
``_sql_ann_ivf_topk`` collection-time pattern) — twin ==
distributed-train equality is separately pytest-gated
(tests/test_quality_model.py)."""

from __future__ import annotations

import os

from websearchengine_spark.operators import bpe, corpus_stats, quality_model
from websearchengine_spark.plans.registry import _docs

# ---------------------------------------------------------------------------
# gopher_rules — Rae et al. 2021 static quality battery
# ---------------------------------------------------------------------------
# The synthetic corpus is short word salad (~25 words/doc), so the
# published 50-word floor would flag everything; the gate lowers it to 20
# so `keep` varies across the result while the other six rules run at
# their published thresholds.

GOPHER_GATE_MIN_WORDS = 20


def q_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText rule battery — one map-side projection."""
    return corpus_stats.gopher_quality_flags(
        _docs(spark, sf_dir), min_words=GOPHER_GATE_MIN_WORDS
    )


_STOPS_SQL = ",".join(f"'{s}'" for s in corpus_stats.GOPHER_STOPS)

SQL_GOPHER_RULES = f"""WITH base AS (
  SELECT doc_id, text,
    list_filter(string_split(trim(regexp_replace(text,
                '[ \\t\\n\\x0B\\f\\r]+',' ','g')),' '),
                x -> x <> '') AS words,
    list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    len(words)::BIGINT AS n_words,
    greatest(len(words), 1) AS nw,
    greatest(len(lines), 1) AS nl,
    coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS sum_wl,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell,
    len(list_filter(lines,
        l -> left(trim(l), 1) IN ('-', '*', '•'))) AS n_bullet,
    len(list_filter(lines, l -> trim(l) LIKE '%...')) AS n_ellline,
    len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha,
    len(list_intersect(list_distinct(list_transform(words, w -> lower(w))),
        [{_STOPS_SQL}]))::BIGINT AS n_stops
  FROM base
),
r AS (
  SELECT doc_id, n_words,
    round(sum_wl / nw, 6) AS mean_word_len,
    round((n_hash + n_ell) / nw, 6) AS symbol_ratio,
    round(n_bullet / nl, 6) AS bullet_ratio,
    round(n_ellline / nl, 6) AS ellipsis_ratio,
    round(n_alpha / nw, 6) AS alpha_frac,
    n_stops
  FROM m
)
SELECT *,
  (n_words BETWEEN {GOPHER_GATE_MIN_WORDS} AND {corpus_stats.GOPHER_MAX_WORDS}
   AND mean_word_len BETWEEN {corpus_stats.GOPHER_MIN_MEAN_WL}
                         AND {corpus_stats.GOPHER_MAX_MEAN_WL}
   AND symbol_ratio <= {corpus_stats.GOPHER_MAX_SYMBOL_RATIO}
   AND bullet_ratio <= {corpus_stats.GOPHER_MAX_BULLET_RATIO}
   AND ellipsis_ratio <= {corpus_stats.GOPHER_MAX_ELLIPSIS_RATIO}
   AND alpha_frac >= {corpus_stats.GOPHER_MIN_ALPHA_FRAC}
   AND n_stops >= {corpus_stats.GOPHER_MIN_STOPS}) AS keep
FROM r"""


# ---------------------------------------------------------------------------
# classifier_score — learned language/quality filter
# ---------------------------------------------------------------------------
# Trains against heuristic weak supervision (marker-term density >= 0.13
# — the GPT-3/CCNet pattern of labeling a positive set by rule; the
# synthetic corpus's lang tags are independent of its shared vocabulary,
# so lang supervision would be unlearnable here), then scores every
# document.  The Spark side trains DISTRIBUTED; the oracle trains the
# sequential numpy twin over the same parquet and embeds the weights as
# literals — equal by the 1e-9 trajectory rounding both trainers share.


def q_classifier_score(spark, sf_dir):
    """Distributed train + score of the hashed linear classifier."""
    docs = _docs(spark, sf_dir)
    feats = quality_model.hashed_features(docs)
    w = quality_model.train_lr(feats, quality_model.rule_labels(docs))
    return quality_model.score_lr(feats, w)


def _sql_classifier_score() -> str | None:
    """Generate the gate SQL at oracle-collection time (it embeds weights
    trained from the gate corpus).  Returns None (rows-only fallback) if
    the corpus is unreadable here."""
    from websearchengine_spark.oracle import quality_lr

    path = os.path.join(
        os.environ.get("WSE_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
        "documents.parquet",
    )
    dim = quality_model.CLF_DIM
    try:
        w = quality_lr.train_from_parquet(
            path,
            dim,
            quality_model.CLF_ITERS,
            quality_model.CLF_LR,
            quality_model.CLF_ROUND,
        )
    except Exception:
        return None
    values = ",".join(f"({f},{float(w[f])!r})" for f in range(dim))
    return f"""WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text),
                '[^a-z0-9]+',' ','g')),' ')) AS term
  FROM documents
),
t2 AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(term),1,15)) AS BIGINT) % {dim} AS fid
  FROM tok WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY doc_id),
tf AS (SELECT doc_id, fid, count(*) AS tf FROM t2 GROUP BY doc_id, fid),
feat AS (
  SELECT tf.doc_id, fid, tf::DOUBLE / dl.dl AS x
  FROM tf JOIN dl USING (doc_id)
),
w(fid, wt) AS (VALUES {values}),
mg AS (
  SELECT feat.doc_id, sum(x * wt) AS s
  FROM feat JOIN w USING (fid) GROUP BY feat.doc_id
),
m AS (
  SELECT d.doc_id, coalesce(s, 0) + {float(w[dim])!r} AS marg
  FROM (SELECT doc_id FROM documents) d LEFT JOIN mg USING (doc_id)
)
SELECT doc_id, round(1/(1+exp(-marg)), 6) AS score,
       (marg > 0)::INT AS pred
FROM m"""


# ---------------------------------------------------------------------------
# bpe_token_count — subword token budget under a corpus-trained BPE
# ---------------------------------------------------------------------------
# Training is deterministic in the word-frequency table (ties break on
# the pair), so the oracle trains the same merge list from DuckDB's word
# counts and embeds the resulting VOCABULARY segmentation (per-word
# subword counts — bounded) as literals; the corpus-sized accounting
# (explode + join + per-doc rollup) is recomputed relationally.  The
# merge algebra itself is pytest-gated on hand-worked examples
# (tests/test_bpe.py).

BPE_GATE_MERGES = 40


def q_bpe_token_count(spark, sf_dir):
    """Distributed word counts -> driver merge learning -> vocab-costed
    segmentation -> per-doc subword budget."""
    docs = _docs(spark, sf_dir)
    merges = bpe.train_merges(docs, BPE_GATE_MERGES)
    return bpe.bpe_token_counts(docs, merges)


def _sql_bpe_token_count() -> str | None:
    """Generate the gate SQL at oracle-collection time (it embeds the
    trained vocabulary's per-word subword counts)."""
    import duckdb

    path = os.path.join(
        os.environ.get("WSE_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
        "documents.parquet",
    )
    try:
        con = duckdb.connect()
        # full distinct vocabulary WITHOUT the top_v training cap: the
        # Spark side segments every distinct word, so the embedded
        # segmentation table must too (training below still sees only
        # the top_v rows, exactly like bpe.train_merges)
        wc = con.execute(
            f"""WITH tok AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text),
         '[^a-z0-9]+',' ','g')),' ')) AS word
  FROM read_parquet('{path}')
)
SELECT word, count(*)::BIGINT AS cnt FROM tok WHERE word <> ''
GROUP BY word ORDER BY cnt DESC, word ASC"""
        ).fetchall()
        con.close()
    except Exception:
        return None
    if not wc or len(wc) > 100_000:
        # empty corpus (VALUES would be malformed) or a vocabulary too
        # large to embed as literals -> rows-only fallback
        return None
    merges = bpe.train_merges_local(
        [(w, c) for w, c in wc[: bpe.BPE_TOP_V]], BPE_GATE_MERGES
    )
    values = ",".join(
        f"('{w}',{len(bpe.segment_word(w, merges))})" for w, _ in wc
    )
    return f"""WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text),
                '[^a-z0-9]+',' ','g')),' ')) AS word
  FROM documents
),
v(word, n_subwords) AS (VALUES {values})
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(n_subwords)::BIGINT AS n_subwords
FROM tok JOIN v USING (word)
GROUP BY doc_id"""


QUALITY_REGISTRY = {
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "classifier_score": (q_classifier_score, _sql_classifier_score),
    "bpe_token_count": (q_bpe_token_count, _sql_bpe_token_count),
}


# ---------------------------------------------------------------------------
# dataset assembly gates: deterministic split + weighted source sampling
# ---------------------------------------------------------------------------
# Both SQL twins are GENERATED from the same Python floats the Spark
# side accumulates (cumulative fractions, temperature-powered rates), so
# threshold literals are bit-identical doubles on both engines.

_U_SQL = (
    "round(CAST(('0x' || substr(md5(doc_id::VARCHAR || '|{salt}'),1,15))"
    " AS BIGINT) / 1152921504606846976.0, 9)"
)

MIX_WEIGHTS = {f"src{i}": 1.0 / (i + 1) for i in range(20)}
MIX_TEMPERATURE = 2.0


def q_dataset_split(spark, sf_dir):
    """Hash-deterministic train/val/test assignment."""
    return corpus_stats.dataset_split(_docs(spark, sf_dir))


def _sql_dataset_split() -> str:
    u = _U_SQL.format(salt="split")
    acc, cases = 0.0, []
    for name, frac in corpus_stats.SPLIT_FRACS[:-1]:
        acc += frac
        cases.append(f"WHEN u < {acc!r} THEN '{name}'")
    last = corpus_stats.SPLIT_FRACS[-1][0]
    return f"""WITH h AS (SELECT doc_id, {u} AS u FROM documents)
SELECT doc_id, u, CASE {' '.join(cases)} ELSE '{last}' END AS split
FROM h"""


def q_source_weighted_sample(spark, sf_dir):
    """Temperature-flattened source mixing (T=2 over 1/(i+1) weights)."""
    return corpus_stats.source_weighted_sample(
        _docs(spark, sf_dir), MIX_WEIGHTS, MIX_TEMPERATURE
    )


def _sql_source_weighted_sample() -> str:
    t = MIX_TEMPERATURE
    powed = {s: w ** (1.0 / t) for s, w in MIX_WEIGHTS.items()}
    mx = max(powed.values())
    cases = " ".join(
        f"WHEN source = '{s}' THEN {float(round(p / mx, 9))!r}"
        for s, p in sorted(powed.items())
    )
    u = _U_SQL.format(salt="mix")
    return f"""WITH h AS (
  SELECT doc_id, source, {u} AS u,
         CAST(CASE {cases} ELSE 0.0 END AS DOUBLE) AS keep_p
  FROM documents
)
SELECT doc_id, source, keep_p, u < keep_p AS is_kept FROM h"""


QUALITY_REGISTRY.update(
    {
        "dataset_split": (q_dataset_split, _sql_dataset_split()),
        "source_weighted_sample": (
            q_source_weighted_sample,
            _sql_source_weighted_sample(),
        ),
    }
)
