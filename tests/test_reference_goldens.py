"""TRUE golden parity: feed the reference's OWN ranked result lists
(hw1.1-numviews.tsv / hw1.2-linear.tsv) and its qrels.tsv through our
Spark evaluator and compare against the metric rows the reference's
Evaluator produced (hw1.3-*.tsv) — value-identical, quirks included.

This is the strongest available reference-output gate that needs no
corpus: every input and every expected output ships in /root/reference.
"""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/hw1/instructor"

GOLDEN_PAIRS = [
    ("result/hw1.1-numviews.tsv", "result/hw1.3-numviews.tsv"),
    ("result/hw1.2-linear.tsv", "result/hw1.3-linear.tsv"),
]

COLS = (
    ["p1", "p5", "p10", "r1", "r5", "r10", "f1", "f5", "f10"]
    + [f"pr{i}" for i in range(11)]
    + ["map", "ndcg1", "ndcg5", "ndcg10", "mrr"]
)


def _load_results(spark, path):
    rows = []
    ranks: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4:
                continue
            q, did = parts[0], int(parts[1])
            ranks[q] = ranks.get(q, 0) + 1
            rows.append((q, did, ranks[q]))
    return spark.createDataFrame(rows, "qid string, doc_id long, rank int")


def _load_qrels(spark):
    rows = []
    with open(os.path.join(REF, "data/qrels.tsv")) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 3:
                rows.append((parts[0], int(parts[1]), parts[2]))
    return spark.createDataFrame(rows, "qid string, doc_id long, grade string")


def _load_golden(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = [p for p in line.rstrip("\n").split("\t")]
            if len(parts) < 26:
                continue
            out[parts[0]] = [float(x) for x in parts[1:26]]
    return out


@pytest.mark.parametrize("result_file,golden_file", GOLDEN_PAIRS)
def test_reference_evaluator_golden_parity(spark, result_file, golden_file):
    from websearchengine_spark.operators import evaluate

    results = _load_results(spark, os.path.join(REF, result_file))
    qrels = _load_qrels(spark)
    got = {
        r.qid: [float(r[c]) for c in COLS]
        for r in evaluate.metrics_reference_line(results, qrels).collect()
    }
    golden = _load_golden(os.path.join(REF, golden_file))
    assert set(got) == set(golden)
    for q, want in golden.items():
        for col, g, w in zip(COLS, got[q], want):
            assert g == pytest.approx(w, abs=1e-9), (q, col, g, w)


def test_linear_blend_golden_identity(spark):
    """R5's blend expression reproduces the reference's shipped
    hw1.2-linear.tsv BIT-EXACTLY from its shipped component scores
    (hw1.1-{vsm,ql,phrase,numviews}.tsv): 3,295 real (query, doc) rows,
    betas 0.6/0.39/0.0099/0.0001 combined in the reference's summation
    order — a corpus-free golden test of the linear ranker's math."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators.score import LINEAR_BETAS

    def load(name):
        rows = []
        with open(
            os.path.join(REF, "result", name), encoding="utf-8",
            errors="replace",
        ) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 4:
                    rows.append((parts[0], int(parts[1]), float(parts[3])))
        return spark.createDataFrame(
            rows, "query string, doc_id long, score double"
        )

    comp = (
        load("hw1.1-vsm.tsv").withColumnRenamed("score", "s_cos")
        .join(
            load("hw1.1-ql.tsv").withColumnRenamed("score", "s_ql"),
            ["query", "doc_id"],
        )
        .join(
            load("hw1.1-phrase.tsv").withColumnRenamed("score", "s_ph"),
            ["query", "doc_id"],
        )
        .join(
            load("hw1.1-numviews.tsv").withColumnRenamed("score", "s_nv"),
            ["query", "doc_id"],
        )
    )
    b1, b2, b3, b4 = LINEAR_BETAS
    blended = comp.select(
        "query",
        "doc_id",
        (
            F.lit(b1) * F.col("s_cos")
            + F.lit(b2) * F.col("s_ql")
            + F.lit(b3) * F.col("s_ph")
            + F.lit(b4) * F.col("s_nv")
        ).alias("score"),
    )
    got = {
        (r.query, r.doc_id): r.score for r in blended.collect()
    }
    want = {
        (r.query, r.doc_id): r.score
        for r in load("hw1.2-linear.tsv").collect()
    }
    assert len(got) == len(want) == 3295
    assert got == want  # bit-exact double equality, no tolerance
