"""operators/pipeline.run_pipeline — composed-stage attrition on a
planted corpus (the library twin of the pipeline_report driver gate)."""

from __future__ import annotations

import pytest

from websearchengine_spark.operators import pipeline


@pytest.fixture(scope="module")
def planted_docs(spark):
    """8 docs: 6 distinct 40-token bases (every doc carries the global
    boilerplate line; doc 0 carries an email), one EXACT copy of doc 1
    at id 100, one NEAR copy of doc 2 (same text + 2-token tail) at
    id 101."""
    def body(i):
        return " ".join(f"w{i}x{j} q{(i * 7 + j) % 97}" for j in range(20))

    boiler = "please accept all cookies"
    rows = []
    for i in range(6):
        pii_bit = " mail me at bob@example.com ok" if i == 0 else ""
        rows.append((i, f"{body(i)}\n{boiler}\nend of doc {i}{pii_bit}"))
    rows.append((100, rows[1][1]))                     # exact copy of 1
    rows.append((101, rows[2][1] + " tail tok"))       # near copy of 2
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_run_pipeline_planted_attrition(planted_docs):
    report = {}
    out = pipeline.run_pipeline(
        planted_docs,
        boilerplate_min_docs=5,
        minhash_threshold=0.7,
        max_rep=0.9,
        min_tokens=3,
        budget=50,
        report=report,
    )
    rows = out.collect()
    out.unpersist()
    assert report["docs_in"] == 8
    assert report["docs_with_pii"] == 1          # only doc 0's email
    assert report["after_exact_dedup"] == 7      # copy of doc 1 dropped
    assert report["after_near_dedup"] == 6       # near copy of 2 dropped
    assert report["after_quality"] == 6          # all survivors long enough
    # survivors are exactly the 6 originals, each packed into a bin
    ids = sorted(r.doc_id for r in rows)
    assert ids == [0, 1, 2, 3, 4, 5]
    assert report["n_bins"] == len({r.bin_id for r in rows})
    # stage 1 stripped the boilerplate line and stage 2 redacted the email
    by_id = {r.doc_id: r.text for r in rows}
    assert all("please accept all cookies" not in t for t in by_id.values())
    assert "bob@example.com" not in by_id[0] and "<EMAIL>" in by_id[0]
    # n_tokens reflects the post-rewrite text
    assert all(r.n_tokens >= 3 for r in rows)


def test_run_pipeline_carries_extra_columns(planted_docs, spark):
    from pyspark.sql import functions as F

    docs = planted_docs.withColumn(
        "url", F.concat(F.lit("u://"), F.col("doc_id"))
    )
    out = pipeline.run_pipeline(
        docs, boilerplate_min_docs=5, min_tokens=1, max_rep=1.0, budget=64
    )
    cols = out.columns
    out.unpersist()
    assert cols == ["doc_id", "url", "text", "n_tokens", "bin_id"]
