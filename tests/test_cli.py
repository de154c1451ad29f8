"""CLI surface: build -> query (WAND path and phrase path) -> merge."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from websearchengine_spark import cli
from websearchengine_spark.sources import fixture


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli_corpus"))
    fixture.corpus_df(spark, 48).write.mode("overwrite").parquet(path)
    return path


def test_build_and_query(spark, corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "idx")
    cli.main(["build", "--corpus", corpus_dir, "--out", out,
              "--docs-per-part", "16"])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["num_docs"] > 0 and built["committed_total"] >= 1
    assert os.path.exists(os.path.join(out, "stats.json"))
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))

    cli.main(["query", "--index", out, "--q", "web search", "--k", "5"])
    lines = [
        l for l in capsys.readouterr().out.strip().splitlines() if "\t" in l
    ]
    assert 0 < len(lines) <= 5
    # hw1 output format: query \t docid \t title \t score
    # (ScoredDocument.java:15-18)
    query, doc_id, title, score = lines[0].split("\t")
    assert query == "web search"
    assert int(doc_id) >= 0 and float(score) > 0
    assert title  # fixture urls (Doc_NNNNNN_*) serve as titles

    # phrase query goes down the positional decode path
    cli.main(["query", "--index", out, "--q", '"data mining"', "--k", "5"])
    plines = [
        l for l in capsys.readouterr().out.strip().splitlines() if "\t" in l
    ]
    assert len(plines) <= 5
