#!/usr/bin/env python
"""Auxiliary N-vs-4N scaling evidence for the TRAINING-DATA PIPELINE tier.

`tools/bench_scaling.py` evidences the north-rule criterion on the index
build; this measures the same two-parallelism-level protocol on the
composed cleaning pipeline (`operators/pipeline.run_pipeline`: line dedup
-> PII -> exact dedup -> MinHash-LSH cluster dedup -> quality filters ->
sequence packing) — the tier a 100 TB training-data deployment actually
spends its hours in.

Input: the sf0.1 documents table replicated ``--repl`` times with a
per-replica uniquifying token appended, so exact dedup keeps every row
while the near-dup stage sees realistic replica CLUSTERS (each base doc's
replicas bucket together and must be verified + clustered — the expensive
path, not an early-exit).  Same methodology as the main artifact:
interleaved trials, best-per-level, warmup run before each clock.

Usage:
  python tools/bench_pipeline_scaling.py                # orchestrate
  python tools/bench_pipeline_scaling.py --cpus 8       # one level (JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (2, 8)
N_TRIALS = 2
REPL_OFF = 1_000_000


def _corpus(spark, repl: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * REPL_OFF).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" uniq"), F.col("rep"), F.lit("tok")
        ).alias("text"),
    )


def measure(cpus: int, repl: int) -> dict:
    from websearchengine_spark.operators import pipeline
    from websearchengine_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))

    # warmup: identical job on a small slice — excludes Python-worker
    # spawn + plan compilation from the clock (amortized on a real
    # cluster)
    from pyspark.sql import functions as F

    warm = _corpus(spark, 1).where(F.col("doc_id") % 10 == 0)
    pipeline.run_pipeline(warm, report={}).unpersist()

    corpus = _corpus(spark, repl)
    report: dict = {}
    t0 = time.time()
    out = pipeline.run_pipeline(corpus, report=report)
    sec = time.time() - t0
    out.unpersist()
    res = {
        "cpus": cpus,
        "repl": repl,
        "sec": round(sec, 3),
        "docs_per_sec": round(report["docs_in"] / sec, 2),
        "report": report,
    }
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--repl", type=int, default=8)
    args = ap.parse_args()

    if args.cpus is not None:
        print(json.dumps(measure(args.cpus, args.repl)))
        return

    trials: dict[int, list[dict]] = {n: [] for n in LEVELS}
    for _ in range(N_TRIALS):
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus",
                 str(cpus), "--repl", str(args.repl)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            trials[cpus].append(json.loads(line))

    best = {n: max(ts, key=lambda r: r["docs_per_sec"])
            for n, ts in trials.items()}
    a, b = LEVELS
    eff = round(
        best[b]["docs_per_sec"] / ((b / a) * best[a]["docs_per_sec"]), 4
    )
    print(json.dumps({
        "metric": "pipeline_scaling_efficiency",
        "value": eff,
        "unit": f"best throughput_{b} / ({b // a} * best throughput_{a})",
        "sf_dir": SF_DIR,
        "repl": args.repl,
        "stage_report": best[b]["report"],
        "best": best,
        "all_trials": {str(n): [r["docs_per_sec"] for r in ts]
                       for n, ts in trials.items()},
    }))


if __name__ == "__main__":
    main()
