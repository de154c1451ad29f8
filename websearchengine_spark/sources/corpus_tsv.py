"""S3 — hw1 ``corpus.tsv`` reader.

One document per line: ``title \\t body \\t numviews``
(hw3/src IndexerFullScan.constructIndex :63-86, processDocument :93-111 —
the hw1 instructor indexer shares the format); docid = 0-based line
number in file order.

Line numbers are assigned with the same two-pass per-split offset trick
as ``indexer.assign_doc_ids`` (count rows per split, broadcast prefix
offsets, then number locally): text-file splits enumerate in byte order,
so the docid contract holds without a global sort and the read scales
across however many splits the file(s) produce.  Extra tab fields beyond
the third are ignored, mirroring ``Scanner.useDelimiter("\\t")`` reading
exactly three fields.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("num_views", T.LongType(), False),
    ]
)

_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("n", T.LongType()),
    ]
)


def read_corpus_tsv(spark: SparkSession, path: str) -> DataFrame:
    """corpus.tsv -> (doc_id, title, text, num_views), doc_id = line rank."""
    lines = spark.read.text(path)

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = sum(len(b) for b in batches)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    counts = sorted(
        lines.mapInPandas(_count, _COUNT_SCHEMA).collect(), key=lambda r: r.pid
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r.pid] = acc
        acc += r.n
    boff = spark.sparkContext.broadcast(offsets)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = boff.value.get(pid, 0)
        seen = 0
        for b in batches:
            ids, titles, bodies, views = [], [], [], []
            for i, line in enumerate(b["value"]):
                parts = line.split("\t")
                title = parts[0] if parts else ""
                body = parts[1] if len(parts) > 1 else ""
                try:
                    nv = int(parts[2].strip()) if len(parts) > 2 else 0
                except ValueError:
                    nv = 0
                ids.append(base + seen + i)
                titles.append(title)
                bodies.append(body)
                views.append(nv)
            seen += len(b)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "title": titles,
                    "text": bodies,
                    "num_views": pd.array(views, dtype="int64"),
                }
            )

    return lines.mapInPandas(_parse, _OUT_SCHEMA)


def corpus_tsv_as_corpus(spark: SparkSession, path: str) -> DataFrame:
    """The engine's standard corpus shape over a corpus.tsv: the title
    doubles as the url (the reference's filename-as-title rule)."""
    df = read_corpus_tsv(spark, path)
    return df.select(
        "doc_id", F.col("title").alias("url"), "title", "text", "num_views"
    )
