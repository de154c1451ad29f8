"""Structured Streaming: file-source + availableNow trigger, asserting the
streaming results equal the batch computation on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_src"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").coalesce(
        2
    ).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, stream_df, cp_dir, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", cp_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_equals_batch(spark, events_dir, tmp_path):
    from websearchengine_spark.streaming import stream

    batch = spark.read.parquet(events_dir)
    schema = batch.schema
    streaming = spark.readStream.schema(schema).parquet(events_dir)

    got = _run_stream(
        spark,
        stream.windowed_event_counts(streaming),
        str(tmp_path / "cp1"),
        "win_counts",
    ).collect()
    want = stream.windowed_event_counts(batch).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


def test_session_windows_stream_equals_batch(spark, events_dir, tmp_path):
    from websearchengine_spark.streaming import stream

    batch = spark.read.parquet(events_dir)
    streaming = spark.readStream.schema(batch.schema).parquet(events_dir)

    got = _run_stream(
        spark,
        stream.session_windows(streaming),
        str(tmp_path / "cp2"),
        "sessions",
    ).collect()
    want = stream.session_windows(batch).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


def test_incremental_index_stream_builds_manifest(spark, tmp_path):
    from websearchengine_spark.operators import checkpoint
    from websearchengine_spark.sources import fixture
    from websearchengine_spark.streaming import stream

    src = str(tmp_path / "corpus_src")
    fixture.corpus_df(spark, 40).where(F.col("lang") == "en").coalesce(
        2
    ).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    streaming = spark.readStream.schema(batch.schema).parquet(src)

    out = str(tmp_path / "idx_out")
    writer = stream.incremental_index_query(
        streaming,
        out_dir=out,
        spark_checkpoint_dir=str(tmp_path / "cp3"),
        avgdl=100.0,
        docs_per_part=32,
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(180)

    cp = checkpoint.IndexCheckpointer(out, docs_per_part=32)
    lineage = cp.lineage()
    assert lineage, "no partitions committed by the stream"
    segs = cp.segments(spark)
    assert segs.count() > 0
    # postings decode back out of the stream-built segments
    from websearchengine_spark.operators import indexer

    decoded = indexer.decode_segments(segs)
    assert decoded.where(F.col("tf") <= 0).count() == 0
