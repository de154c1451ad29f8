"""Resumable-build (checkpoint lineage, kill/restart) and segment-merge
compaction tests — north_star gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators import checkpoint, indexer, merge


def _seg_rows(df):
    cols = [
        "term", "chunk", "block_seq", "n_docs", "first_doc_id", "last_doc_id",
        "doc_gap_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
        "block_max_tf", "sum_tf",
    ]
    rows = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(rows)


@pytest.fixture(scope="module")
def corpus_ids(spark):
    from websearchengine_spark.sources import fixture

    df = fixture.corpus_df(spark, 64).where(F.col("lang") == "en")
    return indexer.assign_doc_ids(df, n_parts=4).cache()


@pytest.fixture(scope="module")
def single_shot(corpus_ids):
    postings = indexer.build_postings(corpus_ids)
    return indexer.build_segments(postings, avgdl=100.0, chunk_docs=16)


def test_incremental_equals_single_shot(spark, corpus_ids, single_shot, tmp_path):
    cp = checkpoint.IndexCheckpointer(
        str(tmp_path / "idx"), docs_per_part=32, chunk_docs=16
    )
    written = cp.build(corpus_ids, avgdl=100.0)
    assert len(written) == len(cp.committed_parts()) >= 2
    # lineage rows carry real metrics
    for lin in written:
        assert lin.n_docs > 0 and lin.n_segments > 0 and lin.posting_bytes > 0
        assert lin.doc_lo // 32 == lin.part_id
    got = _seg_rows(cp.segments(spark))
    want = _seg_rows(single_shot)
    assert got == want


def test_kill_and_resume(spark, corpus_ids, single_shot, tmp_path):
    cp = checkpoint.IndexCheckpointer(
        str(tmp_path / "idx2"), docs_per_part=32, chunk_docs=16
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        cp.build(corpus_ids, avgdl=100.0, fail_after_parts=1)
    assert len(cp.committed_parts()) == 1

    # restart: a NEW checkpointer over the same dir resumes, skipping
    # committed partitions
    cp2 = checkpoint.IndexCheckpointer(
        str(tmp_path / "idx2"), docs_per_part=32, chunk_docs=16
    )
    more = cp2.build(corpus_ids, avgdl=100.0)
    assert all(m.part_id != 0 for m in more)
    assert _seg_rows(cp2.segments(spark)) == _seg_rows(single_shot)
    # seq numbers are contiguous across the restart
    seqs = sorted(p.seq for p in cp2.lineage())
    assert seqs == list(range(len(seqs)))


def test_misaligned_chunk_rejected(tmp_path):
    with pytest.raises(ValueError, match="multiple of chunk_docs"):
        checkpoint.IndexCheckpointer(
            str(tmp_path / "bad"), docs_per_part=24, chunk_docs=16
        )


def test_merge_disjoint_and_colliding(spark, corpus_ids, single_shot):
    # split mid-chunk so some (term, chunk) groups collide across the two
    # builds and must be decoded + re-encoded
    left = corpus_ids.where(F.col("doc_id") < 25)
    right = corpus_ids.where(F.col("doc_id") >= 25)
    seg_l = indexer.build_segments(
        indexer.build_postings(left), avgdl=100.0, chunk_docs=16
    )
    seg_r = indexer.build_segments(
        indexer.build_postings(right), avgdl=100.0, chunk_docs=16
    )
    merged = merge.merge_segments(seg_l, seg_r, avgdl=100.0, chunk_docs=16)
    assert _seg_rows(merged) == _seg_rows(single_shot)


def test_merge_only_touches_overlap(spark, corpus_ids):
    # doc ranges aligned to chunk boundaries -> zero colliding groups ->
    # merge must be pure union (no re-encode): verify count identity
    left = corpus_ids.where(F.col("doc_id") < 16)
    right = corpus_ids.where((F.col("doc_id") >= 16) & (F.col("doc_id") < 32))
    seg_l = indexer.build_segments(
        indexer.build_postings(left), avgdl=100.0, chunk_docs=16
    )
    seg_r = indexer.build_segments(
        indexer.build_postings(right), avgdl=100.0, chunk_docs=16
    )
    merged = merge.merge_segments(seg_l, seg_r, avgdl=100.0, chunk_docs=16)
    assert merged.count() == seg_l.count() + seg_r.count()
    assert _seg_rows(merged) == sorted(_seg_rows(seg_l) + _seg_rows(seg_r))
