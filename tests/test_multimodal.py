"""Multimodal plumbing tests: schema, batch shape, determinism of the
stubbed decode, and shuffle-free fan-out."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def media(spark):
    from websearchengine_spark.operators import multimodal

    return multimodal.synth_media_df(spark, 24).cache()


def test_feature_schema_and_determinism(spark, media):
    from websearchengine_spark.operators import multimodal

    out = multimodal.extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "blob_bytes", "content_hash", "feature",
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 24
    src = {r.media_id: bytes(r.blob) for r in media.collect()}
    for mid, r in rows.items():
        assert len(r.feature) == multimodal.FEATURE_DIM
        assert r.blob_bytes == len(src[mid])
        assert r.content_hash == hashlib.md5(src[mid]).hexdigest()
    # rerun -> identical features (stub decode is deterministic)
    again = {r.media_id: r.feature for r in multimodal.extract_features(media).collect()}
    for mid in rows:
        assert np.allclose(rows[mid].feature, again[mid])


def test_frame_sampling_fanout(spark, media):
    from websearchengine_spark.operators import multimodal

    vids = media.where(media.kind == "video")
    n_vids = vids.count()
    frames = multimodal.sample_frames(vids, n_frames=4)
    rows = frames.collect()
    assert len(rows) == n_vids * 4
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_no)
        assert len(r.frame_feature) == multimodal.FEATURE_DIM
    for nos in per.values():
        assert sorted(nos) == [0, 1, 2, 3]


def test_empty_blob_raises(spark):
    from websearchengine_spark.operators import multimodal

    with pytest.raises(ValueError):
        multimodal._decode_image_stub(b"")
