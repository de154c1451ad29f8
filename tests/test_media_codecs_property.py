"""Property-based round-trips for the hand-written media codecs: random
shapes, filter schedules, palettes, and pixel data — the encoders apply
forward transforms (filtering, LZW compression, DCT), so round-trip
equality across the generated space proves the decoders' inverses."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from websearchengine_spark.operators import jpeg as J
from websearchengine_spark.operators import multimodal as M


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_property(h, w, seed, data):
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    got = M.decode_image(M.encode_png(px, filters=filters))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), px)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(2, 16),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_gif_roundtrip_property(h, w, n_colors, seed, interlace):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    got = M.decode_image(M.encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[idx])


@settings(max_examples=15, deadline=None)
@given(
    bh=st.integers(1, 3),
    bw=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
    restart=st.sampled_from([0, 1, 2]),
)
def test_jpeg_blockconstant_property(bh, bw, seed, restart):
    """Per-block-constant images stay bit-exact at q=1 for any block grid
    and any restart interval."""
    vals = np.random.default_rng(seed).integers(
        0, 256, size=(bh, bw), dtype=np.uint8
    )
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    got = J.decode_jpeg(J.encode_jpeg(gray, restart_interval=restart))
    assert np.array_equal(got[..., 0], gray)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_q1_error_bound_property(h, w, seed):
    """Arbitrary gray content at q=1: error comes only from accumulated
    DCT-coefficient rounding.  Empirically ≤1 on almost all inputs and
    ≤2 on tiny edge-padded blocks where the rounding concentrates
    (hypothesis found a 2x2 case at exactly 2); assert a conservative ≤4
    — the hard bit-exactness guarantee lives in the block-constant
    property, where no coefficient rounds."""
    g = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(g))[..., 0].astype(int)
    assert got.shape == (h, w)
    assert np.abs(got - g.astype(int)).max() <= 4
