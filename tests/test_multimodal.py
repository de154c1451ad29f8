"""Multimodal: REAL decoders (BMP / netpbm / PNG incl. packed sub-8-bit
/ GIF / baseline + full-progressive JPEG / PCM WAV / YUV4MPEG2) proved
against independently-written encoders, a header-only probe for every
container (incl. MP4 box walk and MP3 frame walk), honest
NotImplementedError for payloads the container can't parse (MP3/MP4
decode, arithmetic/12-bit JPEG), plus the Spark plumbing (schema,
fan-out, determinism)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from websearchengine_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media_df(spark, 24).cache()


# --------------------------------------------------------------------------
# decoder correctness vs known pixels/samples
# --------------------------------------------------------------------------


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = M.decode_image(M.encode_bmp(px))
    assert got.shape == (5, 7, 3)
    assert np.array_equal((got * 255.0).round().astype(np.uint8), px)


def test_ppm_and_pgm_decode():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    ppm = b"P6\n# comment\n3 2\n255\n" + px.tobytes()
    got = M.decode_image(ppm)
    assert np.array_equal((got * 255.0).round().astype(np.uint8), px)
    gray = np.array([[0, 128], [255, 64]], dtype=np.uint8)
    pgm = b"P5\n2 2\n255\n" + gray.tobytes()
    g = M.decode_image(pgm)
    assert g.shape == (2, 2, 3)
    assert np.array_equal((g[..., 0] * 255.0).round().astype(np.uint8), gray)
    assert np.array_equal(g[..., 0], g[..., 2])  # replicated channels


def test_wav_roundtrip():
    t = np.arange(400) / 8000.0
    wave = 0.25 * np.sin(2 * np.pi * 440 * t)
    samples, rate = M.decode_audio(M.encode_wav(wave, 8000))
    assert rate == 8000 and samples.shape == (400, 1)
    assert np.allclose(samples[:, 0], wave, atol=1.5 / 32767)


def test_y4m_frame_sampling():
    frames = [np.full((4, 6), v, dtype=np.uint8) for v in (0, 60, 120, 180, 240)]
    blob = M.encode_y4m(frames, 6, 4)
    got = M.y4m_frames(blob, 3)  # evenly spaced -> frames 0, 2, 4
    assert len(got) == 3
    for f, v in zip(got, (0, 120, 240)):
        assert f.shape == (4, 6, 3)
        assert np.allclose(f, v / 255.0)


def test_resize_nearest():
    px = np.array([[[0.0] * 3, [1.0] * 3]] * 2)  # 2x2, left black right white
    up = M.resize_image(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.all(up[:, :2] == 0.0) and np.all(up[:, 2:] == 1.0)


def test_png_roundtrip_every_filter():
    """The decoder must invert every scanline filter type exactly; the
    encoder applies the FORWARD filter transform (a distinct computation),
    so agreement proves the inverse, not a shared bug."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for ft in range(5):
        got = M.decode_image(M.encode_png(px, filters=[ft] * 7))
        assert np.array_equal(
            (got * 255.0).round().astype(np.uint8), px
        ), f"filter {ft}"
    # mixed filters down one image
    got = M.decode_image(M.encode_png(px, filters=[0, 1, 2, 3, 4, 2, 1]))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), px)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    g = M.decode_image(M.encode_png(gray, filters=[1, 4, 2, 3], color=0))
    assert g.shape == (4, 6, 3)
    assert np.array_equal((g[..., 0] * 255.0).round().astype(np.uint8), gray)
    assert np.array_equal(g[..., 0], g[..., 2])  # replicated channels
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = M.decode_image(M.encode_png(rgba, filters=[4, 3, 1], color=6))
    # alpha dropped, RGB exact
    assert np.array_equal(
        (got * 255.0).round().astype(np.uint8), rgba[..., :3]
    )


def test_png_zlib_stream_is_real():
    """The blob really is DEFLATE-compressed — corrupting the IDAT body
    must fail the zlib stream, proving decode isn't reading raw bytes."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = bytearray(M.encode_png(px))
    idat = blob.index(b"IDAT")
    blob[idat + 8] ^= 0xFF
    with pytest.raises(Exception):
        M.decode_image(bytes(blob))


def test_png_unsupported_variants_raise():
    import struct as _s
    import zlib as _z

    def chunk(ctype, body):
        return (_s.pack(">I", len(body)) + ctype + body
                + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # illegal bit depth
    hdr3 = chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0))
    with pytest.raises(ValueError):
        M.decode_image(sig + hdr3 + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
    # packed depth is gray/palette-only: 4-bit RGB is illegal
    hdr4 = chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
    with pytest.raises(ValueError):
        M.decode_image(sig + hdr4 + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
    # invalid interlace method
    hdr_i = chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7))
    with pytest.raises(ValueError):
        M.decode_image(sig + hdr_i + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
    # palette image missing its PLTE
    hdr_p = chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
    body = _z.compress(b"\x00\x00")
    with pytest.raises(ValueError):
        M.decode_image(sig + hdr_p + chunk(b"IDAT", body) + chunk(b"IEND", b""))


def test_png_adam7_interlace_roundtrip():
    """Adam7: seven independently-filtered sub-images scattered on the
    pass grid; round-trip must be pixel-exact and equal the
    non-interlaced decode, including tiny sizes where later passes are
    empty and every filter type inside passes."""
    rng = np.random.default_rng(13)
    for h, w in [(1, 1), (2, 3), (5, 5), (8, 8), (13, 19)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = M.decode_image(
            M.encode_png(px, filters=[0, 1, 2, 3, 4], interlace=True)
        )
        assert np.array_equal(
            (got * 255.0).round().astype(np.uint8), px
        ), (h, w)
        plain = M.decode_image(M.encode_png(px))
        assert np.array_equal(got, plain)
    # gray + RGBA through the interlaced path too
    gray = rng.integers(0, 256, size=(9, 6), dtype=np.uint8)
    g = M.decode_image(M.encode_png(gray, filters=[4, 2], color=0,
                                    interlace=True))
    assert np.array_equal((g[..., 0] * 255.0).round().astype(np.uint8), gray)
    rgba = rng.integers(0, 256, size=(10, 11, 4), dtype=np.uint8)
    got = M.decode_image(M.encode_png(rgba, filters=[3], color=6,
                                      interlace=True))
    assert np.array_equal(
        (got * 255.0).round().astype(np.uint8), rgba[..., :3]
    )


def test_png_palette_decode():
    """Color type 3: indices map through PLTE."""
    import struct as _s
    import zlib as _z

    def chunk(ctype, body):
        return (_s.pack(">I", len(body)) + ctype + body
                + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF))

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    # 3x2 image of indices, filter 0 rows
    scan = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 2, 0])
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", _z.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = (M.decode_image(blob) * 255.0).round().astype(np.uint8)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 255], [0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    assert np.array_equal(got, expect)


def test_png_packed_gray_roundtrip():
    """1/2/4-bit packed gray: MSB-first samples, byte-padded scanlines,
    filtering on the packed bytes with bpp=1.  Decode must equal the
    sample value expanded to the full 8-bit range (255/(2^d-1) steps),
    across sizes that exercise pad bits and every filter type, plain and
    Adam7."""
    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for h, w in [(1, 1), (2, 3), (5, 7), (8, 8), (9, 17)]:
            vals = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
            for interlace in (False, True):
                blob = M.encode_png(
                    vals, filters=[0, 1, 2, 3, 4], color=0, depth=depth,
                    interlace=interlace,
                )
                got = (M.decode_image(blob) * 255.0).round().astype(np.uint8)
                assert got.shape == (h, w, 3), (depth, h, w, interlace)
                assert np.array_equal(got[..., 0], vals * scale), (
                    depth, h, w, interlace)


def test_png_packed_palette_roundtrip():
    """1/2/4-bit packed palette indices map through PLTE; 8-bit palette
    through the encoder path proves PLTE emission against the existing
    hand-built decode test."""
    rng = np.random.default_rng(29)
    for depth in (1, 2, 4, 8):
        n_colors = 1 << min(depth, 4)
        palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
        for h, w in [(1, 2), (3, 5), (6, 11)]:
            idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
            for interlace in (False, True):
                blob = M.encode_png(
                    idx, filters=[2, 0, 1], color=3, depth=depth,
                    palette=palette, interlace=interlace,
                )
                got = (M.decode_image(blob) * 255.0).round().astype(np.uint8)
                assert np.array_equal(got, palette[idx]), (
                    depth, h, w, interlace)


def test_gif_roundtrip_random_palette():
    """Hand-rolled LZW decode vs a genuinely-compressing LZW encoder:
    random indices force long literal stretches, repetition forces
    dictionary sequences — round-trip must be pixel-exact."""
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(9, 11), dtype=np.uint8)
    got = M.decode_image(M.encode_gif(idx, pal))
    assert got.shape == (9, 11, 3)
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[idx])


def test_gif_repetitive_kwkwk_and_dict_growth():
    """All-same and tiled inputs drive the KwKwK code path and the
    growing code widths; a big image overflows the 4096-entry dictionary
    and forces a mid-stream reset the decoder must follow."""
    pal = np.array([[0, 0, 0], [255, 255, 255], [10, 20, 30], [200, 100, 0]],
                   dtype=np.uint8)
    flat = np.zeros((16, 16), dtype=np.uint8)  # all one color -> KwKwK
    got = M.decode_image(M.encode_gif(flat, pal))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[flat])
    rng = np.random.default_rng(22)
    big = rng.integers(0, 4, size=(160, 160), dtype=np.uint8)  # 25.6k px
    got = M.decode_image(M.encode_gif(big, pal))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[big])


def test_gif_interlaced():
    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(13, 6), dtype=np.uint8)
    got = M.decode_image(M.encode_gif(idx, pal, interlace=True))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[idx])


def test_gif_skips_extensions():
    """A GIF89a graphic-control extension before the image descriptor
    must be skipped, not tripped over."""
    pal = np.array([[5, 6, 7], [8, 9, 10]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    blob = bytearray(M.encode_gif(idx, pal))
    # splice a GCE (0x21 0xF9, one 4-byte sub-block, terminator) right
    # before the image descriptor (0x2C)
    at = blob.index(0x2C, 13)
    blob[at:at] = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    got = M.decode_image(bytes(blob))
    assert np.array_equal((got * 255.0).round().astype(np.uint8), pal[idx])


# --------------------------------------------------------------------------
# JPEG (operators/jpeg.py)
# --------------------------------------------------------------------------


def test_jpeg_dct_matrix_matches_direct_formula():
    """The decoder's IDCT must equal the Annex A double-cosine sum computed
    directly (an independent math path, no matrix factoring)."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(31)
    coef = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)
    got = J._M.T @ coef @ J._M
    want = np.zeros((8, 8))
    c = np.ones(8)
    c[0] = 1 / np.sqrt(2)
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c[u] * c[v] * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[x, y] = s / 4.0
    assert np.allclose(got, want, atol=1e-9)


def test_jpeg_blockconstant_bitexact():
    """With all-ones quant tables a per-block-constant image has only an
    integral DC coefficient per block — the full pipeline (DCT, quantize,
    zigzag, Huffman, markers, DC prediction) must round-trip bit-exactly,
    with and without restart markers."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(32)
    vals = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(gray))[..., 0], gray)
    got = J.decode_jpeg(J.encode_jpeg(gray, restart_interval=2))
    assert np.array_equal(got[..., 0], gray)


def test_jpeg_roundtrip_error_bounds():
    """q=1 round-trips are bounded by coefficient rounding: ±1 gray level
    for grayscale, ±2 through the YCbCr transform; non-multiple-of-8
    sizes exercise edge padding + crop."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(33)
    g = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(g))[..., 0].astype(int)
    assert np.abs(got - g.astype(int)).max() <= 1
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got3 = J.decode_jpeg(J.encode_jpeg(px)).astype(int)
    assert np.abs(got3 - px.astype(int)).max() <= 2


def test_jpeg_420_subsampling_smooth():
    """4:2:0 chroma subsampling on a chroma-smooth gradient stays within
    transform rounding; the decoder must replicate-upsample the half-size
    chroma planes against a full-size luma."""
    from websearchengine_spark.operators import jpeg as J

    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = np.stack(
        [(xx * 3 + yy) % 256, (xx + yy * 2) % 256, (xx * 2 + yy * 2) % 256],
        -1,
    ).astype(np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(smooth, subsample=True)).astype(int)
    assert np.abs(got - smooth.astype(int)).max() <= 3


def test_jpeg_lossy_quant_actually_compresses():
    """A q=16 table must shrink the entropy stream vs q=1 on the same
    image (real quantization, not a pass-through) while staying a
    recognizable image (bounded error on smooth input)."""
    from websearchengine_spark.operators import jpeg as J

    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    smooth = ((np.sin(xx / 5.0) + np.cos(yy / 7.0)) * 60 + 128).astype(np.uint8)
    hi = J.encode_jpeg(smooth)
    lo = J.encode_jpeg(smooth, qtable=np.full((8, 8), 16, int))
    assert len(lo) < len(hi)
    got = J.decode_jpeg(lo)[..., 0].astype(int)
    assert np.abs(got - smooth.astype(int)).max() <= 24


def test_jpeg_through_decode_image():
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(34)
    vals = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    got = M.decode_image(J.encode_jpeg(gray))
    assert got.shape == (16, 16, 3)
    assert np.array_equal((got[..., 0] * 255.0).round().astype(np.uint8), gray)


def test_jpeg_progressive_equals_baseline():
    """Spectral-selection progressive (SOF2) transports the SAME
    quantized coefficients as baseline, so decode must be bit-identical
    to the baseline decode — gray, RGB 4:4:4, multiple band splits, and
    lossy tables; a flat image drives one EOBn covering every block."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(36)
    g = rng.integers(0, 256, size=(19, 27), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(g)),
        J.decode_jpeg(J.encode_jpeg_progressive(g)),
    )
    px = rng.integers(0, 256, size=(17, 14, 3), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(px)),
        J.decode_jpeg(J.encode_jpeg_progressive(px)),
    )
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(px)),
        J.decode_jpeg(
            J.encode_jpeg_progressive(px, bands=((1, 2), (3, 20), (21, 63)))
        ),
    )
    q = np.full((8, 8), 16, int)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(px, qtable=q)),
        J.decode_jpeg(J.encode_jpeg_progressive(px, qtable=q)),
    )
    # sparse image -> EOBn runs spanning many blocks; progressive stream
    # must also be SMALLER than baseline here (EOB-run accumulation)
    sp = np.full((64, 64), 128, dtype=np.uint8)
    sp[5, 7], sp[40, 33], sp[63, 63] = 250, 3, 200
    pblob, bblob = J.encode_jpeg_progressive(sp), J.encode_jpeg(sp)
    assert np.array_equal(J.decode_jpeg(pblob), J.decode_jpeg(bblob))
    assert len(pblob) < len(bblob)
    flat = np.full((64, 64), 77, dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg_progressive(flat))
    assert np.array_equal(got[..., 0], flat)


def test_jpeg_successive_approximation_equals_baseline():
    """Successive approximation (Ah/Al != 0) splits each coefficient
    into bit planes; once every refinement scan lands the coefficients
    are bit-identical to the single-scan stream, so decode must equal
    the baseline decode exactly — gray and RGB, multiple Al depths,
    multi-band splits, lossy tables, and a sparse image that drives
    EOBn runs with buffered correction bits through refinement."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(37)
    g = rng.integers(0, 256, size=(19, 27), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(g))
    for approx in (1, 2, 3):
        got = J.decode_jpeg(J.encode_jpeg_progressive(g, approx=approx))
        assert np.array_equal(base, got), approx
    px = rng.integers(0, 256, size=(17, 14, 3), dtype=np.uint8)
    q = np.full((8, 8), 12, int)
    base = J.decode_jpeg(J.encode_jpeg(px, qtable=q))
    got = J.decode_jpeg(
        J.encode_jpeg_progressive(
            px, qtable=q, approx=2, bands=((1, 2), (3, 20), (21, 63))
        )
    )
    assert np.array_equal(base, got)
    # sparse image: nearly-all-zero bands -> refinement scans are EOBn
    # runs whose correction bits ride behind the EOBn symbol
    sp = np.full((64, 64), 128, dtype=np.uint8)
    sp[5, 7], sp[40, 33], sp[63, 63] = 250, 3, 200
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(sp)),
        J.decode_jpeg(J.encode_jpeg_progressive(sp, approx=2)),
    )


def test_jpeg_progressive_subsampled_equals_baseline():
    """Progressive + chroma subsampling: interleaved DC scans cover the
    MCU-padded block grid while AC scans cover each component's own
    non-interleaved grid — decode must equal the baseline subsampled
    decode exactly, with and without successive approximation."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(38)
    for mode in ("420", "422"):
        for hh, ww in [(16, 16), (17, 14), (8, 9), (24, 33)]:
            px = rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)
            base = J.decode_jpeg(J.encode_jpeg(px, subsample=mode))
            prog = J.decode_jpeg(
                J.encode_jpeg_progressive(px, subsample=mode)
            )
            assert np.array_equal(base, prog), (mode, hh, ww)
            prog_sa = J.decode_jpeg(
                J.encode_jpeg_progressive(px, subsample=mode, approx=2)
            )
            assert np.array_equal(base, prog_sa), (mode, hh, ww)


def test_jpeg_progressive_restart_markers_equal_baseline():
    """DRI inside a progressive frame: every scan byte-aligns to RSTn
    each N restart units (MCUs in interleaved DC scans, blocks in
    non-interleaved AC scans), resetting DC predictions and EOB runs.
    Decode must equal the no-restart decode exactly — gray and RGB,
    with subsampling and successive approximation, and with an interval
    small enough that EOB runs are forced to flush at boundaries."""
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(39)
    g = rng.integers(0, 256, size=(19, 27), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(g))
    for ri in (1, 2, 5):
        got = J.decode_jpeg(
            J.encode_jpeg_progressive(g, restart_interval=ri)
        )
        assert np.array_equal(base, got), ri
    px = rng.integers(0, 256, size=(24, 33, 3), dtype=np.uint8)
    for mode in (False, "420", "422"):
        base = J.decode_jpeg(J.encode_jpeg(px, subsample=mode))
        got = J.decode_jpeg(
            J.encode_jpeg_progressive(
                px, subsample=mode, approx=2, restart_interval=2
            )
        )
        assert np.array_equal(base, got), mode
    # sparse image: EOB runs would span many blocks but must flush at
    # every restart boundary (decoder resets eobrun at RSTn)
    sp = np.full((64, 64), 128, dtype=np.uint8)
    sp[5, 7], sp[40, 33], sp[63, 63] = 250, 3, 200
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(sp)),
        J.decode_jpeg(
            J.encode_jpeg_progressive(sp, approx=1, restart_interval=3)
        ),
    )
    # a declared DRI with no RSTn in the entropy stream is corrupt ->
    # loud ValueError, not a wrong image
    blob = bytearray(J.encode_jpeg_progressive(sp))
    first = blob.index(b"\xff\xda")
    blob[first:first] = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(blob))


def test_jpeg_unsupported_variants_raise():
    from websearchengine_spark.operators import jpeg as J

    rng = np.random.default_rng(35)
    px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)

    # arithmetic-coded progressive (SOF10) rejected at SOF parse
    blob2 = bytearray(J.encode_jpeg_progressive(px))
    at = blob2.index(b"\xff\xc2")
    blob2[at + 1] = 0xCA
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(blob2))
    # 12-bit precision rejected
    blob3 = bytearray(J.encode_jpeg(px))
    at = blob3.index(b"\xff\xc0")
    blob3[at + 4] = 12  # SOF precision byte
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(blob3))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNG not a jpeg")


# --------------------------------------------------------------------------
# container probe (header-only metadata)
# --------------------------------------------------------------------------


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _craft_mp4(w=640, h=360, timescale=1000, duration=2500) -> bytes:
    mvhd = b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0) + struct.pack(
        ">II", timescale, duration
    ) + b"\x00" * 80
    tkhd = b"\x00\x00\x00\x00" + b"\x00" * 72 + struct.pack(
        ">II", w << 16, h << 16
    )
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _mp4_box(
        b"moov", moov
    )


def _craft_mp3(n_frames=3) -> bytes:
    # MPEG-1 Layer III, 128 kbit/s (idx 9), 44100 Hz (idx 0), no padding:
    # frame length 144*128000/44100 = 417 bytes
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413
    return b"ID3" + b"\x04\x00\x00" + b"\x00\x00\x00\x0a" + b"\x00" * 10 \
        + frame * n_frames


def test_probe_image_formats():
    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert M.probe_media(M.encode_bmp(px)) == {
        "container": "bmp", "width": 9, "height": 6}
    assert M.probe_media(M.encode_png(px)) == {
        "container": "png", "width": 9, "height": 6}
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 9), dtype=np.uint8)
    assert M.probe_media(M.encode_gif(idx, pal)) == {
        "container": "gif", "width": 9, "height": 6}
    from websearchengine_spark.operators import jpeg as J

    got = M.probe_media(J.encode_jpeg(px))
    assert (got["container"], got["width"], got["height"]) == ("jpeg", 9, 6)
    assert got["progressive"] is False


def test_probe_av_formats():
    t = np.arange(8820) / 44100.0  # 200 ms
    wav = M.probe_media(M.encode_wav(0.1 * np.sin(880 * t), 44100))
    assert wav["container"] == "wav" and wav["duration_ms"] == 200
    frames = [np.zeros((4, 6), dtype=np.uint8)] * 5
    y4m = M.probe_media(M.encode_y4m(frames, 6, 4))
    assert y4m["container"] == "y4m" and y4m["n_frames"] == 5
    assert y4m["duration_ms"] == 200  # 5 frames at F25:1


def test_probe_mp4_box_walk():
    got = M.probe_media(_craft_mp4())
    assert got["container"] == "mp4" and got["brand"] == "isom"
    assert (got["width"], got["height"]) == (640, 360)
    assert got["duration_ms"] == 2500 and got["n_tracks"] == 1
    with pytest.raises(ValueError):
        M.probe_media(_mp4_box(b"ftyp", b"isom") + _mp4_box(b"moov", b""))


def test_probe_mp3_frame_walk():
    got = M.probe_media(_craft_mp3(3))
    assert got["container"] == "mp3" and got["n_frames"] == 3
    assert got["sample_rate"] == 44100 and got["cbr_kbps"] == 128
    assert got["duration_ms"] == int(3 * 1152 * 1000 / 44100)
    # decode of the same blob still honestly refuses
    with pytest.raises(NotImplementedError):
        M.decode_audio(_craft_mp3(1))


def test_probe_media_df(spark, media):
    out = {r.media_id: r for r in M.probe_media_df(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(out) == len(src)
    for mid, r in out.items():
        assert r.probe_error is None, r
        if src[mid].kind == "image":
            assert (r.width, r.height) == (src[mid].width, src[mid].height)
        elif src[mid].kind == "audio":
            assert r.container == "wav" and r.duration_ms is not None
        else:
            assert r.container == "y4m"
    # corrupt blob reports its error instead of failing the job
    bad = spark.createDataFrame(
        [(999, "image", None, b"????", None, None, None)], M.MEDIA_SCHEMA
    )
    row = M.probe_media_df(bad).head()
    assert row.probe_error and row.container is None


def test_compressed_codecs_raise():
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # truncated JPEG
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"ID3\x04" + b"\x00" * 32)  # MP3
    with pytest.raises(ValueError):
        M.decode_image(b"")
    with pytest.raises(ValueError):
        M.decode_image(b"????not a container")


def test_bmp_unsupported_depth_raises():
    # 8bpp header
    hdr = struct.pack("<2sIHHI", b"BM", 100, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0
    ) + b"\x00" * 64
    with pytest.raises(NotImplementedError):
        M.decode_image(hdr)


# --------------------------------------------------------------------------
# Spark plumbing
# --------------------------------------------------------------------------


def test_feature_schema_and_determinism(spark, media):
    out = M.extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "blob_bytes", "content_hash", "feature",
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 24
    src = {r.media_id: bytes(r.blob) for r in media.collect()}
    for mid, r in rows.items():
        assert len(r.feature) == M.FEATURE_DIM
        assert r.blob_bytes == len(src[mid])
        assert r.content_hash == hashlib.md5(src[mid]).hexdigest()
        assert np.isfinite(r.feature).all()
    # rerun -> identical features (real decode of fixed bytes)
    again = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    for mid in rows:
        assert np.allclose(rows[mid].feature, again[mid])


def test_image_features_reflect_pixels(spark, media):
    """Feature vector is real pixel statistics: a known all-white BMP maps
    to all-1.0 grid means."""
    white = M.encode_bmp(np.full((4, 4, 3), 255, dtype=np.uint8))
    df = spark.createDataFrame(
        [(99, "image", "image/bmp", white, 4, 4, None)], M.MEDIA_SCHEMA
    )
    r = M.extract_features(df).head()
    feat = np.array(r.feature)
    assert np.allclose(feat[:12], 1.0)       # 2x2 grid x RGB means
    assert feat[12] == pytest.approx(1.0)     # global mean
    assert feat[13] == pytest.approx(0.0)     # global std


def test_frame_sampling_fanout(spark, media):
    vids = media.where(media.kind == "video")
    n_vids = vids.count()
    frames = M.sample_frames(vids, n_frames=4)
    rows = frames.collect()
    assert len(rows) == n_vids * 4
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_no)
        assert len(r.frame_feature) == M.FEATURE_DIM
    for nos in per.values():
        assert sorted(nos) == [0, 1, 2, 3]


def test_jpeg_422_subsampling():
    """4:2:2 (horizontal-only chroma pooling): 2x1 luma blocks per MCU,
    horizontal replication upsample — bounded error on chroma-smooth
    input, tighter than 4:2:0."""
    from websearchengine_spark.operators import jpeg as J

    xx, yy = np.meshgrid(np.arange(30), np.arange(22))
    smooth = np.stack(
        [(xx * 3 + yy) % 256, (xx + yy * 2) % 256, (xx * 2 + yy * 2) % 256],
        -1,
    ).astype(np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(smooth, subsample="422")).astype(int)
    assert got.shape == smooth.shape
    assert np.abs(got - smooth.astype(int)).max() <= 2


def test_png_16bit_roundtrip():
    """16-bit PNG: big-endian samples, byte-wise filters (bpp = ch*2) —
    round-trip exact at 1/65535 precision, plain and Adam7, RGB and
    gray; palette+16-bit is invalid and rejected."""
    import struct as _s
    import zlib as _z

    rng = np.random.default_rng(17)
    px16 = rng.integers(0, 65536, size=(7, 9, 3), dtype=np.uint16)
    got = M.decode_image(M.encode_png(px16, filters=[0, 1, 2, 3, 4], depth=16))
    assert np.array_equal(
        np.round(got * 65535.0).astype(np.uint16), px16
    )
    g16 = rng.integers(0, 65536, size=(11, 5), dtype=np.uint16)
    got2 = M.decode_image(
        M.encode_png(g16, filters=[4, 3], color=0, depth=16, interlace=True)
    )
    assert np.array_equal(
        np.round(got2[..., 0] * 65535.0).astype(np.uint16), g16
    )
    assert np.array_equal(got2[..., 0], got2[..., 2])

    def chunk(ctype, body):
        return (_s.pack(">I", len(body)) + ctype + body
                + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0))
           + chunk(b"IDAT", _z.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        M.decode_image(bad)


def test_encode_jpeg_rejects_out_of_range_qtable():
    """DQT is emitted with pq=0 (8-bit); entries > 255 must raise instead
    of silently wrapping mod 256 into a wrong-pixel stream."""
    from websearchengine_spark.operators import jpeg as J

    px = np.full((8, 8), 128, np.uint8)
    bad = np.full((8, 8), 300, np.int64)
    with pytest.raises(NotImplementedError):
        J.encode_jpeg(px, qtable=bad)
    with pytest.raises(NotImplementedError):
        J.encode_jpeg_progressive(px, qtable=bad)
    with pytest.raises(ValueError):
        J.encode_jpeg(px, qtable=np.ones((4, 4), np.int64))
