"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

Decode is REAL for the uncompressed container formats a numpy-only
environment can parse bit-exactly from their public specs:

- images: BMP (24-bit BI_RGB, bottom-up, 4-byte row padding), netpbm
  P6/P5 (binary PPM/PGM), PNG (1/2/4-bit packed, 8/16-bit,
  gray/RGB/palette/RGBA, plain AND Adam7-interlaced — DEFLATE via stdlib
  ``zlib`` + numpy unfiltering of all five scanline filters), GIF
  87a/89a (hand-rolled LZW decompressor, variable code widths,
  interlace), and JPEG — baseline AND full progressive
  (operators/jpeg.py: Huffman entropy decode from arbitrary DHT tables,
  dequant, IDCT, 4:2:0/4:2:2/4:4:4, restart markers, SOF2 multi-scan
  with EOBn runs, spectral selection x successive approximation) — no
  codec library anywhere;
- audio: RIFF/WAVE PCM (8/16-bit, any channel count);
- video: YUV4MPEG2 (y4m) — uncompressed frame stream with FRAME markers
  (C420/C444/Cmono), the interchange format ffmpeg pipelines emit.

Codecs needing real entropy/transform stacks this container cannot verify
(MP3, MP4/H.264...) raise ``NotImplementedError`` loudly rather than fake
an answer, as do format variants outside the supported subsets
(arithmetic/12-bit/hierarchical JPEG, DRI-in-progressive).  MP3 Layer III
specifically stays a rejection BY POLICY, not difficulty: a compliant
decoder needs the ISO 11172-3 Huffman code tables and the 512-tap
polyphase window — normative spec DATA with no closed form and no copy
in this environment.  A from-memory reconstruction would be
self-consistent (an encoder/decoder pair built on the same wrong tables
round-trips perfectly) yet mis-decode every real-world file, which is
strictly worse than the honest rejection + real header probe
(``_probe_mp3``: frame walk, duration, CBR rate) shipped here.  Resize is a
real nearest-neighbor
resample (index arithmetic); features are real statistics of decoded
pixels/samples.

Scale notes: media blobs dominate row size, so the operators (a) never
shuffle blobs — decode + feature extraction happen map-side and the
binary drops in the task that read it; (b) emit fixed-width feature
vectors independent of blob size; (c) rely on
``spark.sql.files.maxPartitionBytes`` to bound task input (blobs stream
through Arrow in bounded record batches).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

_COMPRESSED_MAGICS = {
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
    b"ID3": "mp3",
    b"\xff\xfb": "mp3",
}

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _reject_compressed(blob: bytes) -> None:
    for magic, name in _COMPRESSED_MAGICS.items():
        if blob.startswith(magic):
            raise NotImplementedError(
                f"{name} decode requires a codec library not present in "
                "this environment; supported real formats: BMP, PPM/PGM, "
                "PNG, GIF, JPEG, PCM WAV, "
                "YUV4MPEG2"
            )


# --------------------------------------------------------------------------
# image decode (real): BMP 24-bit + netpbm P6/P5
# --------------------------------------------------------------------------


def decode_image(blob: bytes) -> np.ndarray:
    """binary -> float32 HxWx3 in [0,1].  BMP per the BITMAPINFOHEADER
    spec (24bpp BI_RGB, BGR order, bottom-up rows padded to 4 bytes);
    netpbm P6 (RGB) / P5 (gray, replicated to 3 channels)."""
    if not blob:
        raise ValueError("empty media blob")
    blob = bytes(blob)
    _reject_compressed(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] in (b"P6", b"P5"):
        return _decode_pnm(blob)
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        from websearchengine_spark.operators import jpeg

        return jpeg.decode_jpeg(blob).astype(np.float32) / 255.0
    raise ValueError(f"unrecognized image container (magic {blob[:4]!r})")


def _decode_bmp(blob: bytes) -> np.ndarray:
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", blob, 14)[:3]
    h_signed = struct.unpack_from("<i", blob, 22)[0]
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(blob) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(blob, dtype=np.uint8, count=row_bytes * h,
                        offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return (rows[..., ::-1]).astype(np.float32) / 255.0  # BGR -> RGB


def _decode_pnm(blob: bytes) -> np.ndarray:
    # header: magic, whitespace/comment-separated w, h, maxval, single ws,
    # then raw samples
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(int(blob[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if blob[:2] == b"P6" else 1
    raw = np.frombuffer(blob, dtype=np.uint8, count=w * h * ch, offset=i)
    px = raw.reshape(h, w, ch).astype(np.float32) / float(maxval)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def _decode_gif(blob: bytes) -> np.ndarray:
    """Real GIF decode (87a/89a) with a hand-rolled LZW decompressor — no
    codec library.  Parses the logical screen descriptor, global/local
    color tables, skips extensions, and decodes the FIRST image
    descriptor (animation frames beyond the first are out of scope for
    features); handles variable code widths (up to 12 bits), clear/end
    codes, the KwKwK case, and the 4-pass interlace row order."""
    w_s, h_s, flags = struct.unpack_from("<HHB", blob, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(blob):
        b0 = blob[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            i += 2
            while blob[i] != 0:
                i += 1 + blob[i]
            i += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"corrupt GIF block 0x{b0:02x}")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", blob, i + 1)
        i += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = blob[i]
        i += 1
        data = bytearray()
        while blob[i] != 0:
            sz = blob[i]
            data += blob[i + 1 : i + 1 + sz]
            i += 1 + sz
        i += 1
        idx = _lzw_decode(bytes(data), min_code, w * h)
        px = ct[np.array(idx[: w * h], dtype=np.int32)].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        return px.astype(np.float32) / 255.0
    raise ValueError("GIF has no image descriptor")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list[int]:
    """GIF-variant LZW: initial code width min_code+1, dictionary grows to
    4096 entries, CLEAR resets, codes are little-endian bit-packed."""
    clear = 1 << min_code
    end = clear + 1
    bitbuf = bitlen = pos = 0
    width = min_code + 1
    dict_: list[list[int]] = [[c] for c in range(clear)] + [[], []]
    prev: list[int] | None = None
    out: list[int] = []
    while len(out) < max_pixels:
        while bitlen < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            bitbuf |= data[pos] << bitlen
            bitlen += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitlen -= width
        if code == clear:
            dict_ = [[c] for c in range(clear)] + [[], []]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dict_) and dict_[code]:
            entry = dict_[code]
        elif code == len(dict_) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out.extend(entry)
        if prev is not None and len(dict_) < 4096:
            dict_.append(prev + [entry[0]])
            if len(dict_) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


# PNG color type -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_png(blob: bytes) -> np.ndarray:
    """Real PNG decode with stdlib ``zlib`` + numpy unfiltering — no codec
    library.  Supports every legal depth/color combination: 1/2/4-bit
    packed (gray + palette, MSB-first, byte-padded scanlines), 8-bit,
    16-bit (big-endian samples), color types 0 (gray) / 2 (RGB) / 3
    (palette) / 4 (gray+alpha) / 6 (RGBA), all five scanline filters
    (None/Sub/Up/Average/Paeth), and BOTH interlace modes — Adam7 passes
    are seven independently-filtered sub-images scattered on the
    (x0, y0, dx, dy) grid.  Alpha is dropped (features pool over
    color)."""
    import zlib

    i, hdr, plte, idat = 8, None, None, []
    while i + 8 <= len(blob):
        length = struct.unpack_from(">I", blob, i)[0]
        ctype = blob[i + 4 : i + 8]
        body = blob[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + body + crc
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if depth < 8 and color not in (0, 3):
        raise ValueError(f"{depth}-bit PNG invalid for color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("palette PNG cannot be 16-bit")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color]
    nb = depth // 8  # PNG filters operate on BYTES; bpp = max(1, ch * nb)
    raw = zlib.decompress(b"".join(idat))

    def row_stride(pix_w: int) -> int:
        # packed depths (1/2/4, gray or palette only, ch == 1) pad each
        # scanline to a byte boundary; filtering still runs on the
        # packed BYTES with bpp = 1 (PNG spec §9)
        return (pix_w * ch * depth + 7) // 8

    def samples_of(rows: np.ndarray, ph: int, pw: int) -> np.ndarray:
        if depth < 8:
            return _png_unpack(rows, ph, pw, depth)
        return _png_samples(rows, ph, pw, ch, nb)

    fbpp = max(1, ch * nb)
    if interlace == 1:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, ch), np.uint8 if depth <= 8 else np.uint16)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = row_stride(pw)
            need = ph * (pstride + 1)
            if len(raw) < off + need:
                raise ValueError("truncated PNG Adam7 pass data")
            sub = _png_unfilter(
                np.frombuffer(raw, np.uint8, need, off), ph, pstride, fbpp
            )
            off += need
            px[y0::dy, x0::dx] = samples_of(sub, ph, pw)
    else:
        stride = row_stride(w)
        if len(raw) < h * (stride + 1):
            raise ValueError("truncated PNG scanline data")
        samples = _png_unfilter(
            np.frombuffer(raw, dtype=np.uint8), h, stride, fbpp
        )
        px = samples_of(samples, h, w)
    if color == 3:
        px = plte[px[..., 0]]
    elif depth < 8:  # packed gray: expand sample to full 8-bit range
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    elif ch == 2:  # gray+alpha -> gray
        px = px[..., :1]
    elif ch == 4:  # RGBA -> RGB
        px = px[..., :3]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    maxval = 65535.0 if px.dtype == np.uint16 else 255.0
    return px.astype(np.float32) / maxval


def _png_samples(
    rows: np.ndarray, h: int, w: int, ch: int, nb: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> (h, w, ch) samples; 16-bit samples are
    big-endian per the PNG spec."""
    if nb == 1:
        return rows.reshape(h, w, ch)
    return (
        rows.reshape(h, w * ch * 2)
        .view(">u2")
        .astype(np.uint16)
        .reshape(h, w, ch)
    )


def _png_unpack(
    rows: np.ndarray, h: int, w: int, depth: int
) -> np.ndarray:
    """Packed 1/2/4-bit scanline bytes -> (h, w, 1) raw sample values.
    Samples pack MSB-first within each byte; scanlines are byte-padded,
    so per-row unpacking drops the pad bits past w samples."""
    per_byte = 8 // depth
    stride = rows.size // h
    bits = np.unpackbits(rows.reshape(h, stride), axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (
        bits.reshape(h, stride * per_byte, depth).astype(np.uint8) * weights
    ).sum(axis=2)
    return vals[:, :w].astype(np.uint8).reshape(h, w, 1)


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert per-scanline filtering (PNG spec §9).  None/Sub/Up are
    vectorized (Sub is a per-byte-lane cumsum — mod 256 distributes over
    the running sum); Average/Paeth carry a true sequential dependency
    along x and fall back to a per-byte scan."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: cur[x] = row[x] + cur[x-bpp]
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (3, 4):  # Average / Paeth
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out


def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real nearest-neighbor resample (pixel-center mapping)."""
    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
    return px[ys][:, xs]


def image_feature(px: np.ndarray) -> np.ndarray:
    """16-dim: 2x2 grid x RGB means (12) + global mean, global std,
    aspect ratio, log-area."""
    h, w = px.shape[:2]
    grid = resize_image(px, 2, 2).reshape(4, 3)
    return np.concatenate(
        [
            grid.reshape(-1),
            [px.mean(), px.std(), w / h, np.log1p(float(h) * w)],
        ]
    ).astype(np.float32)


# --------------------------------------------------------------------------
# audio decode (real): RIFF/WAVE PCM
# --------------------------------------------------------------------------


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (float32 samples [n, channels] in [-1,1], sample_rate)."""
    if not blob:
        raise ValueError("empty media blob")
    blob = bytes(blob)
    _reject_compressed(blob)
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, fmt, data = 12, None, None
    while i + 8 <= len(blob):
        cid, size = blob[i : i + 4], struct.unpack_from("<I", blob, i + 4)[0]
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"only PCM WAV supported (fmt={audio_fmt})")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = len(s) // n_ch
    return s[: n * n_ch].reshape(n, n_ch), rate


def audio_feature(samples: np.ndarray, rate: int) -> np.ndarray:
    """16-dim: RMS over 13 equal windows of the mono mix + global RMS,
    zero-crossing rate, log-duration."""
    mono = samples.mean(axis=1)
    n = max(len(mono), 1)
    windows = np.array_split(mono, 13)
    rms = [float(np.sqrt(np.mean(w * w))) if len(w) else 0.0 for w in windows]
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    return np.array(
        rms + [float(np.sqrt(np.mean(mono * mono))), zcr,
               np.log1p(n / float(rate))],
        dtype=np.float32,
    )


# --------------------------------------------------------------------------
# video decode (real): YUV4MPEG2 frame stream
# --------------------------------------------------------------------------


def y4m_frames(blob: bytes, n_frames: int) -> list[np.ndarray]:
    """Sample ``n_frames`` evenly spaced frames from a YUV4MPEG2 stream;
    each returned as float32 HxWx3 (luma replicated — chroma upsampling
    is out of scope for features)."""
    if not blob:
        raise ValueError("empty media blob")
    blob = bytes(blob)
    _reject_compressed(blob)
    if not blob.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    eol = blob.index(b"\n")
    w = h = None
    colorspace = "C420"
    for tok in blob[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok.decode()
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("C420"):
        frame_bytes = w * h * 3 // 2
    elif colorspace.startswith("C444"):
        frame_bytes = w * h * 3
    elif colorspace.startswith("Cmono"):
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"y4m colorspace {colorspace}")
    frames = []
    i = eol + 1
    while i < len(blob):
        nl = blob.index(b"\n", i)  # FRAME marker line (may carry params)
        if blob[i : i + 5] != b"FRAME":
            raise ValueError("corrupt y4m FRAME marker")
        start = nl + 1
        luma = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=start)
        frames.append(luma.reshape(h, w))
        i = start + frame_bytes
    if not frames:
        raise ValueError("y4m stream has no frames")
    idx = np.linspace(0, len(frames) - 1, num=n_frames).astype(int)
    out = []
    for k in idx:
        f = frames[k].astype(np.float32)[..., None] / 255.0
        out.append(np.repeat(f, 3, axis=2))
    return out


# --------------------------------------------------------------------------
# container probe: cheap REAL metadata without decoding payloads
# --------------------------------------------------------------------------

MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]  # kbit/s, MPEG-1 Layer III
MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


def probe_media(blob: bytes) -> dict:
    """Header-only metadata probe: container, dimensions, duration —
    parsed from real header math, never by decoding payload frames.  The
    cheap first pass a pipeline runs before deciding what to decode;
    covers everything decode_* handles PLUS the compressed containers
    whose payloads we honestly refuse to decode (MP4 ISO-BMFF box walk,
    MP3 frame-header walk with ID3v2 skip)."""
    blob = bytes(blob)
    if not blob:
        raise ValueError("empty media blob")
    if blob[:2] == b"BM":
        w = struct.unpack_from("<i", blob, 18)[0]
        h = abs(struct.unpack_from("<i", blob, 22)[0])
        return {"container": "bmp", "width": w, "height": h}
    if blob[:8] == _PNG_SIG:
        w, h = struct.unpack_from(">II", blob, 16)  # IHDR is first chunk
        return {"container": "png", "width": int(w), "height": int(h)}
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", blob, 6)
        return {"container": "gif", "width": w, "height": h}
    if blob[:2] in (b"P6", b"P5"):
        px = _decode_pnm(blob)  # header parse dominates; tiny fixtures only
        return {"container": "pnm", "width": px.shape[1], "height": px.shape[0]}
    if blob[:2] == b"\xff\xd8":
        return _probe_jpeg(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        samples, rate = decode_audio(blob)
        return {
            "container": "wav",
            "duration_ms": int(len(samples) * 1000 / rate),
            "channels": samples.shape[1],
        }
    if blob.startswith(b"YUV4MPEG2"):
        return _probe_y4m(blob)
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        return _probe_mp4(blob)
    if blob[:3] == b"ID3" or (
        len(blob) >= 2 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0
    ):
        return _probe_mp3(blob)
    raise ValueError(f"unrecognized media container (magic {blob[:8]!r})")


def _probe_jpeg(blob: bytes) -> dict:
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            break
        marker = blob[i + 1]
        if marker in range(0xC0, 0xD0) and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", blob, i + 5)
            return {"container": "jpeg", "width": int(w), "height": int(h),
                    "progressive": marker == 0xC2}
        if marker == 0xD9 or marker == 0xDA:
            break
        i += 2 + struct.unpack_from(">H", blob, i + 2)[0]
    raise ValueError("JPEG without a frame header")


def _probe_y4m(blob: bytes) -> dict:
    eol = blob.index(b"\n")
    w = h = None
    num, den = 25, 1
    for tok in blob[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = (int(x) for x in tok[1:].split(b":"))
    n_frames = blob.count(b"FRAME", eol)
    return {
        "container": "y4m", "width": w, "height": h, "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 * den / num) if num else None,
    }


def _probe_mp4(blob: bytes) -> dict:
    """ISO BMFF box walk: mvhd -> timescale/duration, first video tkhd ->
    16.16 fixed-point width/height.  Boxes are (size:u32, type:4cc);
    size 1 = 64-bit largesize; containers moov/trak/mdia nest."""

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack_from(">I", blob, i)[0]
            btype = blob[i + 4 : i + 8]
            body = i + 8
            if size == 1:
                size = struct.unpack_from(">Q", blob, i + 8)[0]
                body = i + 16
            elif size == 0:
                size = hi - i
            if size < 8:
                raise ValueError("corrupt MP4 box size")
            yield btype, body, i + size
            i += size

    out: dict = {"container": "mp4", "brand": blob[8:12].decode("ascii",
                                                               "replace")}
    n_tracks = 0
    for btype, body, end in walk(0, len(blob)):
        if btype != b"moov":
            continue
        for b2, body2, end2 in walk(body, end):
            if b2 == b"mvhd":
                ver = blob[body2]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", blob, body2 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", blob, body2 + 12)
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts)
            elif b2 == b"trak":
                n_tracks += 1
                for b3, body3, _e3 in walk(body2, end2):
                    if b3 != b"tkhd":
                        continue
                    # tkhd width/height: after version/flags, times
                    # (4+4 or 8+8), track_id+reserved+duration, 8
                    # reserved, layer/alt/volume/reserved, 36-byte matrix
                    ver = blob[body3]
                    off = body3 + (88 if ver == 1 else 76)
                    w16, h16 = struct.unpack_from(">II", blob, off)
                    if w16 and h16 and "width" not in out:
                        out["width"] = w16 >> 16
                        out["height"] = h16 >> 16
    out["n_tracks"] = n_tracks
    if n_tracks == 0:
        raise ValueError("MP4 without moov/trak metadata")
    return out


def _probe_mp3(blob: bytes) -> dict:
    """Walk MPEG-1 Layer III frame headers (sync 11 bits, bitrate/rate
    indices, padding) — frame count x 1152 samples gives the real
    duration; ID3v2 prefix skipped via its syncsafe size."""
    i = 0
    if blob[:3] == b"ID3":
        size = 0
        for b in blob[6:10]:
            size = (size << 7) | (b & 0x7F)
        i = 10 + size
    n_frames = 0
    rate = None
    bitrates = set()
    while i + 4 <= len(blob):
        if blob[i] != 0xFF or (blob[i + 1] & 0xE0) != 0xE0:
            break
        version = (blob[i + 1] >> 3) & 0x3
        layer = (blob[i + 1] >> 1) & 0x3
        if version != 3 or layer != 1:  # MPEG-1 Layer III only
            raise NotImplementedError(
                "only MPEG-1 Layer III mp3 framing supported"
            )
        br_idx = (blob[i + 2] >> 4) & 0xF
        sr_idx = (blob[i + 2] >> 2) & 0x3
        pad = (blob[i + 2] >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("invalid mp3 frame header")
        rate = MP3_RATES[sr_idx]
        kbps = MP3_BITRATES_V1L3[br_idx]
        bitrates.add(kbps)
        frame_len = 144 * kbps * 1000 // rate + pad
        n_frames += 1
        i += frame_len
    if n_frames == 0:
        raise ValueError("no mp3 frames found")
    return {
        "container": "mp3",
        "n_frames": n_frames,
        "sample_rate": rate,
        "duration_ms": int(n_frames * 1152 * 1000 / rate),
        "cbr_kbps": bitrates.pop() if len(bitrates) == 1 else None,
    }


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("probe_error", T.StringType(), True),
    ]
)


def probe_media_df(media: DataFrame) -> DataFrame:
    """(media_id, container, width, height, duration_ms, probe_error) —
    map-side header probe of every blob; unparseable blobs report their
    error instead of failing the job (the triage pass runs BEFORE the
    pipeline decides what is decodable)."""
    import pandas as pd
    from typing import Iterator

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                try:
                    p = probe_media(bytes(blob))
                    rows.append(
                        (mid, p.get("container"), p.get("width"),
                         p.get("height"), p.get("duration_ms"), None)
                    )
                except Exception as e:
                    rows.append((mid, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "width", "height",
                         "duration_ms", "probe_error"],
            )

    return media.select("media_id", "blob").mapInPandas(_gen, PROBE_SCHEMA)


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------


def _feature_for(kind: str, blob: bytes) -> np.ndarray:
    if kind == "image":
        return image_feature(decode_image(blob))
    if kind == "audio":
        return audio_feature(*decode_audio(blob))
    if kind == "video":
        mid = y4m_frames(blob, 1)[0]
        return image_feature(mid)
    raise ValueError(f"unknown media kind {kind!r}")


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """(media_id, kind, blob_bytes, content_hash, feature[16]) — map-side
    REAL decode + pooled feature vector; the binary column is dropped in
    the same task that read it."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, kinds, sizes, hashes, feats = [], [], [], [], []
            for mid, kind, blob in zip(b["media_id"], b["kind"], b["blob"]):
                blob = bytes(blob)
                vec = _feature_for(kind, blob)
                assert vec.shape == (FEATURE_DIM,)
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(blob))
                hashes.append(hashlib.md5(blob).hexdigest())
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "blob_bytes": sizes,
                    "content_hash": hashes,
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return media.select("media_id", "kind", "blob").mapInPandas(
        _gen, FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), False),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(media_id, frame_no, frame_feature) — per-video y4m frame sampling;
    one input row fans out to ``n_frames`` rows inside the same task (no
    shuffle, no blob movement)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, nos, feats = [], [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                for i, frame in enumerate(y4m_frames(bytes(blob), n_frames)):
                    ids.append(mid)
                    nos.append(i)
                    feats.append(image_feature(frame).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": pd.array(nos, dtype="int32"),
                    "frame_feature": pd.Series(feats, dtype=object),
                }
            )

    return media.select("media_id", "blob").mapInPandas(_gen, FRAME_SCHEMA)


# --------------------------------------------------------------------------
# deterministic REAL-format media synthesis (tests / fixtures)
# --------------------------------------------------------------------------


def encode_bmp(px: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB -> 24-bit BI_RGB BMP (independent writer used by
    tests to prove the decoder against known pixels)."""
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_bytes - w * 3)
    for row in px[::-1]:  # bottom-up
        body += row[:, ::-1].astype(np.uint8).tobytes() + pad  # RGB->BGR
    return header + info + bytes(body)


def _png_filter_rows(px: np.ndarray, filters: list[int], bpp: int) -> bytes:
    """FORWARD-filter one (sub-)image's BYTE rows (the inverse of
    _png_unfilter); ``prev`` resets at the image start, as each Adam7
    pass is independently filtered.  Row stride comes from the data so
    callers may pass (h, w, ch) uint8 pixels or (h, stride) raw bytes
    (16-bit samples pre-serialized big-endian)."""
    h = px.shape[0]
    stride = px[0].reshape(-1).size
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = px[y].reshape(-1).astype(np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:
            enc = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(cur[x]) - pred) & 0xFF
        else:
            raise ValueError(f"invalid filter {ft}")
        lines += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = cur
    return bytes(lines)


def encode_png(
    px: np.ndarray,
    filters: list[int] | None = None,
    color: int = 2,
    interlace: bool = False,
    depth: int = 8,
    palette: np.ndarray | None = None,
) -> bytes:
    """pixels -> PNG (independent writer used by tests to prove the
    decoder against known pixels).  ``filters`` picks the per-scanline
    filter type (0-4, default all 0, cycled) so tests exercise every
    inverse filter; the encoder applies the FORWARD filter transform —
    the decoder must invert it exactly.  ``color``: 2 = RGB (HxWx3
    input), 0 = gray (HxW), 3 = palette indices (HxW + ``palette`` Nx3),
    6 = RGBA (HxWx4).  ``interlace`` writes the Adam7 layout (seven
    independently-filtered sub-images); ``depth=16`` takes uint16 input
    (big-endian samples on the wire, filters still byte-wise per the
    spec); ``depth`` 1/2/4 (gray/palette only) packs raw sample values
    MSB-first with byte-padded scanlines."""
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    if px.ndim == 2:
        px = px[..., None]
    h, w = px.shape[:2]
    assert px.shape[2] == ch
    assert depth in {0: (1, 2, 4, 8, 16), 2: (8, 16),
                     3: (1, 2, 4, 8), 6: (8, 16)}[color]
    assert (palette is not None) == (color == 3)
    filters = filters or [0]
    nb = depth // 8

    def rows_of(pxa: np.ndarray) -> np.ndarray:
        hh, ww = pxa.shape[:2]
        if depth < 8:
            # pack depth-bit samples MSB-first; packbits zero-pads each
            # scanline to a byte boundary (the spec's padding)
            bits = (
                pxa.reshape(hh, ww)[:, :, None]
                >> np.arange(depth - 1, -1, -1)
            ) & 1
            return np.packbits(bits.reshape(hh, -1).astype(np.uint8), axis=1)
        if nb == 1:
            return pxa
        # serialize 16-bit samples big-endian, then filter byte-wise
        return (
            pxa.astype(">u2").reshape(pxa.shape[0], -1).view(np.uint8)
        )

    fbpp = max(1, ch * nb)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _png_filter_rows(rows_of(sub), filters, fbpp)
        lines = bytes(lines)
    else:
        lines = _png_filter_rows(rows_of(px), filters, fbpp)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    plte = (
        chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        if color == 3
        else b""
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """HxW palette indices + Nx3 palette -> GIF89a (independent writer
    used by tests).  Runs a REAL compressing LZW encoder (sequence
    dictionary, growing code widths, mid-stream dictionary reset at 4096)
    — the forward transform of _lzw_decode, so round-trip equality proves
    the decoder, including the KwKwK case on repetitive input."""
    h, w = indices.shape
    n_pal = len(palette)
    size_field = max(1, (int(n_pal) - 1).bit_length() - 1)  # 2<<f entries
    table_n = 2 << size_field
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n_pal] = palette
    min_code = max(2, size_field + 1)
    rows = indices
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = indices[order]
    seq = rows.reshape(-1).tolist()

    clear, end_code = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = [clear]
    table: dict[tuple, int] = {(c,): c for c in range(clear)}
    next_code = end_code + 1
    run: tuple = ()
    for s in seq:
        cand = run + (s,)
        if cand in table:
            run = cand
            continue
        codes.append(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:  # dictionary full: reset mid-stream (decoder must follow)
            codes.append(clear)
            table = {(c,): c for c in range(clear)}
            next_code = end_code + 1
        run = (s,)
    if run:
        codes.append(table[run])
    codes.append(end_code)

    # bit-pack with the decoder's width schedule: width grows when the
    # DECODER's dict (one behind the encoder's) fills the current width
    bitbuf = bitlen = 0
    width = min_code + 1
    dec_n = end_code + 1
    first_after_reset = True
    packed = bytearray()
    for c in codes:
        bitbuf |= c << bitlen
        bitlen += width
        while bitlen >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8
        if c == clear:
            dec_n, width = end_code + 1, min_code + 1
            first_after_reset = True
        elif c != end_code:
            # the decoder adds one dict entry per code EXCEPT the first
            # after a reset (it has no prev); width grows when its dict
            # fills the current width
            if first_after_reset:
                first_after_reset = False
            elif dec_n < 4096:
                dec_n += 1
                if dec_n == (1 << width) and width < 12:
                    width += 1
    if bitlen:
        packed.append(bitbuf & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field & 7), 0, 0)
    out += pal.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code)
    for j in range(0, len(packed), 255):
        chunk = packed[j : j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    ints = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(ints)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(ints)) + ints
    )


def encode_y4m(frames: list[np.ndarray], w: int, h: int) -> bytes:
    """list of uint8 HxW luma planes -> C420 y4m stream (chroma planes
    zero-filled at 128 = neutral)."""
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
    chroma = bytes([128]) * (w * h // 2)
    for f in frames:
        out += b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma
    return bytes(out)


def synth_media_df(spark, n: int = 24) -> DataFrame:
    """Deterministic media table in REAL formats (BMP + PNG + JPEG /
    PCM WAV / y4m) — no external data, but every blob round-trips a
    genuine decoder.  Images rotate BMP / PNG / baseline JPEG / 4-bit
    packed-palette PNG (PNG rows cycle the scanline filter), so the Spark
    feature path exercises real DEFLATE inflation, unfiltering,
    bit-unpacking, and Huffman+IDCT decode."""
    from websearchengine_spark.operators import jpeg as _jpeg

    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "video/x-y4m"}
    for i in range(n):
        kind = kinds[i % 3]
        rng = np.random.default_rng(1000 + i)
        if kind == "image":
            w, h = 8 + i % 5, 6 + i % 4
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            variant = (i // 3) % 4
            if variant == 1:
                blob = encode_png(px, filters=[(i + y) % 5 for y in range(h)])
                rows.append((i, kind, "image/png", blob, w, h, None))
                continue
            if variant == 2:
                if (i // 12) % 2:  # alternate: progressive SA 4:2:0
                    blob = _jpeg.encode_jpeg_progressive(
                        px, subsample="420", approx=1
                    )
                else:
                    blob = _jpeg.encode_jpeg(px)
                rows.append((i, kind, "image/jpeg", blob, w, h, None))
                continue
            if variant == 3:
                palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
                idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
                blob = encode_png(
                    idx, filters=[(i + y) % 5 for y in range(h)],
                    color=3, depth=4, palette=palette,
                )
                rows.append((i, kind, "image/png", blob, w, h, None))
                continue
            blob = encode_bmp(px)
            rows.append((i, kind, mimes[kind], blob, w, h, None))
        elif kind == "audio":
            t = np.arange(800 + 40 * i) / 8000.0
            wave = 0.5 * np.sin(2 * np.pi * (200 + 10 * i) * t)
            blob = encode_wav(wave)
            rows.append((i, kind, mimes[kind], blob, None, None,
                         int(len(t) / 8.0)))
        else:
            w, h = 16, 12
            frames = [
                rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                for _ in range(5)
            ]
            blob = encode_y4m(frames, w, h)
            rows.append((i, kind, mimes[kind], blob, w, h, 200))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
