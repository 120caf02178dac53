"""Multimodal (image/audio/video) column plumbing.

Beyond-reference training-data extension (SURVEY.md §7 M6). The model:
media lives in opaque ``binary`` columns with a typed metadata struct
beside them; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the heavy
per-item work stays columnar-batched and embarrassingly parallel.

Codecs: ``fmt='png'`` and ``fmt='jpeg'`` are REAL — minimal pure-python
decoders run inside the Arrow batches. PNG (:func:`decode_png`): chunk
walk, IDAT inflate, all five scanline filters — byte-tested against
hand-built PNGs. JPEG (:func:`decode_jpeg`): baseline-sequential marker
walk, canonical Huffman entropy decode with byte unstuffing and restart
resync, dequant + IDCT + YCbCr→RGB — coefficient-level-tested against
:func:`encode_jpeg` streams, and oracle-GATED end-to-end (q137):
blockwise-constant even gray levels survive Annex-K quantization
bit-exactly (q00=16 divides 8·(v−128) for even v), so DuckDB replays
the decoded-pixel checksum arithmetically while Spark runs the full
decode path. ``fmt='raw'`` is the deterministic fake for oracle gates
whose payloads aren't SQL-replayable. WAV (:func:`decode_wav`) is REAL
too: RIFF container walk (any chunk order, odd-size pad bytes), PCM16
frame parse — byte-tested and oracle-gated (q158) on aggregates of the
decoded samples. MP4 (:func:`parse_mp4`) gets a REAL ISO-BMFF container
walk (32/64-bit/to-EOF box sizes, ftyp brand, mvhd v0/v1
timescale+duration, trak count, mdat length — oracle-gated q163), and
since r4's third batch the CODEC PAYLOAD decodes too for MJPEG tracks
(:func:`decode_mjpeg`, oracle-gated q176): real stsd/stsz/stsc/stco
sample-table demux feeding the baseline JPEG decoder frame by frame.
Only non-MJPEG codecs (H.264 etc.) raise ``NotImplementedError`` —
those genuinely need ffmpeg. The Spark-side plumbing (schema,
batching, partitioning, UDF signature) is shared either way.

Scale notes (100 TB of media):

- ``mapInPandas`` streams Arrow record batches — per-task memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not by
  partition size, which matters when single rows are multi-MB blobs;
- feature extraction is a pure per-row map: no shuffle, scales linearly
  with executors; keep blobs out of any join/groupBy key;
- binary columns make parquet row groups huge — write media tables with
  a smaller ``parquet.block.size`` / more output partitions than text
  tables, and NEVER broadcast them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import portable as P

CHECKSUM_PREFIX = 16  # bytes folded into the stub checksum

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # greyscale / RGB / G+A / RGBA


def decode_png(payload: bytes) -> dict:
    """REAL (pure-python) PNG decode: chunk walk, IHDR parse, IDAT
    zlib-inflate, scanline unfilter (all five PNG filter types).

    Supports the common non-interlaced 8-bit color types; production
    swaps this for PIL/libpng, which also cover palette/16-bit/interlace
    — the Spark-side contract (bytes in, pixel array + dims out) is
    identical either way. Returns ``{width, height, channels, pixels}``
    with ``pixels`` a row-major ``numpy.uint8`` array.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace}"
                    " is outside the minimal decoder; use PIL in production"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        else:  # sub / average / paeth need the in-row running values
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(ch),
        "pixels": out.reshape(-1),
    }


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — real pure-python codec
# ---------------------------------------------------------------------------

# Annex-K example quantization tables (written into DQT by the encoder
# and read back from the stream by the decoder, so the pair is
# self-consistent by construction).
_JPEG_QL = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = (
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32
)

# standard (Annex K.3.3) Huffman specs as (BITS, HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    """Orthogonal 8x8 DCT-II matrix M (M[u,x] = c(u)/2 * cos((2x+1)u
    pi/16)); forward F = M f M^T, inverse f = M^T F M."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _huff_codes(bits, vals):
    """Canonical Huffman (length, code) per symbol from a DHT spec."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s
        return bytes(self.buf)


def _encode_block(w, coeffs, dc_codes, ac_codes, pred):
    """Huffman-encode one quantized 8x8 block (zigzag order)."""
    diff = int(coeffs[0]) - pred
    t = int(diff).bit_length() if diff else 0
    ln, code = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff > 0 else diff - 1, t)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        t = abs(v).bit_length()
        ln, code = ac_codes[(run << 4) | t]
        w.put(code, ln)
        w.put(v if v > 0 else v - 1, t)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return int(coeffs[0])


def encode_jpeg(
    pixels,
    grayscale: bool | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline-sequential JPEG encoder (SOF0, Annex-K quant +
    Huffman tables, no subsampling). ``pixels`` is an ``(H, W)`` uint8
    array (grayscale) or ``(H, W, 3)`` RGB. Edge blocks pad by edge
    replication. ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every N MCUs (exercises the decoder's resync path). Real
    pipelines land JPEG bytes from object storage; this writer exists
    so decode tests and the oracle gate run against genuine
    entropy-coded streams rather than canned fixtures."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if grayscale is None:
        grayscale = px.ndim == 2
    h, w = px.shape[:2]
    m = _dct_matrix()
    if grayscale:
        planes = [px.astype(np.float64) - 128.0]
        qtabs = [np.array(_JPEG_QL, dtype=np.float64).reshape(8, 8)]
        comp_q = [0]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        ql = np.array(_JPEG_QL, dtype=np.float64).reshape(8, 8)
        qc = np.array(_JPEG_QC, dtype=np.float64).reshape(8, 8)
        qtabs = [ql, qc, qc]
        comp_q = [0, 1, 1]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (zigzag-ordered payload, as the standard specifies)
    for tid in sorted(set(comp_q)):
        raw = _JPEG_QL if tid == 0 else _JPEG_QC
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([tid])
        out += bytes(raw[z] for z in _ZIGZAG)  # DQT payload is zigzag
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, comp_q[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    specs = [(0x00, _DC_L), (0x10, _AC_L)]
    if not grayscale:
        specs += [(0x01, _DC_C), (0x11, _AC_C)]
    for tc_th, (bits, vals) in specs:
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # DRI (optional)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        tbl = 0x00 if comp_q[i] == 0 else 0x11
        sos += bytes([i + 1, tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l, ac_l = _huff_codes(*_DC_L), _huff_codes(*_AC_L)
    dc_c, ac_c = _huff_codes(*_DC_C), _huff_codes(*_AC_C)
    wtr = _BitWriter()
    preds = [0] * ncomp
    bh, bw = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        padded.append(pp)
    mcu_count = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += wtr.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                blk = padded[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = m @ blk @ m.T
                q = np.floor(coef / qtabs[ci] + 0.5).astype(np.int64)
                zz = q.reshape(-1)[_ZIGZAG]
                dc, ac = (dc_l, ac_l) if comp_q[ci] == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(wtr, zz, dc, ac, preds[ci])
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # expected RSTn markers are consumed by expect_restart()
                raise ValueError(f"unexpected marker ff{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self) -> None:
        """Drop pad bits, consume the RSTn marker, realign to a byte."""
        self.acc = 0
        self.n = 0
        b, nxt = self.data[self.pos], self.data[self.pos + 1]
        if b != 0xFF or not (0xD0 <= nxt <= 0xD7):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | rd.bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> dict:
    """REAL (pure-python) baseline JPEG decode: marker walk, DQT/DHT/
    SOF0/SOS parse, canonical Huffman entropy decode with byte
    unstuffing and restart-marker resync, dequantize, un-zigzag,
    float64 matrix IDCT, chroma upsampling for subsampled components,
    and JFIF YCbCr->RGB. Baseline sequential (SOF0) 8-bit only —
    progressive (SOF2) raises ``NotImplementedError``; production
    swaps this for libjpeg-turbo, the Spark-side contract (bytes in,
    pixel array + dims out) is identical either way. Returns
    ``{width, height, channels, pixels}`` (row-major uint8, channels
    interleaved for color)."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    restart_interval = 0
    pos = 2
    h = w = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                qt[tid] = list(seg[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                tbl = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        tbl[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = tbl
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (non-baseline) not supported; "
                "use libjpeg in production"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            tmap = {}
            for c in range(ns):
                cid, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                tmap[cid] = (tbl >> 4, tbl & 0x0F)
            scan_start = pos + 2 + seglen
            return _decode_scan(
                payload, scan_start, w, h, comps, tmap, qt, huff,
                restart_interval, np,
            )
        pos += 2 + seglen
    raise ValueError("JPEG ended without SOS scan")


def _decode_scan(payload, pos, w, h, comps, tmap, qt, huff,
                 restart_interval, np):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _dct_matrix()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    rd = _BitReader(payload, pos)
    preds = [0] * len(comps)
    # dequant tables stay in zigzag order; blocks un-zigzag after scale
    qzz = [np.array(qt[c["tq"]], dtype=np.float64) for c in comps]
    unzig = np.empty(64, dtype=np.int64)
    for i, z in enumerate(_ZIGZAG):
        unzig[z] = i
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rd.expect_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t = huff[(0, tmap[c["id"]][0])]
                ac_t = huff[(1, tmap[c["id"]][1])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _huff_decode(rd, dc_t)
                        diff = _extend(rd.bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(rd, ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        coef = (zz * qzz[ci])[unzig].reshape(8, 8)
                        blk = m.T @ coef @ m
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[ci][py:py + 8, px:px + 8] = blk
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution by sample replication
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(p[:h, :w] + 128.0)
    if len(comps) == 1:
        pix = np.clip(np.floor(out_planes[0] + 0.5), 0, 255).astype(np.uint8)
        return {"width": int(w), "height": int(h), "channels": 1,
                "pixels": pix.reshape(-1)}
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    pix = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return {"width": int(w), "height": int(h), "channels": 3,
            "pixels": pix.reshape(-1)}


def decode_media(payload: bytes, fmt: str) -> dict:
    """Decode one media payload → feature dict.

    ``fmt='png'`` runs the REAL pure-python PNG decoder above and
    ``fmt='jpeg'`` the REAL baseline JPEG decoder (checksums come from
    decoded PIXELS, proving actual decode). ``fmt='raw'`` keeps the
    deterministic fake used by cross-engine oracle gates whose payloads
    aren't replayable in SQL. ``fmt='wav'`` decodes RIFF/PCM16 for
    real, and ``fmt='mp4'`` demuxes + decodes MJPEG video tracks for
    real; only non-MJPEG mp4 codecs raise — they need ffmpeg.
    """
    if fmt == "png":
        d = decode_png(payload)
        return {
            "n_bytes": len(payload),
            "checksum": int(d["pixels"][:CHECKSUM_PREFIX].sum() % 256),
            "width": d["width"],
            "height": d["height"],
        }
    if fmt == "jpeg":
        d = decode_jpeg(payload)
        return {
            "n_bytes": len(payload),
            "checksum": int(d["pixels"][:CHECKSUM_PREFIX].sum() % 256),
            "width": d["width"],
            "height": d["height"],
        }
    if fmt == "wav":
        d = decode_wav(payload)
        samples = d["samples"]
        # FEATURE_SCHEMA is image-shaped; for audio, width carries the
        # frame count and height the channel count.
        return {
            "n_bytes": len(payload),
            "checksum": int(abs(int(samples.sum())) % 256),
            "width": int(samples.shape[0]),
            "height": int(d["channels"]),
        }
    if fmt == "mp4":
        d = parse_mp4(payload)  # real container walk (any codec)
        try:
            v = decode_mjpeg(payload)  # REAL decode for MJPEG tracks
        except ValueError:
            raise NotImplementedError(
                f"mp4 container parsed (brand={d['brand']}, "
                f"{d['n_tracks']} tracks) but has no MJPEG video trak; "
                "other codecs need ffmpeg; swap this branch in production"
            ) from None
        px0 = v["frames"][0]
        return {
            "n_bytes": len(payload),
            "checksum": int(px0[:CHECKSUM_PREFIX].sum() % 256),
            "width": v["width"],
            "height": v["height"],
        }
    if fmt != "raw":
        raise NotImplementedError(
            f"codec {fmt!r} needs a library not present here; "
            "swap this branch for ffmpeg in production"
        )
    checksum = sum(payload[:CHECKSUM_PREFIX]) % 256
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "width": 64 + checksum % 64,
        "height": 64 + len(payload) % 64,
    }


def attach_binary(docs: DataFrame) -> DataFrame:
    """Model a media table: text bytes stand in for an opaque payload,
    with a typed metadata struct beside it (the real pipeline lands
    payloads from object storage the same way)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("fmt"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(p, m["fmt"])
                for p, m in zip(pdf["payload"], pdf["media_meta"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "fmt", [m["fmt"] for m in pdf["media_meta"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def ordered_rows(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic global order without the RangePartitioner sampling
    pass: a bare ``.orderBy()`` directly above a mapInPandas decode
    plans an Exchange rangepartitioning whose bounds are SAMPLED —
    executing the whole Python decode pipeline TWICE (measured on q25:
    extract 0.94 s, extract+orderBy 1.77 s). The audit outputs here are
    corpus-bounded narrow rows, so exchange them round-robin into one
    partition (the decode stays parallel in the map stage, and
    round-robin needs no sampling) and sort within it — one execution,
    identical rows in identical order. At a scale where the audit
    output itself outgrows one reducer it is the global sort, not this
    exchange, that has to go."""
    return df.repartition(1).sortWithinPartitions(*cols)


def media_features(docs: DataFrame) -> DataFrame:
    """End-to-end: attach payloads, extract features, deterministic order."""
    return ordered_rows(extract_features(attach_binary(docs)), "doc_id")


# ---------------------------------------------------------------------------
# resize + frame sampling (stub codecs, real distributed plumbing)
# ---------------------------------------------------------------------------

RESIZE_TARGET = 4096  # stub "resized image" byte budget
CHECK_BYTES = 16  # bytes folded into the resize checksum

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("checksum16", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = RESIZE_TARGET) -> DataFrame:
    """Resize stub: stride-decimate each payload to at most
    ``target_bytes`` (every ``len//target``-th byte, then truncate) —
    the deterministic stand-in for a real thumbnail/downsample pass.
    Binary in, binary out, through one Arrow-batched ``mapInPandas``;
    swap the body for PIL's ``Image.resize`` in production. The
    decimation arithmetic is integer-exact so the DuckDB oracle can
    replay it byte-for-byte.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                n = len(p)
                step = max(1, n // target_bytes)
                out = p[::step][:target_bytes]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes_in": n,
                        "n_bytes_out": len(out),
                        "checksum16": sum(out[:CHECK_BYTES]) % (2**31),
                        "payload": out,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def resize_oracle_sql(
    table: str = "documents", target_bytes: int = RESIZE_TARGET
) -> str:
    """DuckDB replay of the decimation arithmetic (ASCII fixture text:
    byte j of the output is character ``1 + j*step`` of the input)."""
    d = "duckdb"
    n = "octet_length(encode(text))"
    step = f"greatest(1, {n} // {target_bytes})"
    out_len = f"least(({n} + {step} - 1) // {step}, {target_bytes})"
    codes = P.transform(
        f"range(0, least({CHECK_BYTES}, {out_len}))",
        "j",
        f"CAST(ascii(substr(text, 1 + j * {step}, 1)) AS BIGINT)",
        d,
    )
    checksum = P.fold(codes, "CAST(0 AS BIGINT)", "h", "c", "h + c", d)
    return (
        f"SELECT doc_id, CAST({n} AS BIGINT) AS n_bytes_in, "
        f"CAST({out_len} AS BIGINT) AS n_bytes_out, "
        f"CAST(({checksum}) % 2147483648 AS BIGINT) AS checksum16 "
        f"FROM {table} ORDER BY doc_id"
    )


FRAME_SIZE = 256  # stub "video frame" = fixed byte chunk

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub: treat each payload as a sequence of
    ``FRAME_SIZE``-byte frames and emit ~``n_frames`` evenly-strided
    ones, one output row per sampled frame (the 1→N generator shape of
    real video sampling; swap the chunking for ffmpeg keyframe extract
    in production). Runs as one ``mapInPandas`` generator — no shuffle,
    output rows stay on the producing partition.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                total = (len(p) + FRAME_SIZE - 1) // FRAME_SIZE
                stride = max(1, -(-total // n_frames))
                for idx in range(0, total, stride):
                    fb = p[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "n_frame_bytes": len(fb),
                            "first_byte": fb[0],
                            "frame": fb,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)


def sample_frames_oracle_sql(table: str = "documents", n_frames: int = 4) -> str:
    """DuckDB replay: per-doc frame index list via ``range(0, total,
    stride)`` unnested, lengths/first-bytes from substr arithmetic."""
    return (
        "SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx, "
        f"CAST(least({FRAME_SIZE}, n - idx * {FRAME_SIZE}) AS BIGINT) "
        "  AS n_frame_bytes, "
        f"CAST(ascii(substr(text, idx * {FRAME_SIZE} + 1, 1)) AS BIGINT) "
        "  AS first_byte "
        "FROM ("
        "  SELECT doc_id, text, n, unnest(range(0, total, stride)) AS idx "
        "  FROM ("
        "    SELECT doc_id, text, octet_length(encode(text)) AS n, "
        f"    (octet_length(encode(text)) + {FRAME_SIZE - 1}) // {FRAME_SIZE} "
        "      AS total, "
        f"    greatest(1, ((octet_length(encode(text)) + {FRAME_SIZE - 1}) "
        f"      // {FRAME_SIZE} + {n_frames - 1}) // {n_frames}) AS stride "
        f"    FROM {table})) "
        "ORDER BY doc_id, frame_idx"
    )


def media_features_oracle_sql(table: str = "documents") -> str:
    """DuckDB oracle: the payload is UTF-8 text and the fixture vocabulary
    is pure ASCII, so byte values == character code points; the checksum
    fold below replays :func:`decode_media` arithmetic exactly."""
    d = "duckdb"
    codes = P.transform(
        P.sequence_1_to(f"least({CHECKSUM_PREFIX}, length(text))", d),
        "i",
        "CAST(ascii(substr(text, i, 1)) AS BIGINT)",
        d,
    )
    checksum = f"({P.fold(codes, 'CAST(0 AS BIGINT)', 'h', 'c', 'h + c', d)} % 256)"
    return f"""
SELECT doc_id, 'raw' AS fmt,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST({checksum} AS BIGINT) AS checksum,
       CAST(64 + {checksum} % 64 AS BIGINT) AS width,
       CAST(64 + octet_length(encode(text)) % 64 AS BIGINT) AS height
FROM {table} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# JPEG decode gate (q137): real decode, SQL-replayable expected pixels
# ---------------------------------------------------------------------------

JPEG_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def jpeg_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Oracle-gateable REAL JPEG decode: per document, build a genuine
    entropy-coded grayscale JPEG (block (i,j) is the constant even gray
    ``2*((doc_id*7 + i*3 + j*5) % 128)``, 2 block rows, ``2 + doc_id%3``
    block cols), run the FULL decoder — marker walk, canonical Huffman,
    dequant, IDCT, rounding — inside Arrow-batched ``mapInPandas``, and
    emit aggregates of the DECODED pixels. Even gray levels survive
    Annex-K quantization bit-exactly (q00=16 divides 8*(v-128)), so a
    SQL oracle can replay ``checksum`` (first-16-pixel fold) and
    ``pixel_sum`` arithmetically while Spark exercises the codec; any
    decoder regression breaks the value hash, not just the row count.
    Map-only: no shuffle, scales linearly with executors."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                bw = 2 + doc_id % 3
                img = np.zeros((16, 8 * bw), dtype=np.uint8)
                for i in range(2):
                    for j in range(bw):
                        img[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = \
                            2 * ((doc_id * 7 + i * 3 + j * 5) % 128)
                d = decode_jpeg(encode_jpeg(img))
                px = d["pixels"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "checksum": int(
                            px[:CHECKSUM_PREFIX].astype(np.int64).sum() % 256
                        ),
                        "pixel_sum": int(px.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, JPEG_GATE_SCHEMA)


def jpeg_gate_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`jpeg_roundtrip_features`' expected decoded
    pixels (valid because the even-gray fixture roundtrips bit-exactly)."""
    g = "2 * ((b.doc_id * 7 + i.i * 3 + j.j * 5) % 128)"
    return f"""
WITH sub AS (SELECT doc_id FROM {table} WHERE doc_id % 4 = 1),
blocks AS (
  SELECT b.doc_id, {g} AS gray
  FROM sub b, range(0, 2) i(i), range(0, 4) j(j)
  WHERE j.j < 2 + b.doc_id % 3
)
SELECT doc_id,
       CAST(8 * (2 + doc_id % 3) AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST((8 * (2 * ((doc_id * 7) % 128))
             + 8 * (2 * ((doc_id * 7 + 5) % 128))) % 256 AS BIGINT)
         AS checksum,
       CAST(SUM(64 * gray) AS BIGINT) AS pixel_sum
FROM blocks GROUP BY doc_id ORDER BY doc_id
"""


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("phash", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("canonical_doc_id", T.LongType()),
        T.StructField("doc_id_sum", T.LongType()),
    ]
)

PHASH_MOD = 200  # docs with equal doc_id % PHASH_MOD render the same image


def phash_media(docs: DataFrame) -> DataFrame:
    """Per-doc perceptual hash (aHash) over REAL JPEG round-trips —
    the visual near-dup primitive (block-mean average hash, the
    classic pHash-family baseline): decode the doc's JPEG, pool the
    pixel grid into 8x8 cells, threshold each cell against the global
    mean, emit the 64-bit signature as a '0'/'1' string (strings keep
    the top bit out of BIGINT sign trouble on both engines).

    Integer-exact thresholding: cells have EQUAL pixel counts, so
    bit_c = (cell_sum * 64 > total_sum) compares means without a
    division. The fixture renders doc_id % PHASH_MOD, so visually
    identical re-encodes exist by construction and hash-group exactly.

    Map-only Arrow ``mapInPandas`` (decode + pooling per row, zero
    shuffle); the dedup itself is one hash aggregate on the signature
    — at 100 TB this is the image-side twin of q18's exact text dedup,
    with Hamming-banded LSH (q21's SimHash machinery) as the near-match
    extension."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                d = doc_id % PHASH_MOD
                bw = 2 + d % 3
                img = np.zeros((16, 8 * bw), dtype=np.uint8)
                for i in range(2):
                    for j in range(bw):
                        img[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = \
                            2 * ((d * 7 + i * 3 + j * 5) % 128)
                px = decode_jpeg(encode_jpeg(img))["pixels"]
                g = px.reshape(16, 8 * bw).astype(np.int64)
                cells = g.reshape(8, 2, 8, bw).sum(axis=(1, 3))
                total = int(cells.sum())
                bits = "".join(
                    "1" if int(cells[ci, cj]) * 64 > total else "0"
                    for ci in range(8)
                    for cj in range(8)
                )
                rows.append({"doc_id": doc_id, "phash": bits})
            yield pd.DataFrame(rows)

    per_doc = docs.select("doc_id").mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("phash", T.StringType()),
            ]
        ),
    )
    from pyspark.sql import functions as F

    return (
        per_doc.groupBy("phash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("canonical_doc_id")
    )


def phash_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`phash_media`: the even-gray fixture
    round-trips the JPEG path bit-exactly (q137's invariant), so cell
    sums are computable from the block formula — cell (ci, cj) covers
    2 pixel rows of block row ci//4 and bw columns each of gray
    g(ci//4, x//8)."""
    g = "2 * (((b.doc_id % {m}) * 7 + (c.ci // 4) * 3 + ((c.cj * (2 + (b.doc_id % {m}) % 3) + o.o) // 8) * 5) % 128)".format(m=PHASH_MOD)
    return f"""
WITH sub AS (SELECT doc_id FROM {table} WHERE doc_id % 4 = 3),
cells AS (
  SELECT b.doc_id, c.ci, c.cj,
         2 * SUM({g}) AS v
  FROM sub b,
       (SELECT i // 8 AS ci, i % 8 AS cj FROM range(0, 64) t(i)) c,
       range(0, 5) o(o)
  WHERE o.o < 2 + (b.doc_id % {PHASH_MOD}) % 3
  GROUP BY b.doc_id, c.ci, c.cj
),
tot AS (SELECT doc_id, SUM(v) AS total FROM cells GROUP BY doc_id),
bits AS (
  SELECT c.doc_id,
         string_agg(CASE WHEN c.v * 64 > t.total THEN '1' ELSE '0' END,
                    '' ORDER BY c.ci, c.cj) AS phash
  FROM cells c JOIN tot t ON c.doc_id = t.doc_id
  GROUP BY c.doc_id
)
SELECT phash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM bits
GROUP BY phash
HAVING COUNT(*) > 1
ORDER BY canonical_doc_id
"""


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM) codec: real encode/decode, SQL-replayable expected samples
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Minimal but genuine RIFF/WAVE writer: PCM (format 1), 16-bit
    little-endian, interleaved frames. ``samples`` is an int-like numpy
    array shaped (n,) for mono or (n, channels)."""
    import struct

    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.shape[1] != channels:
        raise ValueError(
            f"samples have {arr.shape[1]} channels, expected {channels}"
        )
    if np.any(arr > 32767) or np.any(arr < -32768):
        raise ValueError("sample out of int16 range")
    data = arr.astype("<i2").tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """REAL RIFF/WAVE parser: container walk (any chunk order, unknown
    chunks skipped with the mandatory odd-size pad byte), fmt-chunk
    validation (PCM, 16-bit), then the data chunk parsed as interleaved
    little-endian int16 frames. Returns
    ``{samples: (n, channels) int16 ndarray, sample_rate, channels}``.
    Compressed formats (IEEE float, A-law, …) raise
    ``NotImplementedError`` — same contract as the PNG/JPEG decoders."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= riff_size + 8:
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize % 2)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit supported (format={audio_format}, bits={bits})"
        )
    if block_align != 2 * channels:
        raise ValueError("block align inconsistent with 16-bit frames")
    n_frames = len(data) // block_align
    samples = np.frombuffer(
        data[: n_frames * block_align], dtype="<i2"
    ).reshape(n_frames, channels)
    return {
        "samples": samples,
        "sample_rate": sample_rate,
        "channels": channels,
    }


WAV_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("abs_sum", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def wav_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Oracle-gateable REAL WAV decode (q158): per document, write a
    genuine RIFF/PCM16 stream whose sample ``i`` is the integer
    ``((doc_id*31 + i*17) % 2001) - 1000`` (n = 40 + doc_id%25 frames,
    rate = 8000 + 4000*(doc_id%3)), run the full container walk +
    frame parse inside Arrow-batched ``mapInPandas``, and emit
    aggregates of the DECODED samples — integer arithmetic end to end,
    so a SQL oracle replays ``abs_sum`` / ``peak`` exactly while Spark
    exercises the codec. Map-only: no shuffle, linear in executors."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 40 + doc_id % 25
                rate = 8000 + 4000 * (doc_id % 3)
                i = np.arange(n, dtype=np.int64)
                samples = (doc_id * 31 + i * 17) % 2001 - 1000
                d = decode_wav(encode_wav(samples, rate))
                got = d["samples"][:, 0].astype(np.int64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": int(got.shape[0]),
                        "sample_rate": int(d["sample_rate"]),
                        "abs_sum": int(np.abs(got).sum()),
                        "peak": int(np.abs(got).max()),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, WAV_GATE_SCHEMA)


WAV_FRAME = 16  # samples per analysis frame (full frames only)

WAV_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_energy", T.LongType()),
        T.StructField("peak_frame_energy", T.LongType()),
        T.StructField("total_zc", T.LongType()),
        T.StructField("max_frame_zc", T.LongType()),
    ]
)


def wav_frame_features(docs: DataFrame) -> DataFrame:
    """Audio feature extraction over DECODED PCM (q233): the classic
    frame-level front end (short-time energy + zero-crossing rate, the
    voice-activity / segmentation primitives) computed on the samples
    that the REAL RIFF/PCM16 codec round-trip produces — the same
    deterministic integer fixture as q158, so a SQL oracle replays the
    expected samples exactly while Spark exercises decode + framing.

    Per doc: samples are cut into ``WAV_FRAME``-sample frames (full
    frames only, the trailing remainder is dropped — the standard
    hop=frame STFT convention); per frame, energy = Σ s² (int64) and
    zc = #{i : s_i·s_{i+1} < 0, both in frame}; emitted as per-doc
    aggregates so the gate's output is bounded.

    Shape at 100 TB: Arrow-batched ``mapInPandas`` over the blob
    column, map-only, zero shuffle, linear in executors — blobs never
    enter a join key (the multimodal rule)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 40 + doc_id % 25
                rate = 8000 + 4000 * (doc_id % 3)
                i = np.arange(n, dtype=np.int64)
                samples = (doc_id * 31 + i * 17) % 2001 - 1000
                d = decode_wav(encode_wav(samples, rate))
                s = d["samples"][:, 0].astype(np.int64)
                nf = s.shape[0] // WAV_FRAME
                fr = s[: nf * WAV_FRAME].reshape(nf, WAV_FRAME)
                energy = (fr * fr).sum(axis=1)
                zc = ((fr[:, :-1] * fr[:, 1:]) < 0).sum(axis=1)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": int(nf),
                        "total_energy": int(energy.sum()),
                        "peak_frame_energy": int(energy.max()),
                        "total_zc": int(zc.sum()),
                        "max_frame_zc": int(zc.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, WAV_FRAME_SCHEMA)


def wav_frame_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`wav_frame_features` (integer PCM fixture
    end to end): regenerate the samples, frame by i // WAV_FRAME, pair
    zero-crossings within frames via (i % WAV_FRAME) < WAV_FRAME-1."""
    s = "((b.doc_id * 31 + i.i * 17) % 2001) - 1000"
    s_next = "((b.doc_id * 31 + (i.i + 1) * 17) % 2001) - 1000"
    w = WAV_FRAME
    return f"""
WITH sub AS (SELECT doc_id FROM {table} WHERE doc_id % 4 = 1),
samp AS (
  SELECT b.doc_id, i.i, {s} AS s, {s_next} AS sn,
         i.i // {w} AS frame,
         (40 + b.doc_id % 25) // {w} AS nf
  FROM sub b, range(0, 65) i(i)
  WHERE i.i < ((40 + b.doc_id % 25) // {w}) * {w}
),
per_frame AS (
  SELECT doc_id, frame,
         SUM(s * s) AS energy,
         SUM(CASE WHEN (i % {w}) < {w - 1} AND s * sn < 0
                  THEN 1 ELSE 0 END) AS zc
  FROM samp GROUP BY doc_id, frame
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS total_energy,
       CAST(MAX(energy) AS BIGINT) AS peak_frame_energy,
       CAST(SUM(zc) AS BIGINT) AS total_zc,
       CAST(MAX(zc) AS BIGINT) AS max_frame_zc
FROM per_frame GROUP BY doc_id ORDER BY doc_id
"""


def wav_gate_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`wav_roundtrip_features`' expected decoded
    samples (valid because the fixture is integer PCM end to end)."""
    s = "((b.doc_id * 31 + i.i * 17) % 2001) - 1000"
    return f"""
WITH sub AS (SELECT doc_id FROM {table} WHERE doc_id % 4 = 2),
samp AS (
  SELECT b.doc_id, {s} AS s
  FROM sub b, range(0, 65) i(i)
  WHERE i.i < 40 + b.doc_id % 25
)
SELECT doc_id,
       CAST(40 + doc_id % 25 AS BIGINT) AS n_samples,
       CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
       CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak
FROM samp GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF) container walk: real box parsing, SQL-replayable metadata
# ---------------------------------------------------------------------------


def encode_mp4(brand: bytes, timescale: int, duration: int,
               n_tracks: int, mdat: bytes) -> bytes:
    """Minimal but genuine ISO-BMFF writer: ftyp + moov(mvhd v0 +
    empty trak boxes) + mdat, all with big-endian 32-bit box sizes."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,                          # rate..next_track_id
    )
    moov = box(b"moov", mvhd + b"".join(box(b"trak", b"") for _ in range(n_tracks)))
    return ftyp + moov + box(b"mdat", mdat)


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [pos, end) — 64-bit largesize and to-end-of-file sizes included."""
    import struct

    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        head = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        yield btype, pos + head, pos + size
        pos += size


def parse_mp4(payload: bytes) -> dict:
    """REAL ISO-BMFF container walk: top-level box iteration (32-bit,
    64-bit largesize, and run-to-EOF sizes), ftyp major brand, moov
    recursion for the mvhd movie header (v0 and v1 timescale/duration)
    and trak count, mdat byte length. Returns ``{brand, timescale,
    duration, n_tracks, mdat_bytes}``. Decoding the CODEC PAYLOAD
    inside mdat (H.264 etc.) still raises via :func:`decode_media` —
    that genuinely needs ffmpeg; the container metadata path, which is
    what a 100 TB media-curation pipeline filters and routes on, is
    real and byte-tested."""
    import struct

    out = {"brand": None, "timescale": None, "duration": None,
           "n_tracks": 0, "mdat_bytes": 0}
    seen = set()
    for btype, s, e in _walk_boxes(payload, 0, len(payload)):
        seen.add(btype)
        if btype == b"ftyp":
            out["brand"] = payload[s:s + 4].decode("latin-1")
        elif btype == b"mdat":
            out["mdat_bytes"] += e - s
        elif btype == b"moov":
            for ityp, i0, i1 in _walk_boxes(payload, s, e):
                if ityp == b"trak":
                    out["n_tracks"] += 1
                elif ityp == b"mvhd":
                    version = payload[i0]
                    if version == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[i0 + 20:i0 + 32])
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[i0 + 12:i0 + 20])
                    out["timescale"], out["duration"] = ts, dur
    if b"moov" not in seen:
        raise ValueError("not an ISO-BMFF stream (no moov box)")
    return out


MP4_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("timescale", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("mdat_bytes", T.LongType()),
    ]
)


def mp4_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Oracle-gateable REAL MP4 container walk (q163): per document,
    write a genuine ISO-BMFF stream (brand 'isom', timescale 1000,
    duration = doc_id*7 % 100000, 1 + doc_id%3 tracks, mdat of
    10 + doc_id%50 bytes) and parse it back inside Arrow-batched
    ``mapInPandas`` — integer metadata end to end, so a SQL oracle
    replays every field while Spark exercises the box walk."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                payload = encode_mp4(
                    b"isom", 1000, doc_id * 7 % 100000,
                    1 + doc_id % 3, b"\x00" * (10 + doc_id % 50),
                )
                d = parse_mp4(payload)
                rows.append({"doc_id": doc_id, **d})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, MP4_GATE_SCHEMA)


def mp4_gate_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`mp4_roundtrip_features`' expected parsed
    metadata (valid because the fixture is integer arithmetic)."""
    return f"""
SELECT doc_id,
       'isom' AS brand,
       CAST(1000 AS BIGINT) AS timescale,
       CAST(doc_id * 7 % 100000 AS BIGINT) AS duration,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
       CAST(10 + doc_id % 50 AS BIGINT) AS mdat_bytes
FROM {table} WHERE doc_id % 4 = 3 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MJPEG-in-MP4: real video sample tables + real codec-payload decode (q176)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + btype + payload


# identity transform matrix for tkhd (16.16 / 2.30 fixed point)
_TKHD_MATRIX = (
    b"\x00\x01\x00\x00" + b"\x00" * 12
    + b"\x00\x01\x00\x00" + b"\x00" * 12
    + b"\x40\x00\x00\x00"
)


def encode_mjpeg_mp4(
    frames,
    timescale: int = 1000,
    frame_delta: int = 40,
    samples_per_chunk: int = 0,
) -> bytes:
    """Genuine MJPEG-in-MP4 writer: one video trak whose stbl carries
    REAL sample tables (stsd 'jpeg' VisualSampleEntry, stts, stsc,
    stsz, stco) and whose mdat is the concatenation of
    :func:`encode_jpeg` streams — Motion JPEG, the one ISO-BMFF codec
    whose payload this repo can decode end to end without ffmpeg.
    ``samples_per_chunk`` splits the mdat into multiple chunks (stco
    entries) to exercise the demuxer's stsc run-length expansion; 0
    packs all frames into a single chunk. Two-pass layout: moov is
    built once with zeroed chunk offsets to learn its size, then
    rebuilt with absolute offsets (stco is absolute-file-offset)."""
    import struct

    import numpy as np

    jfrs = [encode_jpeg(np.asarray(f, dtype=np.uint8)) for f in frames]
    n = len(jfrs)
    spc = samples_per_chunk or n
    h, w = np.asarray(frames[0], dtype=np.uint8).shape[:2]
    dur = n * frame_delta
    n_chunks = (n + spc - 1) // spc
    # intra-mdat byte offset of each chunk's first sample
    intra, pos = [], 0
    for c in range(n_chunks):
        intra.append(pos)
        for j in jfrs[c * spc:(c + 1) * spc]:
            pos += len(j)

    def moov_for(chunk_offsets):
        entry = (
            struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
            + struct.pack(">H", 1)          # data_reference_index
            + b"\x00" * 16                  # pre_defined / reserved
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4 + struct.pack(">H", 1)          # frame_count
            + b"\x00" * 32                  # compressorname
            + struct.pack(">Hh", 24, -1)    # depth, pre_defined
        )
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        stts = _box(
            b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, frame_delta)
        )
        runs = [(1, spc, 1)]
        if n % spc and n_chunks > 1:
            runs.append((n_chunks, n - spc * (n_chunks - 1), 1))
        stsc = _box(
            b"stsc",
            b"\x00" * 4 + struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", *r) for r in runs),
        )
        stsz = _box(
            b"stsz",
            b"\x00" * 4 + struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(j)) for j in jfrs),
        )
        stco = _box(
            b"stco",
            b"\x00" * 4 + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        url = _box(b"url ", b"\x00\x00\x00\x01")  # self-contained
        dinf = _box(
            b"dinf",
            _box(b"dref", b"\x00" * 4 + struct.pack(">I", 1) + url),
        )
        vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
        minf = _box(b"minf", vmhd + dinf + stbl)
        hdlr = _box(
            b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"mjpeg\x00"
        )
        mdhd = _box(
            b"mdhd",
            b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),  # lang 'und'
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + _TKHD_MATRIX
            + struct.pack(">II", w << 16, h << 16),
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur) + b"\x00" * 80,
        )
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x00\x00" + b"isom")
    base = len(ftyp) + len(moov_for(intra)) + 8  # + mdat header
    moov = moov_for([base + o for o in intra])
    return ftyp + moov + _box(b"mdat", b"".join(jfrs))


def mp4_sample_table(payload: bytes) -> dict:
    """Expand the first video trak's stbl into per-sample absolute
    ``(offset, size)`` pairs — the real demux step: stsd sample-entry
    fourcc + dimensions, stsz sizes (fixed or per-sample), stco/co64
    chunk offsets, and stsc run-length chunk→sample-count mapping.
    Raises ``ValueError`` on a missing video trak or an inconsistent
    sample table (stsc/stco not covering every stsz sample)."""
    import struct

    def children(span):
        return list(_walk_boxes(payload, *span))

    def child(boxes, t):
        for bt, s, e in boxes:
            if bt == t:
                return s, e
        raise ValueError(f"missing {t.decode('latin-1')!r} box")

    top = children((0, len(payload)))
    for bt, ts, te in children(child(top, b"moov")):
        if bt != b"trak":
            continue
        mboxes = children(child(children((ts, te)), b"mdia"))
        hs, _he = child(mboxes, b"hdlr")
        if payload[hs + 8:hs + 12] != b"vide":
            continue
        sboxes = children(child(children(child(mboxes, b"minf")), b"stbl"))
        ss, _se = child(sboxes, b"stsd")
        codec = payload[ss + 12:ss + 16].decode("latin-1")
        w, h = struct.unpack(">HH", payload[ss + 40:ss + 44])
        zs, _ze = child(sboxes, b"stsz")
        fixed, cnt = struct.unpack(">II", payload[zs + 4:zs + 12])
        sizes = (
            [fixed] * cnt if fixed
            else list(struct.unpack(f">{cnt}I", payload[zs + 12:zs + 12 + 4 * cnt]))
        )
        try:
            cs, _ce = child(sboxes, b"stco")
            (nch,) = struct.unpack(">I", payload[cs + 4:cs + 8])
            offs = struct.unpack(f">{nch}I", payload[cs + 8:cs + 8 + 4 * nch])
        except ValueError:
            cs, _ce = child(sboxes, b"co64")
            (nch,) = struct.unpack(">I", payload[cs + 4:cs + 8])
            offs = struct.unpack(f">{nch}Q", payload[cs + 8:cs + 8 + 8 * nch])
        ks, _ke = child(sboxes, b"stsc")
        (nsc,) = struct.unpack(">I", payload[ks + 4:ks + 8])
        runs = [
            struct.unpack(">III", payload[ks + 8 + 12 * i:ks + 20 + 12 * i])
            for i in range(nsc)
        ]
        spc_by_chunk = []
        for i, (first, spc, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else nch
            spc_by_chunk += [spc] * (last - first + 1)
        samples, si = [], 0
        for c, off in enumerate(offs):
            pos = off
            for _ in range(spc_by_chunk[c] if c < len(spc_by_chunk) else 0):
                if si >= cnt:
                    break
                samples.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
        if si != cnt:
            raise ValueError(
                f"sample table inconsistent: stsc/stco cover {si} of "
                f"{cnt} stsz samples"
            )
        return {"codec": codec, "width": w, "height": h, "samples": samples}
    raise ValueError("no video trak in moov")


def decode_mjpeg(payload: bytes) -> dict:
    """REAL video decode for MJPEG-in-MP4: demux via
    :func:`mp4_sample_table`, then run the full baseline JPEG decoder
    on every frame's byte range. Non-MJPEG sample entries (avc1/hev1…)
    raise ``NotImplementedError`` — those genuinely need ffmpeg; MJPEG
    is the one video codec whose payload is decodable here, and it
    makes the mdat path real instead of stubbed."""
    st = mp4_sample_table(payload)
    if st["codec"] != "jpeg":
        raise NotImplementedError(
            f"codec {st['codec']!r} inside mdat needs ffmpeg; MJPEG "
            "('jpeg' sample entries) decodes here"
        )
    frames = [decode_jpeg(payload[o:o + s])["pixels"] for o, s in st["samples"]]
    return {**st, "n_frames": len(frames), "frames": frames}


MJPEG_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def mjpeg_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Oracle-gateable REAL video decode (q176): per document, write a
    genuine MJPEG-in-MP4 (``2 + doc_id % 3`` 16×16 grayscale frames;
    frame k's 8×8 block (i,j) is the constant even gray
    ``2*((doc_id*11 + k*13 + i*3 + j*5) % 128)``; chunked every 2
    frames so stsc expansion is on the hot path), then demux the
    sample tables and run the FULL JPEG decoder on every frame inside
    Arrow-batched ``mapInPandas``. Even gray levels survive Annex-K
    quantization bit-exactly (the q137 invariant), so the SQL oracle
    replays the decoded-pixel aggregates arithmetically while Spark
    exercises container walk + demux + entropy decode + IDCT.
    Map-only: no shuffle, linear in executors."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                frs = []
                for k in range(2 + doc_id % 3):
                    img = np.zeros((16, 16), dtype=np.uint8)
                    for i in range(2):
                        for j in range(2):
                            img[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = (
                                2 * ((doc_id * 11 + k * 13 + i * 3 + j * 5)
                                     % 128)
                            )
                    frs.append(img)
                d = decode_mjpeg(encode_mjpeg_mp4(frs, samples_per_chunk=2))
                px0 = d["frames"][0]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "codec": d["codec"],
                        "n_frames": d["n_frames"],
                        "width": d["width"],
                        "height": d["height"],
                        "checksum": int(
                            px0[:CHECKSUM_PREFIX].astype(np.int64).sum() % 256
                        ),
                        "pixel_sum": int(
                            sum(f.astype(np.int64).sum() for f in d["frames"])
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, MJPEG_GATE_SCHEMA)


def mjpeg_gate_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`mjpeg_roundtrip_features`' decoded-pixel
    aggregates (valid because the even-gray fixture roundtrips the
    JPEG quantizer bit-exactly)."""
    g = "2 * ((b.doc_id * 11 + k.k * 13 + i.i * 3 + j.j * 5) % 128)"
    return f"""
WITH sub AS (SELECT doc_id FROM {table} WHERE doc_id % 4 = 2),
blocks AS (
  SELECT b.doc_id, {g} AS gray
  FROM sub b, range(0, 4) k(k), range(0, 2) i(i), range(0, 2) j(j)
  WHERE k.k < 2 + b.doc_id % 3
)
SELECT doc_id,
       'jpeg' AS codec,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST((8 * (2 * ((doc_id * 11) % 128))
             + 8 * (2 * ((doc_id * 11 + 5) % 128))) % 256 AS BIGINT)
         AS checksum,
       CAST(SUM(64 * gray) AS BIGINT) AS pixel_sum
FROM blocks GROUP BY doc_id ORDER BY doc_id
"""
