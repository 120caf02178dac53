"""Real PNG decode through the Arrow-batched media path: hand-built PNGs
(every scanline filter type) -> decode_png -> exact pixel recovery, and
the same payloads through mapInPandas end-to-end."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import types as T

from aws_dms_to_hudi_spark.functions import multimodal as mm


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, color_type: int, filters=None) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced) applying a chosen
    filter per scanline — exercises every decoder filter branch."""
    h, w, ch = pixels.shape
    bpp = ch
    filters = filters or [0] * h
    raw = bytearray()
    flat = pixels.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, np.int32)
    for y, ftype in zip(range(h), filters):
        line = flat[y]
        if ftype == 0:
            enc = line.copy()
        elif ftype == 2:
            enc = (line - prev) % 256
        else:
            enc = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_roundtrip_all_filters(color_type, ch):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
    payload = encode_png(px, color_type, filters=[0, 1, 2, 3, 4])
    d = mm.decode_png(payload)
    assert (d["width"], d["height"], d["channels"]) == (4, 5, ch)
    assert np.array_equal(d["pixels"], px.reshape(-1))


def test_decode_media_png_features():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = encode_png(px, 2, filters=[4, 3, 2, 1])
    feat = mm.decode_media(payload, "png")
    assert feat["width"] == 4 and feat["height"] == 4
    assert feat["n_bytes"] == len(payload)
    # checksum derives from DECODED pixels 0..15, not the compressed bytes
    assert feat["checksum"] == int(px.reshape(-1)[:16].sum() % 256)


def test_unsupported_codec_still_raises():
    # wav and the mp4 container walk are REAL since r4: malformed bytes
    # surface as parser ValueErrors; a valid mp4 container still raises
    # NotImplementedError at the codec-payload boundary
    with pytest.raises(ValueError):
        mm.decode_media(b"RIFF....WAVE", "wav")
    with pytest.raises(ValueError):
        mm.decode_media(b"\x00\x01", "mp4")
    with pytest.raises(NotImplementedError):
        mm.decode_media(mm.encode_mp4(b"isom", 1, 1, 1, b""), "mp4")
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")


def test_png_through_arrow_batched_path(spark):
    imgs = []
    for i in range(6):
        px = np.full((2 + i, 3, 3), i * 10, dtype=np.uint8)
        imgs.append((i, bytearray(encode_png(px, 2, filters=[2] * (2 + i)))))
    media = spark.createDataFrame(
        imgs, T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ])
    ).selectExpr(
        "doc_id", "payload",
        "named_struct('fmt', 'png', 'n_bytes', CAST(length(payload) AS BIGINT))"
        " AS media_meta",
    )
    feats = {r["doc_id"]: r for r in
             mm.extract_features(media).collect()}
    assert len(feats) == 6
    for i in range(6):
        assert feats[i]["width"] == 3 and feats[i]["height"] == 2 + i
        assert feats[i]["checksum"] == (i * 10 * 16) % 256
