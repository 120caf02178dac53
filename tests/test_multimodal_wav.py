"""Real WAV (RIFF/PCM16) decode: byte-level container tests against
hand-built streams, then the same codec through the Arrow-batched media
path (mirrors test_multimodal_png.py / test_multimodal_jpeg.py)."""

import struct

import numpy as np
import pytest

from aws_dms_to_hudi_spark.functions import multimodal as mm


def test_roundtrip_mono():
    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int64)
    d = mm.decode_wav(mm.encode_wav(s, 16000))
    assert d["sample_rate"] == 16000
    assert d["channels"] == 1
    assert (d["samples"][:, 0] == s).all()


def test_roundtrip_stereo_interleave():
    left = np.arange(10, dtype=np.int64) * 100
    right = -left
    d = mm.decode_wav(mm.encode_wav(np.stack([left, right], 1), 44100, 2))
    assert d["channels"] == 2
    assert (d["samples"][:, 0] == left).all()
    assert (d["samples"][:, 1] == right).all()


def test_header_bytes_exact():
    """The writer must emit a spec-shaped header the parser re-reads —
    pinned field by field so neither side drifts."""
    payload = mm.encode_wav(np.array([1, 2, 3]), 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt "
    fmt_size = struct.unpack("<I", payload[16:20])[0]
    assert fmt_size == 16
    audio_format, channels, rate, byte_rate, block_align, bits = \
        struct.unpack("<HHIIHH", payload[20:36])
    assert (audio_format, channels, rate, bits) == (1, 1, 8000, 16)
    assert byte_rate == 8000 * 2 and block_align == 2
    assert payload[36:40] == b"data"
    assert struct.unpack("<I", payload[40:44])[0] == 6
    assert np.frombuffer(payload[44:50], dtype="<i2").tolist() == [1, 2, 3]


def test_unknown_chunks_skipped_with_pad():
    """RIFF chunks with odd sizes carry a pad byte; the walker must skip
    unknown chunks (LIST, cue) wherever they sit, including before fmt."""
    s = np.array([7, -7, 7], dtype=np.int64)
    base = mm.encode_wav(s, 8000)
    fmt_and_data = base[12:]
    odd_junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    body = b"WAVE" + odd_junk + fmt_and_data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    d = mm.decode_wav(payload)
    assert (d["samples"][:, 0] == s).all()


def test_odd_data_chunk_padded():
    """A 3-sample mono stream has a 6-byte data chunk (even), but a
    manually truncated 5-byte one must not break frame alignment: only
    whole frames parse."""
    base = mm.encode_wav(np.array([1, 2]), 8000)
    # rewrite data size to 3 (1.5 frames) — parser keeps 1 whole frame
    idx = base.index(b"data")
    hacked = (base[:idx + 4] + struct.pack("<I", 3)
              + base[idx + 8:idx + 11])
    hacked = base[:8].replace(
        base[4:8], struct.pack("<I", len(hacked) - 8)
    ) + hacked[8:]
    d = mm.decode_wav(hacked)
    assert d["samples"].shape == (1, 1)
    assert d["samples"][0, 0] == 1


def test_rejects_non_riff_and_non_pcm():
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"OggS" + b"\x00" * 40)
    base = bytearray(mm.encode_wav(np.array([1]), 8000))
    base[20] = 3  # audio_format = IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        mm.decode_wav(bytes(base))
    with pytest.raises(ValueError, match="int16"):
        mm.encode_wav(np.array([40000]), 8000)


def test_decode_media_wav_branch():
    s = np.array([10, -20, 30], dtype=np.int64)
    out = mm.decode_media(mm.encode_wav(s, 8000), "wav")
    assert out["width"] == 3      # frames
    assert out["height"] == 1     # channels
    assert out["checksum"] == abs(10 - 20 + 30) % 256


def test_gate_features_match_fixture_arithmetic(spark):
    """The mapInPandas gate path must reproduce the fixture arithmetic
    the SQL oracle replays (decoded == generated for integer PCM)."""
    docs = spark.createDataFrame([(2,), (6,), (10,)], ["doc_id"])
    rows = {r["doc_id"]: r for r in
            mm.wav_roundtrip_features(docs).collect()}
    for doc_id in (2, 6, 10):
        n = 40 + doc_id % 25
        i = np.arange(n, dtype=np.int64)
        samples = (doc_id * 31 + i * 17) % 2001 - 1000
        r = rows[doc_id]
        assert r["n_samples"] == n
        assert r["sample_rate"] == 8000 + 4000 * (doc_id % 3)
        assert r["abs_sum"] == int(np.abs(samples).sum())
        assert r["peak"] == int(np.abs(samples).max())
