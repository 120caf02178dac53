"""Real ISO-BMFF (MP4) container walk: byte-level tests against
hand-built box streams (mirrors the PNG/JPEG/WAV files), then the
codec through the Arrow-batched media path."""

import struct

import pytest

from aws_dms_to_hudi_spark.functions import multimodal as mm


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def test_roundtrip():
    p = mm.encode_mp4(b"mp42", 90000, 123456, 3, b"\x01" * 77)
    d = mm.parse_mp4(p)
    assert d == {"brand": "mp42", "timescale": 90000, "duration": 123456,
                 "n_tracks": 3, "mdat_bytes": 77}


def test_largesize_and_to_eof_boxes():
    """size==1 → 64-bit largesize follows; size==0 → box runs to EOF.
    Both forms must walk correctly, including multiple mdat boxes."""
    base = mm.encode_mp4(b"isom", 1000, 10, 1, b"ab")
    large_mdat = (struct.pack(">I", 1) + b"mdat"
                  + struct.pack(">Q", 16 + 5) + b"hello")
    eof_mdat = struct.pack(">I", 0) + b"mdat" + b"tail!"
    d = mm.parse_mp4(base + large_mdat + eof_mdat)
    assert d["mdat_bytes"] == 2 + 5 + 5


def test_mvhd_version1():
    """64-bit (version 1) movie headers carry 8-byte times — the
    timescale/duration offsets shift accordingly."""
    mvhd = _box(
        b"mvhd",
        b"\x01\x00\x00\x00"          # version 1
        + struct.pack(">QQ", 0, 0)   # ctime, mtime (64-bit)
        + struct.pack(">IQ", 600, 2**33)  # timescale, duration (64-bit)
        + b"\x00" * 80,
    )
    p = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"moov", mvhd)
    d = mm.parse_mp4(p)
    assert d["timescale"] == 600
    assert d["duration"] == 2 ** 33


def test_unknown_boxes_skipped():
    base = mm.encode_mp4(b"isom", 1000, 5, 2, b"zz")
    junk = _box(b"free", b"\x00" * 13) + _box(b"skip", b"")
    d = mm.parse_mp4(junk + base)
    assert d["n_tracks"] == 2 and d["mdat_bytes"] == 2


def test_malformed_raises():
    with pytest.raises(ValueError, match="moov"):
        mm.parse_mp4(_box(b"ftyp", b"isom" + b"\x00" * 8))
    # box claiming to extend past EOF
    bad = struct.pack(">I", 100) + b"moov" + b"\x00" * 8
    with pytest.raises(ValueError, match="malformed"):
        mm.parse_mp4(bad)


def test_gate_features_match_fixture_arithmetic(spark):
    docs = spark.createDataFrame([(3,), (7,), (11,)], ["doc_id"])
    rows = {r["doc_id"]: r for r in
            mm.mp4_roundtrip_features(docs).collect()}
    for doc_id in (3, 7, 11):
        r = rows[doc_id]
        assert r["brand"] == "isom"
        assert r["timescale"] == 1000
        assert r["duration"] == doc_id * 7 % 100000
        assert r["n_tracks"] == 1 + doc_id % 3
        assert r["mdat_bytes"] == 10 + doc_id % 50
