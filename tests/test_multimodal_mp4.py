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


# ---------------------------------------------------------------------------
# MJPEG-in-MP4: real sample tables + real codec-payload decode
# ---------------------------------------------------------------------------


def _gray_frames(doc_id: int, nf: int):
    import numpy as np

    frames = []
    for k in range(nf):
        img = np.zeros((16, 16), np.uint8)
        for i in range(2):
            for j in range(2):
                img[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = (
                    2 * ((doc_id * 11 + k * 13 + i * 3 + j * 5) % 128)
                )
        frames.append(img)
    return frames


def test_mjpeg_roundtrip_bit_exact_single_chunk():
    import numpy as np

    frames = _gray_frames(7, 3)
    d = mm.decode_mjpeg(mm.encode_mjpeg_mp4(frames))
    assert (d["codec"], d["n_frames"], d["width"], d["height"]) == \
        ("jpeg", 3, 16, 16)
    for k, f in enumerate(d["frames"]):
        assert (f == frames[k].reshape(-1)).all(), k
    assert isinstance(d["frames"][0], np.ndarray)


def test_mjpeg_multi_chunk_stsc_expansion():
    # 5 frames chunked by 2 -> chunks of 2/2/1: stsc needs TWO runs and
    # the demuxer must walk stco offsets with per-chunk sample counts.
    frames = _gray_frames(3, 5)
    payload = mm.encode_mjpeg_mp4(frames, samples_per_chunk=2)
    st = mm.mp4_sample_table(payload)
    assert len(st["samples"]) == 5
    sizes = [s for _o, s in st["samples"]]
    direct = [len(mm.encode_jpeg(f)) for f in frames]
    assert sizes == direct
    d = mm.decode_mjpeg(payload)
    for k, f in enumerate(d["frames"]):
        assert (f == frames[k].reshape(-1)).all(), k


def test_mjpeg_frame_slices_are_standalone_jpegs():
    frames = _gray_frames(11, 4)
    payload = mm.encode_mjpeg_mp4(frames, samples_per_chunk=3)
    for (off, size), f in zip(mm.mp4_sample_table(payload)["samples"], frames):
        blob = payload[off:off + size]
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert (mm.decode_jpeg(blob)["pixels"] == f.reshape(-1)).all()


def test_mjpeg_container_still_parses_generically():
    meta = mm.parse_mp4(mm.encode_mjpeg_mp4(_gray_frames(1, 2)))
    assert meta["brand"] == "isom"
    assert meta["n_tracks"] == 1
    assert meta["timescale"] == 1000 and meta["duration"] == 80
    assert meta["mdat_bytes"] > 0


def test_non_mjpeg_codec_raises_not_implemented():
    # swap the stsd fourcc to avc1: demux succeeds, decode refuses
    payload = bytearray(mm.encode_mjpeg_mp4(_gray_frames(2, 2)))
    idx = payload.find(b"stsd")
    fourcc = payload.find(b"jpeg", idx)
    payload[fourcc:fourcc + 4] = b"avc1"
    st = mm.mp4_sample_table(bytes(payload))
    assert st["codec"] == "avc1" and len(st["samples"]) == 2
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.decode_mjpeg(bytes(payload))


def test_decode_media_mp4_mjpeg_checksum_from_decoded_pixels():
    frames = _gray_frames(5, 2)
    feat = mm.decode_media(mm.encode_mjpeg_mp4(frames), "mp4")
    expect = int(frames[0].reshape(-1)[:mm.CHECKSUM_PREFIX].sum()) % 256
    assert feat["checksum"] == expect
    assert (feat["width"], feat["height"]) == (16, 16)


def test_mjpeg_gate_features_match_fixture_arithmetic(spark):
    rows = [(i,) for i in range(2, 40, 4)]
    docs = spark.createDataFrame(rows, "doc_id long")
    out = {r["doc_id"]: r for r in mm.mjpeg_roundtrip_features(docs).collect()}
    for (doc_id,) in rows:
        nf = 2 + doc_id % 3
        import numpy as np

        frames = _gray_frames(doc_id, nf)
        r = out[doc_id]
        assert r["codec"] == "jpeg" and r["n_frames"] == nf
        assert r["pixel_sum"] == sum(
            int(f.astype(np.int64).sum()) for f in frames
        )
        assert r["checksum"] == int(
            frames[0].reshape(-1)[:mm.CHECKSUM_PREFIX].astype(np.int64).sum()
        ) % 256
