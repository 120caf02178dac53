"""Real baseline JPEG decode through the Arrow-batched media path.

Coverage strategy (no external JPEG library exists in this container to
cross-check against, so the tests are structured to catch each layer's
failure mode independently):

- blockwise-constant even gray levels survive Annex-K quantization
  BIT-EXACTLY (q00=16 divides 8*(v-128) for even v) — proves marker
  parse, Huffman DC path, dequant, IDCT and rounding end-to-end with a
  closed-form expected value;
- coefficient-level consistency: the decoder's output must equal the
  quant->dequant->IDCT pipeline replayed independently in numpy on the
  encoder's own quantized coefficients — ANY entropy-coding bit error
  garbles coefficients, so equality proves the Huffman/bitstream layer
  exactly (AC runs, ZRL, EOB, byte stuffing included);
- restart markers, odd (edge-padded) sizes, color conversion, and the
  error paths (progressive SOF2, truncation, bad SOI) each get a case.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from aws_dms_to_hudi_spark.functions import multimodal as mm


def _expected_roundtrip(img: np.ndarray) -> np.ndarray:
    """Independently replay quantize->dequantize->IDCT on a grayscale
    image (what a bit-perfect entropy layer must reproduce)."""
    h, w = img.shape
    m = mm._dct_matrix()
    ql = np.array(mm._JPEG_QL, dtype=np.float64).reshape(8, 8)
    bh, bw = -(-h // 8), -(-w // 8)
    pp = np.pad(img.astype(np.float64) - 128.0,
                ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    out = np.zeros_like(pp)
    for by in range(bh):
        for bx in range(bw):
            blk = pp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            q = np.floor((m @ blk @ m.T) / ql + 0.5)
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                m.T @ (q * ql) @ m
    return np.clip(np.floor(out[:h, :w] + 128.0 + 0.5), 0, 255).astype(
        np.uint8
    )


def test_blockwise_constant_even_gray_is_exact():
    img = np.zeros((16, 24), dtype=np.uint8)
    vals = {}
    for i in range(2):
        for j in range(3):
            v = 2 * ((7 * i + 5 * j + 11) % 128)
            vals[(i, j)] = v
            img[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = v
    d = mm.decode_jpeg(mm.encode_jpeg(img))
    assert (d["width"], d["height"], d["channels"]) == (24, 16, 1)
    rec = d["pixels"].reshape(16, 24)
    for (i, j), v in vals.items():
        assert np.all(rec[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] == v)


@pytest.mark.parametrize("shape", [(8, 8), (24, 32), (10, 13), (7, 30)])
def test_entropy_layer_bit_exact_vs_numpy_replay(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = mm.decode_jpeg(mm.encode_jpeg(img))
    assert (d["width"], d["height"]) == (shape[1], shape[0])
    got = d["pixels"].reshape(shape)
    assert np.array_equal(got, _expected_roundtrip(img))


def test_restart_markers_roundtrip_identically():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    plain = mm.decode_jpeg(mm.encode_jpeg(img))
    with_rst = mm.encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in with_rst for k in range(8))
    d = mm.decode_jpeg(with_rst)
    assert np.array_equal(d["pixels"], plain["pixels"])


def test_color_smooth_gradient_small_error():
    x = np.linspace(0, 255, 32)
    img = np.stack(
        [np.tile(x, (16, 1)), np.tile(x[::-1], (16, 1)),
         np.full((16, 32), 128.0)],
        axis=-1,
    ).astype(np.uint8)
    d = mm.decode_jpeg(mm.encode_jpeg(img))
    assert (d["width"], d["height"], d["channels"]) == (32, 16, 3)
    err = np.abs(
        d["pixels"].reshape(16, 32, 3).astype(int) - img.astype(int)
    )
    assert err.max() <= 32  # chroma quantization, no codec defect


def test_constant_color_block_exact_channels():
    """A constant RGB image maps to constant Y/Cb/Cr planes; decode must
    return one constant color (DC-only path through all 3 components)."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 96, 40
    d = mm.decode_jpeg(mm.encode_jpeg(img))
    rec = d["pixels"].reshape(8, 8, 3)
    assert (rec == rec[0, 0]).all()
    assert np.abs(rec[0, 0].astype(int) - [200, 96, 40]).max() <= 6


def test_decode_media_jpeg_checksum_from_decoded_pixels():
    img = np.full((8, 8), 150, dtype=np.uint8)  # even -> exact
    payload = mm.encode_jpeg(img)
    feat = mm.decode_media(payload, "jpeg")
    assert feat["width"] == 8 and feat["height"] == 8
    assert feat["n_bytes"] == len(payload)
    # checksum folds DECODED pixels, not the compressed stream
    assert feat["checksum"] == (150 * mm.CHECKSUM_PREFIX) % 256


def test_error_paths():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(mm.encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        mm.decode_jpeg(b"\x00\x01" + bytes(payload[2:]))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        mm.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        mm.decode_jpeg(mm.encode_jpeg(img)[:20])  # truncated: no SOS


def test_jpeg_through_arrow_batched_path(spark):
    imgs = []
    for i in range(6):
        px = np.full((8, 8 * (1 + i % 2)), 2 * (40 + 10 * i),
                     dtype=np.uint8)
        imgs.append((i, bytearray(mm.encode_jpeg(px))))
    media = spark.createDataFrame(
        imgs,
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    ).selectExpr(
        "doc_id", "payload",
        "named_struct('fmt', 'jpeg', "
        "'n_bytes', CAST(length(payload) AS BIGINT)) AS media_meta",
    )
    feats = {r["doc_id"]: r for r in mm.extract_features(media).collect()}
    assert len(feats) == 6
    for i in range(6):
        v = 2 * (40 + 10 * i)
        assert feats[i]["height"] == 8
        assert feats[i]["width"] == 8 * (1 + i % 2)
        assert feats[i]["checksum"] == (v * mm.CHECKSUM_PREFIX) % 256


def test_phash_identical_renders_share_signature(spark):
    """docs d and d+PHASH_MOD render byte-identical images and MUST
    share a signature (the guaranteed direction of a perceptual hash);
    distinct smooth gradients MAY also collide — that is aHash recall
    vs precision, refined downstream by Hamming distance — so the test
    pins only membership, well-formedness, and the canonical id."""
    from aws_dms_to_hudi_spark.functions.multimodal import PHASH_MOD, phash_media

    docs = spark.createDataFrame(
        [(3,), (3 + PHASH_MOD,), (7,), (11,)], "doc_id long"
    )
    groups = phash_media(docs).collect()
    assert groups
    g3 = [g for g in groups if g["canonical_doc_id"] == 3]
    assert len(g3) == 1, "3 and 3+MOD must land in one group led by 3"
    assert g3[0]["n_docs"] >= 2
    for g in groups:
        assert set(g["phash"]) <= {"0", "1"} and len(g["phash"]) == 64
