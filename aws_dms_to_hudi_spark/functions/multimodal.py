"""Multimodal (image/audio/video) column plumbing.

Beyond-reference training-data extension (SURVEY.md §7 M6). The model:
media lives in opaque ``binary`` columns with a typed metadata struct
beside them; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the heavy
per-item work stays columnar-batched and embarrassingly parallel.

Codecs: ``fmt='png'`` is REAL — a minimal pure-python decoder
(:func:`decode_png`: chunk walk, IDAT inflate, all five scanline
filters) runs inside the Arrow batches, byte-tested against hand-built
PNGs. ``fmt='raw'`` is the deterministic fake the cross-engine oracle
gates use (DuckDB can't inflate PNGs, so parity queries stay on the
arithmetic path). jpeg/wav/mp4 raise ``NotImplementedError`` — they
need libraries not present in this container; the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is shared either way.

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


def decode_media(payload: bytes, fmt: str) -> dict:
    """Decode one media payload → feature dict.

    ``fmt='png'`` runs the REAL pure-python PNG decoder above (checksum
    comes from decoded PIXELS, proving actual decode). ``fmt='raw'``
    keeps the deterministic fake used by the cross-engine oracle gates
    (a DuckDB oracle cannot inflate PNGs, so parity queries stay on the
    arithmetic path). Other codecs (jpeg/wav/mp4) still raise — they
    need libraries not present in this container.
    """
    if fmt == "png":
        d = decode_png(payload)
        return {
            "n_bytes": len(payload),
            "checksum": int(d["pixels"][:CHECKSUM_PREFIX].sum() % 256),
            "width": d["width"],
            "height": d["height"],
        }
    if fmt != "raw":
        raise NotImplementedError(
            f"codec {fmt!r} needs an image/audio library not present here; "
            "swap this branch for PIL/torchaudio/ffmpeg in production"
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


def media_features(docs: DataFrame) -> DataFrame:
    """End-to-end: attach payloads, extract features, deterministic order."""
    return extract_features(attach_binary(docs)).orderBy("doc_id")


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
