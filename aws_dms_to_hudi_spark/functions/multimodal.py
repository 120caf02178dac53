"""Multimodal (image/audio/video) column plumbing.

Beyond-reference training-data extension (SURVEY.md §7 M6). The model:
media lives in opaque ``binary`` columns with a typed metadata struct
beside them; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the heavy
per-item work stays columnar-batched and embarrassingly parallel.

The decode step itself is a STUB in this container (no PIL/ffmpeg):
:func:`decode_media` raises ``NotImplementedError`` for real codecs and
provides a deterministic fake for ``fmt='raw'`` — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
oracle-tested; only the codec call is swapped out.

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


def decode_media(payload: bytes, fmt: str) -> dict:
    """Decode one media payload → feature dict.

    STUB: real codecs (jpeg/png/wav/mp4) are unavailable in this
    container; ``fmt='raw'`` uses a deterministic fake decode so the
    distributed plumbing is fully testable. The fake derives pseudo
    width/height from the byte content — stable across engines.
    """
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
