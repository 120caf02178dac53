"""Parquet change-log source with checkpointed incremental scan (D1+D2).

The reference delegates this to DeltaStreamer's ``ParquetDFSSource``
(``src/lambdas/launch_hudi/handler.py:141``) reading the DMS landing dir
(``hoodie.deltastreamer.source.dfs.root``, ``handler.py:70,82``): an
append-only tree of gzip-parquet files whose *names are monotonically
increasing* (DMS writes ``LOAD...`` then timestamped CDC files into
date-partitioned dirs, ``templates/aws-dms-to-hudi.yaml:48``).

Checkpoint design: because arrival order == lexicographic path order, the
checkpoint is a single high-watermark string (the max relative path
consumed), not a list of seen files. At 100 TB / millions of CDC files a
seen-file set would grow without bound and would have to be shipped into
every run; a watermark is O(1) and makes "new files" a simple sorted-range
scan. (DeltaStreamer's own checkpoint for DFS sources is the same idea: a
modification-timestamp watermark.)

The watermark is stored inside the table's commit manifest
(storage.Commit.checkpoint), so source position and table state commit
atomically — re-running after a crash replays only uncommitted files, and
the idempotent merge absorbs exact replays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

PARQUET_SUFFIX = ".parquet"
CHECKPOINT_KEY = "watermark"


class ParquetDFSSource:
    """Incremental reader over an append-only parquet change-log dir."""

    SUFFIX = PARQUET_SUFFIX

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)

    def list_files(self) -> list[str]:
        """All data files under the root, sorted by relative path.

        Local-fs implementation; on an object store this is a prefix
        listing (S3 LIST already returns lexicographic order).
        """
        if not self.root.exists():
            return []
        return sorted(
            str(p.relative_to(self.root))
            for p in self.root.rglob(f"*{self.SUFFIX}")
            if p.is_file() and not p.name.startswith(("_", "."))
        )

    def new_files(self, checkpoint: dict[str, Any] | None) -> list[str]:
        watermark = (checkpoint or {}).get(CHECKPOINT_KEY, "")
        return [f for f in self.list_files() if f > watermark]

    def read_new(
        self, checkpoint: dict[str, Any] | None
    ) -> tuple[DataFrame | None, dict[str, Any]]:
        """Read files newer than the checkpoint; return (batch, next_ckpt).

        Schema is inferred from parquet (no DDL anywhere in the reference,
        SURVEY.md §1.2); additive schema evolution is tolerated via
        ``mergeSchema`` so a widened source table doesn't break ingest.
        """
        files = self.new_files(checkpoint)
        if not files:
            return None, dict(checkpoint or {})
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*[str(self.root / f) for f in files])
        )
        return df, {CHECKPOINT_KEY: files[-1]}
