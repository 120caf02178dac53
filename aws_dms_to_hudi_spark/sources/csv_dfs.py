"""CSV change-log source (DMS's *default* S3 target format).

The reference configures DMS for parquet (``templates/aws-dms-to-hudi.yaml:48``
sets ``DataFormat=parquet``), but a stock DMS S3 endpoint lands CSV with a
leading ``Op`` column (``I``/``U``/``D``) on change rows — so a complete
engine accepts both landing formats. This source shares the
watermark-checkpoint incremental scan with :class:`.parquet_dfs.ParquetDFSSource`
(arrival order == lexicographic path order holds for DMS CSV file names
too) and normalizes the CSV envelope to the engine's canonical one:

- ``Op`` -> ``_hoodie_is_deleted`` (``D`` = tombstone), then dropped;
- all other columns pass through (``trx_seq`` included when the task adds
  it via the same AddColumns transformation rule as the parquet path).

CSV carries no embedded schema, so the caller supplies one (DDL string or
StructType); with none, headers + inference are used — acceptable for
small control tables, not the 100 TB path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parquet_dfs import CHECKPOINT_KEY, ParquetDFSSource

OP_COL = "Op"
DELETED_COL = "_hoodie_is_deleted"


class CsvDFSSource(ParquetDFSSource):
    """Incremental reader over an append-only DMS-style CSV change-log dir."""

    SUFFIX = ".csv"

    def __init__(self, spark, root: str | Path, schema=None):
        super().__init__(spark, root)
        self.schema = schema

    def read_new(
        self, checkpoint: dict[str, Any] | None
    ) -> tuple[DataFrame | None, dict[str, Any]]:
        files = self.new_files(checkpoint)
        if not files:
            return None, dict(checkpoint or {})
        reader = self.spark.read.option("header", "true")
        if self.schema is not None:
            reader = reader.schema(self.schema)
        else:
            reader = reader.option("inferSchema", "true")
        df = reader.csv([str(self.root / f) for f in files])
        if OP_COL in df.columns:
            df = df.withColumn(
                DELETED_COL, F.col(OP_COL) == F.lit("D")
            ).drop(OP_COL)
        return df, {CHECKPOINT_KEY: files[-1]}
