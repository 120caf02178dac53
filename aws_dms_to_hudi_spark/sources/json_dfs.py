"""JSON-lines change-log source (DMS S3 target with ``DataFormat=json``).

The reference pins parquet (``templates/aws-dms-to-hudi.yaml:48``), but a
DMS S3 endpoint can equally land newline-delimited JSON; a complete engine
accepts all three landing formats (parquet / CSV / JSON). Shares the
watermark-checkpoint incremental scan with
:class:`.parquet_dfs.ParquetDFSSource` (DMS file names sort in arrival
order regardless of format) and normalizes the same stock envelope the CSV
path does:

- a ``record`` JSON object per line holding the source columns;
- an optional ``Op`` field (``I``/``U``/``D``) on change rows ->
  ``_hoodie_is_deleted`` (``D`` = tombstone), then dropped;
- ``trx_seq`` passes through when the task's AddColumns rule injects it.

JSON is self-describing but weakly typed; pass an explicit schema (DDL
string or StructType) for the production path — inference samples the
data and costs an extra scan, acceptable only for small control tables.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .csv_dfs import DELETED_COL, OP_COL
from .parquet_dfs import CHECKPOINT_KEY, ParquetDFSSource


class JsonDFSSource(ParquetDFSSource):
    """Incremental reader over an append-only DMS-style JSON change-log dir."""

    SUFFIX = ".json"

    def __init__(self, spark, root: str | Path, schema=None):
        super().__init__(spark, root)
        self.schema = schema

    def read_new(
        self, checkpoint: dict[str, Any] | None
    ) -> tuple[DataFrame | None, dict[str, Any]]:
        files = self.new_files(checkpoint)
        if not files:
            return None, dict(checkpoint or {})
        reader = self.spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.json([str(self.root / f) for f in files])
        if OP_COL in df.columns:
            df = df.withColumn(
                DELETED_COL, F.col(OP_COL) == F.lit("D")
            ).drop(OP_COL)
        return df, {CHECKPOINT_KEY: files[-1]}
