"""ORC change-log source (beyond-reference landing format).

The reference pins DMS to parquet (``templates/aws-dms-to-hudi.yaml:48``)
and stock DMS also lands CSV — both covered by sibling sources. ORC is
the third columnar landing format a lake commonly receives (Hive-lineage
exporters default to it), and Spark reads it natively with the same
vectorized reader + pushdown machinery as parquet, so supporting it is
pure source-plumbing: this class shares the watermark-checkpoint
incremental scan with :class:`.parquet_dfs.ParquetDFSSource` and applies
the same ``Op`` -> ``_hoodie_is_deleted`` envelope normalization as the
CSV/JSON sources when the column is present.

ORC embeds its schema, so no caller-supplied DDL is needed (unlike CSV/
JSON); additive schema evolution is tolerated via ``mergeSchema`` like
the parquet path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .csv_dfs import DELETED_COL, OP_COL
from .parquet_dfs import CHECKPOINT_KEY, ParquetDFSSource


class OrcDFSSource(ParquetDFSSource):
    """Incremental reader over an append-only ORC change-log dir."""

    SUFFIX = ".orc"

    def read_new(
        self, checkpoint: dict[str, Any] | None
    ) -> tuple[DataFrame | None, dict[str, Any]]:
        files = self.new_files(checkpoint)
        if not files:
            return None, dict(checkpoint or {})
        # .orc() takes one path-or-list argument (extra positionals are
        # keyword options, unlike .parquet(*paths))
        df = (
            self.spark.read.option("mergeSchema", "true")
            .orc([str(self.root / f) for f in files])
        )
        if OP_COL in df.columns:
            df = df.withColumn(
                DELETED_COL, F.col(OP_COL) == F.lit("D")
            ).drop(OP_COL)
        return df, {CHECKPOINT_KEY: files[-1]}
