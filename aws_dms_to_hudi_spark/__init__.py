"""PySpark-native CDC lake engine.

A from-scratch rebuild of the data-plane and control-plane semantics of
``doitintl/aws-dms-to-hudi`` (reference: AWS DMS change logs merged into
Hudi tables by DeltaStreamer on EMR), re-expressed as idiomatic PySpark:

- raw layer: append-only parquet CDC change logs with a DMS-style envelope
  (``trx_seq`` string change-sequence + ``_hoodie_is_deleted`` boolean);
- curated layer: keyed, optionally partitioned parquet tables maintained by
  a precombine-dedup + keyed-upsert merge (COPY_ON_WRITE) or an append-log +
  periodic-compaction emulation (MERGE_ON_READ);
- control plane: JSON config -> per-table merge plans -> thread-pooled Spark
  jobs, with checkpoints, concurrency guard, run reports, and chaining.

Reference parity pins are cited per module as ``file:line`` into
``/root/reference``.
"""

from aws_dms_to_hudi_spark.config import (
    PipelineConfig,
    TableConfig,
    munge_configs,
)
from aws_dms_to_hudi_spark.session import get_spark

__all__ = [
    "PipelineConfig",
    "TableConfig",
    "munge_configs",
    "get_spark",
]

__version__ = "0.1.0"
