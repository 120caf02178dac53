"""Continuous ingest mode (D11): Structured Streaming file source.

The reference's ``hudi_delta_continuous`` pipeline passes ``--continuous``
to DeltaStreamer (``src/lambdas/launch_hudi/handler.py:166-167``; pipeline
type whitelist ``handler.py:28``), which loops the ingest
(read-new-files → transform → merge) forever instead of running once.

Spark-native mapping: ``spark.readStream`` over the raw change-log dir +
``foreachBatch`` invoking the SAME merge path as batch mode
(``CuratedTable.upsert``), so batch and streaming share one set of
semantics — exactly the Structured Streaming unified-model idiom.

- run-forever:  ``trigger(processingTime=...)`` — the 2-hour EventBridge
  cadence (yaml:76) collapses to a trigger interval;
- run-once parity: ``trigger(availableNow=True)`` processes everything
  pending and stops (what a scheduled batch run does);
- exactly-once: the streaming checkpoint tracks consumed files; the merge
  itself is idempotent (see operators.merge), so replays after a crash
  converge — the same two-layer story as the batch path.

Scale notes: ``maxFilesPerTrigger`` bounds per-micro-batch volume so a
backlogged table doesn't produce one giant merge; state on the stream is
ZERO (no watermarks/windows needed — ordering lives in ``trx_seq`` and is
resolved by the precombine rule per batch, SURVEY.md §2.3 note).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.operators.transformer import apply_transformer_sql
from aws_dms_to_hudi_spark.storage import CuratedTable


class ContinuousIngest:
    """Streaming CDC ingest for one table."""

    def __init__(
        self,
        spark: SparkSession,
        config: TableConfig,
        source_root: str | Path,
        target_root: str | Path,
        checkpoint_root: str | Path,
        max_files_per_trigger: int = 64,
    ):
        self.spark = spark
        self.config = config
        self.source_root = Path(source_root)
        self.target_root = Path(target_root)
        self.checkpoint_root = Path(checkpoint_root)
        self.max_files_per_trigger = max_files_per_trigger
        self.table = CuratedTable(spark, target_root, config)

    def _stream(self) -> DataFrame:
        # File-source schema must be pinned; infer it once from the files
        # present (same inferred-from-parquet contract as batch D1). The DMS
        # raw layout nests batch dirs (<table>/<batch>/*.parquet), which are
        # data dirs, not hive partitions — recursiveFileLookup both here and
        # on the stream so they are treated as a flat file set.
        schema = (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(str(self.source_root))
            .schema
        )
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .parquet(str(self.source_root))
        )

    def _merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = apply_transformer_sql(
            batch.sparkSession, batch, self.config.transformer_sql
        )
        self.table.upsert(batch, checkpoint={"stream_epoch": epoch_id})

    def start(
        self,
        processing_interval: str | None = None,
        available_now: bool = False,
    ):
        """Start the ingest query.

        ``available_now=True`` = run-once parity (drain pending, stop);
        otherwise ``processing_interval`` loops forever — the reference's
        ``--continuous`` mode.
        """
        writer = (
            self._stream()
            .writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", str(self.checkpoint_root))
            .queryName(f"ingest-{self.config.name}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_interval or "30 seconds")
        return writer.start()

    def run_available(self) -> None:
        """Drain everything pending and return (synchronous helper)."""
        q = self.start(available_now=True)
        q.awaitTermination()
