"""Streaming ingest (SURVEY.md §2.1 D11) + event-time extensions (§7 M4)."""

from aws_dms_to_hudi_spark.streaming.continuous import ContinuousIngest

__all__ = ["ContinuousIngest"]
