"""Source connectors (SURVEY.md §2.1 D1/D2)."""

from aws_dms_to_hudi_spark.sources.parquet_dfs import ParquetDFSSource

__all__ = ["ParquetDFSSource"]
