"""Source connectors (SURVEY.md §2.1 D1/D2).

- ``ParquetDFSSource`` — the reference's landing format (DMS parquet).
- ``CsvDFSSource`` / ``JsonDFSSource`` — stock-DMS CSV / JSON-lines
  landings with the leading ``Op`` envelope.
- ``JdbcSource`` — the upstream RDBMS itself: full load + high-watermark
  incremental with envelope derivation on ingest (the DMS
  ``full-load-and-cdc`` entry point, ``README.md:11``).
"""

from aws_dms_to_hudi_spark.sources.csv_dfs import CsvDFSSource
from aws_dms_to_hudi_spark.sources.jdbc import JdbcSource
from aws_dms_to_hudi_spark.sources.json_dfs import JsonDFSSource
from aws_dms_to_hudi_spark.sources.parquet_dfs import ParquetDFSSource

__all__ = [
    "CsvDFSSource",
    "JdbcSource",
    "JsonDFSSource",
    "ParquetDFSSource",
]
