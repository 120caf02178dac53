"""Catalog sync (D16).

The reference registers every curated table in the Glue catalog via Hudi's
Hive sync (``handler.py:78-80,118,142``; Glue factory
``src/stepfunctions/emr1.json:79-101``) so engines can query by name.

The Spark-native engine keeps a JSON catalog of table -> {path, keys,
partitioning, schema} and can project it into the live SparkSession as
temp views (the local equivalent of metastore registration; on a cluster
with a metastore the same info feeds ``CREATE TABLE ... USING PARQUET
LOCATION ...``).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

CATALOG_FILE = "_catalog.json"


class Catalog:
    """JSON-file catalog over a curated lake root."""

    def __init__(self, lake_root: str | Path):
        self.lake_root = Path(lake_root)
        self.path = self.lake_root / CATALOG_FILE

    def _load(self) -> dict[str, dict[str, Any]]:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def _save(self, entries: dict[str, dict[str, Any]]) -> None:
        self.lake_root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.lake_root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, self.path)

    def sync(
        self,
        table_name: str,
        table_path: str | Path,
        record_key: list[str],
        partition_path: str | None,
        schema_json: str,
    ) -> None:
        """Register/refresh one table (idempotent, like Hive sync)."""
        entries = self._load()
        entries[table_name] = {
            "path": str(table_path),
            "record_key": record_key,
            "partition_path": partition_path,
            "schema": json.loads(schema_json),
        }
        self._save(entries)

    def tables(self) -> dict[str, dict[str, Any]]:
        return self._load()

    def register_spark_views(self, spark: SparkSession, engine: Any) -> list[str]:
        """Expose every cataloged table as a Spark temp view of its
        latest snapshot (query-by-name parity with Glue/Hive sync)."""
        names = []
        for name in self._load():
            df = engine.read_table(name)
            if df is not None:
                df.createOrReplaceTempView(name)
                names.append(name)
        return names
