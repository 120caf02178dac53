"""SQL transformer (D10).

The reference lets each table config carry an arbitrary SQL statement that
DeltaStreamer applies to the incoming batch before merge
(``hoodie.deltastreamer.transformer.sql`` — ``handler.py:115-116``;
``docs/config_table.md:87-88``). The statement references the batch as
``<SRC>``.

This imports the whole Spark SQL operator surface into the engine
(SURVEY.md §2.3) — Catalyst plans the statement like any other query, so
pushdown/pruning/codegen apply to the transformed batch for free.

Thread-safety: merge jobs run concurrently in one SparkSession (C9), so the
temp-view name is suffixed per call to avoid collisions
(SURVEY.md §7.3 risk note).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

SRC_PLACEHOLDER = "<SRC>"


def apply_transformer_sql(
    spark: SparkSession, batch: DataFrame, sql: str | None
) -> DataFrame:
    """Apply a ``SELECT ... FROM <SRC>`` transform to the batch, if any."""
    if not sql:
        return batch
    view = f"src_{uuid.uuid4().hex}"
    batch.createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly; the returned DataFrame holds the
        # resolved relation, so the view can be dropped right away.
        return spark.sql(sql.replace(SRC_PLACEHOLDER, view))
    finally:
        spark.catalog.dropTempView(view)
