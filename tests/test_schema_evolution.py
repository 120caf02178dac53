"""Additive schema evolution (SURVEY.md §1.2): DMS tolerates source-side
DDL, so the curated layer must absorb batches that add or drop columns.

- added column: old state rows read back NULL, incoming rows keep it;
- dropped column: incoming rows NULL-fill the stored column;
- engine-level: a raw delta batch with a new column flows through
  scan (mergeSchema) -> merge (allowMissingColumns) -> storage.
"""

from pathlib import Path

from pyspark.sql import functions as F

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.engine import Engine
from aws_dms_to_hudi_spark.operators.merge import upsert_merge


def test_merge_batch_with_added_column(spark):
    existing = spark.createDataFrame(
        [(1, "a", "001"), (2, "b", "002")], "k int, v string, trx_seq string"
    )
    batch = spark.createDataFrame(
        [(2, "b2", "003", "x", False)],
        "k int, v string, trx_seq string, extra string, _hoodie_is_deleted boolean",
    )
    out = upsert_merge(existing, batch, ["k"], "trx_seq")
    rows = {r["k"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["extra"] is None
    assert rows[2]["extra"] == "x"
    assert rows[2]["v"] == "b2"


def test_merge_batch_with_dropped_column(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10.0, "001")], "k int, v string, w double, trx_seq string"
    )
    batch = spark.createDataFrame(
        [(1, "a2", "002", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean",
    )
    out = upsert_merge(existing, batch, ["k"], "trx_seq")
    row = out.collect()[0]
    assert row["v"] == "a2"
    assert row["w"] is None


def test_engine_ingests_widened_raw_batch(spark, tmp_path: Path):
    sf = "/root/testdata/sf0.001"
    config_items = [
        {"identifier": "evo", "config": "pipeline::hudi_bulk_insert",
         "pipeline_config": {"step_parallelism": 1}},
        {"identifier": "evo", "config": "pipeline::hudi_delta",
         "pipeline_config": {"step_parallelism": 1}},
        {"identifier": "evo", "config": "table::public.orders",
         "enabled": True,
         "hudi_config": {"record_key": "o_orderkey",
                         "source_ordering_field": "trx_seq"}},
    ]
    eng = Engine(spark, "evo", config_items, tmp_path / "raw", tmp_path / "curated")
    rec = cdc.RECIPES["orders"]
    cdc.write_raw_batch(spark, sf, rec, 0, tmp_path / "raw", "evo")
    assert all(s.status == "SUCCEEDED" for s in eng.run("hudi_bulk_insert").steps)
    before_rows = eng.read_table("evo_public_orders").count()

    # source-side DDL: batch 1 arrives with a new column
    widened = cdc.generate_batch(spark, sf, rec, 1).withColumn(
        "o_channel", F.lit("web")
    )
    out = (tmp_path / "raw" / "evo" / "public" / "orders" / "batch-00001")
    widened.write.mode("overwrite").parquet(str(out))
    assert all(s.status == "SUCCEEDED" for s in eng.run("hudi_delta").steps)

    state = eng.read_table("evo_public_orders")
    assert "o_channel" in state.columns
    touched = state.filter(F.col("o_channel") == "web").count()
    untouched = state.filter(F.col("o_channel").isNull()).count()
    assert touched > 0 and untouched > 0
    assert touched + untouched == state.count()
    # a later batch WITHOUT the new column must still merge cleanly
    cdc.write_raw_batch(spark, sf, rec, 2, tmp_path / "raw", "evo")
    assert all(s.status == "SUCCEEDED" for s in eng.run("hudi_delta").steps)
    assert "o_channel" in eng.read_table("evo_public_orders").columns
    assert eng.read_table("evo_public_orders").count() > 0
    assert before_rows > 0
