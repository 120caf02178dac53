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


# ---------- type widening (Avro/Hudi promotion rules) ----------

import pytest
from pyspark.sql.types import (
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.operators.schema_evolution import (
    SchemaEvolutionError,
    align_to,
    evolved_schema,
    reconcile,
    widen_type,
)
from aws_dms_to_hudi_spark.storage import CuratedTable


def test_widen_type_lattice():
    assert widen_type(IntegerType(), LongType()) == LongType()
    assert widen_type(LongType(), IntegerType()) == LongType()
    assert widen_type(FloatType(), DoubleType()) == DoubleType()
    assert widen_type(IntegerType(), DoubleType()) == DoubleType()
    assert widen_type(LongType(), FloatType()) == FloatType()
    assert widen_type(StringType(), StringType()) == StringType()
    # integer digits max(10-2, 12-4) = 8, scale max(2, 4) = 4
    assert widen_type(DecimalType(10, 2), DecimalType(12, 4)) == DecimalType(
        12, 4
    )
    assert widen_type(IntegerType(), DecimalType(6, 2)) == DecimalType(12, 2)
    assert widen_type(DateType(), TimestampType()) == TimestampType()
    with pytest.raises(SchemaEvolutionError):
        widen_type(StringType(), IntegerType())
    with pytest.raises(SchemaEvolutionError):
        widen_type(TimestampType(), LongType())


def test_evolved_schema_order_and_nullability():
    old = StructType(
        [
            StructField("k", IntegerType(), False),
            StructField("v", StringType(), True),
        ]
    )
    new = StructType(
        [
            StructField("extra", StringType(), False),
            StructField("k", LongType(), False),
        ]
    )
    out = evolved_schema(old, new)
    # stored order first, appended new columns after; widened key type;
    # fields absent on one side become nullable
    assert [f.name for f in out.fields] == ["k", "v", "extra"]
    assert out["k"].dataType == LongType() and not out["k"].nullable
    assert out["v"].nullable and out["extra"].nullable
    with pytest.raises(SchemaEvolutionError, match="column 'k'"):
        evolved_schema(old, StructType([StructField("k", StringType())]))


def test_merge_widens_types(spark):
    existing = spark.createDataFrame(
        [(1, 10, "001")], "k int, v int, trx_seq string"
    )
    batch = spark.createDataFrame(
        [(2, 2**40, "002", False)],
        "k int, v long, trx_seq string, _hoodie_is_deleted boolean",
    )
    out = upsert_merge(existing, batch, ["k"], "trx_seq")
    assert dict(out.dtypes)["v"] == "bigint"
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {1: 10, 2: 2**40}


def test_merge_incompatible_evolution_raises(spark):
    existing = spark.createDataFrame([(1, 10, "001")], "k int, v int, trx_seq string")
    batch = spark.createDataFrame(
        [(1, "oops", "002", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean",
    )
    with pytest.raises(SchemaEvolutionError, match="column 'v'"):
        upsert_merge(existing, batch, ["k"], "trx_seq")


def test_reconcile_identity_when_schemas_match(spark):
    a = spark.createDataFrame([(1,)], "k int")
    b = spark.createDataFrame([(2,)], "k int")
    out = reconcile([a, b])
    assert out[0] is a and out[1] is b  # no projection inserted


def test_align_to_casts_and_null_fills(spark):
    df = spark.createDataFrame([(1, 2.5)], "k int, x double")
    target = StructType(
        [
            StructField("k", LongType(), True),
            StructField("x", DoubleType(), True),
            StructField("y", StringType(), True),
        ]
    )
    row = align_to(df, target).collect()[0]
    assert row["k"] == 1 and row["x"] == 2.5 and row["y"] is None


def test_partitioned_cow_widening_with_carried_forward_dirs(spark, tmp_path):
    """A widened batch touching ONE partition must not break the read of
    untouched partitions carried forward with the narrower schema."""
    cfg = TableConfig(
        name="evo_part",
        record_key=["k"],
        is_partitioned=True,
        partition_path="p",
    )
    t = CuratedTable(spark, tmp_path / "evo_part", cfg)
    base = spark.createDataFrame(
        [(1, "a", 10, "001"), (2, "b", 20, "001")],
        "k int, p string, v int, trx_seq string",
    )
    t.bulk_insert(base)
    batch = spark.createDataFrame(
        [(1, "a", 2**40, "002", False)],
        "k int, p string, v long, trx_seq string, _hoodie_is_deleted boolean",
    )
    t.upsert(batch)
    state = t.read()
    assert dict(state.dtypes)["v"] == "bigint"
    rows = {r["k"]: r["v"] for r in state.collect()}
    assert rows == {1: 2**40, 2: 20}


def test_mor_delta_evolution_snapshot_and_compact(spark, tmp_path):
    """MOR: a delta carrying a widened type + a new column must merge at
    read (snapshot) and fold cleanly at compaction."""
    cfg = TableConfig(name="evo_mor", record_key=["k"], table_type="MERGE_ON_READ")
    t = CuratedTable(spark, tmp_path / "evo_mor", cfg)
    t.bulk_insert(
        spark.createDataFrame([(1, 10, "001"), (2, 20, "001")], "k int, v int, trx_seq string")
    )
    t.upsert(
        spark.createDataFrame(
            [(2, 2**40, "002", "x", False)],
            "k int, v long, trx_seq string, extra string, _hoodie_is_deleted boolean",
        )
    )
    snap = t.read()
    assert dict(snap.dtypes)["v"] == "bigint"
    rows = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
    assert rows == {1: (10, None), 2: (2**40, "x")}
    t.compact()
    rows2 = {r["k"]: (r["v"], r["extra"]) for r in t.read().collect()}
    assert rows2 == rows
