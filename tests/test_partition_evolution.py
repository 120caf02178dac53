"""Partition evolution (Iceberg partition-evolution analog via its
rewrite path, D44): evolve_partitioning rewrites the snapshot under a
new partition column and returns a handle bound to the evolved spec.
Invariants: content identical across the evolve, reads are
spec-agnostic (time travel across specs works), stale handles refuse
writes loudly, indexes rebuild, new-spec upserts partition-prune."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


def _orders(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
    )


def _table(spark, sf_dir, tmp_path, **kw):
    cfg = TableConfig(
        name="ev",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_orderstatus",
        **kw,
    )
    t = CuratedTable(spark, tmp_path / "ev", cfg)
    t.bulk_insert(_orders(spark, sf_dir))
    return t


def _sum(df):
    return df.agg(
        F.count("*"), F.sum("o_orderkey"),
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")),
    ).first()


def test_evolve_preserves_content_and_changes_spec(
    spark, sf_smoke, tmp_path
):
    t = _table(spark, sf_smoke, tmp_path)
    before = _sum(t.read())
    t2 = t.evolve_partitioning("o_orderpriority")
    c = t2.latest_commit()
    assert c.operation == "evolve_partitioning"
    assert all(k.startswith("o_orderpriority=") for k in c.data)
    assert _sum(t2.read()) == before
    # the old handle still reads (spec-agnostic) but refuses writes
    assert _sum(t.read()) == before
    batch = _orders(spark, sf_smoke).limit(1).withColumn(
        "trx_seq", F.lit("00000001"))
    with pytest.raises(ValueError, match="evolved"):
        t.upsert(batch)
    # the new handle upserts fine and prunes under the new spec
    c2 = t2.upsert(batch)
    touched = batch.first()["o_orderpriority"]
    assert c2.data[f"o_orderpriority={touched}"].startswith(
        f"v{c2.version:08d}")
    carried = [k for k in c2.data if k != f"o_orderpriority={touched}"]
    assert all(c2.data[k] == c.data[k] for k in carried)


def test_time_travel_across_specs(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path)
    v1 = t.latest_commit().version
    before = _sum(t.read())
    t2 = t.evolve_partitioning(None)  # to unpartitioned
    assert t2.latest_commit().data == {
        "": f"v{t2.latest_commit().version:08d}"}
    assert _sum(t2.read()) == before
    assert _sum(t2.read(version=v1)) == before  # old spec version
    t3 = t2.evolve_partitioning("o_orderstatus")  # and back
    assert _sum(t3.read()) == before
    assert _sum(t3.read(version=v1)) == before


def test_mor_deltas_materialize_on_evolve(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path, table_type="MERGE_ON_READ")
    base = _orders(spark, sf_smoke)
    t.upsert(
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    want = _sum(t.read())  # merged view
    t2 = t.evolve_partitioning("o_orderpriority")
    c = t2.latest_commit()
    assert c.deltas == []
    assert _sum(t2.read()) == want


def test_indexes_rebuilt_after_evolve(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path, record_index=True,
               secondary_index="o_custkey")
    base = _orders(spark, sf_smoke)
    row = base.first()
    t2 = t.evolve_partitioning("o_orderpriority")
    got = t2.point_lookup(
        spark.createDataFrame([(row["o_orderkey"],)], "o_orderkey long"))
    assert got.count() == 1
    got2 = t2.lookup_by(
        spark.createDataFrame([(row["o_custkey"],)], "o_custkey long"))
    want = t2.read().filter(F.col("o_custkey") == row["o_custkey"])
    assert got2.count() == want.count() > 0


def test_evolve_validations(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path)
    with pytest.raises(ValueError, match="already partitioned"):
        t.evolve_partitioning("o_orderstatus")
    with pytest.raises(ValueError, match="not in the table schema"):
        t.evolve_partitioning("nope")
    empty = CuratedTable(
        spark, tmp_path / "empty",
        TableConfig(name="x", record_key=["k"]))
    with pytest.raises(ValueError, match="empty table"):
        empty.evolve_partitioning("k2")
    bucketed = CuratedTable(
        spark, tmp_path / "b",
        TableConfig(name="b", record_key=["o_orderkey"], num_buckets=4))
    bucketed.bulk_insert(_orders(spark, sf_smoke))
    with pytest.raises(ValueError, match="synthetic"):
        bucketed.evolve_partitioning("o_orderstatus")
