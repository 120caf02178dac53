"""Shallow clone (Delta SHALLOW CLONE analog, D45): a new table whose
first commit references the source's dirs by absolute path — zero data
I/O, copy-on-write divergence, source never written. DV snapshots and
index/CDC-image configs are rejected with the documented remedies."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


def _table(spark, sf_dir, tmp_path, **kw):
    cfg = TableConfig(
        name="src",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_orderstatus",
        **kw,
    )
    t = CuratedTable(spark, tmp_path / "src", cfg)
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
    )
    t.bulk_insert(base)
    return t, base


def test_clone_is_zero_copy_and_equal(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path)
    c = t.clone_to(tmp_path / "dev")
    cc = c.latest_commit()
    assert cc.operation == "clone"
    assert all(v.startswith(str(t.root)) for v in cc.data.values())
    assert {p.name for p in c.root.iterdir()} == {"_commits"}
    assert c.read().count() == base.count()
    assert (c.read().agg(F.sum("o_orderkey")).first()[0]
            == base.agg(F.sum("o_orderkey")).first()[0])


def test_clone_diverges_cow_and_source_untouched(
    spark, sf_smoke, tmp_path
):
    t, base = _table(spark, sf_smoke, tmp_path)
    v_src = t.latest_commit().version
    c = t.clone_to(tmp_path / "dev")
    batch = (
        base.filter((F.col("o_orderkey") % 5 == 0)
                    & (F.col("o_orderstatus") == "F"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    c.upsert(batch)
    # clone sees the change, source does not
    assert c.read().filter(F.col("trx_seq") == "00000001").count() \
        == batch.count()
    assert t.read().filter(F.col("trx_seq") == "00000001").count() == 0
    assert t.latest_commit().version == v_src
    # touched partitions are clone-owned; untouched still source refs
    cc = c.latest_commit()
    assert any(v.startswith("v") for v in cc.data.values())
    assert any(v.startswith(str(t.root)) for v in cc.data.values())


def test_clone_at_old_version_and_mor_deltas(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path,
                     table_type="MERGE_ON_READ")
    v1 = t.latest_commit().version
    t.upsert(
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    # clone the CURRENT snapshot: outstanding delta dirs carry by ref
    c2 = t.clone_to(tmp_path / "dev2")
    assert c2.latest_commit().deltas
    assert (c2.read().filter(F.col("trx_seq") == "00000001").count()
            == t.read().filter(F.col("trx_seq") == "00000001").count())
    # clone the PRE-upsert version: time-travel clone
    c1 = t.clone_to(tmp_path / "dev1", version=v1)
    assert c1.read().filter(F.col("trx_seq") == "00000001").count() == 0


def test_clone_validations(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path,
                     deletion_vectors=True)
    t.delete_keys(base.limit(5).select("o_orderkey"))
    with pytest.raises(ValueError, match="deletion vectors"):
        t.clone_to(tmp_path / "dv_clone")
    t2, _ = _table(spark, sf_smoke, tmp_path / "ri",
                   record_index=True)
    with pytest.raises(ValueError, match="unsupported"):
        t2.clone_to(tmp_path / "ri_clone")
    empty = CuratedTable(
        spark, tmp_path / "e", TableConfig(name="e", record_key=["k"]))
    with pytest.raises(ValueError, match="empty"):
        empty.clone_to(tmp_path / "e2")
