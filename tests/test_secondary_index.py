"""Secondary index (Hudi 1.0 SECONDARY_INDEX analog, D42): a value-
bucketed index on a non-key column serving lookup_by(values) with
index-pruned dir scans. Invariants: lookup equals a full-scan value
filter EXACTLY (stale entries from changed/deleted keys are harmless
false positives), maintenance is O(batch) on every write path, rebuild
compacts, restore re-establishes never-miss even past a rebuild."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


def _table(spark, sf_dir, tmp_path, **kw):
    cfg = TableConfig(
        name="orders_sidx",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_orderstatus",
        secondary_index="o_custkey",
        **kw,
    )
    t = CuratedTable(spark, tmp_path / "orders_sidx", cfg)
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
    )
    t.bulk_insert(base)
    return t, base


def _probe(spark, custkeys):
    return spark.createDataFrame([(k,) for k in custkeys],
                                 "o_custkey long")


def _keys(df):
    return sorted(r["o_orderkey"] for r in df.collect())


def test_lookup_equals_full_scan_filter(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path)
    custs = [r[0] for r in
             base.select("o_custkey").distinct().limit(3).collect()]
    got = t.lookup_by(_probe(spark, custs))
    want = t.read().filter(F.col("o_custkey").isin(custs))
    assert _keys(got) == _keys(want)
    assert set(got.columns) == set(want.columns)
    # the index is a real value-bucketed table on disk
    idir = t.root / "_index/secondary_o_custkey"
    assert any(idir.rglob("__bucket=*"))


def test_changed_value_never_misses_and_clears_stale(
    spark, sf_smoke, tmp_path
):
    t, base = _table(spark, sf_smoke, tmp_path)
    mover = base.orderBy("o_orderkey").first()
    new_cust = mover["o_custkey"] + 1_000_000
    t.upsert(
        base.filter(F.col("o_orderkey") == mover["o_orderkey"])
        .withColumn("o_custkey", F.lit(new_cust))
        .withColumn("trx_seq", F.lit("00000001"))
    )
    # new value finds the key (never-miss)
    assert mover["o_orderkey"] in _keys(t.lookup_by(_probe(spark,
                                                           [new_cust])))
    # old value no longer returns it (stale entry cleared by the
    # final value filter)
    assert mover["o_orderkey"] not in _keys(
        t.lookup_by(_probe(spark, [mover["o_custkey"]])))
    # and the whole lookup still equals the full-scan filter
    want = t.read().filter(F.col("o_custkey") == mover["o_custkey"])
    got = t.lookup_by(_probe(spark, [mover["o_custkey"]]))
    assert _keys(got) == _keys(want)


def test_mor_delta_values_visible(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path,
                     table_type="MERGE_ON_READ")
    mover = base.orderBy(F.col("o_orderkey").desc()).first()
    new_cust = mover["o_custkey"] + 2_000_000
    t.upsert(  # MOR: delta append, base dirs untouched
        base.filter(F.col("o_orderkey") == mover["o_orderkey"])
        .withColumn("o_custkey", F.lit(new_cust))
        .withColumn("trx_seq", F.lit("00000001"))
    )
    got = t.lookup_by(_probe(spark, [new_cust]))
    assert _keys(got) == [mover["o_orderkey"]]


def test_rebuild_compacts_and_stays_exact(spark, sf_smoke, tmp_path):
    t, base = _table(spark, sf_smoke, tmp_path)
    movers = [r["o_orderkey"] for r in
              base.orderBy("o_orderkey").limit(5).collect()]
    t.upsert(
        base.filter(F.col("o_orderkey").isin(movers))
        .withColumn("o_custkey", F.col("o_custkey") + 3_000_000)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    before = t._sidx().read().count()
    t.rebuild_secondary_index()
    after = t._sidx().read().count()
    assert after < before  # the 5 stale entries compacted away
    probe = _probe(spark, [r["o_custkey"] + 3_000_000 for r in
                           base.filter(F.col("o_orderkey")
                                       .isin(movers)).collect()])
    assert sorted(_keys(t.lookup_by(probe))) == sorted(movers)


def test_restore_past_rebuild_restores_never_miss(
    spark, sf_smoke, tmp_path
):
    """Value changed after the restore target, compacted away by a
    rebuild, then restore — the old (value, key) pair must be findable
    again (restore rebuilds the index from the restored snapshot)."""
    t, base = _table(spark, sf_smoke, tmp_path)
    v1 = t.latest_commit().version
    mover = base.orderBy("o_orderkey").first()
    t.upsert(
        base.filter(F.col("o_orderkey") == mover["o_orderkey"])
        .withColumn("o_custkey", F.lit(mover["o_custkey"] + 9_000_000))
        .withColumn("trx_seq", F.lit("00000001"))
    )
    t.rebuild_secondary_index()  # drops the (old value, key) entry
    t.restore(v1)
    got = t.lookup_by(_probe(spark, [mover["o_custkey"]]))
    assert mover["o_orderkey"] in _keys(got)


def test_bucketed_base_table_dir_keys(spark, sf_smoke, tmp_path):
    cfg = TableConfig(
        name="orders_sidx_b",
        record_key=["o_orderkey"],
        num_buckets=4,
        secondary_index="o_custkey",
    )
    t = CuratedTable(spark, tmp_path / "b", cfg)
    base = (
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
    )
    t.bulk_insert(base)
    cust = base.first()["o_custkey"]
    got = t.lookup_by(_probe(spark, [cust]))
    want = t.read().filter(F.col("o_custkey") == cust)
    assert _keys(got) == _keys(want)


def test_validations(spark, sf_smoke, tmp_path):
    with pytest.raises(ValueError, match="redundant"):
        TableConfig(name="x", record_key=["k"], secondary_index="k")
    with pytest.raises(ValueError, match="exclusive"):
        TableConfig(name="x", record_key=["k"], deletion_vectors=True,
                    secondary_index="v")
    cfg = TableConfig(name="plain", record_key=["o_orderkey"])
    t = CuratedTable(spark, tmp_path / "p", cfg)
    with pytest.raises(ValueError, match="not enabled"):
        t.lookup_by(_probe(spark, [1]))
    with pytest.raises(ValueError, match="not enabled"):
        t.rebuild_secondary_index()
