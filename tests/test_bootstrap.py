"""Bootstrap (Hudi METADATA_ONLY bootstrap / Delta CONVERT TO DELTA
analog, D41): onboard an existing hive-layout parquet lake as the
table's first commit with ZERO data I/O — the data map references the
source dirs by absolute path. Invariants: no data file written or read
at bootstrap time, reads union external dirs like owned ones, the first
rewrite of a partition materializes it (and only it), GC never deletes
source dirs, validations are loud."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


def _source_lake(spark, sf_dir, tmp_path, partitioned=True):
    """A pre-existing lake: orders + a constant-low ordering column,
    hive-partitioned by o_orderstatus (or flat)."""
    src = tmp_path / "legacy_lake"
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
    )
    w = df.write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("o_orderstatus")
    w.parquet(str(src))
    return src, df


def _cfg(**kw):
    base = dict(
        name="orders_boot",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_orderstatus",
    )
    base.update(kw)
    return TableConfig(**base)


def test_bootstrap_is_metadata_only_and_readable(spark, sf_smoke, tmp_path):
    src, df = _source_lake(spark, sf_smoke, tmp_path)
    t = CuratedTable(spark, tmp_path / "t", _cfg())
    c = t.bootstrap(src)
    assert c.operation == "bootstrap"
    # every data-map entry is an absolute path INTO the source lake
    assert all(v.startswith(str(src)) for v in c.data.values())
    assert set(c.data) == {
        f"o_orderstatus={r[0]}"
        for r in df.select("o_orderstatus").distinct().collect()
    }
    # metadata-only: nothing under the table root but the commit dir
    children = {p.name for p in t.root.iterdir()}
    assert children == {"_commits"}
    # read() sees the full source state, partition column included
    got = t.read()
    assert got.count() == df.count()
    assert set(got.columns) == set(df.columns)
    assert (
        got.agg(F.sum("o_orderkey")).first()[0]
        == df.agg(F.sum("o_orderkey")).first()[0]
    )


def test_first_rewrite_materializes_only_touched_partition(
    spark, sf_smoke, tmp_path
):
    src, df = _source_lake(spark, sf_smoke, tmp_path)
    t = CuratedTable(spark, tmp_path / "t", _cfg())
    t.bootstrap(src)
    batch = (
        df.filter((F.col("o_orderstatus") == "F")
                  & (F.col("o_orderkey") % 5 == 0))
        .withColumn("trx_seq", F.lit("00000001"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    )
    c2 = t.upsert(batch)
    # touched partition now owned; untouched ones still external
    assert c2.data["o_orderstatus=F"].startswith("v")
    for k, v in c2.data.items():
        if k != "o_orderstatus=F":
            assert v.startswith(str(src)), (k, v)
    # merged state: bumped rows carry the new price, row count unchanged
    got = t.read()
    assert got.count() == df.count()
    bumped = got.filter(F.col("trx_seq") == "00000001")
    assert bumped.count() == batch.count()
    # time travel to the bootstrap version still sees the original state
    v1 = t.read(version=c2.parent)
    assert v1.filter(F.col("trx_seq") == "00000001").count() == 0


def test_clean_and_vacuum_never_touch_source(spark, sf_smoke, tmp_path):
    src, df = _source_lake(spark, sf_smoke, tmp_path)
    t = CuratedTable(spark, tmp_path / "t", _cfg())
    t.bootstrap(src)
    for b in range(1, 4):
        batch = (
            df.filter((F.col("o_orderstatus") == "F")
                      & (F.col("o_orderkey") % 7 == b))
            .withColumn("trx_seq", F.lit(f"0000000{b}"))
        )
        t.upsert(batch)
    n_src_files = len(list(src.rglob("*.parquet")))
    t.clean(retained_commits=1)
    assert t.vacuum(dry_run=True) == []
    # source lake untouched; still-referenced external partitions readable
    assert len(list(src.rglob("*.parquet"))) == n_src_files
    assert t.read().count() == df.count()


def test_bootstrap_unpartitioned_and_mor_compaction(
    spark, sf_smoke, tmp_path
):
    src, df = _source_lake(spark, sf_smoke, tmp_path, partitioned=False)
    cfg = TableConfig(
        name="orders_boot_mor",
        record_key=["o_orderkey"],
        table_type="MERGE_ON_READ",
    )
    t = CuratedTable(spark, tmp_path / "t", cfg)
    c = t.bootstrap(src)
    assert c.data == {"": str(src)}
    batch = (
        df.filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    t.upsert(batch)  # MOR: delta append, base still external
    assert t.latest_commit().data == {"": str(src)}
    assert t.read().filter(F.col("trx_seq") == "00000001").count() \
        == batch.count()
    cc = t.compact()  # materializes: base becomes table-owned
    assert cc is not None and not cc.data[""].startswith(str(src))
    assert t.read().count() == df.count()


def test_bootstrap_record_index_point_lookup(spark, sf_smoke, tmp_path):
    src, df = _source_lake(spark, sf_smoke, tmp_path)
    t = CuratedTable(spark, tmp_path / "t", _cfg(record_index=True))
    t.bootstrap(src)
    key = df.select("o_orderkey").orderBy("o_orderkey").first()[0]
    got = t.point_lookup(
        spark.createDataFrame([(key,)], "o_orderkey long"))
    assert [r["o_orderkey"] for r in got.collect()] == [key]


def test_bootstrap_validations(spark, sf_smoke, tmp_path):
    src, df = _source_lake(spark, sf_smoke, tmp_path)
    # non-empty table
    t = CuratedTable(spark, tmp_path / "t1", _cfg())
    t.bootstrap(src)
    with pytest.raises(ValueError, match="empty table"):
        t.bootstrap(src)
    # bucket layout unsupported (buckets are non-partitioned-only, so
    # the bucketed probe uses a flat source)
    flat_for_bucket, _ = _source_lake(
        spark, sf_smoke, tmp_path / "fb", partitioned=False
    )
    t2 = CuratedTable(
        spark, tmp_path / "t2",
        TableConfig(name="b", record_key=["o_orderkey"], num_buckets=4),
    )
    with pytest.raises(ValueError, match="bucket"):
        t2.bootstrap(flat_for_bucket)
    # partitioned table needs hive-style dirs
    flat_src, _ = _source_lake(
        spark, sf_smoke, tmp_path / "flat", partitioned=False
    )
    t3 = CuratedTable(spark, tmp_path / "t3", _cfg())
    with pytest.raises(ValueError, match="hive-style"):
        t3.bootstrap(flat_src)
    # missing ordering column
    bad = tmp_path / "bad_lake"
    spark.read.parquet(f"{sf_smoke}/orders.parquet").write.mode(
        "overwrite"
    ).partitionBy("o_orderstatus").parquet(str(bad))
    t4 = CuratedTable(spark, tmp_path / "t4", _cfg())
    with pytest.raises(ValueError, match="trx_seq"):
        t4.bootstrap(bad)
    # not a directory
    t5 = CuratedTable(spark, tmp_path / "t5", _cfg())
    with pytest.raises(ValueError, match="not a directory"):
        t5.bootstrap(tmp_path / "nope")
