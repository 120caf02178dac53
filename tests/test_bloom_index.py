"""Bloom key index (D46, beyond-reference; Hudi BLOOM index /
metadata-table bloom_filters partition analog): one bloom filter of the
record keys per data dir, built once per dir (dirs are immutable),
serving point lookups that scan only maybe-containing file groups with
an exact semi-join clearing false positives.

Reference pins: the reference delegates indexing entirely to Hudi
(`src/lambdas/launch_hudi/handler.py:139-152` launches DeltaStreamer,
whose default upsert index IS the bloom index); this is the read-side
analog rebuilt on the engine's own manifest format.

The replayed fixture table is built ONCE per module (7 CDC batches);
the one mutating test runs last and re-checks the invariants it
perturbs itself.
"""

import json

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import BLOOM_K, CuratedTable

REC = cdc.RECIPES["orders"]


def _month(col="o_orderdate"):
    return F.substring(F.col(col).cast("string"), 1, 7)


@pytest.fixture(scope="module")
def btable(spark, sf_smoke, tmp_path_factory):
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__bx_orders"
    )
    cfg = TableConfig(
        name="orders_bx",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_month",
        bloom_index=True,
    )
    t = CuratedTable(
        spark, tmp_path_factory.mktemp("bloomix") / "orders_bx", cfg
    )
    for b in range(cdc.N_BATCHES):
        batch = spark.sql(
            cdc.batch_sql(REC, b, src="__bx_orders")
        ).withColumn("o_month", _month())
        (t.bulk_insert if b == 0 else t.upsert)(batch)
    return t


def test_lookup_equals_full_scan_filter(spark, btable):
    snap = btable.read()
    probe_keys = [r[0] for r in snap.select("o_orderkey").distinct()
                  .orderBy("o_orderkey").limit(7).collect()]
    probe = spark.createDataFrame(
        [(k,) for k in probe_keys], "o_orderkey long")
    got = btable.bloom_lookup(probe).orderBy(
        "o_orderkey", "trx_seq").collect()
    want = (snap.where(F.col("o_orderkey").isin(probe_keys))
            .orderBy("o_orderkey", "trx_seq").collect())
    assert got == want and len(got) == len(probe_keys)


def test_absent_keys_return_nothing(spark, btable):
    probe = spark.createDataFrame(
        [(10**12 + i,) for i in range(5)], "o_orderkey long")
    assert btable.bloom_lookup(probe).count() == 0


def test_pruning_is_selective(spark, btable):
    """A single-key probe must NOT admit every dir — with 16 KiB
    filters and the smoke corpus's per-dir key counts, the fp rate is
    well under 50%, so scanning all dirs means the filters are not
    wired in."""
    one = btable.read().select("o_orderkey").orderBy("o_orderkey").limit(1)
    rep = btable.bloom_pruning_report(one)
    assert rep["total_dirs"] > 1
    assert rep["scanned_dirs"] < rep["total_dirs"]
    assert rep["scanned_dirs"] >= 1


def test_no_false_negatives_exhaustive(spark, btable):
    """Every live key must route to its dir: bloom_lookup over ALL keys
    returns the full snapshot."""
    snap = btable.read()
    got = btable.bloom_lookup(snap.select("o_orderkey").distinct())
    assert got.count() == snap.count()


def test_filter_file_format_is_bounded(spark, btable):
    """The on-disk filter is a sparse word map bounded by the bitmap
    size, never by the row count."""
    c = btable.latest_commit()
    rel = next(iter(c.data.values()))
    blob = json.loads(btable._bloom_path(rel).read_text())
    assert blob["rel"] == rel and blob["k"] == BLOOM_K
    assert len(blob["words"]) <= blob["bits"] // 64


def test_zz_filters_built_once_per_dir(spark, btable):
    """Carried-forward dirs keep their filter file byte-for-byte: a
    later commit must only add filters for dirs it wrote. Runs last
    (zz): it mutates the shared table."""
    c = btable.latest_commit()
    stamps = {
        rel: btable._bloom_path(rel).stat().st_mtime_ns
        for rel in c.data.values()
    }
    snap = btable.read()
    batch = (snap.orderBy("o_orderkey").limit(3)
             .withColumn("trx_seq", F.concat(F.col("trx_seq"), F.lit("z"))))
    btable.upsert(batch)
    c2 = btable.latest_commit()
    for rel, old in stamps.items():
        if rel in set(c2.data.values()):  # carried forward
            assert btable._bloom_path(rel).stat().st_mtime_ns == old
    # post-mutation: lookup still exact over the new snapshot
    snap2 = btable.read()
    got = btable.bloom_lookup(snap2.select("o_orderkey").distinct())
    assert got.count() == snap2.count()


def test_backfill_on_preexisting_dirs(spark, sf_smoke, tmp_path):
    """Flipping bloom_index on over an existing table backfills filters
    lazily at first lookup (the async-indexer path)."""
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__bx_orders2"
    )
    cfg = TableConfig(
        name="orders_bx2", record_key=["o_orderkey"],
        is_partitioned=True, partition_path="o_month",
    )
    t = CuratedTable(spark, tmp_path / "orders_bx2", cfg)
    b0 = spark.sql(cdc.batch_sql(REC, 0, src="__bx_orders2")).withColumn(
        "o_month", _month())
    t.bulk_insert(b0)
    t.config.bloom_index = True  # flag flip, no rewrite
    one = t.read().select("o_orderkey").orderBy("o_orderkey").limit(1)
    got = t.bloom_lookup(one)
    assert got.count() >= 1
    c = t.latest_commit()
    assert all(t._bloom_path(rel).exists() for rel in c.data.values())


def test_validations(spark, tmp_path):
    with pytest.raises(ValueError, match="bloom_index"):
        TableConfig(name="x", record_key=["k"], deletion_vectors=True,
                    bloom_index=True)
    cfg = TableConfig(name="y", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "y", cfg)
    probe = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="bloom_index not enabled"):
        t.bloom_lookup(probe)
