"""Optimistic concurrency control (beyond-reference; Hudi
OPTIMISTIC_CONCURRENCY_CONTROL + SimpleConcurrentFileWritesConflict
resolution analog): two writers prepare merges from the same snapshot
un-serialized; the metadata-only commit step detects overlapping
touched file groups (conflict -> re-prepare) or rebases disjoint ones
(both land, serially numbered)."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import (
    ConcurrentWriteConflict,
    CuratedTable,
)

from tests.util import assert_same, duck_con

REC = cdc.RECIPES["orders"]


def _table(spark, sf_dir, tmp_path):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "__occ_orders"
    )
    cfg = TableConfig(
        name="orders_occ",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_year",
    )
    t = CuratedTable(spark, tmp_path / "orders_occ", cfg)
    b0 = spark.sql(cdc.batch_sql(REC, 0, src="__occ_orders")).withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    t.bulk_insert(b0)
    return t


def _b1_halves(spark):
    b1 = spark.sql(cdc.batch_sql(REC, 1, src="__occ_orders")).withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    return (
        b1.filter(F.col("o_year") % 2 == 0),
        b1.filter(F.col("o_year") % 2 == 1),
    )


def test_disjoint_writers_both_land_and_match_oracle(
    spark, sf_smoke, tmp_path
):
    t = _table(spark, sf_smoke, tmp_path)
    a, b = _b1_halves(spark)
    # both writers snapshot the SAME parent before either commits
    sa = t.prepare_upsert(a)
    sb = t.prepare_upsert(b)
    assert sa.parent_version == sb.parent_version == 1
    ca = t.commit_staged(sa)
    cb = t.commit_staged(sb)  # rebases onto ca
    assert (ca.version, cb.version) == (2, 3)
    assert cb.parent == ca.version
    # the rebased manifest carries BOTH writers' dirs
    for k in sa.fresh:
        assert cb.data[k] == sa.fresh[k]
    for k in sb.fresh:
        assert cb.data[k] == sb.fresh[k]
    # final state == serial replay of the full batch 1
    got = t.read().select(*REC.columns, "trx_seq")
    con = duck_con(sf_smoke)
    con.execute("CREATE VIEW __occ_orders AS SELECT * FROM orders")
    oracle = con.execute(
        cdc.replay_sql(REC, 1, src="__occ_orders")
    ).df()
    assert_same(got, oracle)


def test_overlapping_writers_conflict(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path)
    a, _ = _b1_halves(spark)
    sa = t.prepare_upsert(a)
    sb = t.prepare_upsert(a.limit(5))  # same partitions -> overlap
    t.commit_staged(sa)
    with pytest.raises(ConcurrentWriteConflict, match="re-prepare"):
        t.commit_staged(sb)
    # loser re-prepares from the NEW snapshot and succeeds
    sb2 = t.prepare_upsert(a.limit(5))
    c = t.commit_staged(sb2)
    assert c.version == 3


def test_no_intervener_is_plain_commit(spark, sf_smoke, tmp_path):
    t = _table(spark, sf_smoke, tmp_path)
    a, _ = _b1_halves(spark)
    c = t.commit_staged(t.prepare_upsert(a))
    assert c.version == 2 and c.parent == 1
    # serial upsert still works after an OCC commit
    _, b = _b1_halves(spark)
    c2 = t.upsert(b)
    assert c2.version == 3


def test_occ_rejects_unpartitioned_and_mor(spark, sf_smoke, tmp_path):
    cfg = TableConfig(name="flat", record_key=["o_orderkey"])
    flat = CuratedTable(spark, tmp_path / "flat", cfg)
    with pytest.raises(ValueError, match="layout column"):
        flat.prepare_upsert(
            spark.read.parquet(f"{sf_smoke}/orders.parquet").withColumn(
                "trx_seq", F.lpad(F.col("o_orderkey").cast("string"), 50, "0")
            )
        )
    mcfg = TableConfig(
        name="mor", record_key=["o_orderkey"], table_type="MERGE_ON_READ"
    )
    mor = CuratedTable(spark, tmp_path / "mor", mcfg)
    with pytest.raises(ValueError, match="COW-only"):
        mor.prepare_upsert(spark.range(1).selectExpr("id AS o_orderkey"))
    # row_lineage is excluded: the lineage stamp needs the commit
    # version, which OCC only learns at commit_staged — staging would
    # write NULL stamps and silently break the every-write-stamps
    # invariant.
    lcfg = TableConfig(
        name="lin", record_key=["o_orderkey"], row_lineage=True,
        is_partitioned=True, partition_path="o_year",
    )
    lin = CuratedTable(spark, tmp_path / "lin", lcfg)
    with pytest.raises(ValueError, match="row_lineage"):
        lin.prepare_upsert(spark.range(1).selectExpr("id AS o_orderkey"))


def test_occ_carries_col_stats_across_rebase(spark, sf_smoke, tmp_path):
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__occ_orders"
    )
    cfg = TableConfig(
        name="orders_occ_cs",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_year",
        stats_columns=["o_orderdate"],
    )
    t = CuratedTable(spark, tmp_path / "occ_cs", cfg)
    b0 = spark.sql(cdc.batch_sql(REC, 0, src="__occ_orders")).withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    t.bulk_insert(b0)
    a, b = _b1_halves(spark)
    sa, sb = t.prepare_upsert(a), t.prepare_upsert(b)
    t.commit_staged(sa)
    cb = t.commit_staged(sb)
    # every manifest dir still has stats (fresh + rebased + carried)
    assert set(cb.col_stats) == set(cb.data.values())


def test_wap_staged_invisible_then_abort_traceless(spark, sf_smoke, tmp_path):
    """Write-audit-publish: a staged write is invisible to readers, the
    audit queries the would-be state, and abort removes every dir."""
    t = _table(spark, sf_smoke, tmp_path)
    before_rows = t.read().count()
    before_version = t.latest_commit().version
    a, _ = _b1_halves(spark)
    staged = t.prepare_upsert(a)
    # invisible: timeline and readable state unchanged
    assert t.latest_commit().version == before_version
    assert t.read().count() == before_rows
    # the audit sees the would-be state (same keys, updated rows)
    would_be = t.read_staged(staged)
    assert would_be.count() == before_rows  # batch 1 = pure updates
    changed = (
        would_be.select("o_orderkey", "trx_seq")
        .exceptAll(t.read().select("o_orderkey", "trx_seq"))
        .count()
    )
    assert changed > 0
    # abort: dirs gone, state still unchanged
    t.abort_staged(staged)
    for rel in list(staged.fresh.values()) + list(staged.changelog):
        assert not (t.root / rel.split("/", 1)[0]).exists()
    assert t.read().count() == before_rows
    assert t.latest_commit().version == before_version
    # and the table still accepts ordinary writes afterwards
    _, b = _b1_halves(spark)
    assert t.upsert(b).version == before_version + 1


def test_vacuum_reclaims_abandoned_stage_only(spark, sf_smoke, tmp_path):
    """A writer that died mid-stage leaves orphan dirs; vacuum lists
    exactly those, deletes them on request, and never touches live or
    metadata dirs."""
    t = _table(spark, sf_smoke, tmp_path)
    a, b = _b1_halves(spark)
    t.upsert(a)
    abandoned = t.prepare_upsert(b)  # never committed, never aborted
    expect = {rel.split("/", 1)[0] for rel in abandoned.fresh.values()}
    expect.update(rel.split("/", 1)[0] for rel in abandoned.changelog)
    orphans = t.vacuum(dry_run=True)
    assert set(orphans) == expect
    # dry run deleted nothing
    assert all((t.root / o).exists() for o in orphans)
    before = t.read().count()
    removed = t.vacuum(dry_run=False)
    assert set(removed) == expect
    assert not any((t.root / o).exists() for o in removed)
    # live state, timeline, and a subsequent vacuum are untouched/empty
    assert t.read().count() == before
    assert t.vacuum(dry_run=True) == []
    # time travel to v1 still works (its dirs were referenced)
    assert t.read(version=1).count() > 0


# ------------------------------------------ lock coverage + lock provider


def test_serial_manifest_write_racing_commit_is_conflict_not_lost_update(
    spark, sf_smoke, tmp_path
):
    """Every manifest-writing path (not only commit_staged) detects a
    version another writer already landed and raises instead of
    silently os.replace-ing that manifest away — the lost-update hole
    Hudi closes by requiring the lock provider for ALL writers."""
    import dataclasses

    t = _table(spark, sf_smoke, tmp_path)
    latest = t.latest_commit()
    stale = dataclasses.replace(latest)  # same version: simulates a
    # writer that computed latest.version before another commit landed
    before = latest.to_json()
    with pytest.raises(ConcurrentWriteConflict, match="another writer"):
        t._write_commit(stale)
    # the existing manifest is untouched
    assert t.latest_commit().to_json() == before


def test_stale_commit_lock_is_broken(spark, sf_smoke, tmp_path):
    """A lock left by a writer killed mid-commit is broken after the
    staleness bound instead of poisoning the table forever."""
    import os
    import time

    t = _table(spark, sf_smoke, tmp_path)
    lock = t.root / "_commits" / "_commit.lock"
    lock.write_text('{"pid": 0, "ts": 0}')
    old = time.time() - 120
    os.utime(lock, (old, old))
    a, _ = _b1_halves(spark)
    c = t.upsert(a)  # breaks the stale lock and commits
    assert c.version == 2
    assert not lock.exists()


def test_fresh_lock_contention_times_out(spark, sf_smoke, tmp_path):
    from aws_dms_to_hudi_spark.storage import FileLockProvider

    t = _table(spark, sf_smoke, tmp_path)
    t.lock_provider = FileLockProvider(timeout=0.2, stale_after=60.0)
    lock = t.root / "_commits" / "_commit.lock"
    lock.write_text('{"pid": 0, "ts": 0}')  # fresh mtime: a live holder
    a, _ = _b1_halves(spark)
    with pytest.raises(TimeoutError, match="commit lock"):
        t.upsert(a)
    lock.unlink()


def test_injected_lock_provider_serializes_all_writers(
    spark, sf_smoke, tmp_path
):
    """The provider is injectable (object-store deployments bring their
    own coordination service) and every manifest write goes through it:
    bulk_insert, upsert, compact/cluster-class services, restore, and
    commit_staged."""
    import contextlib

    from aws_dms_to_hudi_spark.storage import LockProvider

    class CountingProvider(LockProvider):
        def __init__(self):
            self.acquired = 0
            self.held = False

        def lock(self, table):
            @contextlib.contextmanager
            def _l():
                assert not self.held, "lock is not re-entered"
                self.held = True
                self.acquired += 1
                try:
                    yield
                finally:
                    self.held = False

            return _l()

    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__occ_orders"
    )
    cfg = TableConfig(
        name="orders_lp",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_year",
    )
    prov = CountingProvider()
    t = CuratedTable(spark, tmp_path / "orders_lp", cfg, lock_provider=prov)
    b0 = spark.sql(cdc.batch_sql(REC, 0, src="__occ_orders")).withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    t.bulk_insert(b0)
    assert prov.acquired == 1
    a, b = _b1_halves(spark)
    t.upsert(a)
    assert prov.acquired == 2
    staged = t.prepare_upsert(b)
    t.commit_staged(staged)  # lock held across conflict check + write
    assert prov.acquired == 3
    t.cluster()
    assert prov.acquired == 4
    t.restore(1)
    assert prov.acquired == 5
