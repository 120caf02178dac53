"""Deletion vectors (Delta Lake DV analog, D39): row-level deletes as
an O(deleted keys) sidecar + unchanged manifest data map — no data-file
rewrite. Invariants: zero rewrite on delete, time travel sees each
version's own vector set, rewrites make entries inert (resurrect),
clustering materializes + clears, GC protects then ages the sidecars."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


def _dv_table(spark, sf_dir, tmp_path, **kw):
    cfg = TableConfig(
        name="orders_dv",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_year",
        deletion_vectors=True,
        **kw,
    )
    t = CuratedTable(spark, tmp_path / "orders_dv", cfg)
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("trx_seq", F.lit("00000000"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    t.bulk_insert(base)
    return t, base


def test_delete_keys_no_rewrite_and_exact_complement(spark, sf_smoke, tmp_path):
    t, base = _dv_table(spark, sf_smoke, tmp_path)
    v1 = t.latest_commit()
    files_before = sorted(
        str(p) for p in (t.root / "v00000001").rglob("*.parquet")
    )
    doomed = base.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    n_doomed = doomed.count()
    assert n_doomed > 0
    c = t.delete_keys(doomed)
    # manifest data map unchanged, data files untouched on disk
    assert c.data == v1.data
    assert c.operation == "delete_vector"
    assert len(c.dv) == 1
    files_after = sorted(
        str(p) for p in (t.root / "v00000001").rglob("*.parquet")
    )
    assert files_after == files_before
    got = t.read()
    assert got.filter(F.col("o_orderkey") % 7 == 2).count() == 0
    assert got.count() == base.count() - n_doomed
    # time travel: the pre-delete version still shows every row
    assert t.read(version=1).count() == base.count()


def test_upsert_resurrects_only_reinserted_keys(spark, sf_smoke, tmp_path):
    t, base = _dv_table(spark, sf_smoke, tmp_path)
    t.delete_keys(
        base.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    )
    resurrect = (
        base.filter(F.col("o_orderkey") % 14 == 2)
        .withColumn("trx_seq", F.lit("00000001"))
    )
    n_res = resurrect.count()
    assert n_res > 0
    t.upsert(resurrect)
    got = t.read()
    # reinserted keys back; the other deleted keys stay gone even in
    # partitions the upsert rewrote (the rewrite merged DV-applied state)
    assert got.filter(F.col("o_orderkey") % 14 == 2).count() == n_res
    assert got.filter(
        (F.col("o_orderkey") % 7 == 2) & (F.col("o_orderkey") % 14 != 2)
    ).count() == 0
    # vectors carried forward on the upsert commit (inert where rewritten)
    assert t.latest_commit().dv


def test_cluster_materializes_and_clears_vectors(spark, sf_smoke, tmp_path):
    t, base = _dv_table(spark, sf_smoke, tmp_path)
    doomed = base.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    t.delete_keys(doomed)
    want = t.read().count()
    c = t.cluster()
    assert c.dv == []
    assert t.read().count() == want
    assert t.read().filter(F.col("o_orderkey") % 7 == 2).count() == 0


def test_gc_protects_then_ages_dv_dirs(spark, sf_smoke, tmp_path):
    t, base = _dv_table(spark, sf_smoke, tmp_path)
    t.delete_keys(
        base.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    )
    dvdir = t.latest_commit().dv[0]
    # vacuum never lists a referenced dv dir
    assert dvdir not in t.vacuum(dry_run=True)
    # while any retained commit references the dv dir, clean keeps it
    t.cluster()  # vectors cleared going forward, old commits still ref
    removed = t.clean(retained_commits=3)
    assert dvdir not in removed and (t.root / dvdir).exists()
    # once every referencing commit ages out, the dv dir is reclaimed
    t.upsert(base.limit(50).withColumn("trx_seq", F.lit("00000002")))
    t.upsert(base.limit(50).withColumn("trx_seq", F.lit("00000003")))
    removed = t.clean(retained_commits=2)
    assert dvdir in removed and not (t.root / dvdir).exists()


def test_restore_carries_vectors(spark, sf_smoke, tmp_path):
    t, base = _dv_table(spark, sf_smoke, tmp_path)
    t.delete_keys(
        base.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    )
    after_delete = t.read().count()
    t.cluster()  # v3: deletes materialized, vectors cleared
    c = t.restore(2)  # back to the DV state
    assert c.dv
    assert t.read().count() == after_delete
    assert t.read().filter(F.col("o_orderkey") % 7 == 2).count() == 0


def test_dv_config_validation():
    with pytest.raises(ValueError, match="COPY_ON_WRITE"):
        TableConfig(name="x", record_key=["k"],
                    table_type="MERGE_ON_READ", deletion_vectors=True)
    with pytest.raises(ValueError, match="exclusive"):
        TableConfig(name="x", record_key=["k"], record_index=True,
                    deletion_vectors=True)


def test_delete_keys_requires_enablement(spark, sf_smoke, tmp_path):
    cfg = TableConfig(name="plain", record_key=["o_orderkey"])
    t = CuratedTable(spark, tmp_path / "plain", cfg)
    t.bulk_insert(
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .withColumn("trx_seq", F.lit("0"))
    )
    with pytest.raises(ValueError, match="deletion_vectors not enabled"):
        t.delete_keys(spark.createDataFrame([(1,)], "o_orderkey long"))


# ----------------------- TIMESTAMP AS OF time travel -----------------------


def test_timestamp_as_of_resolution(spark, sf_smoke, tmp_path):
    """read(as_of=t) resolves to the newest commit stamped <= t; commits
    before the ts field existed resolve as older than any stamped one;
    an instant before every commit raises; version+as_of is rejected."""
    import json

    cfg = TableConfig(name="asof", record_key=["o_orderkey"])
    t = CuratedTable(spark, tmp_path / "asof", cfg)
    base = spark.read.parquet(f"{sf_smoke}/orders.parquet").withColumn(
        "trx_seq", F.lit("00000000")
    )
    t.bulk_insert(base)
    t.upsert(base.limit(10).withColumn("trx_seq", F.lit("00000001")))
    t.delete_where("o_totalprice > 300000")
    commits = t.commits()
    assert all(c.ts is not None for c in commits)
    assert [c.ts for c in commits] == sorted(c.ts for c in commits)
    n_by_version = {c.version: t.read(version=c.version).count()
                    for c in commits}
    # exactly at each stamp -> that version; just before -> the previous
    for c in commits:
        assert t.read(as_of=c.ts).count() == n_by_version[c.version]
    assert (
        t.read(as_of=commits[-1].ts - 1e-4).count()
        == n_by_version[commits[-2].version]
    )
    # far future -> latest; before the first stamp -> error
    assert t.read(as_of=commits[-1].ts + 3600).count() \
        == n_by_version[commits[-1].version]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no commit at or before"):
        t.read(as_of=commits[0].ts - 3600)
    with _pytest.raises(ValueError, match="version OR as_of"):
        t.read(version=1, as_of=commits[0].ts)
    # back-compat: a manifest written before the ts field (ts stripped)
    # resolves as older than any stamped commit
    mpath = t.root / "_commits" / "00000001.json"
    d = json.loads(mpath.read_text())
    d.pop("ts")
    mpath.write_text(json.dumps(d))
    assert t.read(as_of=commits[1].ts).count() \
        == n_by_version[commits[1].version]
    assert t.read(as_of=commits[0].ts - 3600).count() \
        == n_by_version[commits[0].version]  # ts->0: always eligible
