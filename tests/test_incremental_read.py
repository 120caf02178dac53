"""Incremental / CDC read (Hudi incremental-query analog): changed keys
between two commits, fed by per-commit changelogs."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable


@pytest.fixture()
def table(spark, tmp_path: Path) -> CuratedTable:
    cfg = TableConfig(name="t", record_key=["k"], source_ordering_field="trx_seq")
    return CuratedTable(spark, tmp_path / "t", cfg)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k int, v string, trx_seq string, _hoodie_is_deleted boolean"
    )


def test_incremental_returns_only_changed_keys(spark, table):
    c0 = table.bulk_insert(
        _df(spark, [(1, "a", "001", False), (2, "b", "002", False),
                    (3, "c", "003", False)])
    )
    c1 = table.upsert(_df(spark, [(2, "b2", "004", False)]))
    c2 = table.upsert(
        _df(spark, [(2, "b3", "005", False), (3, None, "006", True),
                    (4, "d", "007", False)])
    )
    # since the initial load: everything currently live + latest values
    full = table.read_incremental(begin_version=None)
    assert {r["k"]: r["v"] for r in full.collect()} == {1: "a", 2: "b3", 4: "d"}

    # since c0: only keys touched after the bulk load
    inc = table.read_incremental(begin_version=c0.version)
    assert {r["k"]: r["v"] for r in inc.collect()} == {2: "b3", 4: "d"}

    # bounded range (c0, c1]: just the one update
    rng = table.read_incremental(begin_version=c0.version, end_version=c1.version)
    assert {r["k"]: r["v"] for r in rng.collect()} == {2: "b2"}

    # CDC mode: tombstones visible
    cdc = table.read_incremental(begin_version=c1.version, drop_deleted=False)
    flags = {r["k"]: r["_hoodie_is_deleted"] for r in cdc.collect()}
    assert flags == {2: False, 3: True, 4: False}
    assert c2.changelog


def test_incremental_precombines_across_commits(spark, table):
    table.bulk_insert(_df(spark, [(1, "a", "001", False)]))
    table.upsert(_df(spark, [(1, "a1", "002", False)]))
    table.upsert(_df(spark, [(1, "a2", "003", False)]))
    inc = table.read_incremental(begin_version=1)
    rows = inc.collect()
    assert len(rows) == 1 and rows[0]["v"] == "a2"


def test_no_changes_returns_none_or_empty(spark, table):
    c0 = table.bulk_insert(_df(spark, [(1, "a", "001", False)]))
    out = table.read_incremental(begin_version=c0.version)
    assert out is None or out.count() == 0


def test_services_emit_no_changes(spark, tmp_path):
    cfg = TableConfig(
        name="m", record_key=["k"], source_ordering_field="trx_seq",
        table_type="MERGE_ON_READ",
    )
    t = CuratedTable(spark, tmp_path / "m", cfg)
    t.bulk_insert(_df(spark, [(1, "a", "001", False), (2, "b", "002", False)]))
    c1 = t.upsert(_df(spark, [(1, "a1", "003", False)]))
    compacted = t.compact()
    assert compacted is not None and compacted.changelog == []
    # compaction adds no changed keys
    inc = t.read_incremental(begin_version=c1.version)
    assert inc is None or inc.count() == 0
    # but the pre-compaction change is still visible from earlier positions
    inc2 = t.read_incremental(begin_version=c1.version - 1)
    assert {r["k"]: r["v"] for r in inc2.collect()} == {1: "a1"}


def test_clean_gc_includes_changelogs(spark, table, tmp_path):
    table.bulk_insert(_df(spark, [(1, "a", "001", False)]))
    for i in range(6):
        table.upsert(_df(spark, [(1, f"a{i}", f"{i + 2:03d}", False)]))
    removed = table.clean(retained_commits=2)
    assert any("_changelog" in d for d in removed)
    # retained window still serves incremental reads
    last = table.latest_commit()
    inc = table.read_incremental(begin_version=last.version - 1)
    assert inc.count() == 1


def test_restore_rolls_back_state_and_checkpoint(spark, table):
    c0 = table.bulk_insert(
        _df(spark, [(1, "a", "001", False), (2, "b", "002", False)]),
        checkpoint={"watermark": "batch-0"},
    )
    table.upsert(
        _df(spark, [(1, "a1", "003", False), (3, "c", "004", False)]),
        checkpoint={"watermark": "batch-1"},
    )
    rc = table.restore(c0.version)
    assert rc.operation == "restore" and rc.version > c0.version
    assert {r["k"]: r["v"] for r in table.read().collect()} == {1: "a", 2: "b"}
    # checkpoint rolled back -> next run re-consumes the undone batch
    assert table.checkpoint() == {"watermark": "batch-0"}
    # timeline stays append-only: the undone version is still readable
    assert {r["k"] for r in table.read(version=c0.version + 1).collect()} == {1, 2, 3}
    # restoring forward again also works (restore of a restore)
    table.restore(c0.version + 1)
    assert {r["k"]: r["v"] for r in table.read().collect()} == {
        1: "a1", 2: "b", 3: "c"
    }


def test_restore_unknown_version_raises(spark, table):
    table.bulk_insert(_df(spark, [(1, "a", "001", False)]))
    with pytest.raises(ValueError, match="not on timeline"):
        table.restore(99)


def test_downstream_table_chains_off_incremental_reads(spark, tmp_path):
    """Incremental ETL chain: a downstream table stays in sync by
    consuming ONLY the upstream changelog after each commit (never a full
    scan) — the pattern that makes derived tables affordable at 100 TB."""
    cfg_up = TableConfig(name="up", record_key=["k"], source_ordering_field="trx_seq")
    cfg_dn = TableConfig(name="dn", record_key=["k"], source_ordering_field="trx_seq")
    up = CuratedTable(spark, tmp_path / "up", cfg_up)
    dn = CuratedTable(spark, tmp_path / "dn", cfg_dn)

    batches = [
        [(1, "a", "001", False), (2, "b", "002", False)],
        [(2, "b1", "003", False), (3, "c", "004", False)],
        [(1, None, "005", True), (3, "c1", "006", False)],
    ]
    pos = None
    for rows in batches:
        df = spark.createDataFrame(
            rows, "k int, v string, trx_seq string, _hoodie_is_deleted boolean"
        )
        c = up.upsert(df) if up.latest_commit() else up.bulk_insert(df)
        changes = up.read_incremental(begin_version=pos, end_version=c.version,
                                      drop_deleted=False)
        if dn.latest_commit() is None:
            dn.bulk_insert(changes)
        else:
            dn.upsert(changes)
        pos = c.version

    up_state = {(r["k"], r["v"]) for r in up.read().collect()}
    dn_state = {(r["k"], r["v"]) for r in dn.read().collect()}
    assert up_state == dn_state == {(2, "b1"), (3, "c1")}


def test_read_optimized_vs_snapshot(spark, tmp_path):
    """On MOR, read_optimized serves base files only (stale by the
    uncompacted deltas); snapshot merges them; after compaction the two
    modes converge. On COW they are always identical."""
    from aws_dms_to_hudi_spark.config import TableConfig
    from aws_dms_to_hudi_spark.storage import CuratedTable

    def rows(df):
        return sorted(tuple(r) for r in df.select("k", "v").collect())

    base = spark.createDataFrame(
        [(1, "a", "001", False), (2, "b", "002", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean",
    )
    delta = spark.createDataFrame(
        [(2, "B2", "011", False), (3, "c", "012", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean",
    )
    for ttype in ("MERGE_ON_READ", "COPY_ON_WRITE"):
        t = CuratedTable(
            spark, tmp_path / ttype,
            TableConfig(name=f"t_{ttype}", record_key=["k"],
                        source_ordering_field="trx_seq",
                        table_type=ttype),
        )
        t.bulk_insert(base)
        t.upsert(delta)
        snap = rows(t.read())
        ro = rows(t.read(read_optimized=True))
        assert snap == [(1, "a"), (2, "B2"), (3, "c")]
        if ttype == "MERGE_ON_READ":
            assert ro == [(1, "a"), (2, "b")]  # base only, delta unseen
            t.compact()
            assert rows(t.read(read_optimized=True)) == snap
        else:
            assert ro == snap
