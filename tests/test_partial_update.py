"""Partial-update payload semantics (Hudi
OverwriteNonDefaultsWithLatestAvroPayload analog): sparse patches
resolve against stored state, stack per column within a batch, and
flow through the ordinary upsert path."""

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.operators.merge import (
    apply_patches,
    patch_precombine,
)
from aws_dms_to_hudi_spark.storage import CuratedTable

SCHEMA = "k int, v string, w int, trx_seq string, _hoodie_is_deleted boolean"


def test_patch_precombine_stacks_columns(spark):
    """Two same-key patches touching DIFFERENT columns must stack:
    each column takes its last non-NULL write; plain precombine would
    lose w=5."""
    batch = spark.createDataFrame(
        [(1, None, 5, "001", False), (1, "x", None, "002", False)], SCHEMA
    )
    row = patch_precombine(batch, ["k"], "trx_seq").collect()[0]
    assert (row["v"], row["w"], row["trx_seq"]) == ("x", 5, "002")


def test_patch_precombine_envelope_from_winner(spark):
    """The delete flag is NOT column-stacked — it comes from the
    overall winner, so an old tombstone cannot resurrect into a newer
    data patch."""
    batch = spark.createDataFrame(
        [(1, None, None, "001", True), (1, "x", None, "002", False)], SCHEMA
    )
    row = patch_precombine(batch, ["k"], "trx_seq").collect()[0]
    assert row["_hoodie_is_deleted"] is False and row["v"] == "x"


def test_apply_patches_fills_from_stored(spark):
    stored = spark.createDataFrame(
        [(1, "a", 10, "000", False)], SCHEMA
    )
    batch = spark.createDataFrame(
        [(1, None, 99, "001", False), (2, "new", None, "001", False)], SCHEMA
    )
    rows = {r["k"]: r for r in
            apply_patches(stored, batch, ["k"], "trx_seq").collect()}
    # unset column keeps stored value; set column overrides
    assert (rows[1]["v"], rows[1]["w"]) == ("a", 99)
    # absent key inserts the payload as-is
    assert (rows[2]["v"], rows[2]["w"]) == ("new", None)


def test_patch_upsert_cow_roundtrip(spark, tmp_path):
    cfg = TableConfig(name="patch_cow", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "patch_cow", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 10, "000", False), (2, "b", 20, "000", False)], SCHEMA))
    t.patch_upsert(spark.createDataFrame(
        [(1, None, 99, "001", False)], SCHEMA))
    rows = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
    assert rows == {1: ("a", 99), 2: ("b", 20)}


def test_patch_upsert_mor_resolves_against_deltas(spark, tmp_path):
    """On MOR, a patch must see earlier un-compacted deltas: patch 2
    stacks on patch 1's column, not on the base."""
    cfg = TableConfig(name="patch_mor", record_key=["k"],
                      table_type="MERGE_ON_READ")
    t = CuratedTable(spark, tmp_path / "patch_mor", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 10, "000", False)], SCHEMA))
    t.patch_upsert(spark.createDataFrame(
        [(1, "x", None, "001", False)], SCHEMA))
    t.patch_upsert(spark.createDataFrame(
        [(1, None, 77, "002", False)], SCHEMA))
    row = t.read().collect()[0]
    assert (row["v"], row["w"]) == ("x", 77)
    t.compact()
    row2 = t.read().collect()[0]
    assert (row2["v"], row2["w"]) == ("x", 77)


def test_patch_delete_tombstones(spark, tmp_path):
    cfg = TableConfig(name="patch_del", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "patch_del", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 10, "000", False), (2, "b", 20, "000", False)], SCHEMA))
    t.patch_upsert(spark.createDataFrame(
        [(2, None, None, "001", True)], SCHEMA))
    assert [r["k"] for r in t.read().collect()] == [1]


# ---------- insert_overwrite (replacecommit analog) ----------


def test_insert_overwrite_replaces_partitions(spark, tmp_path):
    """Touched partitions take EXACTLY the batch rows (stored keys the
    batch omits disappear); untouched partitions carry forward."""
    cfg = TableConfig(name="ow_cow", record_key=["k"],
                      is_partitioned=True, partition_path="p")
    t = CuratedTable(spark, tmp_path / "ow_cow", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "A", "a", 1, "000", False), (2, "A", "b", 2, "000", False),
         (3, "B", "c", 3, "000", False)],
        "k int, p string, v string, w int, trx_seq string, "
        "_hoodie_is_deleted boolean"))
    t.insert_overwrite(spark.createDataFrame(
        [(9, "A", "z", 9, "001", False)],
        "k int, p string, v string, w int, trx_seq string, "
        "_hoodie_is_deleted boolean"))
    rows = {r["k"]: (r["p"], r["v"]) for r in t.read().collect()}
    # k=1, k=2 gone (partition A replaced); k=3 untouched; k=9 new
    assert rows == {9: ("A", "z"), 3: ("B", "c")}
    assert t.latest_commit().operation == "insert_overwrite"


def test_insert_overwrite_tombstone_only_partition_empties(spark, tmp_path):
    cfg = TableConfig(name="ow_tomb", record_key=["k"],
                      is_partitioned=True, partition_path="p")
    t = CuratedTable(spark, tmp_path / "ow_tomb", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "A", "a", "000", False), (2, "B", "b", "000", False)],
        "k int, p string, v string, trx_seq string, "
        "_hoodie_is_deleted boolean"))
    t.insert_overwrite(spark.createDataFrame(
        [(1, "A", "a", "001", True)],
        "k int, p string, v string, trx_seq string, "
        "_hoodie_is_deleted boolean"))
    assert [r["k"] for r in t.read().collect()] == [2]


def test_insert_overwrite_nonpartitioned_replaces_table(spark, tmp_path):
    cfg = TableConfig(name="ow_full", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "ow_full", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", "000", False), (2, "b", "000", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean"))
    t.insert_overwrite(spark.createDataFrame(
        [(7, "z", "001", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean"))
    assert {r["k"] for r in t.read().collect()} == {7}


def test_insert_overwrite_mor_compacts_first(spark, tmp_path):
    cfg = TableConfig(name="ow_mor", record_key=["k"],
                      table_type="MERGE_ON_READ")
    t = CuratedTable(spark, tmp_path / "ow_mor", cfg)
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", "000", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean"))
    t.upsert(spark.createDataFrame(
        [(2, "b", "001", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean"))
    t.insert_overwrite(spark.createDataFrame(
        [(9, "z", "002", False)],
        "k int, v string, trx_seq string, _hoodie_is_deleted boolean"))
    assert {r["k"] for r in t.read().collect()} == {9}
    assert not t.latest_commit().deltas
