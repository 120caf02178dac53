"""MERGE INTO (D43, Spark SQL / Delta / Hudi MERGE analog): conditional
three-way merge compiled onto the keyed upsert path. Clause order is
Delta's (DELETE before UPDATE), no-clause matches are no-ops, SET may
not touch key columns, and the whole thing is one key join + one
upsert."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable

SCHEMA = ("k long, status string, amount long, trx_seq string")
BASE = [
    (1, "A", 100, "00000000"),
    (2, "A", 200, "00000000"),
    (3, "B", 300, "00000000"),
    (4, "B", 400, "00000000"),
]
SRC_SCHEMA = SCHEMA + ", op string, delta long"


def _table(spark, tmp_path, partitioned=True):
    cfg = TableConfig(
        name="m",
        record_key=["k"],
        is_partitioned=partitioned,
        partition_path="status" if partitioned else None,
    )
    t = CuratedTable(spark, tmp_path / "m", cfg)
    t.bulk_insert(spark.createDataFrame(BASE, SCHEMA))
    return t


def _state(t):
    return {
        r["k"]: (r["status"], r["amount"], r["trx_seq"])
        for r in t.read().collect()
    }


def test_three_clause_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (1, "A", 0, "00000001", "D", 0),      # matched -> delete
            (2, "A", 0, "00000001", "U", 50),     # matched -> update
            (3, "B", 0, "00000001", "X", 99),     # matched, no clause
            (9, "C", 900, "00000001", "I", 0),    # unmatched -> insert
        ],
        SRC_SCHEMA,
    )
    c = t.merge_into(
        src,
        when_matched_update={"amount": "t.amount + s.delta"},
        when_matched_update_condition="s.op = 'U'",
        when_matched_delete_condition="s.op = 'D'",
        when_not_matched_insert=True,
    )
    assert c is not None and c.operation == "upsert"
    got = _state(t)
    assert 1 not in got                         # deleted
    assert got[2] == ("A", 250, "00000001")     # t.amount + s.delta
    assert got[3] == ("B", 300, "00000000")     # untouched no-op
    assert got[4] == ("B", 400, "00000000")     # not in source
    assert got[9] == ("C", 900, "00000001")     # inserted


def test_delete_wins_over_update(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 0, "00000001", "D", 10)], SRC_SCHEMA
    )
    t.merge_into(
        src,
        when_matched_update={"amount": "t.amount + s.delta"},
        # both conditions true for this row: DELETE evaluates first
        when_matched_update_condition="s.delta > 0",
        when_matched_delete_condition="s.op = 'D'",
    )
    assert 1 not in _state(t)


def test_conditional_insert_and_noop_returns_none(spark, tmp_path):
    t = _table(spark, tmp_path)
    v = t.latest_commit().version
    src = spark.createDataFrame(
        [
            (8, "C", 800, "00000001", "I", 0),
            (9, "C", -1, "00000001", "I", 0),
        ],
        SRC_SCHEMA,
    )
    t.merge_into(src, when_not_matched_insert="s.amount >= 0")
    got = _state(t)
    assert 8 in got and 9 not in got
    # a merge where nothing applies writes no commit at all
    src2 = spark.createDataFrame(
        [(3, "B", 0, "00000002", "X", 0)], SRC_SCHEMA
    )
    assert t.merge_into(
        src2,
        when_matched_update={"amount": "s.delta"},
        when_matched_update_condition="s.op = 'U'",
    ) is None
    assert t.latest_commit().version == v + 1  # only the insert commit


def test_merge_into_empty_table_inserts(spark, tmp_path):
    cfg = TableConfig(name="e", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "e", cfg)
    src = spark.createDataFrame(BASE, SCHEMA)
    c = t.merge_into(src, when_not_matched_insert=True)
    assert c is not None
    assert t.read().count() == len(BASE)


def test_validations(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 0, "00000001", "U", 1)], SRC_SCHEMA
    )
    with pytest.raises(ValueError, match="record-key"):
        t.merge_into(src, when_matched_update={"k": "s.k + 1"})
    with pytest.raises(ValueError, match="ordering"):
        t.merge_into(src.drop("trx_seq"),
                     when_not_matched_insert=True)
    with pytest.raises(ValueError, match="lacks target"):
        t.merge_into(
            spark.createDataFrame(
                [(9, "00000001")], "k long, trx_seq string"
            ),
            when_not_matched_insert=True,
        )
