"""Governed read (D48, LakeFormation analog — the reference provisions
LakeFormation data-access roles over the curated lake,
templates/aws-dms-to-hudi.yaml:103-115,585-586,653-678): row filter +
column masks enforced inside the engine read path; the row filter
shares the column-stats dir-pruning machinery."""

import datetime

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import CuratedTable

REC = cdc.RECIPES["orders"]


@pytest.fixture(scope="module")
def gtable(spark, sf_smoke, tmp_path_factory):
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__gv_orders"
    )
    cfg = TableConfig(
        name="orders_gv",
        record_key=["o_orderkey"],
        is_partitioned=True,
        partition_path="o_year",
        stats_columns=["o_orderdate"],
    )
    t = CuratedTable(spark, tmp_path_factory.mktemp("gov") / "orders", cfg)
    for b in range(cdc.N_BATCHES):
        batch = spark.sql(
            cdc.batch_sql(REC, b, src="__gv_orders")
        ).withColumn("o_year", F.year("o_orderdate").cast("int"))
        (t.bulk_insert if b == 0 else t.upsert)(batch)
    return t


WIN = [("o_orderdate", ">=", datetime.datetime(1996, 1, 1)),
       ("o_orderdate", "<", datetime.datetime(1997, 1, 1))]


def test_row_filter_enforced_and_prunes(gtable):
    got = gtable.read_governed({"row_filter": WIN})
    plain = gtable.read()
    want = plain
    for c, op, v in WIN:
        want = want.filter(
            F.col(c) >= F.lit(v) if op == ">=" else F.col(c) < F.lit(v))
    assert got.count() == want.count() > 0
    # the filter rides the stats-pruning path: strictly fewer dirs scan
    pruned = gtable._prune_stats_dirs(gtable.latest_commit(), WIN)
    assert len(pruned) < len(gtable.latest_commit().data)


def test_masks(spark, gtable):
    got = gtable.read_governed({
        "masks": {"o_totalprice": "null",
                  "o_custkey": "hash",
                  "o_orderpriority": ("partial", 2)},
    })
    row = got.orderBy("o_orderkey").first()
    assert row["o_totalprice"] is None
    assert isinstance(row["o_custkey"], str) and "-" in row["o_custkey"]
    assert row["o_orderpriority"].endswith("***")
    # schema preserved for the nulled column
    assert dict(got.dtypes)["o_totalprice"] == \
        dict(gtable.read().dtypes)["o_totalprice"]
    # hash surrogate is deterministic and collision-free on this corpus
    n = gtable.read().select("o_custkey").distinct().count()
    assert got.select("o_custkey").distinct().count() == n


def test_hash_mask_keeps_joins_working(spark, gtable):
    """The surrogate is value-keyed, not row-keyed: two governed reads
    join on the masked key exactly like the raw key would."""
    a = gtable.read_governed({"masks": {"o_custkey": "hash"}}).select(
        "o_orderkey", "o_custkey")
    b = gtable.read_governed({"masks": {"o_custkey": "hash"}}).select(
        F.col("o_orderkey").alias("k2"), F.col("o_custkey").alias("c2"))
    raw = gtable.read().select("o_orderkey", "o_custkey")
    raw2 = raw.select(F.col("o_orderkey").alias("k2"),
                      F.col("o_custkey").alias("c2"))
    masked_join = a.join(b, a["o_custkey"] == b["c2"]).count()
    raw_join = raw.join(raw2, raw["o_custkey"] == raw2["c2"]).count()
    assert masked_join == raw_join


def test_mask_filter_overlap_rejected(gtable):
    with pytest.raises(ValueError, match="masks and row_filter"):
        gtable.read_governed({
            "row_filter": [("o_custkey", ">=", 1)],
            "masks": {"o_custkey": "hash"},
        })


def test_unknown_mask_and_column_rejected(gtable):
    with pytest.raises(ValueError, match="unknown column"):
        gtable.read_governed({"masks": {"nope": "null"}})
    with pytest.raises(ValueError, match="unknown mask spec"):
        gtable.read_governed({"masks": {"o_custkey": "rot13"}})
