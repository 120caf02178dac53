"""JDBC/RDBMS source: full load + high-watermark incremental + envelope
derivation against Apache Derby embedded (the JDBC engine shipped with
Spark)."""

from pathlib import Path

from aws_dms_to_hudi_spark.operators.merge import upsert_merge
from aws_dms_to_hudi_spark.sources.jdbc import JdbcSource

DRV = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path: Path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _append(spark, url, rows, mode):
    df = spark.createDataFrame(
        rows, "k bigint, v string, seq bigint, op string"
    )
    (
        df.write.format("jdbc").option("url", url).option("driver", DRV)
        .option("dbtable", "journal")
        .option("createTableColumnTypes", "v VARCHAR(64), op CHAR(1)")
        .mode(mode).save()
    )


def _src(spark, url, **kw):
    return JdbcSource(
        spark, url, "journal", ordering_column="seq", driver=DRV,
        op_column="op", **kw
    )


def test_full_load_then_incremental(spark, tmp_path):
    url = _url(tmp_path, "db1")
    _append(spark, url, [(1, "a", 100, "I"), (2, "b", 200, "I")], "overwrite")
    src = _src(spark, url)
    batch, ckpt = src.read_new(None)
    assert ckpt == {"watermark": 200}
    assert set(batch.columns) == {"k", "v", "trx_seq", "_hoodie_is_deleted"}
    rows = {r["k"]: r for r in batch.collect()}
    assert rows[1]["trx_seq"].endswith("100") and len(rows[1]["trx_seq"]) == 50
    assert not rows[1]["_hoodie_is_deleted"]

    # nothing new
    none_df, ckpt2 = src.read_new(ckpt)
    assert none_df is None and ckpt2 == ckpt

    # delta: update + delete; only rows past the watermark come back
    _append(spark, url, [(1, "a2", 300, "U"), (2, "b", 400, "D")], "append")
    d, ckpt3 = src.read_new(ckpt)
    assert ckpt3 == {"watermark": 400}
    got = {r["k"]: r["_hoodie_is_deleted"] for r in d.collect()}
    assert got == {1: False, 2: True}


def test_partitioned_read_matches_serial(spark, tmp_path):
    url = _url(tmp_path, "db2")
    rows = [(i, f"v{i}", 1000 + i, "I") for i in range(1, 101)]
    _append(spark, url, rows, "overwrite")
    serial, _ = _src(spark, url).read_new(None)
    par, _ = _src(
        spark, url, partition_column="k", num_partitions=8
    ).read_new(None)
    assert par.rdd.getNumPartitions() > 1
    assert sorted(map(tuple, serial.collect())) == \
        sorted(map(tuple, par.collect()))


def test_jdbc_batch_merges_like_parquet(spark, tmp_path):
    url = _url(tmp_path, "db3")
    _append(spark, url, [(1, "a", 100, "I"), (2, "b", 200, "I")], "overwrite")
    src = _src(spark, url)
    batch0, ckpt = src.read_new(None)
    state = upsert_merge(None, batch0, ["k"], "trx_seq")
    _append(spark, url, [(1, "a2", 300, "U"), (2, "b", 400, "D")], "append")
    batch1, _ = src.read_new(ckpt)
    state = upsert_merge(state, batch1, ["k"], "trx_seq")
    rows = {r["k"]: r["v"] for r in state.collect()}
    assert rows == {1: "a2"}


def test_string_watermark_passthrough(spark, tmp_path):
    """A string ordering column (e.g. a real trx_seq) is used verbatim,
    and the lexicographic watermark matches numeric order because the
    journal pads it."""
    url = _url(tmp_path, "db4")
    df = spark.createDataFrame(
        [(1, "a", "0009", "I"), (2, "b", "0010", "I")],
        "k bigint, v string, seq string, op string",
    )
    (
        df.write.format("jdbc").option("url", url).option("driver", DRV)
        .option("dbtable", "journal")
        .option("createTableColumnTypes",
                "v VARCHAR(64), seq VARCHAR(8), op CHAR(1)")
        .mode("overwrite").save()
    )
    src = _src(spark, url)
    batch, ckpt = src.read_new(None)
    assert ckpt == {"watermark": "0010"}
    assert {r["trx_seq"] for r in batch.collect()} == {"0009", "0010"}
