"""ORC change-log source: Op-column envelope + incremental watermark
(schema embedded in the files — no caller DDL, unlike CSV/JSON)."""

from pathlib import Path

from aws_dms_to_hudi_spark.operators.merge import upsert_merge
from aws_dms_to_hudi_spark.sources.orc_dfs import OrcDFSSource


def _land(spark, root: Path, batch: str, rows) -> None:
    df = spark.createDataFrame(rows, "Op string, k int, v string, trx_seq string")
    df.coalesce(1).write.mode("overwrite").orc(str(root / batch))


def test_reads_op_envelope_and_watermark(spark, tmp_path: Path):
    root = tmp_path / "t"
    _land(spark, root, "batch-00000", [("I", 1, "a", "001"), ("I", 2, "b", "002")])
    src = OrcDFSSource(spark, root)
    df, ckpt = src.read_new(None)
    assert "_hoodie_is_deleted" in df.columns and "Op" not in df.columns
    assert df.count() == 2
    assert not [r for r in df.collect() if r["_hoodie_is_deleted"]]

    # nothing new -> no batch, checkpoint unchanged
    none_df, ckpt2 = src.read_new(ckpt)
    assert none_df is None and ckpt2 == ckpt

    # next batch: update + delete, only the new file is read — and the
    # int column arrives typed from the embedded ORC schema
    _land(spark, root, "batch-00001", [("U", 1, "a2", "003"), ("D", 2, "b", "004")])
    df2, ckpt3 = src.read_new(ckpt)
    assert df2.count() == 2
    assert dict(df2.dtypes)["k"] == "int"
    deleted = {r["k"]: r["_hoodie_is_deleted"] for r in df2.collect()}
    assert deleted == {1: False, 2: True}


def test_orc_batch_merges_like_parquet(spark, tmp_path: Path):
    root = tmp_path / "t"
    src = OrcDFSSource(spark, root)
    _land(spark, root, "b0", [("I", 1, "a", "001"), ("I", 2, "b", "002")])
    batch0, ckpt = src.read_new(None)
    state = upsert_merge(None, batch0, ["k"], "trx_seq")
    _land(spark, root, "b1", [("U", 1, "a2", "003"), ("D", 2, "b", "004")])
    batch1, _ = src.read_new(ckpt)
    state = upsert_merge(state, batch1, ["k"], "trx_seq")
    rows = {r["k"]: r["v"] for r in state.collect()}
    assert rows == {1: "a2"}
