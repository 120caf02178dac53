"""JSON-lines change-log source: DMS Op envelope + incremental watermark."""

from pathlib import Path

from aws_dms_to_hudi_spark.operators.merge import upsert_merge
from aws_dms_to_hudi_spark.sources.json_dfs import JsonDFSSource

SCHEMA = "Op string, k int, v string, trx_seq string"


def _write(p: Path, text: str) -> None:
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_reads_op_envelope_and_watermark(spark, tmp_path: Path):
    _write(
        tmp_path / "t" / "batch-00000" / "part-0.json",
        '{"Op":"I","k":1,"v":"a","trx_seq":"001"}\n'
        '{"Op":"I","k":2,"v":"b","trx_seq":"002"}\n',
    )
    src = JsonDFSSource(spark, tmp_path / "t", schema=SCHEMA)
    df, ckpt = src.read_new(None)
    assert "_hoodie_is_deleted" in df.columns and "Op" not in df.columns
    assert df.count() == 2
    assert not [r for r in df.collect() if r["_hoodie_is_deleted"]]

    # nothing new -> no batch, checkpoint unchanged
    none_df, ckpt2 = src.read_new(ckpt)
    assert none_df is None and ckpt2 == ckpt

    # next batch: update + delete, only the new file is read
    _write(
        tmp_path / "t" / "batch-00001" / "part-0.json",
        '{"Op":"U","k":1,"v":"a2","trx_seq":"003"}\n'
        '{"Op":"D","k":2,"v":"b","trx_seq":"004"}\n',
    )
    df2, ckpt3 = src.read_new(ckpt)
    assert df2.count() == 2
    assert ckpt3[list(ckpt3)[0]] > ckpt[list(ckpt)[0]]
    deleted = {r["k"]: r["_hoodie_is_deleted"] for r in df2.collect()}
    assert deleted == {1: False, 2: True}


def test_json_inferred_schema_merges_like_parquet(spark, tmp_path: Path):
    """No explicit schema: Spark infers from the JSON lines."""
    src = JsonDFSSource(spark, tmp_path / "t")
    _write(
        tmp_path / "t" / "b0" / "p.json",
        '{"Op":"I","k":1,"v":"a","trx_seq":"001"}\n'
        '{"Op":"I","k":2,"v":"b","trx_seq":"002"}\n',
    )
    batch0, ckpt = src.read_new(None)
    state = upsert_merge(None, batch0, ["k"], "trx_seq")
    _write(
        tmp_path / "t" / "b1" / "p.json",
        '{"Op":"U","k":1,"v":"a2","trx_seq":"003"}\n'
        '{"Op":"D","k":2,"v":"b","trx_seq":"004"}\n',
    )
    batch1, _ = src.read_new(ckpt)
    state = upsert_merge(state, batch1, ["k"], "trx_seq")
    rows = {r["k"]: r["v"] for r in state.collect()}
    assert rows == {1: "a2"}
