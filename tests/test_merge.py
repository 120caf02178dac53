"""Merge-core semantics (D4-D6) on hand-built micro-batches."""

from pyspark.sql import Row

from aws_dms_to_hudi_spark.operators.merge import (
    apply_deletes,
    precombine,
    upsert_merge,
)


SCHEMA = "k int, v string, trx_seq string, _hoodie_is_deleted boolean"


def seq(n: int) -> str:
    return str(n).zfill(50)


def row(k, v, s, deleted=False):
    return Row(k=k, v=v, trx_seq=seq(s), _hoodie_is_deleted=deleted)


def mkdf(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def by_key(df):
    return {r["k"]: r for r in df.collect()}


def test_precombine_keeps_max_trx_seq(spark):
    batch = mkdf(
        spark,
        [row(1, "a", 10), row(1, "b", 30), row(1, "c", 20), row(2, "x", 5)]
    )
    out = by_key(precombine(batch, ["k"], "trx_seq"))
    assert out[1]["v"] == "b"
    assert out[2]["v"] == "x"


def test_precombine_is_lexicographic_not_numeric(spark):
    # SURVEY.md §7.3: trx_seq compares as a string. With zero-padded
    # fixtures string order == numeric order; an unpadded '9' would beat
    # '10' — assert we use plain string order on the raw column.
    batch = spark.createDataFrame(
        [
            Row(k=1, v="short", trx_seq="9", _hoodie_is_deleted=False),
            Row(k=1, v="long", trx_seq="10", _hoodie_is_deleted=False),
        ]
    )
    out = by_key(precombine(batch, ["k"], "trx_seq"))
    assert out[1]["v"] == "short"


def test_upsert_insert_update_delete(spark):
    existing = mkdf(spark, [row(1, "old", 1), row(2, "keep", 2), row(3, "gone", 3)])
    batch = mkdf(
        spark,
        [
            row(1, "new", 10),  # update
            row(3, None, 11, deleted=True),  # delete
            row(4, "fresh", 12),  # insert
        ],
    )
    out = by_key(upsert_merge(existing, batch, ["k"], "trx_seq"))
    assert set(out) == {1, 2, 4}
    assert out[1]["v"] == "new"
    assert out[2]["v"] == "keep"
    assert out[4]["v"] == "fresh"


def test_stale_update_loses_to_stored_row(spark):
    # A change arriving late (older trx_seq than stored) must not win.
    existing = mkdf(spark, [row(1, "current", 20)])
    batch = mkdf(spark, [row(1, "stale", 10)])
    out = by_key(upsert_merge(existing, batch, ["k"], "trx_seq"))
    assert out[1]["v"] == "current"


def test_stale_delete_does_not_remove_newer_row(spark):
    existing = mkdf(spark, [row(1, "current", 20)])
    batch = mkdf(spark, [row(1, None, 10, deleted=True)])
    out = by_key(upsert_merge(existing, batch, ["k"], "trx_seq"))
    assert out[1]["v"] == "current"


def test_delete_then_reinsert_in_one_batch(spark):
    existing = mkdf(spark, [row(1, "v0", 1)])
    batch = mkdf(
        spark,
        [row(1, None, 10, deleted=True), row(1, "v2", 11)]
    )
    out = by_key(upsert_merge(existing, batch, ["k"], "trx_seq"))
    assert out[1]["v"] == "v2"


def test_reinsert_then_late_delete_in_one_batch(spark):
    existing = mkdf(spark, [row(1, "v0", 1)])
    batch = mkdf(
        spark,
        [row(1, "v2", 10), row(1, None, 11, deleted=True)]
    )
    out = upsert_merge(existing, batch, ["k"], "trx_seq")
    assert out.count() == 0


def test_merge_is_idempotent_on_replay(spark):
    existing = mkdf(spark, [row(1, "old", 1), row(2, "keep", 2)])
    batch = mkdf(spark, [row(1, "new", 10), row(3, "ins", 11)])
    once = upsert_merge(existing, batch, ["k"], "trx_seq")
    twice = upsert_merge(once, batch, ["k"], "trx_seq")
    assert sorted(by_key(once)) == sorted(by_key(twice))
    assert by_key(twice)[1]["v"] == "new"


def test_composite_key_merge(spark):
    existing = spark.createDataFrame(
        [Row(a=1, b=1, v="x", trx_seq=seq(1), _hoodie_is_deleted=False)]
    )
    batch = spark.createDataFrame(
        [
            Row(a=1, b=1, v="y", trx_seq=seq(10), _hoodie_is_deleted=False),
            Row(a=1, b=2, v="z", trx_seq=seq(11), _hoodie_is_deleted=False),
        ]
    )
    out = {(r["a"], r["b"]): r for r in upsert_merge(existing, batch, ["a", "b"], "trx_seq").collect()}
    assert out[(1, 1)]["v"] == "y"
    assert out[(1, 2)]["v"] == "z"


def test_apply_deletes_noop_without_column(spark):
    df = spark.createDataFrame([Row(k=1, v="a")])
    assert apply_deletes(df).count() == 1


def test_scd2_history_invariants(spark, sf_smoke):
    """SCD2 expansion vs the keep-latest merge over the SAME change log:

    - per key, exactly one open interval (valid_to NULL), versions chain
      (each valid_to equals the next valid_from);
    - the current (open, non-deleted) rows are exactly the rows the
      precombine+merge replay produces — the two operators are the
      keep-all / keep-latest projections of one CDC semantics."""
    from aws_dms_to_hudi_spark import cdc
    from aws_dms_to_hudi_spark.operators.scd import scd2

    rec = cdc.RECIPES["orders"]
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__scd_orders"
    )
    changes = spark.sql(cdc.stream_sql(rec, src="__scd_orders"))
    hist = scd2(changes, keys=["o_orderkey"]).collect()

    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r.o_orderkey, []).append(r)
    for versions in by_key.values():
        versions.sort(key=lambda r: r.valid_from_seq)
        assert sum(1 for r in versions if r.valid_to_seq is None) == 1
        assert versions[-1].valid_to_seq is None  # open interval is newest
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to_seq == b.valid_from_seq

    current = {
        (r.o_orderkey, r.trx_seq) for r in hist if r.is_current
    }
    merged = precombine(changes, ["o_orderkey"], "trx_seq")
    merged = apply_deletes(merged)
    latest = {(r.o_orderkey, r.trx_seq) for r in merged.collect()}
    assert current == latest


# ---------------------------------------------------------------------------
# dead-letter quarantine (operators/quarantine.py)
# ---------------------------------------------------------------------------


def test_quarantine_split_is_exhaustive_and_disjoint(spark):
    from pyspark.sql import functions as F

    from aws_dms_to_hudi_spark.operators.quarantine import split_quarantine

    df = spark.createDataFrame(
        [
            ("I", 1, "a"),
            ("U", 2, "b"),
            ("D", 3, "c"),
            ("X", 4, "d"),        # bad op
            (None, 5, "e"),       # null op
            ("U", None, "f"),     # null key
            ("Z", None, "g"),     # both -> bad_op wins (fixed order)
        ],
        "Op string, k int, payload string",
    )
    clean, dlq = split_quarantine(df, ["k"])
    assert clean.count() + dlq.count() == df.count()
    assert {r["k"] for r in clean.collect()} == {1, 2, 3}
    reasons = {r["payload"]: r["dlq_reason"] for r in dlq.collect()}
    assert reasons == {"d": "bad_op", "e": "bad_op",
                       "f": "null_key", "g": "bad_op"}
    # no shuffle: the split is two filters over one scan
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quarantine_without_op_column(spark):
    from aws_dms_to_hudi_spark.operators.quarantine import split_quarantine

    df = spark.createDataFrame(
        [(1, "x"), (None, "y")], "k int, payload string"
    )
    clean, dlq = split_quarantine(df, ["k"])
    assert clean.count() == 1
    assert dlq.collect()[0]["dlq_reason"] == "null_key"
