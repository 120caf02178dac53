"""Property-based CDC merge tests (SURVEY.md §5.2).

Invariant: for ANY random insert/update/delete history ordered by
``trx_seq``, the engine's merged state equals a naive dict replay of the
history (last-writer-wins per key, deleted keys absent). Also checked:
re-applying the final batch is a no-op (idempotent replay — the
crash-recovery contract of the checkpointed pipeline).

Keys are drawn from a tiny range to force heavy in-batch and cross-batch
collisions; ``trx_seq`` is a zero-padded string so lexicographic order
equals generation order (the DMS $AR_H_CHANGE_SEQ contract,
templates/aws-dms-to-hudi.yaml:490-506).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from aws_dms_to_hudi_spark.operators.merge import upsert_merge

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("trx_seq", T.StringType()),
        T.StructField("_hoodie_is_deleted", T.BooleanType()),
    ]
)

# one history = list of batches; one op = (key 0..7, value, is_delete)
op_st = st.tuples(
    st.integers(0, 7), st.integers(0, 999), st.booleans()
)
history_st = st.lists(st.lists(op_st, min_size=1, max_size=8), min_size=1, max_size=4)


def _rows(history):
    """Stamp each op with a global zero-padded trx_seq."""
    seq = 0
    out = []
    for batch in history:
        rows = []
        for k, val, deleted in batch:
            seq += 1
            rows.append((k, val, f"{seq:020d}", deleted))
        out.append(rows)
    return out


def _naive_replay(batches):
    state: dict[int, tuple] = {}
    for rows in batches:
        for k, val, seq, deleted in rows:  # generation order == seq order
            if deleted:
                state.pop(k, None)
            else:
                state[k] = (k, val, seq)
    return set(state.values())


@settings(max_examples=12, deadline=None)
@given(history=history_st)
def test_merge_equals_naive_replay(spark, history):
    batches = _rows(history)
    state = None
    for rows in batches:
        df = spark.createDataFrame(rows, SCHEMA)
        state = upsert_merge(state, df, ["k"], "trx_seq")
    got = {(r.k, r.val, r.trx_seq) for r in state.collect()}
    assert got == _naive_replay(batches)


@settings(max_examples=6, deadline=None)
@given(history=history_st)
def test_reapplying_last_batch_is_noop(spark, history):
    batches = _rows(history)
    state = None
    for rows in batches:
        df = spark.createDataFrame(rows, SCHEMA)
        state = upsert_merge(state, df, ["k"], "trx_seq")
    replayed = upsert_merge(
        state, spark.createDataFrame(batches[-1], SCHEMA), ["k"], "trx_seq"
    )
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in state.collect()
    }


def test_delete_then_reinsert_same_batch(spark):
    """Ordering inside one batch is by trx_seq, not arrival: a re-insert
    AFTER a delete must survive; a delete after an update must win."""
    rows = [
        (1, 10, "00000001", False),
        (1, 0, "00000002", True),   # delete
        (1, 30, "00000003", False),  # re-insert wins
        (2, 20, "00000004", False),
        (2, 0, "00000005", True),   # delete wins
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    state = upsert_merge(None, df, ["k"], "trx_seq")
    got = {(r.k, r.val) for r in state.collect()}
    assert got == {(1, 30)}


# ---------------------------------------------------------------------------
# quarantine split invariants (operators/quarantine.py)
# ---------------------------------------------------------------------------

_ROW = st.tuples(
    st.one_of(st.none(),
              st.sampled_from(["I", "U", "D", "X", "d", "", "insert"])),
    st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
    st.text(alphabet="abc", max_size=3),
)


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(_ROW, min_size=0, max_size=40))
def test_quarantine_partitions_any_batch(spark, rows):
    """For ANY batch: clean ∪ quarantine ≡ input (nothing dropped or
    duplicated), the two parts are disjoint by construction, every
    quarantined row carries a reason, and no clean row has a bad Op or
    NULL key."""
    from aws_dms_to_hudi_spark.operators.quarantine import (
        VALID_OPS,
        split_quarantine,
    )

    df = spark.createDataFrame(
        rows, "Op string, k long, payload string"
    )
    clean, dlq = split_quarantine(df, ["k"])
    n_clean, n_dlq = clean.count(), dlq.count()
    assert n_clean + n_dlq == len(rows)
    for r in clean.collect():
        assert r["Op"] in VALID_OPS and r["k"] is not None
    for r in dlq.collect():
        assert r["dlq_reason"] in ("bad_op", "null_key")
        if r["dlq_reason"] == "null_key":
            assert r["k"] is None and r["Op"] in VALID_OPS
        else:
            assert r["Op"] not in VALID_OPS
    # exact multiset identity on the payload projection (None-safe sort)
    keyf = lambda t: (t[0] is None, t[0] or "", t[1] is None, t[1] or 0, t[2])
    both = sorted(
        [(r["Op"], r["k"], r["payload"]) for r in clean.collect()]
        + [(r["Op"], r["k"], r["payload"]) for r in dlq.collect()],
        key=keyf,
    )
    assert both == sorted(rows, key=keyf)
