"""Incremental group-aggregate maintenance (functions/incremental.py):
maintained state must equal a full recompute after every commit, through
the cases the recompute-affected-groups strategy exists for — updates in
place, keys MOVING between groups, deletes, a group losing its last
member, and a brand-new group."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.functions import incremental as fn_incr
from aws_dms_to_hudi_spark.storage import CuratedTable


@pytest.fixture()
def table(spark, tmp_path: Path) -> CuratedTable:
    cfg = TableConfig(
        name="t", record_key=["k"], source_ordering_field="trx_seq"
    )
    return CuratedTable(spark, tmp_path / "t", cfg)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k int, grp string, amt double, trx_seq string, "
        "_hoodie_is_deleted boolean"
    )


def _aggs():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": F.count("*").cast("long"),
        "total": F.sum("amt").cast("double"),
    }


def _full(table, version):
    return fn_incr.group_agg(table.read(version=version), "grp", _aggs())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_state_tracks_full_recompute(spark, table):
    # groups: A={1,2}, B={3,4}, C={5}
    c0 = table.bulk_insert(
        _df(spark, [
            (1, "A", 10.0, "001", False),
            (2, "A", 20.0, "002", False),
            (3, "B", 30.0, "003", False),
            (4, "B", 40.0, "004", False),
            (5, "C", 50.0, "005", False),
        ])
    )
    state = _full(table, c0.version)

    # round 1: in-place update (2), group move B->A (3), delete (4),
    # C loses its only member (5 deleted), new group D appears (6)
    c1 = table.upsert(
        _df(spark, [
            (2, "A", 25.0, "006", False),
            (3, "A", 30.0, "007", False),
            (4, "B", 40.0, "008", True),
            (5, "C", 50.0, "009", True),
            (6, "D", 60.0, "010", False),
        ])
    )
    state = fn_incr.maintain_group_agg(
        table, state, "grp", _aggs(), c0.version, c1.version
    )
    assert _rows(state) == _rows(_full(table, c1.version))
    got = {r["grp"]: (r["n"], r["total"]) for r in state.collect()}
    assert got == {"A": (3, 65.0), "D": (1, 60.0)}  # B, C gone

    # round 2: move 3 back (A->B, resurrecting B), update 6
    c2 = table.upsert(
        _df(spark, [
            (3, "B", 35.0, "011", False),
            (6, "D", 66.0, "012", False),
        ])
    )
    state = fn_incr.maintain_group_agg(
        table, state, "grp", _aggs(), c1.version, c2.version
    )
    assert _rows(state) == _rows(_full(table, c2.version))


def test_multi_commit_catchup_in_one_call(spark, table):
    c0 = table.bulk_insert(
        _df(spark, [(1, "A", 1.0, "001", False), (2, "B", 2.0, "002", False)])
    )
    state0 = _full(table, c0.version)
    table.upsert(_df(spark, [(1, "B", 1.5, "003", False)]))
    c2 = table.upsert(_df(spark, [(2, "B", 2.0, "004", True)]))
    # one maintenance call spanning both commits
    state = fn_incr.maintain_group_agg(
        table, state0, "grp", _aggs(), c0.version, c2.version
    )
    assert _rows(state) == _rows(_full(table, c2.version))


def test_empty_round_is_identity(spark, table):
    c0 = table.bulk_insert(_df(spark, [(1, "A", 1.0, "001", False)]))
    state = _full(table, c0.version)
    out = fn_incr.maintain_group_agg(
        table, state, "grp", _aggs(), c0.version, c0.version
    )
    assert _rows(out) == _rows(state)


def test_state_diff_tags_insert_update_delete(spark):
    old = spark.createDataFrame(
        [("A", 2, 10.0), ("B", 1, 5.0), ("C", 3, 9.0)],
        "grp string, n long, total double")
    new = spark.createDataFrame(
        [("A", 2, 10.0), ("B", 2, 7.5), ("D", 1, 1.0)],
        "grp string, n long, total double")
    out = {r["grp"]: r for r in fn_incr.state_diff(
        old, new, "grp", ["n", "total"]).collect()}
    assert set(out) == {"B", "C", "D"}  # A unchanged -> not published
    assert out["B"]["change_type"] == "update" and out["B"]["new_total"] == 7.5
    assert out["C"]["change_type"] == "delete" and out["C"]["new_n"] is None
    assert out["D"]["change_type"] == "insert" and out["D"]["old_n"] is None


# ---------------------------------------------------------------------------
# join-view maintenance (maintain_join_view)
# ---------------------------------------------------------------------------


def _ldf(spark, rows):
    return spark.createDataFrame(
        rows, "ok int, ck int, amt double, trx_seq string, "
        "_hoodie_is_deleted boolean"
    )


def _rdf(spark, rows):
    return spark.createDataFrame(
        rows, "ck int, seg string, trx_seq string, "
        "_hoodie_is_deleted boolean"
    )


def _jv_full(lt, rt, lv, rv):
    return fn_incr.join_view(
        lt.read(version=lv), rt.read(version=rv),
        "ck", "ck", ["ok", "ck", "amt"], ["seg"],
    )


def test_join_view_tracks_full_recompute(spark, tmp_path):
    """Maintained join view == full re-join through: left update, left
    delete, left row MOVING to another join key, right attribute
    update (fan-out re-join), right delete (orphans leave the inner
    join), and a brand-new right key adopting an existing orphan."""
    lt = CuratedTable(
        spark, tmp_path / "l",
        TableConfig(name="l", record_key=["ok"],
                    source_ordering_field="trx_seq"),
    )
    rt = CuratedTable(
        spark, tmp_path / "r",
        TableConfig(name="r", record_key=["ck"],
                    source_ordering_field="trx_seq"),
    )
    lc0 = lt.bulk_insert(_ldf(spark, [
        (1, 10, 1.0, "001", False),
        (2, 10, 2.0, "002", False),
        (3, 20, 3.0, "003", False),
        (4, 30, 4.0, "004", False),
        (5, 99, 5.0, "005", False),   # orphan: no right key 99 yet
    ]))
    rc0 = rt.bulk_insert(_rdf(spark, [
        (10, "a", "001", False),
        (20, "b", "002", False),
        (30, "c", "003", False),
    ]))
    state = _jv_full(lt, rt, lc0.version, rc0.version)

    # round 1: left update (1), left delete (2), left key-move (3: 20→30)
    lc1 = lt.upsert(_ldf(spark, [
        (1, 10, 1.5, "011", False),
        (2, 10, 2.0, "012", True),
        (3, 30, 3.0, "013", False),
    ]))
    # right: seg update on 30 (fan-out), delete 20, new key 99
    rc1 = rt.upsert(_rdf(spark, [
        (30, "c2", "011", False),
        (20, "b", "012", True),
        (99, "z", "013", False),
    ]))
    state = fn_incr.maintain_join_view(
        lt, rt, state, "ck", ["ok", "ck", "amt"], ["seg"],
        lc0.version, lc1.version, rc0.version, rc1.version,
    )
    assert _rows(state) == _rows(_jv_full(lt, rt, lc1.version, rc1.version))

    # round 2: left-only changes (right side quiet)
    lc2 = lt.upsert(_ldf(spark, [(6, 30, 6.0, "021", False)]))
    state = fn_incr.maintain_join_view(
        lt, rt, state, "ck", ["ok", "ck", "amt"], ["seg"],
        lc1.version, lc2.version, rc1.version, rc1.version,
    )
    assert _rows(state) == _rows(_jv_full(lt, rt, lc2.version, rc1.version))


# --- SCD Type-2 history (scd2_history) ---------------------------------


def _scd2(spark, batches):
    dfs = [
        (
            v,
            spark.createDataFrame(
                rows,
                "k int, val string, trx_seq string, "
                "_hoodie_is_deleted boolean",
            ),
        )
        for v, rows in batches
    ]
    return {
        tuple(r)
        for r in fn_incr.scd2_history(dfs, ["k"], ["val"]).collect()
    }


def test_scd2_insert_update_chain(spark):
    got = _scd2(
        spark,
        [
            (0, [(1, "a", "t0", False)]),
            (1, [(1, "b", "t1", False)]),
            (2, [(1, "c", "t2", False)]),
        ],
    )
    assert got == {
        (1, "a", 0, 1, False),
        (1, "b", 1, 2, False),
        (1, "c", 2, None, True),
    }


def test_scd2_delete_closes_without_opening(spark):
    """A hard delete ends the open interval; no row represents the
    deleted state, and nothing is current afterwards."""
    got = _scd2(
        spark,
        [
            (0, [(1, "a", "t0", False)]),
            (1, [(1, "a", "t1", True)]),
        ],
    )
    assert got == {(1, "a", 0, 1, False)}


def test_scd2_reinsert_opens_fresh_interval(spark):
    got = _scd2(
        spark,
        [
            (0, [(1, "a", "t0", False)]),
            (1, [(1, "a", "t1", True)]),
            (2, [(1, "z", "t2", False)]),
        ],
    )
    assert got == {(1, "a", 0, 1, False), (1, "z", 2, None, True)}


def test_scd2_in_batch_precombine_picks_max_seq(spark):
    """Two changes to one key inside one batch: only the max-trx_seq
    row opens the interval (the D4 rule)."""
    got = _scd2(
        spark,
        [(0, [(1, "first", "t0", False), (1, "second", "t1", False)])],
    )
    assert got == {(1, "second", 0, None, True)}


def test_scd2_keys_are_independent(spark):
    got = _scd2(
        spark,
        [
            (0, [(1, "a", "t0", False), (2, "x", "t0", False)]),
            (1, [(1, "b", "t1", False)]),
        ],
    )
    assert got == {
        (1, "a", 0, 1, False),
        (1, "b", 1, None, True),
        (2, "x", 0, None, True),
    }


# ----------------------------------------------------- incremental top-k


def _mk_topk_table(spark, tmp_path, rows_by_batch):
    """rows_by_batch: list of lists of (key, grp, val, seq, deleted)."""
    from aws_dms_to_hudi_spark.config import TableConfig
    from aws_dms_to_hudi_spark.storage import CuratedTable

    cfg = TableConfig(name="lb", record_key=["k"],
                      source_ordering_field="seq")
    t = CuratedTable(spark, tmp_path / "lb", cfg)
    for i, rows in enumerate(rows_by_batch):
        df = spark.createDataFrame(
            rows,
            "k long, grp string, val long, seq string, "
            "_hoodie_is_deleted boolean",
        )
        (t.bulk_insert if i == 0 else t.upsert)(df)
    return t


def test_topk_no_refresh_on_growth_refresh_on_boundary_drop(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from aws_dms_to_hudi_spark.functions.incremental import maintain_topk

    base = [
        (i, f"g{i:02d}", 100 - i, f"0{i:03d}", False) for i in range(12)
    ]
    # batch 1: raise g11 (stays a candidate, no refresh needed)
    up = [(11, "g11", 95, "1000", False)]
    # batch 2: delete the #1 group's only row -> buffer boundary sinks
    kill = [(0, "g00", 100, "2000", True)]
    t = _mk_topk_table(spark, tmp_path, [base, up, kill])
    top, refreshes = maintain_topk(
        t, "grp", F.sum("val"), k=3, buffer_factor=2
    )
    got = [(r["grp"], r["val"]) for r in top.orderBy("rank").collect()]
    # brute force over the final state
    want = [
        (r["grp"], r["v"])
        for r in t.read()
        .groupBy("grp").agg(F.sum("val").alias("v"))
        .orderBy(F.col("v").desc(), "grp").limit(3).collect()
    ]
    assert got == want
    # growth round must not refresh; the kill round must
    assert refreshes == 1


def test_topk_matches_full_rank_on_replay(spark, sf_smoke, tmp_path):
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    table, _ = entry._replayed_orders(spark, sf_smoke)
    spend = F.sum(
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    )
    from aws_dms_to_hudi_spark.functions.incremental import maintain_topk

    top, refreshes = maintain_topk(table, "o_custkey", spend, k=10)
    got = [(r["o_custkey"], r["val"]) for r in top.orderBy("rank").collect()]
    want = [
        (r["o_custkey"], r["v"])
        for r in table.read()
        .groupBy("o_custkey").agg(spend.alias("v"))
        .orderBy(F.col("v").desc(), "o_custkey").limit(10).collect()
    ]
    assert got == want
    assert refreshes >= 1  # the delete batch sinks the boundary
