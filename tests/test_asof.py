"""Unit tests for the as-of join operator (operators/asof.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_and_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:10:00"), 102.0),
            ("B", _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:03:00"), 1),  # -> 10:00 quote
            ("A", _ts("2024-01-01 10:05:00"), 2),  # tie -> 10:05 (inclusive)
            ("A", _ts("2024-01-01 10:30:00"), 3),  # -> 10:10
            ("B", _ts("2024-01-01 10:01:00"), 4),  # before any B quote -> null
            ("C", _ts("2024-01-01 10:00:00"), 5),  # key with no quotes -> null
        ],
        "sym string, ts timestamp, qty int",
    )
    return quotes, trades


def test_backward_inclusive(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on=["sym"], carry={"px": "px"})
    got = {r["qty"]: r["px"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: None}


def test_forward(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(
        trades, quotes, on=["sym"], carry={"px": "px"}, direction="forward"
    )
    got = {r["qty"]: r["px"] for r in out.collect()}
    # earliest quote with ts >= trade ts (inclusive at qty=2)
    assert got == {1: 101.0, 2: 101.0, 3: None, 4: 50.0, 5: None}


def test_tolerance_nulls_far_matches(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        carry={"px": "px"},
        tolerance_seconds=5 * 60,
    )
    got = {r["qty"]: r["px"] for r in out.collect()}
    # qty=3 is 20 min past the last quote -> nulled by tolerance
    assert got == {1: 100.0, 2: 101.0, 3: None, 4: None, 5: None}


def test_schema_and_row_preservation(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on=["sym"], carry={"px": "px"})
    assert out.columns == ["sym", "ts", "qty", "px"]
    assert out.count() == trades.count()


def test_carry_collision_raises(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes, on=["sym"], carry={"qty": "px"})


def test_bad_direction_raises(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on=["sym"], direction="nearest")


def test_single_shuffle_plan(spark, quotes_and_trades):
    """The plan must contain no join at all — one exchange on the key,
    then a window; that is the property that makes it scale."""
    quotes, trades = quotes_and_trades
    out = asof_join(trades, quotes, on=["sym"], carry={"px": "px"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_null_right_ts_rows_are_ignored(spark, quotes_and_trades):
    quotes, trades = quotes_and_trades
    polluted = quotes.unionByName(
        spark.createDataFrame([("A", None, 999.0)], quotes.schema)
    )
    out = asof_join(trades, polluted, on=["sym"], carry={"px": "px"})
    got = {r["qty"]: r["px"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: None}


def test_matches_pandas_merge_asof_on_random_data(spark):
    """pandas.merge_asof IS the reference semantics for backward as-of;
    fixed-seed random data, cross-checked exactly."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 300
    left_pd = pd.DataFrame({
        "g": rng.integers(0, 5, n_l).astype("int64"),
        "t": rng.integers(0, 10_000, n_l).astype("int64"),
        "lid": np.arange(n_l, dtype="int64"),
    })
    right_pd = pd.DataFrame({
        "g": rng.integers(0, 5, n_r).astype("int64"),
        "t": rng.integers(0, 10_000, n_r).astype("int64"),
        "val": rng.random(n_r),
    })
    # merge_asof needs unique, sorted keys; drop duplicate (g, t) on the
    # right so "latest at equal ts" is unambiguous in both engines
    right_pd = (
        right_pd.drop_duplicates(["g", "t"]).sort_values("t").reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left_pd.sort_values("t"), right_pd, on="t", by="g",
        direction="backward", allow_exact_matches=True,
    ).set_index("lid")["val"]

    out = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        on=["g"], left_ts="t", right_ts="t", carry={"val": "val"},
    )
    got = {r["lid"]: r["val"] for r in out.collect()}
    assert len(got) == n_l
    for lid, want in expected.items():
        g = got[lid]
        assert (pd.isna(want) and g is None) or g == want, lid
