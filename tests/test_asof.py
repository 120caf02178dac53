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
