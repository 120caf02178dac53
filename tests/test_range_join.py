"""Unit tests for the bucketed range join (operators/range_join.py)."""

import datetime as dt

import pytest

from aws_dms_to_hudi_spark.operators.range_join import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def points_and_intervals(spark):
    points = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:30:00"), 1),   # inside i1
            ("u1", _ts("2024-01-03 12:00:00"), 2),   # inside i2 (spans buckets)
            ("u1", _ts("2024-01-05 00:00:00"), 3),   # exactly at i2 end
            ("u2", _ts("2024-01-01 00:30:00"), 4),   # right key, no interval
            ("u1", _ts("2024-02-01 00:00:00"), 5),   # outside all
        ],
        "k string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), "i1"),
            ("u1", _ts("2024-01-02 00:00:00"), _ts("2024-01-05 00:00:00"), "i2"),
        ],
        "k string, start timestamp, end timestamp, iid string",
    )
    return points, intervals


def test_membership_and_bucket_spanning(spark, points_and_intervals):
    points, intervals = points_and_intervals
    out = range_join(
        points, intervals, on=["k"], left_ts="ts",
        right_start="start", right_end="end", bucket_seconds=86400,
    )
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    # end-exclusive by default: pid=3 at the exact end does not match
    assert got == {(1, "i1"), (2, "i2")}


def test_end_inclusive(spark, points_and_intervals):
    points, intervals = points_and_intervals
    out = range_join(
        points, intervals, on=["k"], left_ts="ts",
        right_start="start", right_end="end", bucket_seconds=86400,
        end_inclusive=True,
    )
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, "i1"), (2, "i2"), (3, "i2")}


def test_no_duplicate_matches_small_buckets(spark, points_and_intervals):
    """Interval exploded over many buckets must still match each point
    exactly once (the point's own bucket)."""
    points, intervals = points_and_intervals
    out = range_join(
        points, intervals, on=["k"], left_ts="ts",
        right_start="start", right_end="end", bucket_seconds=3600,
    )
    rows = [r["pid"] for r in out.collect()]
    assert sorted(rows) == [1, 2]


def test_column_collision_raises(spark, points_and_intervals):
    points, intervals = points_and_intervals
    with pytest.raises(ValueError, match="collision"):
        range_join(
            points.withColumnRenamed("pid", "iid"), intervals, on=["k"],
            left_ts="ts", right_start="start", right_end="end",
        )


def test_plan_is_equi_join(spark, points_and_intervals):
    """The whole point: a hash-partitioned equi-join, never a nested
    loop / cartesian over the inequality."""
    points, intervals = points_and_intervals
    out = range_join(
        points, intervals, on=["k"], left_ts="ts",
        right_start="start", right_end="end",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
