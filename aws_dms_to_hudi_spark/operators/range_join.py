"""Range (point-in-interval) join — the other join Spark SQL can only
nest-loop.

``left.ts BETWEEN right.start AND right.end`` with an equi-key is an
inequality join: Catalyst plans BroadcastNestedLoopJoin (or a cartesian
region per key), O(n·m) — the classic scale trap (Databricks ships a
dedicated "range join optimization" for exactly this; open-source Spark
has none).

The standard relational fix, implemented here: quantize time into
fixed-width buckets. A point falls in exactly ONE bucket; an interval is
exploded to the buckets it overlaps. The join becomes an equi-join on
(key, bucket) followed by an exact BETWEEN filter — hash shuffle, linear
work, no duplicate matches (each point meets each interval in precisely
the point's own bucket). Bucket width trades explode factor against
candidate precision: pick it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__range_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join left point rows to right interval rows.

    Returns left columns + right's non-key columns for every pair with
    ``right_start <= left_ts < right_end`` (``<=`` when ``end_inclusive``).
    Column names (outside ``on``) must be disjoint between the sides.
    """
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(f"column collision outside join key: {sorted(overlap)}")
    w = F.lit(float(bucket_seconds))
    lb = left.withColumn(
        _B, F.floor(F.col(left_ts).cast("double") / w).cast("long")
    )
    rb = right.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("double") / w).cast("long"),
                F.floor(F.col(right_end).cast("double") / w).cast("long"),
            )
        ),
    )
    upper = (
        F.col(left_ts) <= F.col(right_end)
        if end_inclusive
        else F.col(left_ts) < F.col(right_end)
    )
    return (
        lb.join(rb, on + [_B])
        .filter((F.col(left_ts) >= F.col(right_start)) & upper)
        .drop(_B)
    )
