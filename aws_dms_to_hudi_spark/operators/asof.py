"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

For every left row, attach values from the single right row with the
largest ``right_ts <= left_ts`` (direction ``"backward"``, the default)
or smallest ``right_ts >= left_ts`` (``"forward"``), within the same
join key. This is ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``
semantics, required for point-in-time-correct feature joins in
training-data pipelines (features as-of label time, no leakage).

Why not a range join: ``left.ts >= right.ts`` + argmax per left row is
an inequality join — Catalyst can only nest-loop it (O(n·m) per key),
which detonates at scale. Instead we express it as::

    union(right-tagged, left-tagged)
      → window last(value, ignorenulls) over
          (partition by key order by (ts, tag) rows unbounded preceding..current)
      → filter tag = left

One shuffle on the join key, linear work per partition, no broadcast and
no cartesian region — the plan scales to arbitrarily large tables on
both sides. Tag ordering (right rows sort before left rows at equal ts)
pins the inclusive tie rule ``right_ts <= left_ts`` deterministically.

The reference's SQL surface imports joins generally (SURVEY.md §2.3,
``handler.py:115-116`` transformer SQL); as-of is the §7 extension
variant for event-time alignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    carry: dict[str, str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``carry`` columns from its
    matching right row (NULL when no right row qualifies).

    Args:
        on: equi-join key columns (present in both sides).
        left_ts / right_ts: event-time columns.
        carry: mapping output-name -> right column. Output names must not
            collide with left's columns. Defaults to carrying the matched
            right timestamp as ``"matched_ts"``.
        direction: ``"backward"`` (right_ts <= left_ts, take latest) or
            ``"forward"`` (right_ts >= left_ts, take earliest).
        tolerance_seconds: if set, matches farther than this from the
            left timestamp are nulled out (pandas ``tolerance=``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carry = dict(carry or {"matched_ts": right_ts})
    collisions = set(carry) & set(left.columns)
    if collisions:
        raise ValueError(f"carry names collide with left columns: {sorted(collisions)}")

    out_cols = list(left.columns) + list(carry)
    # a right row with NULL event time can't be "as of" anything, but its
    # carried values would survive last(ignorenulls) — drop them up front
    right = right.filter(F.col(right_ts).isNotNull())
    # Right rows tag 0, left rows tag 1; at equal ts the right row sorts
    # first (backward) / last (forward), making the bound inclusive.
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.col(src).alias(dst) for dst, src in carry.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[src].dataType).alias(dst)
          for dst, src in carry.items()],
    )
    u = l.unionByName(r.select(*l.columns))

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched: dict[str, Column] = {
        dst: F.last(F.col(dst), ignorenulls=True).over(w) for dst in carry
    }
    matched_ts = F.last(
        F.when(F.col(_TAG) == 0, F.col(_TS)), ignorenulls=True
    ).over(w)

    out = u.select(
        *[c for c in u.columns if c not in carry],
        *[matched[dst].alias(dst) for dst in carry],
        matched_ts.alias("__asof_matched_ts"),
    ).filter(F.col(_TAG) == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(_TS).cast("double") - F.col("__asof_matched_ts").cast("double")
        )
        keep = gap <= F.lit(float(tolerance_seconds))
        out = out.select(
            *[c for c in out.columns if c not in carry and c != "__asof_matched_ts"],
            *[F.when(keep, F.col(dst)).alias(dst) for dst in carry],
        )
    return out.select(*out_cols)
