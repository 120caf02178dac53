"""Slowly-changing-dimension (type 2) build from a CDC change log.

Beyond-reference extension of the merge family (SURVEY.md §2.1 D4-D6):
where the upsert merge (``operators/merge.py``) keeps only each key's
LATEST version, SCD2 keeps the full version history with validity
intervals — the standard shape for dimension tables and for
point-in-time training-data joins (every ``asof_join`` probe against a
dimension is answerable from its SCD2 form).

Semantics, derived from the same CDC envelope the merge uses
(``trx_seq`` string change-sequence, ``_hoodie_is_deleted`` flag —
reference pins yaml:490-522):

- every change row becomes a version row, valid from its own ``trx_seq``
  until the key's next change (``lead`` over the per-key sequence);
- the newest version of a key is *current* iff it is not a delete —
  a delete closes the key's history without opening a new interval.

Scale notes (100 TB): one window shuffle on the key — identical cost
shape to the precombine the merge already does; no join, no self-join.
History tables grow without bound by design; pair with the partition
layout (valid_from date) so time-range scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    changes: DataFrame,
    keys: list[str],
    ordering: str = "trx_seq",
    deleted_flag: str = "_hoodie_is_deleted",
) -> DataFrame:
    """Expand a change log into versioned history rows.

    Adds ``valid_from_seq`` / ``valid_to_seq`` (the ordering value of
    this change and of the key's next change; open interval = NULL) and
    ``is_current`` (newest version and not a delete).
    """
    w = Window.partitionBy(*keys).orderBy(ordering)
    return (
        changes.withColumn("valid_from_seq", F.col(ordering))
        .withColumn("valid_to_seq", F.lead(ordering).over(w))
        .withColumn(
            "is_current",
            F.col("valid_to_seq").isNull() & ~F.col(deleted_flag),
        )
    )


def scd2_oracle_sql(stream_sql: str, keys: list[str], ordering: str = "trx_seq") -> str:
    """DuckDB oracle: the same lead-window expansion over the same
    change-log SQL."""
    kcsv = ", ".join(keys)
    return (
        f"SELECT *, {ordering} AS valid_from_seq, "
        f"LEAD({ordering}) OVER w AS valid_to_seq, "
        f"(LEAD({ordering}) OVER w IS NULL AND NOT _hoodie_is_deleted) "
        "  AS is_current "
        f"FROM ({stream_sql}) "
        f"WINDOW w AS (PARTITION BY {kcsv} ORDER BY {ordering})"
    )
