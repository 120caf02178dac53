"""Incremental maintenance of derived aggregates from commit changelogs.

The reference's pipelines end at the curated Hudi table; everything
downstream (marts, feature tables, report aggregates) is someone's
``GROUP BY`` over it. Rebuilding those aggregates from scratch every
2-hour sync round is the classic O(table) anti-pattern — at 100 TB the
derived job must cost O(changes), like the ingest itself
(SURVEY.md §3.2; reference cadence `templates/aws-dms-to-hudi.yaml:76`).

:func:`maintain_group_agg` advances a per-group aggregate state across a
commit range using the *recompute-affected-groups* strategy (the
standard incremental-view-maintenance fallback when the changelog
carries new row images only, no retractions — exactly what a
DMS-shaped upsert stream provides):

1. ``changed`` — the keys touched in ``(from_version, to_version]``,
   from per-commit changelogs (O(changes), never the table);
2. ``affected`` — the union of those keys' NEW group values (from the
   changelog) and their OLD group values (point-lookup join against the
   pre-state snapshot — a key can move between groups on update);
3. recompute the aggregate for affected groups only, from the current
   snapshot filtered to those groups;
4. splice: keep every unaffected group's row from the old state, insert
   the recomputed rows.

Scale notes (100 TB):

- steps 1-2 are sized to the batch; the two snapshot touches (old group
  lookup, affected-group re-aggregation) are key-/group-pruned scans —
  with the table bucketed on the record key and/or partitioned on the
  group column these prune to the touched files, and both joins
  broadcast the (small) changed-key / affected-group sides;
- the state itself is a tiny table (one row per group) that an engine
  would persist as its own CuratedTable and upsert into — splice here
  IS that upsert, expressed relationally so the whole round stays one
  declarative plan.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

    from ..storage import CuratedTable


def group_agg(
    snapshot: "DataFrame", group_col: str, aggs: dict[str, "Column"]
) -> "DataFrame":
    """The full-recompute aggregate (also the initial state and the
    correctness oracle for the incremental path)."""
    return snapshot.groupBy(group_col).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def maintain_group_agg(
    table: "CuratedTable",
    state: "DataFrame",
    group_col: str,
    aggs: dict[str, "Column"],
    from_version: int,
    to_version: int | None = None,
) -> "DataFrame":
    """Advance ``state`` (the group aggregate as of ``from_version``) to
    ``to_version`` reading only changelogs + pruned snapshot lookups.

    ``aggs`` maps output column name -> aggregate Column over the table's
    rows (e.g. ``{"n": F.count("*")}``). Deleted keys leave their group
    via the affected-group recompute; a group whose last row disappears
    drops out of the state entirely (matching the full recompute).
    """
    keys = list(table.config.record_key)
    changed = table.read_incremental(
        begin_version=from_version, end_version=to_version, drop_deleted=False
    )
    if changed is None:  # empty round: nothing to do
        return state

    changed_keys = changed.select(*keys).distinct()
    new_groups = (
        changed.filter(~F.col("_hoodie_is_deleted"))
        .select(group_col)
        .distinct()
    )
    pre = table.read(version=from_version)
    old_groups = (
        pre.join(F.broadcast(changed_keys), on=keys, how="left_semi")
        .select(group_col)
        .distinct()
    )
    affected = new_groups.unionByName(old_groups).distinct()

    current = table.read(version=to_version)
    fresh = group_agg(
        current.join(F.broadcast(affected), on=group_col, how="left_semi"),
        group_col,
        aggs,
    )
    kept = state.join(F.broadcast(affected), on=group_col, how="left_anti")
    return kept.unionByName(fresh)


def state_diff(
    old: "DataFrame",
    new: "DataFrame",
    group_col: str,
    value_cols: list[str],
) -> "DataFrame":
    """Change feed between two aggregate states: one row per group whose
    aggregate changed, tagged insert/update/delete with old and new
    values — what a maintained mart PUBLISHES downstream so consumers
    can themselves be incremental (change-data-feed for derived tables).

    One full-outer join on the group key; at scale both sides are the
    (small) aggregate states, not base data."""
    o = old.select(
        F.col(group_col).alias("__og"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
    )
    n = new.select(
        F.col(group_col).alias("__ng"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
    )
    j = o.join(n, o["__og"] == n["__ng"], "full_outer")
    changed = (
        F.col("__og").isNull()
        | F.col("__ng").isNull()
        | functools_reduce_or(
            [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
             for c in value_cols]
        )
    )
    return (
        j.filter(changed)
        .select(
            F.coalesce(F.col("__og"), F.col("__ng")).alias(group_col),
            F.when(F.col("__og").isNull(), F.lit("insert"))
            .when(F.col("__ng").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            *[F.col(f"old_{c}") for c in value_cols],
            *[F.col(f"new_{c}") for c in value_cols],
        )
        .orderBy(group_col)
    )


def functools_reduce_or(cols: list["Column"]) -> "Column":
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out
