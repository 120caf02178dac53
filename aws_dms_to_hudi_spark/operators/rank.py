"""Scale-safe global ordering: two-pass range-partitioned row numbers.

A global ``row_number()/ntile()/percent_rank()`` over an unpartitioned
window forces Spark to move every row to ONE partition (`WindowExec`
warns, and at 100 TB the job simply dies). The classic distributed fix —
what TeraSort and Spark's own ``sortWithinPartitions`` pipeline do — is:

1. **Sketch pass**: compute equi-depth cut points of the leading sort
   column with ``percentile_approx`` (one map-side-combinable aggregate).
2. **Bucket**: assign each row a range-bucket id with a pure expression
   (count of cut points strictly below the value) — monotone in the sort
   key, ties share a bucket, so cross-bucket order == global order.
3. **Count pass**: per-bucket counts -> prefix-sum offsets (a tiny
   aggregate collected to the driver; bucket count is O(100), not O(rows)).
4. **Rank pass**: ``row_number() OVER (PARTITION BY bucket ORDER BY ...)``
   + the broadcast offset — every window partition is one bucket, sorted
   in parallel.

The result is the exact global ``row_number`` (dense, 1-based) over
``order_cols``; downstream, ``ntile / percent_rank / cume_dist`` are pure
arithmetic on (row_number, total_count) when the sort key is unique.

The reference delegates all SQL to Spark via Hudi's read surface, so
there is no reference counterpart file; this operator exists to keep the
inherited SQL family (SURVEY §2.3, window functions) scale-clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Below this measured row count the two-pass machinery's extra driver
# actions (sketch job + offsets job) cost more than they save: a single
# task sorts a few million narrow rows comfortably, so the operators
# take the plain-window path — SAME exact output, one job. This is the
# AQE philosophy applied to the operator: plan from the measured size,
# keep the scale path for when it matters. The count that drives the
# choice is itself the cheapest possible job (aggregates to one row)
# and replaces the count/offset pass of the two-pass form.
RANK_SMALL_INPUT = 2_000_000


def _bucket_expr(col: Column, cuts: list[float]) -> Column:
    """#{c in cuts : value > c} — monotone, ties share a bucket; NULLs
    (which sort first) pin to bucket 0.

    Emitted as a nested CASE chain (first ascending cut ≥ value, which
    equals the count of cuts strictly below even with duplicate cuts)
    rather than an array fold: ``F.aggregate`` is a higher-order
    lambda interpreted per element outside whole-stage codegen, and at
    64 buckets it cost more than the window it was feeding."""
    if not cuts:
        return F.lit(0)
    b: Column = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        b = F.when(col <= F.lit(float(cuts[i])), F.lit(i)).otherwise(b)
    return F.when(col.isNull(), F.lit(0)).otherwise(b)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "__rn",
    num_buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Append the exact global 1-based ``row_number`` over ``order_cols``
    (first column must be numeric; NULLS FIRST semantics) without ever
    forming a single-partition window.

    If ``total_col`` is given, the total row count is appended as a
    literal column too (it falls out of the count pass for free, saving
    callers a separate COUNT(*) job).

    The input is materialized before the size-probe count: both
    branches re-read it at least twice more (window, or sketch +
    offsets + window), and callers pass derived relations that would
    otherwise recompute per action — exactly the at-scale regime this
    operator exists for.
    """
    from ..functions.dedup import materialize

    df = materialize(df)
    total = df.count()
    if total <= RANK_SMALL_INPUT:
        w = Window.orderBy(
            *[F.col(c).asc_nulls_first() for c in order_cols]
        )
        out = df.withColumn(out_col, F.row_number().over(w).cast("long"))
        if total_col is not None:
            out = out.withColumn(total_col, F.lit(total).cast("long"))
        return out
    c1 = F.col(order_cols[0])
    qs = [i / num_buckets for i in range(1, num_buckets)]
    # accuracy only shapes bucket BALANCE, never correctness of the rank,
    # so a cheap sketch suffices.
    cuts_row = df.select(
        F.percentile_approx(c1, qs, 1_000).alias("cuts")
    ).first()
    cuts = [c for c in (cuts_row["cuts"] or []) if c is not None]

    b = df.withColumn("__gb", _bucket_expr(c1, cuts))
    counts = {r["__gb"]: r["cnt"] for r in
              b.groupBy("__gb").agg(F.count("*").alias("cnt")).collect()}
    # the probe count and the bucket-count sum agree by construction;
    # keep the already-paid probe total rather than re-deriving it
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]

    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = Window.partitionBy("__gb").orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    )
    out = b.withColumn(
        out_col,
        (F.coalesce(off[F.col("__gb")], F.lit(0)).cast("long")
         + F.row_number().over(w)),
    ).drop("__gb")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "__rsum",
    num_buckets: int = 64,
) -> DataFrame:
    """Single-column form of :func:`global_running_sums` (kept for the
    existing call sites)."""
    return global_running_sums(
        df, order_col, [value_col], [out_col], num_buckets
    )


def global_running_sums(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    out_cols: list[str],
    num_buckets: int = 64,
) -> DataFrame:
    """Append the exact global running (inclusive-prefix) sums of EVERY
    ``value_cols`` entry ordered by ``order_col`` — same two-pass range
    partitioning as :func:`global_row_number`, so no single-partition
    window ever forms. ``order_col`` must be numeric and UNIQUE per row
    (pre-aggregate ties first: with duplicate keys the within-tie
    prefix order would be layout-dependent).

    All columns share ONE sketch, ONE per-bucket aggregate (collected —
    O(buckets) rows), and ONE per-bucket window pass: k prefix sums
    cost the same two map-reduce passes as one (the q232 KS statistic
    needs both ECDFs and pays a single traversal). The input is
    materialized first: three actions read it (sketch, offsets, final
    window), and callers pass derived relations (unions, aggregates)
    that would otherwise be recomputed per action."""
    from ..functions.dedup import materialize

    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must align")
    df = materialize(df)
    c1 = F.col(order_col)
    if df.count() <= RANK_SMALL_INPUT:
        w = (Window.orderBy(c1.asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        for v, out_col in zip(value_cols, out_cols):
            df = df.withColumn(out_col, F.sum(v).over(w).cast("long"))
        return df
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts_row = df.select(
        F.percentile_approx(c1, qs, 1_000).alias("cuts")
    ).first()
    cuts = [c for c in (cuts_row["cuts"] or []) if c is not None]

    b = df.withColumn("__gb", _bucket_expr(c1, cuts))
    bucket_rows = b.groupBy("__gb").agg(
        *[F.sum(v).alias(f"__s_{i}") for i, v in enumerate(value_cols)]
    ).collect()
    sums = {r["__gb"]: [r[f"__s_{i}"] for i in range(len(value_cols))]
            for r in bucket_rows}
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(value_cols)
    for k in sorted(sums):
        offsets[k] = list(acc)
        for i, s in enumerate(sums[k]):
            acc[i] += s or 0

    w = (
        Window.partitionBy("__gb")
        .orderBy(c1.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i, (v, out_col) in enumerate(zip(value_cols, out_cols)):
        off = F.create_map(
            *[F.lit(x) for k, vals in offsets.items() for x in (k, vals[i])]
        ) if offsets else F.create_map()
        b = b.withColumn(
            out_col,
            (F.coalesce(off[F.col("__gb")], F.lit(0)).cast("long")
             + F.sum(v).over(w).cast("long")),
        )
    return b.drop("__gb")


def ntile_from_rn(rn: Column, total: Column, k: int) -> Column:
    """Exact ``ntile(k)`` from a unique-key global row_number: the first
    ``total % k`` tiles take ``total div k + 1`` rows, the rest take
    ``total div k`` (Spark/DuckDB/ANSI semantics)."""
    big = F.floor(total / k) + 1  # rows per tile in the first `rem` tiles
    rem = total % k
    cutoff = rem * big  # rows covered by the bigger tiles
    small = F.floor(total / k)
    return (
        F.when(rn <= cutoff, F.floor((rn - 1) / big) + 1)
        .otherwise(
            rem + F.when(
                small > 0, F.floor((rn - cutoff - 1) / small) + 1
            ).otherwise(F.lit(1))
        )
        .cast("long")
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "__rn",
    num_buckets: int = 64,
    group_total_col: str | None = None,
) -> DataFrame:
    """Per-group exact 1-based row_number over ``order_cols`` without a
    per-group single-task window — the grouped form of
    :func:`global_row_number`, for LOW-cardinality groups whose members
    don't fit one task (a plain ``PARTITION BY group`` window puts each
    whole group in one partition; with 5 sources over 100 TB that's 5
    tasks). Buckets on the first order column exactly like the global
    form; the window partitions by (group, bucket) and per-(group,
    bucket) offsets are collected driver-side — ``|groups| ×
    num_buckets`` rows, bounded by construction.

    ``group_total_col`` appends each group's total row count (falls out
    of the offset pass for free). Materialized before the size probe
    for the same reason as :func:`global_row_number`."""
    from ..functions.dedup import materialize

    df = materialize(df)
    if df.count() <= RANK_SMALL_INPUT:
        w = Window.partitionBy(*group_cols).orderBy(
            *[F.col(c).asc_nulls_first() for c in order_cols]
        )
        out = df.withColumn(
            out_col, F.row_number().over(w).cast("long"))
        if group_total_col is not None:
            out = out.withColumn(
                group_total_col,
                F.count(F.lit(1)).over(
                    Window.partitionBy(*group_cols)).cast("long"),
            )
        return out
    c1 = F.col(order_cols[0])
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts_row = df.select(
        F.percentile_approx(c1, qs, 1_000).alias("cuts")
    ).first()
    cuts = [c for c in (cuts_row["cuts"] or []) if c is not None]

    b = df.withColumn("__gb", _bucket_expr(c1, cuts))
    rows = (
        b.groupBy(*group_cols, "__gb").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[tuple, int] = {}
    totals: dict[tuple, int] = {}
    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault(tuple(r[g] for g in group_cols), []).append(r)
    for gkey, rs in by_group.items():
        acc = 0
        for r in sorted(rs, key=lambda x: x["__gb"]):
            offsets[(*gkey, r["__gb"])] = acc
            acc += r["cnt"]
        totals[gkey] = acc

    # flat create_map lookups on a composite string key (a nested WHEN
    # chain at |groups|·num_buckets arms overflows the converter stack)
    def _key_col(cols: list) -> "F.Column":
        return F.concat_ws(
            # coalesce: concat_ws SKIPS null columns (positional shift)
            "", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                      for c in cols]
        )

    def _key_str(vals: tuple) -> str:
        return "".join("" if v is None else str(v) for v in vals)

    def _lookup(mapping: dict, cols: list) -> "F.Column":
        if not mapping:
            return F.lit(0).cast("long")
        m = F.create_map(
            *[F.lit(x) for k, v in mapping.items()
              for x in (_key_str(k), v)]
        )
        return F.coalesce(m[_key_col(cols)], F.lit(0)).cast("long")

    w = Window.partitionBy(*group_cols, "__gb").orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    )
    out = b.withColumn(
        out_col,
        _lookup(offsets, [*group_cols, "__gb"])
        + F.row_number().over(w).cast("long"),
    ).drop("__gb")
    if group_total_col is not None:
        out = out.withColumn(
            group_total_col, _lookup(totals, group_cols)
        )
    return out


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "__rmax",
    num_buckets: int = 64,
) -> DataFrame:
    """Append the exact global running (inclusive-prefix) MAX of
    ``value_col`` ordered by ``order_col`` — the prefix-max sibling of
    :func:`global_running_sum`, same two-pass range partitioning, no
    single-partition window. Per-bucket prefix = max of all EARLIER
    buckets' maxima (a bounded driver-side scan); within a bucket one
    ordered window takes over. ``order_col`` numeric and unique per
    row, ``value_col`` numeric (int64 here)."""
    from ..functions.dedup import materialize

    df = materialize(df)
    c1 = F.col(order_col)
    if df.count() <= RANK_SMALL_INPUT:
        w = (Window.orderBy(c1.asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return df.withColumn(
            out_col, F.max(value_col).over(w).cast("long"))
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts_row = df.select(
        F.percentile_approx(c1, qs, 1_000).alias("cuts")
    ).first()
    cuts = [c for c in (cuts_row["cuts"] or []) if c is not None]

    b = df.withColumn("__gb", _bucket_expr(c1, cuts))
    maxes = {r["__gb"]: r["m"] for r in
             b.groupBy("__gb").agg(F.max(value_col).alias("m")).collect()}
    prefix: dict[int, int | None] = {}
    run = None
    for k in sorted(maxes):
        prefix[k] = run
        if maxes[k] is not None and (run is None or maxes[k] > run):
            run = maxes[k]

    pre = F.create_map(
        *[F.lit(x) for k, v in prefix.items() if v is not None
          for x in (k, v)]
    ) if any(v is not None for v in prefix.values()) else None
    w = (
        Window.partitionBy("__gb")
        .orderBy(c1.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.max(value_col).over(w).cast("long")
    if pre is None:
        combined = local
    else:
        combined = F.greatest(
            local, F.coalesce(pre[F.col("__gb")].cast("long"), local)
        )
    return b.withColumn(out_col, combined).drop("__gb")


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    accuracy: int = 1_000,
) -> DataFrame:
    """EXACT interpolated percentiles per group — ``(group_cols..., p,
    value)`` — without ever buffering a group's value multiset.

    Spark's exact ``percentile()`` is an ObjectHashAggregate that
    collects every value of a group into one task's buffer: at 100 TB
    with a handful of groups that is an OOM, not a slow plan. The
    sketch-narrowed two-pass form instead:

    1. One map-side-combinable pass: per-group count + a GK sketch
       (``percentile_approx``) probed at p ± 2ε (ε = 1/accuracy — the
       sketch's rank-error bound, so the probed values' TRUE ranks
       bracket the target rank with margin to spare).
    2. The |groups|·|ps| target relation (positions, bracket values) is
       built driver-side — bounded by the operator's low-cardinality-
       groups contract, same as :func:`grouped_row_number`'s offsets —
       and broadcast back.
    3. One conditional-aggregate pass counts values strictly below each
       bracket floor; one filter pass keeps only the ~4εn values inside
       the bracket. Only that BAND is sorted (a per-(group, p) window
       over ≈ 0.4 % of the group at the default accuracy); band rank +
       below-count = exact global rank, and the floor/ceil ranks
       interpolate exactly as DuckDB's ``quantile_cont`` / Spark's
       ``percentile`` do: lower + frac·(upper − lower), in DOUBLE.

    At larger corpora raise ``accuracy`` with n (band size is ~4n/
    accuracy rows per target): the sketch pass stays one aggregate,
    and the sorted band stays task-sized by construction. NULL values
    are excluded, matching both engines' percentile semantics.

    Size-gated like :func:`global_row_number`: at or under
    ``RANK_SMALL_INPUT`` total rows the buffered ``percentile()`` is
    ONE job and its group buffers are task-sized — the sketch path's
    four sequential jobs cost more than they save (measured 2.4 s vs
    1.7 s at sf0.1); above the gate the buffered form is the OOM and
    the sketch path is the plan.
    """
    import math

    if df.count() <= RANK_SMALL_INPUT:
        arr = ", ".join(repr(float(p)) for p in ps)
        pct = df.groupBy(*group_cols).agg(
            F.expr(
                f"percentile({value_col}, array({arr}))"
            ).alias("__pcts")
        )
        return pct.select(
            *group_cols,
            F.posexplode("__pcts").alias("__i", "value"),
        ).select(
            *group_cols,
            F.element_at(
                F.array(*[F.lit(float(p)) for p in ps]),
                F.col("__i") + 1,
            ).alias("p"),
            F.col("value").cast("double").alias("value"),
        )

    eps2 = 2.0 / accuracy
    probes: dict[float, tuple[float, float]] = {
        p: (max(0.0, p - eps2), min(1.0, p + eps2)) for p in ps
    }
    probe_qs = sorted({q for pair in probes.values() for q in pair})
    sk = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.col(value_col)).alias("__n"),
            F.percentile_approx(
                value_col, probe_qs, accuracy).alias("__cuts"),
        )
    )
    spark = df.sparkSession
    tgt_rows = []
    for r in sk.collect():  # bounded: one row per group
        n, cuts = r["__n"], r["__cuts"]
        for p in ps:
            pos = (n - 1) * p
            lo_q, hi_q = probes[p]
            tgt_rows.append(
                tuple(r[g] for g in group_cols)
                + (
                    float(p),
                    float(pos),
                    int(math.floor(pos)),
                    int(math.ceil(pos)),
                    float(cuts[probe_qs.index(lo_q)]),
                    float(cuts[probe_qs.index(hi_q)]),
                )
            )
    gschema = ", ".join(
        f"`{g}` {dict(df.dtypes)[g]}" for g in group_cols
    )
    tgt = spark.createDataFrame(
        tgt_rows,
        f"{gschema}, __p double, __pos double, __lo long, __hi long, "
        "__blo double, __bhi double",
    )
    v = F.col(value_col)
    joined = df.filter(v.isNotNull()).join(F.broadcast(tgt), group_cols)
    below = (
        joined.filter(v < F.col("__blo"))
        .groupBy(*group_cols, "__p")
        .agg(F.count("*").alias("__below"))
    )
    band = joined.filter((v >= F.col("__blo")) & (v <= F.col("__bhi")))
    w = Window.partitionBy(*group_cols, "__p").orderBy(v)
    ranked = (
        band.withColumn("__rn", F.row_number().over(w).cast("long"))
        .join(below, [*group_cols, "__p"], "left")
        .withColumn(
            "__idx",
            F.coalesce(F.col("__below"), F.lit(0)) + F.col("__rn") - 1,
        )
    )
    picked = (
        ranked.filter(
            (F.col("__idx") == F.col("__lo"))
            | (F.col("__idx") == F.col("__hi"))
        )
        .groupBy(*group_cols, "__p", "__pos", "__lo")
        .agg(
            F.max(
                F.when(F.col("__idx") == F.col("__lo"), v)
            ).alias("__vlo"),
            F.max(
                F.when(F.col("__idx") == F.col("__hi"), v)
            ).alias("__vhi"),
        )
    )
    return picked.select(
        *group_cols,
        F.col("__p").alias("p"),
        (
            F.col("__vlo")
            + (F.col("__pos") - F.col("__lo"))
            * (F.col("__vhi") - F.col("__vlo"))
        ).cast("double").alias("value"),
    )
