"""Skew mitigation utilities: salting for joins and aggregations.

At 100 TB a handful of hot keys (one mega-customer, one default enum
value) can put an entire shuffle partition on one executor. AQE's skew
handling (``spark.sql.adaptive.skewJoin.enabled``, on by default in
:mod:`..session`) splits oversized partitions at runtime for sort-merge
joins; these helpers cover the cases AQE does not:

- :func:`salted_join` — equi-join where the build side is too big to
  broadcast and one probe-side key dominates: the probe side gets a
  random salt in [0, n), the build side is replicated n× (one copy per
  salt), and the join key becomes (key, salt) — the hot key's rows
  spread over n partitions at the cost of an n× build-side blowup, so
  keep the build side small relative to n.
- :func:`two_stage_aggregate` — groupBy where even map-side partial
  aggregation leaves one reducer hot (e.g. high-cardinality DISTINCT
  payloads under one key): aggregate first on (key, salt), then merge
  the partials per key. For plain algebraic aggs (sum/count/min/max)
  Spark's own partial aggregation already does this; the two-stage form
  is for when stage 1 must shrink data that partials can't (collects,
  distincts) — and it is also the portable recipe when AQE is off.

Salts are deterministic per row (hash of a per-row id), so retries and
replays place rows identically — important for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _with_salt(df: DataFrame, num_salts: int) -> DataFrame:
    # monotonically_increasing_id is stable within a deterministic plan:
    # (partition id << 33) + row position — no RNG, replay-safe.
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts)).cast(
            "int"
        ),
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    Correctness: every probe row carries exactly one salt s, and the
    build side contains one copy per salt, so each (key, salt) pair
    matches exactly the rows key alone would have matched — the result
    multiset is identical to ``probe.join(build, on, how)``.

    The join is pinned to SHUFFLE_HASH: salting exists precisely for
    the build-side-too-big-to-broadcast regime, but after replication
    the CBO can still ESTIMATE the build side under the broadcast
    threshold and collect all num_salts copies to the driver — a
    single-threaded hash build of the blown-up relation (measured
    5.2x at the 10x probe, where a 12M-row replicated side was being
    broadcast). Shuffle-hash distributes the build by (key, salt) —
    the layout the salt was introduced to create — and skips
    sort-merge's sort of both sides.
    """
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    salted_probe = _with_salt(probe, num_salts)
    replicated_build = build.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    ).hint("shuffle_hash")
    return salted_probe.join(
        replicated_build, [*on, SALT_COL], how
    ).drop(SALT_COL)


def profile_salt_factor(
    df: DataFrame,
    on: list[str],
    max_salts: int = 64,
    sample_fraction: float | None = None,
) -> int:
    """Derive the salt count from the MEASURED key distribution instead
    of a constant (the q89 skew-profiler feeding the salted join).

    The hot key's excess over a fair shuffle share is exactly how many
    partitions its rows must spread across::

        num_salts = ceil(max_key_count / (total_rows / shuffle_partitions))

    clamped to [1, max_salts]. 1 means no key exceeds a fair share — the
    caller should use a plain join (AQE handles mild residual skew).

    Cost: one map-side-combinable aggregate over ``df`` (the same shape
    as q89's profiler); pass ``sample_fraction`` to profile a uniform
    sample at very large inputs — the estimate only steers partition
    spread, never correctness.
    """
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    row = (
        df.groupBy(*on).agg(F.count("*").alias("__c"))
        .agg(F.max("__c").alias("mx"), F.sum("__c").alias("tot"))
        .first()
    )
    if row is None or not row["tot"]:
        return 1
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    fair = max(1.0, float(row["tot"]) / max(1, parts))
    import math

    return max(1, min(max_salts, math.ceil(float(row["mx"]) / fair)))


def auto_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    max_salts: int = 64,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, int]:
    """Measure, then salt only as much as the data demands: profile the
    probe side's key distribution, pick the salt factor, and emit either
    the plain join (factor 1 — no replication cost) or the salted join.
    Returns ``(joined, num_salts)`` so callers/tests can see the chosen
    factor."""
    n = profile_salt_factor(
        probe, on, max_salts=max_salts, sample_fraction=sample_fraction
    )
    if n <= 1:
        return probe.join(build, on, how), 1
    return salted_join(probe, build, on, num_salts=n, how=how), n


def two_stage_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    num_salts: int = 16,
) -> DataFrame:
    """groupBy(keys) in two shuffles: (keys, salt) → partials, then keys
    → merged finals. ``partial_aggs`` run per (key, salt); ``final_aggs``
    merge the stage-1 columns (reference them by their stage-1 aliases).

    Example — skew-safe count + distinct-count::

        two_stage_aggregate(
            df, ["k"],
            partial_aggs=[F.count("*").alias("c"),
                          F.collect_set("u").alias("us")],
            final_aggs=[F.sum("c").cast("long").alias("n"),
                        F.size(F.array_distinct(F.flatten(
                            F.collect_list("us")))).alias("n_distinct")],
        )
    """
    staged = (
        _with_salt(df, num_salts)
        .groupBy(*keys, SALT_COL)
        .agg(*partial_aggs)
    )
    return staged.groupBy(*keys).agg(*final_aggs)
