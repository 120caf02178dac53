"""Salting utilities: result-equivalence with the unsalted plan on a
deliberately skewed dataset (90% of rows share one key)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.operators.skew import (
    SALT_COL,
    salted_join,
    two_stage_aggregate,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds ~90% of 20k rows; keys 1..9 share the rest
    return spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 9) + 1).alias("k"),
        (F.col("id") % 997).alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"]).groupBy("k", "name").count()
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }
    assert SALT_COL not in salted_join(skewed, dim, ["k"]).columns


def test_salted_left_join_keeps_unmatched(spark, dim):
    probe = spark.range(5).select((F.col("id") + 8).alias("k"))  # 8..12; 10..12 unmatched
    out = salted_join(probe, dim, ["k"], how="left").collect()
    assert len(out) == 5
    assert sum(1 for r in out if r.name is None) == 3


def test_two_stage_aggregate_matches_direct(skewed):
    direct = {
        (r.k): (r.n, r.sv)
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").cast("long").alias("sv"))
        .collect()
    }
    staged = {
        (r.k): (r.n, r.sv)
        for r in two_stage_aggregate(
            skewed,
            ["k"],
            partial_aggs=[
                F.count("*").alias("c"),
                F.sum("v").cast("long").alias("s"),
            ],
            final_aggs=[
                F.sum("c").cast("long").alias("n"),
                F.sum("s").cast("long").alias("sv"),
            ],
        ).collect()
    }
    assert staged == direct


def test_salt_spreads_hot_key(skewed):
    """The hot key's rows must land in >1 salt bucket (the whole point)."""
    from aws_dms_to_hudi_spark.operators.skew import _with_salt

    buckets = (
        _with_salt(skewed.filter(F.col("k") == 0), 16)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert buckets > 4


def test_profile_salt_factor_tracks_skew(spark, skewed):
    from aws_dms_to_hudi_spark.operators.skew import profile_salt_factor

    # 90% of 20k rows on one key, 8 shuffle partitions (conftest):
    # hot key ≈ 18k rows vs fair share 2.5k -> factor ≈ 8
    hot = profile_salt_factor(skewed, ["k"])
    assert hot > 1

    uniform = spark.range(20_000).select((F.col("id") % 1000).alias("k"))
    assert profile_salt_factor(uniform, ["k"]) == 1

    # more skew -> bigger factor (monotone in the measured distribution)
    extreme = spark.range(20_000).select(F.lit(0).alias("k"))
    assert profile_salt_factor(extreme, ["k"]) >= hot


def test_auto_salted_join_plans_by_distribution(spark, skewed, dim):
    from aws_dms_to_hudi_spark.operators.skew import auto_salted_join

    joined, n = auto_salted_join(skewed, dim, ["k"])
    assert n > 1  # measured skew -> salted
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    via_auto = joined.groupBy("k", "name").count()
    assert {tuple(r) for r in via_auto.collect()} == {
        tuple(r) for r in plain.collect()
    }

    uniform = spark.range(1000).select((F.col("id") % 500).alias("k"))
    joined_u, n_u = auto_salted_join(uniform, dim, ["k"])
    assert n_u == 1  # uniform keys -> plain join, no replication
    assert "Generate" not in joined_u._jdf.queryExecution().executedPlan().toString()
