"""Unit tests for Bloom-filter semi-join reduction (functions/bloom.py)."""

from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.functions import bloom


def test_no_false_negatives(spark):
    """Every true match must pass the prefilter — a Bloom filter can
    only over-admit, never drop a member."""
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    small = spark.range(0, 5000, 7).withColumnRenamed("id", "sk")
    bf = bloom.build_bloom(small, "sk")
    passed = {
        r["k"] for r in bloom.bloom_prefilter(big, "k", bf).collect()
    }
    members = set(range(0, 5000, 7))
    assert members <= passed


def test_prefilter_rejects_most_non_members(spark):
    """With m=2^16 bits and ~715 keys, the FP rate is far below 1% —
    the prefilter must reject the overwhelming majority of the 4285
    non-members (this is the shuffle-volume reduction being bought)."""
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    small = spark.range(0, 5000, 7).withColumnRenamed("id", "sk")
    bf = bloom.build_bloom(small, "sk")
    passed = bloom.bloom_prefilter(big, "k", bf).count()
    n_members = len(range(0, 5000, 7))
    false_positives = passed - n_members
    assert false_positives <= 0.02 * (5000 - n_members)


def test_semi_join_equals_plain_semi_join(spark):
    """End to end: the bloom-reduced semi join returns exactly the
    plain semi join's rows (false positives removed by the exact
    stage), including under duplicate big-side keys."""
    big = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 1000, 13).withColumnRenamed("id", "sk")
    got = bloom.bloom_semi_join(big, small, "k", "sk")
    want = big.join(small, big["k"] == small["sk"], "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bitmap_is_bounded(spark):
    """The bitmap relation never exceeds m_bits/64 rows — that bound is
    what makes it broadcastable regardless of |small|."""
    small = spark.range(0, 100_000).withColumnRenamed("id", "sk")
    m_bits = 1 << 12
    bf = bloom.build_bloom(small, "sk", m_bits=m_bits)
    assert bf.count() <= m_bits // 64


def test_prefilter_plan_is_broadcast_only(spark):
    """The probe joins must all plan as broadcast hash joins — the big
    side is never shuffled by the prefilter (that is the point of the
    reduction)."""
    big = spark.range(0, 10_000).withColumnRenamed("id", "k")
    small = spark.range(0, 10_000, 11).withColumnRenamed("id", "sk")
    bf = bloom.build_bloom(small, "sk")
    plan = bloom.bloom_prefilter(big, "k", bf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no Exchange on the big-side lineage: the only exchanges allowed
    # are the bitmap build's tiny aggregation + broadcasts
    assert "ShuffledHashJoin" not in plan
