"""Unit tests for deterministic hash-split sampling (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.functions import sampling


def test_split_is_deterministic_and_total(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = sampling.assign_split(df, "doc_id")
    b = sampling.assign_split(df, "doc_id")
    assert a.exceptAll(b).count() == 0
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # hash-mod is approximately proportional
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]
    assert 0.70 < counts["train"] / 2000 < 0.90


def test_custom_fractions(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = sampling.assign_split(df, "doc_id", (("a", 50), ("b", 50)))
    assert {r["split"] for r in out.select("split").distinct().collect()} == {
        "a",
        "b",
    }


def test_fractions_must_sum_to_buckets():
    with pytest.raises(ValueError, match="sum"):
        sampling.split_expr("doc_id", "spark", (("a", 50), ("b", 40)))


def test_no_shuffle_in_assignment(spark):
    """Assignment is per-row compute only — it must fuse into the scan."""
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        sampling.assign_split(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_stratified_sample_rate_and_determinism(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    s1 = sampling.stratified_sample(df, "doc_id", 20)
    s2 = sampling.stratified_sample(df, "doc_id", 20)
    assert s1.exceptAll(s2).count() == 0
    n = s1.count()
    assert 0.15 < n / 5000 < 0.25
    # pct=100 keeps everything, pct=0 keeps nothing
    assert sampling.stratified_sample(df, "doc_id", 100).count() == 5000
    assert sampling.stratified_sample(df, "doc_id", 0).count() == 0


def test_stratified_pct_bounds():
    with pytest.raises(ValueError, match="pct"):
        sampling.stratified_keep_expr("doc_id", 101, "spark")


# ---------------------------------------------------------------------------
# per-domain quota (domain_cap)
# ---------------------------------------------------------------------------


def test_domain_cap_matches_single_window(spark):
    """The salted two-phase rank must return exactly the single-window
    keep-set (same rows the oracle SQL selects)."""
    from pyspark.sql import Window

    df = spark.range(3000).select(
        F.concat(F.lit("dom"), (F.col("id") % 7)).alias("source"),
        F.col("id").alias("doc_id"),
    )
    got = sampling.domain_cap(df, cap=10)
    h = F.expr(
        sampling.P.rolling_hash("CAST(doc_id AS STRING)", "spark")
    )
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(F.col("source").alias("domain"), "doc_id")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_domain_cap_layout_independent(spark):
    """Same keep-set on any partitioning of the input."""
    df = spark.range(1000).select(
        F.concat(F.lit("d"), (F.col("id") % 3)).alias("source"),
        F.col("id").alias("doc_id"),
    )
    a = sampling.domain_cap(df.repartition(1), cap=5).collect()
    b = sampling.domain_cap(df.repartition(17, "doc_id"), cap=5).collect()
    assert a == b


def test_domain_cap_small_domains_kept_whole(spark):
    """A domain with fewer than cap docs keeps every doc."""
    df = spark.createDataFrame(
        [("tiny", i) for i in range(3)] + [("big", 100 + i) for i in range(50)],
        ["source", "doc_id"],
    )
    out = sampling.domain_cap(df, cap=10)
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"tiny": 3, "big": 10}


import pytest


@pytest.fixture(scope="module")
def docs_view(spark, sf_correct):
    spark.read.parquet(
        f"{sf_correct}/documents.parquet"
    ).createOrReplaceTempView("qs_documents")
    return "qs_documents"


def test_exact_quota_sample_sums_to_target(spark, docs_view):
    """Largest-remainder apportionment: per-stratum allocations sum
    EXACTLY to floor(N * 20%), every allocation is filled, and the
    sample is deterministic across runs."""
    from aws_dms_to_hudi_spark.functions.sampling import (
        exact_quota_sample_sql,
    )

    sql = exact_quota_sample_sql("spark", table=docs_view)
    rows = spark.sql(sql).collect()
    n_total = sum(r["n_total"] for r in rows)
    assert sum(r["allocation"] for r in rows) == n_total * 2 // 10
    for r in rows:
        assert r["n_sampled"] == r["allocation"]
    again = spark.sql(sql).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
