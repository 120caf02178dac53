"""Two-pass global rank (operators/rank.py) == the global window, without
ever forming a single-partition window."""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.operators import rank as R


@pytest.fixture(autouse=True)
def force_two_pass(monkeypatch):
    """The operators take a plain-window fast path under
    RANK_SMALL_INPUT rows (measured-size planning); these tests exist
    to pin the TWO-PASS machinery, so force it regardless of fixture
    size. test_small_input_fast_path covers the other branch."""
    monkeypatch.setattr(R, "RANK_SMALL_INPUT", 0)


def test_small_input_fast_path(spark, monkeypatch):
    """Default threshold: a small input takes the plain-window branch
    and must produce the identical rank relation."""
    monkeypatch.setattr(R, "RANK_SMALL_INPUT", 2_000_000)
    df = spark.range(500).select(
        (F.col("id") * 37 % 101).cast("double").alias("v"),
        F.col("id").alias("k"),
    )
    got = R.global_row_number(df, ["v", "k"], total_col="__n")
    ref = _ref(spark, df, ["v", "k"])
    assert sorted(map(tuple, got.select("v", "k", "__rn").collect())) == \
        sorted(map(tuple, ref.select("v", "k", "__rn").collect()))
    assert got.select("__n").first()[0] == 500
    gg = R.grouped_row_number(
        df.withColumn("g", F.col("k") % 3), ["g"], ["v", "k"],
        group_total_col="__gn")
    wref = Window.partitionBy("g").orderBy(
        F.col("v").asc_nulls_first(), F.col("k").asc_nulls_first())
    rr = (df.withColumn("g", F.col("k") % 3)
          .withColumn("__rn", F.row_number().over(wref)))
    assert sorted(map(tuple, gg.select("g", "k", "__rn").collect())) == \
        sorted(map(tuple, rr.select("g", "k", "__rn").collect()))


def _ref(spark, df, order_cols):
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w))


@pytest.mark.parametrize("n,buckets", [(1, 4), (7, 4), (1000, 16)])
def test_matches_global_window(spark, n, buckets):
    df = spark.range(n).select(
        (F.col("id") * 37 % 101).cast("double").alias("v"),
        F.col("id").alias("k"),
    )
    got = R.global_row_number(df, ["v", "k"], num_buckets=buckets)
    ref = _ref(spark, df, ["v", "k"])
    assert sorted(map(tuple, got.select("v", "k", "__rn").collect())) == \
        sorted(map(tuple, ref.select("v", "k", "__rn").collect()))


def test_nulls_first_and_total(spark):
    df = spark.createDataFrame(
        [Row(v=None, k=1), Row(v=2.0, k=2), Row(v=1.0, k=3), Row(v=None, k=0)]
    )
    got = R.global_row_number(df, ["v", "k"], total_col="__n")
    rows = {r["k"]: (r["__rn"], r["__n"]) for r in got.collect()}
    assert rows == {0: (1, 4), 1: (2, 4), 3: (3, 4), 2: (4, 4)}


@pytest.mark.parametrize("n,k", [(3, 10), (10, 10), (17, 4), (1000, 7)])
def test_ntile_formula(spark, n, k):
    df = spark.range(n).select(F.col("id").cast("double").alias("v"),
                               F.col("id").alias("kk"))
    ref = df.select(
        "kk", F.ntile(k).over(Window.orderBy("v", "kk")).alias("t")
    )
    got = R.global_row_number(df, ["v", "kk"], total_col="__n").select(
        "kk", R.ntile_from_rn(F.col("__rn"), F.col("__n"), k).alias("t")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_running_sum_matches_window(spark, parts):
    """Exact inclusive prefix sum on any partition layout — compared
    against the single-partition window reference."""
    import random

    rng = random.Random(7)
    rows = [Row(t=float(t), v=rng.randint(-5, 5))
            for t in rng.sample(range(10_000), 500)]
    df = spark.createDataFrame(rows).repartition(parts)
    ref = {
        r["t"]: r["s"]
        for r in df.select(
            "t",
            F.sum("v").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow)
            ).alias("s"),
        ).collect()
    }
    got = {r["t"]: r["__rsum"]
           for r in R.global_running_sum(df, "t", "v").collect()}
    assert got == ref


def test_grouped_row_number_matches_window(spark):
    """Grouped two-pass rank == the plain per-group window, including
    group totals, on a multi-group fixture with duplicate order keys."""
    from aws_dms_to_hudi_spark.operators.rank import grouped_row_number

    rows = [(g, v, i) for i, (g, v) in enumerate(
        [("a", 5), ("a", 1), ("a", 5), ("b", 2), ("b", 2), ("b", 9),
         ("b", 0), ("c", 7)]
    )]
    df = spark.createDataFrame(rows, "g string, v int, id int")
    out = grouped_row_number(
        df, ["g"], ["v", "id"], out_col="r",
        num_buckets=4, group_total_col="n",
    )
    got = {(r["g"], r["id"]): (r["r"], r["n"]) for r in out.collect()}
    import itertools
    want = {}
    for g, grp in itertools.groupby(
        sorted(rows, key=lambda x: (x[0], x[1], x[2])), key=lambda x: x[0]
    ):
        grp = list(grp)
        for i, (gg, v, rid) in enumerate(grp, 1):
            want[(gg, rid)] = (i, len(grp))
    assert got == want


def test_global_running_max_matches_window(spark):
    """Two-pass prefix max == the plain global window, including ties
    and a descending stretch."""
    from pyspark.sql import functions as F

    from aws_dms_to_hudi_spark.operators.rank import global_running_max

    vals = [9, 1, 5, 9, 2, 14, 3, 14, 0, 7]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    out = global_running_max(df, "k", "v", out_col="m", num_buckets=3)
    got = {r["k"]: r["m"] for r in out.collect()}
    run, want = None, {}
    for i, v in enumerate(vals):
        run = v if run is None or v > run else run
        want[i] = run
    assert got == want
