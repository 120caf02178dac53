"""Bucket index (TableConfig.num_buckets): hash-bucketed layout for
non-partitioned tables so upserts rewrite only touched buckets.

Checks: (1) merged state is identical to the unbucketed replay oracle,
(2) an upsert's new version dir contains ONLY the buckets the batch
touched (the pruning that makes small-batch upserts O(batch), not
O(table)), (3) untouched buckets carry forward by reference, (4) the
bucket column never leaks into read() output.
"""

from __future__ import annotations

import pytest

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import BUCKET_COL, CuratedTable

from tests.util import assert_same, duck_con

N_BUCKETS = 8


@pytest.fixture()
def table(spark, tmp_path):
    cfg = TableConfig(
        name="public.orders",
        record_key=["o_orderkey"],
        num_buckets=N_BUCKETS,
    )
    return CuratedTable(spark, tmp_path / "orders", cfg)


def _batch(spark, sf_dir, b):
    rec = cdc.RECIPES["orders"]
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "__bkt_orders"
    )
    return spark.sql(cdc.batch_sql(rec, b, src="__bkt_orders"))


def test_bucketed_state_matches_replay(spark, sf_smoke, table):
    for b in range(cdc.N_BATCHES):
        table.upsert(_batch(spark, sf_smoke, b))
    state = table.read()
    assert BUCKET_COL not in state.columns
    con = duck_con(sf_smoke)
    oracle = con.execute(cdc.replay_sql(cdc.RECIPES["orders"])).df()
    assert_same(state.select(*oracle.columns), oracle)


def test_upsert_rewrites_only_touched_buckets(spark, sf_smoke, table):
    table.upsert(_batch(spark, sf_smoke, 0))  # bulk: all buckets written
    v1_buckets = set(table.latest_commit().data)
    assert len(v1_buckets) == N_BUCKETS

    # a tiny batch: 5 keys -> at most 5 buckets touched
    small = _batch(spark, sf_smoke, 1).limit(5)
    table.upsert(small)
    commit = table.latest_commit()
    vdir = f"v{commit.version:08d}"
    rewritten = {k for k, d in commit.data.items() if d.startswith(vdir)}
    carried = {k for k, d in commit.data.items() if not d.startswith(vdir)}
    assert 1 <= len(rewritten) <= 5
    assert len(carried) == N_BUCKETS - len(rewritten)


def test_bucketed_services_preserve_state(spark, sf_smoke, table):
    for b in range(cdc.N_BATCHES):
        table.upsert(_batch(spark, sf_smoke, b))
    before = {tuple(r) for r in table.read().collect()}
    table.cluster()
    after = {tuple(r) for r in table.read().collect()}
    assert before == after


def test_bucketed_partitioned_conflict():
    with pytest.raises(ValueError, match="num_buckets"):
        TableConfig(
            name="t",
            record_key=["k"],
            is_partitioned=True,
            partition_path="p",
            num_buckets=4,
        )


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def _matching_files(df):
    from pyspark.sql import functions as F

    return df.select(F.input_file_name()).distinct().count()


def test_zorder_cluster_prunes_on_both_dimensions(spark, tmp_path):
    """Linear sort by x packs every y value into every file, so a y-range
    scan touches ALL files; a z-order rewrite over (x, y) bounds both
    coordinates per file, so either dimension prunes to ~sqrt(files)."""
    from pyspark.sql import functions as F

    grid = spark.range(64 * 64).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    cfg = TableConfig(name="zgrid", record_key=["k"])  # k == 64*y + x
    t = CuratedTable(spark, tmp_path / "zgrid", cfg)
    t.bulk_insert(grid.withColumn("trx_seq", F.lpad(F.col("k").cast("string"), 8, "0")))

    t.cluster(target_partitions=16)  # linear: range-partitioned by k=64y+x
    # k-order == y-major order, so an X-range scan touches every file
    linear = _matching_files(t.read().filter(F.col("x") < 8))

    t.cluster(target_partitions=16, zorder_by=["x", "y"])
    zordered = _matching_files(t.read().filter(F.col("x") < 8))
    assert linear == 16  # every k-slice holds all x
    assert zordered <= 6  # x-slab intersects one column of z-blocks

    # full state is preserved by the rewrite
    assert t.read().count() == 64 * 64
    # and a y-range scan prunes too (z-order helps BOTH dims)
    assert _matching_files(t.read().filter(F.col("y") < 8)) <= 6


def test_delete_where_rewrites_only_touched_buckets(spark, sf_smoke, table):
    """Predicate delete flows through the pruned upsert: only buckets
    holding doomed keys are rewritten, the changelog carries real
    tombstones, and the surviving state is the complement filter."""
    from pyspark.sql import functions as F

    table.upsert(_batch(spark, sf_smoke, 0))
    before = table.read()
    doomed_keys = {
        r[0] for r in before.filter("o_totalprice > 200000")
        .select("o_orderkey").collect()
    }
    assert doomed_keys, "fixture should contain high-value orders"
    c = table.delete_where("o_totalprice > 200000")
    # only the doomed keys' buckets were rewritten in the new version
    vdir = f"v{c.version:08d}"
    rewritten = {d for d in c.data.values() if d.startswith(vdir)}
    assert 0 < len(rewritten) < N_BUCKETS + 1
    # state == complement
    after = table.read()
    assert after.filter("o_totalprice > 200000").count() == 0
    assert after.count() == before.count() - len(doomed_keys)
    # changelog carries the tombstones for downstream IVM
    ch = table.read_incremental(
        begin_version=c.version - 1, drop_deleted=False
    )
    dels = ch.filter(F.col("_hoodie_is_deleted"))
    assert {r["o_orderkey"] for r in dels.select("o_orderkey").collect()} \
        == doomed_keys


# ---------------------------------------------------------------------------
# Hilbert clustering
# ---------------------------------------------------------------------------


def test_hilbert_key_is_bijective_and_adjacent(spark, tmp_path):
    """The broadcast-LUT transform IS the Hilbert curve: over the full
    256x256 bucket grid the key is a bijection onto [0, 65536) and
    every pair of consecutive curve positions is Manhattan-adjacent —
    the locality property Morton order lacks (Z-order jumps at every
    quadrant boundary)."""
    from pyspark.sql import functions as F

    t = CuratedTable(
        spark, tmp_path / "hk", TableConfig(name="hk", record_key=["k"])
    )
    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    rows = t._with_hilbert_key(grid, ["x", "y"], "d").collect()
    byd = sorted((r["d"], r["x"], r["y"]) for r in rows)
    assert byd[0][0] == 0 and byd[-1][0] == n * n - 1
    assert len({d for d, _, _ in byd}) == n * n  # bijection
    for (_, x0, y0), (_, x1, y1) in zip(byd, byd[1:]):
        assert abs(x1 - x0) + abs(y1 - y0) == 1  # adjacency


def test_hilbert_cluster_prunes_on_both_dimensions(spark, tmp_path):
    """Same setup as the z-order pruning test: a Hilbert rewrite over
    (x, y) bounds both coordinates per file at least as tightly."""
    from pyspark.sql import functions as F

    grid = spark.range(64 * 64).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    cfg = TableConfig(name="hgrid", record_key=["k"])
    t = CuratedTable(spark, tmp_path / "hgrid", cfg)
    t.bulk_insert(
        grid.withColumn(
            "trx_seq", F.lpad(F.col("k").cast("string"), 8, "0")
        )
    )
    t.cluster(target_partitions=16, hilbert_by=["x", "y"])
    assert _matching_files(t.read().filter(F.col("x") < 8)) <= 6
    assert _matching_files(t.read().filter(F.col("y") < 8)) <= 6
    assert t.read().count() == 64 * 64

    import pytest

    with pytest.raises(ValueError, match="exclusive"):
        t.cluster(zorder_by=["x"], hilbert_by=["x", "y"])
    with pytest.raises(ValueError, match="exactly 2"):
        t.cluster(hilbert_by=["x"])
