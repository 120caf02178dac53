"""Key-range file groups (beyond-reference; Hudi file-group/column-stats
pruning analog): plain tables stop rewriting the whole table on upsert —
a narrow-key batch rewrites only the groups its keys fall into, the rest
carry forward by reference, and state stays oracle-exact."""

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import RANGE_COL, CuratedTable

from tests.util import assert_same, duck_con

import pytest
from pyspark.sql import functions as F

GROUPS = 8


def _table(spark, tmp_path, groups=GROUPS):
    cfg = TableConfig(
        name="orders_rg", record_key=["o_orderkey"],
        key_range_groups=groups,
    )
    return CuratedTable(spark, tmp_path / "orders_rg", cfg)


def _batch(spark, sf, b):
    return cdc.generate_batch(spark, sf, cdc.RECIPES["orders"], b)


def test_narrow_upsert_rewrites_strict_subset(spark, sf_smoke, tmp_path):
    t = _table(spark, tmp_path)
    c0 = t.bulk_insert(_batch(spark, sf_smoke, 0))
    assert c0.key_bounds, "bounds must freeze at bulk insert"
    n_groups = len(c0.data)
    assert n_groups > 1

    # narrow batch: updates touching ONLY the lowest few keys
    lo = _batch(spark, sf_smoke, 1).orderBy("o_orderkey").limit(5)
    c1 = t.upsert(lo)

    # frozen bounds carried forward
    assert c1.key_bounds == c0.key_bounds
    rewritten = {k for k, v in c1.data.items() if v != c0.data[k]}
    carried = {k for k, v in c1.data.items() if k in c0.data and v == c0.data[k]}
    assert rewritten and carried, (c0.data, c1.data)
    assert len(rewritten) < n_groups  # strict subset rewritten
    # carried groups still point at version-1 dirs (by reference)
    assert all(v.startswith("v00000001") for k, v in c1.data.items()
               if k in carried)


def test_state_matches_oracle_and_plain_table(spark, sf_smoke, tmp_path):
    rec = cdc.RECIPES["orders"]
    t = _table(spark, tmp_path)
    t.bulk_insert(_batch(spark, sf_smoke, 0))
    for b in range(1, cdc.N_BATCHES):
        t.upsert(_batch(spark, sf_smoke, b))
    got = t.read().select(*rec.columns, "trx_seq")
    assert RANGE_COL not in got.columns
    con = duck_con(sf_smoke)
    oracle = con.execute(cdc.replay_sql(rec)).df()
    assert_same(got, oracle)


def test_new_keys_beyond_bounds_land_in_edge_groups(spark, sf_smoke, tmp_path):
    t = _table(spark, tmp_path)
    t.bulk_insert(_batch(spark, sf_smoke, 0))
    base = _batch(spark, sf_smoke, 0)
    mx = base.agg(F.max("o_orderkey")).first()[0]
    fresh = (
        base.orderBy("o_orderkey").limit(2)
        .withColumn("o_orderkey", F.col("o_orderkey") + mx + 10)
        .withColumn("trx_seq", F.concat(F.lit("9"), F.col("trx_seq")))
    )
    before = t.read().count()
    c = t.upsert(fresh)
    assert t.read().count() == before + 2
    # only the top edge group rewrote
    prev = t._commit_at(c.parent)
    rewritten = {k for k, v in c.data.items() if prev.data.get(k) != v}
    assert rewritten == {f"{RANGE_COL}={len(c.key_bounds)}"}


def test_single_group_degenerates_to_full_rewrite(spark, sf_smoke, tmp_path):
    t = _table(spark, tmp_path, groups=1)
    t.bulk_insert(_batch(spark, sf_smoke, 0))
    c = t.upsert(_batch(spark, sf_smoke, 1))
    assert c.key_bounds == []
    assert set(c.data) == {f"{RANGE_COL}=0"}
