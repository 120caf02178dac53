"""Row lineage (D47, beyond-reference; Iceberg v3 row-lineage analog):
write paths stamp the rows they CHANGE with the committing version in
`_commit_version`; table services rewrite rows WITHOUT re-stamping, so
the column answers "which commit last modified this row" through any
layout change. read() hides the column unless asked, like Iceberg's
metadata columns.

Reference pins: the reference's Hudi tables carry commit metadata per
record via `_hoodie_commit_time` (written by the DeltaStreamer the
config compiler launches, handler.py:139-152); this is that capability
on the engine's own manifest format, with Iceberg's
survives-rewrite semantics."""

import pytest
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.storage import LINEAGE_COL, CuratedTable

REC = cdc.RECIPES["orders"]


def _build(spark, sf_dir, root, **cfg_kw):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "__rl_orders"
    )
    cfg = TableConfig(
        name="orders_rl", record_key=["o_orderkey"], row_lineage=True,
        **cfg_kw,
    )
    t = CuratedTable(spark, root, cfg)
    for b in range(cdc.N_BATCHES):
        batch = spark.sql(cdc.batch_sql(REC, b, src="__rl_orders"))
        (t.bulk_insert if b == 0 else t.upsert)(batch)
    return t


def _expected(spark, upto=cdc.N_BATCHES - 1):
    """Batch-stamped replay: winner's batch b -> version b + 1."""
    union = " UNION ALL ".join(
        f"(SELECT *, {b} AS __b FROM "
        f"({cdc.batch_sql(REC, b, src='__rl_orders')}) s{b})"
        for b in range(upto + 1)
    )
    return spark.sql(f"""
SELECT o_orderkey, trx_seq, CAST(__b + 1 AS BIGINT) AS v FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey ORDER BY trx_seq DESC) AS rn
  FROM ({union}) u
) r WHERE rn = 1 AND NOT _hoodie_is_deleted""")


def test_stamps_match_batch_replay_and_read_hides(spark, sf_smoke,
                                                  tmp_path):
    t = _build(spark, sf_smoke, tmp_path / "rl")
    assert LINEAGE_COL not in t.read().columns
    got = t.read(include_lineage=True).select(
        "o_orderkey", F.col(LINEAGE_COL).alias("v"))
    want = _expected(spark).select("o_orderkey", "v")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_compaction_preserves_stamps(spark, sf_smoke, tmp_path):
    t = _build(spark, sf_smoke, tmp_path / "rlmor",
               table_type="MERGE_ON_READ")
    before = t.read(include_lineage=True).select(
        "o_orderkey", LINEAGE_COL).collect()
    assert t.latest_commit().deltas
    t.compact()
    after = t.read(include_lineage=True).select(
        "o_orderkey", LINEAGE_COL).collect()
    assert sorted(before) == sorted(after)


def test_clustering_and_delete_where_preserve_stamps(spark, sf_smoke,
                                                     tmp_path):
    t = _build(spark, sf_smoke, tmp_path / "rlclus")
    snap = t.read(include_lineage=True)
    keep = {r["o_orderkey"]: r[LINEAGE_COL] for r in snap.collect()}
    cut = sorted(keep)[len(keep) // 2]
    t.delete_where(f"o_orderkey > {cut}")
    after = {r["o_orderkey"]: r[LINEAGE_COL]
             for r in t.read(include_lineage=True).collect()}
    assert after == {k: v for k, v in keep.items() if k <= cut}
    t.cluster()
    clustered = {r["o_orderkey"]: r[LINEAGE_COL]
                 for r in t.read(include_lineage=True).collect()}
    assert clustered == after


def test_partial_update_restamps_only_patched_keys(spark, sf_smoke,
                                                   tmp_path):
    t = _build(spark, sf_smoke, tmp_path / "rlpatch")
    snap = t.read(include_lineage=True)
    k = snap.orderBy("o_orderkey").first()["o_orderkey"]
    patch = (snap.where(F.col("o_orderkey") == k)
             .select("o_orderkey",
                     F.concat(F.col("trx_seq"), F.lit("z")).alias("trx_seq"),
                     (F.col("o_totalprice") + 1).alias("o_totalprice")))
    c = t.patch_upsert(patch)
    after = {r["o_orderkey"]: r[LINEAGE_COL]
             for r in t.read(include_lineage=True).collect()}
    before = {r["o_orderkey"]: r[LINEAGE_COL] for r in snap.collect()}
    assert after[k] == c.version
    del after[k], before[k]
    assert after == before


def test_bootstrap_rejected(spark, sf_smoke, tmp_path):
    cfg = TableConfig(name="rlboot", record_key=["o_orderkey"],
                      row_lineage=True)
    t = CuratedTable(spark, tmp_path / "rlboot", cfg)
    with pytest.raises(ValueError, match="row_lineage"):
        t.bootstrap(str(tmp_path))


def test_index_lookups_hide_lineage_like_read(spark, sf_smoke, tmp_path):
    """point_lookup / bloom_lookup mirror read()'s include_lineage=False
    default: the hidden _commit_version metadata column must not leak
    through the index read paths on a lineage-stamped table."""
    t = _build(spark, sf_smoke, tmp_path / "rlidx",
               record_index=True, bloom_index=True)
    keys = t.read().select("o_orderkey").limit(5)
    got = t.point_lookup(keys)
    assert LINEAGE_COL not in got.columns
    assert got.count() == 5
    got_b = t.bloom_lookup(keys)
    assert LINEAGE_COL not in got_b.columns
    assert got_b.count() == 5
