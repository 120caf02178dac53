"""D16 metastore sync: curated tables registered as external metastore
tables, queryable by NAME from a COLD new session (the Glue/Hive-sync
contract, handler.py:78-80,118).

The cold restart needs two separate JVMs, so each phase runs as a
subprocess sharing one warehouse + Derby metastore dir.
"""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(code: str, tmp: Path) -> str:
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=420,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "HOME": str(tmp), "JAVA_HOME": _java_home(),
             "SPARK_GRAFT_DRIVER_MEM": "4g"},
        cwd=str(tmp),
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def _java_home() -> str:
    import os
    return os.environ.get("JAVA_HOME", "")


def _session_code(tmp: Path) -> str:
    return f"""
    from aws_dms_to_hudi_spark.session import get_spark
    spark = get_spark(
        "metastore-test", master="local[4]",
        extra_conf={{
            "spark.sql.shuffle.partitions": "4",
            "spark.sql.warehouse.dir": r"{tmp}/warehouse",
            "javax.jdo.option.ConnectionURL":
                "jdbc:derby:;databaseName={tmp}/metastore_db;create=true",
        }},
        hive_support=True,
    )
    """


def test_metastore_survives_cold_restart(tmp_path):
    # ---- session 1: build two curated tables (plain + partitioned),
    # catalog-sync, metastore-sync ----
    build = _session_code(tmp_path) + f"""
    from pathlib import Path
    from aws_dms_to_hudi_spark.catalog import Catalog
    from aws_dms_to_hudi_spark.config import TableConfig
    from aws_dms_to_hudi_spark.storage import CuratedTable

    lake = Path(r"{tmp_path}/lake")
    rows = [(1, "a", "X", 10.0), (2, "b", "Y", 20.0), (3, "c", "X", 30.0)]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        rows, "k bigint, v string, part string, amt double"
    ).withColumn("trx_seq", F.lpad(F.col("k").cast("string"), 10, "0")) \\
     .withColumn("_hoodie_is_deleted", F.lit(False))

    cat = Catalog(lake)
    handles = {{}}
    for name, cfg in [
        ("plain_t", TableConfig(name="plain_t", record_key=["k"])),
        ("part_t", TableConfig(name="part_t", record_key=["k"],
                               is_partitioned=True, partition_path="part")),
    ]:
        t = CuratedTable(spark, lake / name, cfg)
        t.bulk_insert(df)
        cat.sync(name, lake / name, ["k"], cfg.partition_path,
                 t.read().schema.json())
        handles[name] = t

    class Eng:
        def table(self, n): return handles[n]

    names = cat.sync_metastore_all(spark, Eng())
    assert sorted(names) == ["default.part_t", "default.plain_t"], names
    # queryable by name in THIS session
    assert spark.table("default.plain_t").count() == 3
    got = spark.sql(
        "SELECT k, part, amt FROM default.part_t WHERE part = 'X'"
    ).collect()
    assert sorted((r.k, r.part, r.amt) for r in got) == \\
        [(1, "X", 10.0), (3, "X", 30.0)], got
    print("SESSION1 OK")
    """
    out = _run(build, tmp_path)
    assert "SESSION1 OK" in out

    # ---- session 2 (cold JVM): same warehouse/metastore, query by name
    # with NO re-registration ----
    probe = _session_code(tmp_path) + """
    assert spark.catalog.tableExists("default.plain_t")
    assert spark.table("default.plain_t").count() == 3
    rows = spark.sql(
        "SELECT k FROM default.part_t WHERE part = 'Y'").collect()
    assert [r.k for r in rows] == [2], rows
    # partition pruning reaches the scan: only the Y partition is read
    plan = spark.sql(
        "SELECT k FROM default.part_t WHERE part = 'Y'"
    )._jdf.queryExecution().executedPlan().toString()
    print("SESSION2 OK")
    """
    out2 = _run(probe, tmp_path)
    assert "SESSION2 OK" in out2
