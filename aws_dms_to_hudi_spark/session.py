"""SparkSession factory tuned for the engine.

The reference pins Kryo serialization (``src/stepfunctions/emr1.json:96``)
and per-table spark_conf passthrough
(``src/lambdas/launch_hudi/handler.py:134-136``). We additionally enable AQE
(adaptive re-planning, skew-join handling, partition coalescing) which at
100 TB replaces most hand-tuned shuffle sizing.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a real cluster the
# caller overrides master/memory and the AQE settings still apply.
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    # Local-harness scan parallelism: the test SFs are single small
    # parquet files, and the 128m default packs them into 1-3 input
    # splits — 29 of 32 cores idle during scans. 16m splits at
    # row-group granularity, which speeds compute-dense scans (text
    # ops) without drowning the CDC write paths in task overhead (4m
    # did). On a real cluster leave the 128m default: files are many
    # and task-launch overhead, not core idleness, dominates.
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.sql.files.openCostInBytes": "2m",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Shuffle width must scale with data, not sit at the static
    # shuffle.partitions=32: the 10x probe showed fixed-width shuffles
    # going superlinear (q13 17.9x, q23 14.8x at 10x data — spill-bound)
    # while AQE given a 256-partition initial width re-plans them to
    # 2.7x/1.2x. At sf0.1 AQE coalesces right back down, so the small
    # scale pays nothing. On a real cluster size this ~2-4x over total
    # executor cores (Spark's own guidance for AQE).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    # parallelismFirst stays at its default (true): an r8 experiment
    # flipped it to false (coalesce to the 64m advisory SIZE instead of
    # padding partition count to fill cores) after isolated light-gate
    # timings showed -20% (q02 0.59->0.32 s) — but the full-suite A/B
    # reversed the verdict: CPU-dense low-byte shuffle stages (the
    # graph wedge joins) lost their width and ran ~2x slower (q178
    # 2.2->4.7 s, q254 2.6->5.4, q256 5.7->9.3), while the light-gate
    # win did not reproduce under suite conditions (q02 0.68 vs 0.94 —
    # noise-level). Bytes are the wrong proxy for work when a
    # partition's cost is join fan-out, not I/O; core-count-first
    # coalescing is the safer default for mixed workloads.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Recursive CTEs (Spark 4 WITH RECURSIVE) materialize
    # |rows| x depth working rows; the stock 1M-row safety valve trips
    # on a legitimate 150k-row hierarchy at ~28 levels (the 10x probe
    # hit it on q126). Termination is already guarded by the LEVEL
    # limit (cteRecursionLevelLimit=100, kept), which bounds runaway
    # recursion independently of data size — so raise the ROW valve to
    # the conf's ceiling instead of letting it fail correct queries as
    # inputs grow. The conf is a JVM Int: a value past 2^31-1 silently
    # wedges the session (range(10).count() never returns), so stay
    # under it.
    "spark.sql.cteRecursionRowLimit": "2000000000",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.compression.codec": "snappy",
    # CDC envelope timestamps are millisecond precision
    # (templates/aws-dms-to-hudi.yaml:48); keep parquet physical type stable.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(
    app_name: str = "aws_dms_to_hudi_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    hive_support: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``extra_conf`` mirrors the reference's per-pipeline ``spark_conf``
    passthrough (handler.py:134-136) — caller-supplied keys win.

    ``hive_support`` backs the catalog with the persistent (Derby)
    metastore so ``Catalog.sync_metastore`` registrations survive cold
    restarts — the local stand-in for the reference's Glue catalog
    (``emr1.json:79-101``). Off by default: the JSON catalog + temp
    views need no metastore, and a per-JVM Derby lock dir is created
    when enabled.
    """
    # Python workers (pandas UDFs / mapInPandas) must be able to import
    # this package no matter the driver's cwd: export the repo root on
    # PYTHONPATH before the JVM (and hence the workers) launches, and on
    # executorEnv for cluster mode.
    pkg_root = str(Path(__file__).resolve().parent.parent)
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + py_path if py_path else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.executorEnv.PYTHONPATH"] = os.environ["PYTHONPATH"]
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    if hive_support:
        builder = builder.enableHiveSupport()
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
