"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR and
prints ONE JSON line with per-query wall-clock seconds.

Execution is forced with the no-op sink (``format("noop")``) so the full
plan runs distributed with zero collect/serialization overhead on the
driver — the measured time is the query, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import __spark_entry__ as entry_mod
from aws_dms_to_hudi_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # JVM/codegen warmup on the smallest query so q01 isn't charged for boot.
    force(queries["q01_scan_projection"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
