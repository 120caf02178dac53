"""Interleaved same-session A/B of two Spark SQL texts.

Usage::

    python tools/ab_sql.py <module:func_returning_pairs> [rounds]

The target function receives (spark, sf_dir) and returns a list of
(label, DataFrame) variants; this harness forces each variant
alternately ``rounds`` times (noop sink) and prints per-variant times
and mins. Interleaving makes the comparison robust to the host's
minute-scale I/O-throttle bursts — both variants sample the same
weather.
"""

from __future__ import annotations

import importlib
import os
import sys
import time

from aws_dms_to_hudi_spark.session import get_spark


def main() -> None:
    target = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mod_name, fn_name = target.split(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_sql")
    variants = fn(spark, sf_dir)
    # warmup: run each once (codegen + artifact builds land here)
    for label, df in variants:
        df.write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {label: [] for label, _ in variants}
    for _ in range(rounds):
        for label, df in variants:
            spark.sparkContext.setJobDescription(f"ab:{label}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[label].append(time.time() - t0)
    for label, ts in times.items():
        runs = " ".join(f"{t:.2f}" for t in ts)
        print(f"{label}: min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f}"
              f"  [{runs}]", flush=True)


if __name__ == "__main__":
    main()
