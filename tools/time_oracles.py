"""Time the full DuckDB oracle suite at a given sf dir — the denominator
of the bench-vs-oracle ratio the judge tracks. Mirrors the driver's
setup: every base table registered as a view, every oracle_sql() entry
executed and fully materialized (fetchall), wall-clock per query.

Usage: python tools/time_oracles.py [sf_dir]  (default /root/testdata/sf0.1)
Writes tools/oracle_timings.json and prints the total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    oracles = entry_mod.oracle_sql()
    timings: dict[str, float] = {}
    for name in sorted(oracles):
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    out = Path(__file__).parent / "oracle_timings.json"
    out.write_text(json.dumps(
        {"total_sec": total, "sf_dir": sf_dir, "n": len(timings),
         "queries": timings}, indent=1))
    print(json.dumps({"oracle_total_sec": total, "n": len(timings)}))
    worst = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print("slowest:", worst)


if __name__ == "__main__":
    main()
