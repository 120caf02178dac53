"""Differential-test helpers: Spark result vs DuckDB oracle.

Normalization mirrors FIXTURES.md §3: timestamps to millisecond precision,
doubles rounded to 6 decimals, order-insensitive compare (sort by all
columns).
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str | Path) -> duckdb.DuckDBPyConnection:
    """Connection with every base table registered as a view (the driver
    does the same for oracle_sql)."""
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.floor("ms").astype("datetime64[ms]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
    out = out.reindex(sorted(out.columns), axis=1)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_same(spark_df, duck_df: pd.DataFrame) -> None:
    left = normalize(spark_df.toPandas())
    right = normalize(duck_df)
    assert list(left.columns) == list(right.columns), (
        f"columns differ: {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"row counts differ: {len(left)} vs {len(right)}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=False, rtol=1e-6)
