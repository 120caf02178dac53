"""Key generation (D9).

The reference picks a Hudi key generator by key arity and partitioning
(``src/lambdas/launch_hudi/handler.py:105-110``): NonpartitionedKeyGenerator,
SimpleKeyGenerator, or ComplexKeyGenerator. In DataFrame terms a record key
is just the list of key columns used in joins/windows; a single string key
value is only materialized when something needs one (e.g. exact-dedup
hashing or key-range stats).

Scale note: joining/grouping on the raw key *columns* (multi-column join
keys) is strictly better than concat-then-join — Catalyst can push filters
per column and keeps codegen'd comparisons; the concat form is kept only
for places needing one value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Hudi's ComplexKeyGenerator renders "col1:val1,col2:val2"; we keep the
# values-only form with a field separator that cannot appear in numeric keys.
KEY_SEP = ":"


def record_key_expr(key_cols: list[str]) -> Column:
    """One string key value from 1..n key columns (handler.py:105-110).

    Simple key (arity 1) → the column cast to string; complex key →
    NULL-safe concat of all parts (NULL renders as empty string so the key
    is still total — matches Hudi's treatment of nulls in complex keys).
    """
    if not key_cols:
        raise ValueError("record_key_expr requires at least one key column")
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    if len(parts) == 1:
        return parts[0]
    return F.concat_ws(KEY_SEP, *parts)
