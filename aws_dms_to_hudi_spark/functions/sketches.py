"""Mergeable-sketch operators (beyond-reference, SURVEY.md §7 M6).

The approx family's driver gates follow one contract (set by q12/q87):
an estimator may be probabilistic internally, but the GATED output must
be deterministic and hash-verifiable. For heavy hitters the classic way
to get there is the two-pass Misra-Gries pattern:

1. **Sketch pass** — every partition runs a Misra-Gries summary with
   ``k`` counters over its local token stream (``mapInPandas``, Arrow
   batches; state is a k-entry dict). MG guarantees every item with
   local frequency > n_p/k survives the partition's summary, and
   Σ n_p/k = n/k, so the UNION of per-partition candidate sets is a
   superset of every global item with frequency > n/k — regardless of
   how rows are partitioned.
2. **Verify pass** — exact counts for the (≤ k · partitions, tiny)
   candidate set via one filtered aggregate, keep frequency · k > n.

The emitted set is therefore EXACTLY the true heavy hitters — same
answer on any cluster layout — while the corpus is never globally
aggregated: the only full-data work is the linear sketch pass and one
semi-join-pruned count. At 100 TB the candidate set stays O(k · P) and
broadcasts; the verify aggregate shuffles only candidate-matching rows.

Oracle: the plain relational heavy-hitter query (GROUP BY + HAVING with
the same strict cross-multiplied threshold).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HH_K = 50  # counters per partition / strict threshold divisor


def _mg_partition(pdfs: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition's ``token`` stream."""
    counters: dict[str, int] = {}
    for pdf in pdfs:
        for tok, cnt in pdf["token"].value_counts().items():
            if tok in counters:
                counters[tok] += int(cnt)
            elif len(counters) < k - 1:
                counters[tok] = int(cnt)
            else:
                # decrement-all by the min of (incoming, current floor):
                # batch form of the classic one-at-a-time decrement
                dec = min(int(cnt), min(counters.values()))
                counters = {
                    t: c - dec for t, c in counters.items() if c > dec
                }
                rem = int(cnt) - dec
                if rem > 0 and len(counters) < k - 1:
                    counters[tok] = rem
    yield pd.DataFrame({"token": list(counters)})


def heavy_hitters(tokens: DataFrame, k: int = HH_K) -> DataFrame:
    """Exact heavy hitters (frequency · k > total) via the two-pass
    MG pattern. ``tokens`` must have a ``token`` string column.

    Returns (token, freq, n_total) for every true heavy hitter,
    deterministically, without a full global aggregate."""
    cand = (
        tokens.select("token")
        .mapInPandas(lambda it: _mg_partition(it, k), "token string")
        .distinct()
    )
    verified = (
        tokens.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    total = tokens.select(F.count("*").alias("n_total"))
    return (
        verified.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("n_total"))
        .orderBy(F.col("freq").desc(), "token")
    )


def heavy_hitters_oracle_sql(
    table: str = "documents", k: int = HH_K, dialect: str = "duckdb"
) -> str:
    from . import portable as P

    toks = P.tokens("text", dialect)
    if dialect == "spark":
        tok_rows = (
            f"SELECT t AS token FROM (SELECT {toks} AS toks FROM {table}) "
            "LATERAL VIEW explode(toks) _x AS t"
        )
    else:
        tok_rows = f"SELECT unnest({toks}) AS token FROM {table}"
    return f"""
WITH tok AS ({tok_rows}),
tot AS (SELECT COUNT(*) AS n_total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(MAX(tot.n_total) AS BIGINT) AS n_total
FROM tok CROSS JOIN tot
GROUP BY token
HAVING COUNT(*) * {k} > MAX(tot.n_total)
ORDER BY freq DESC, token
"""
