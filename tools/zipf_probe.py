"""Zipf-corpus probe for the prefix-Jaccard candidate bound (q166).

The committed 10x probe runs on the deterministic test corpus, whose
~40-word vocabulary makes even each doc's RAREST shingles' document
frequency scale with N (see prefix_jaccard_sql's probe-bound note) —
the measured 10x ratio there is that synthetic-vocab artifact, capped
linear by DEDUP_MAX_DF. This probe supplies the missing half of the
argument (r8 verdict item 8): on a Zipf-distributed vocabulary — the
shape of any real corpus (Bayardo et al. WWW'07 build prefix filtering
on exactly this property) — the prefix slice keeps shingles whose df
stays O(1) as the corpus grows, so candidate volume grows ~linearly
with N and the candidate:pair ratio stays flat.

Usage::

    PYTHONPATH=/root/repo python tools/zipf_probe.py

Generates two deterministic Zipf corpora (base and 10x doc count,
seeded RNG, s=1.07, 50k-word vocabulary), builds the df-capped
inverted index through the same _inv_cte text q166 runs, and records
per scale: |inv|, mean prefix-shingle df, candidate-pair count, and
candidate wall time. Writes tools/zipf_probe_results.json.
"""

from __future__ import annotations

import json
import random
import time
from pathlib import Path

from aws_dms_to_hudi_spark.functions import dedup as fn_dedup
from aws_dms_to_hudi_spark.session import get_spark

VOCAB = 50_000
DOC_TOKENS = 60
BASE_DOCS = 5_000
SCALES = {"1x": BASE_DOCS, "10x": 10 * BASE_DOCS}
S = 1.07  # Zipf exponent (word-frequency-like)
THRESHOLD = 0.8  # q166's operating point


def zipf_corpus(n_docs: int, seed: int = 42) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    # inverse-CDF sampling over a fixed harmonic table (deterministic)
    weights = [1.0 / (r ** S) for r in range(1, VOCAB + 1)]
    tot = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w
        cdf.append(acc / tot)
    import bisect

    def draw() -> int:
        return bisect.bisect_left(cdf, rng.random())

    return [
        (i, " ".join(f"w{draw()}" for _ in range(DOC_TOKENS)))
        for i in range(n_docs)
    ]


def probe_scale(spark, tag: str, n_docs: int) -> dict:
    rows = zipf_corpus(n_docs)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    view = f"__zipf_{tag}"
    df.createOrReplaceTempView(view)
    base = fn_dedup._inv_cte("spark", view, fn_dedup.DEDUP_MAX_DF)
    inv_stats = spark.sql(
        f"WITH {base}, gdf AS (SELECT g, COUNT(*) AS df FROM inv "
        "GROUP BY g), ranked AS (SELECT i.doc_id, i.g, row_number() "
        "OVER (PARTITION BY i.doc_id ORDER BY d.df, i.g) AS rk, d.df "
        "FROM inv i JOIN gdf d ON i.g = d.g), pinv AS (SELECT r.doc_id, "
        "r.g, r.df FROM ranked r JOIN sizes s ON r.doc_id = s.doc_id "
        f"WHERE r.rk <= s.n - CAST(ceil({THRESHOLD} * s.n) AS BIGINT) + 1) "
        "SELECT (SELECT COUNT(*) FROM inv) AS n_inv, "
        "(SELECT COUNT(*) FROM pinv) AS n_prefix, "
        "(SELECT AVG(df) FROM pinv) AS mean_prefix_df"
    ).collect()[0]
    t0 = time.time()
    n_cand = spark.sql(
        f"WITH {base} SELECT COUNT(*) AS n FROM "
        f"({fn_dedup.prefix_jaccard_cand_body(THRESHOLD)}) c"
    ).collect()[0]["n"]
    wall = time.time() - t0
    return {
        "docs": n_docs,
        "n_inv": int(inv_stats["n_inv"]),
        "n_prefix_shingles": int(inv_stats["n_prefix"]),
        "mean_prefix_df": round(float(inv_stats["mean_prefix_df"]), 3),
        "n_candidate_pairs": int(n_cand),
        "cand_wall_s": round(wall, 2),
    }


def main() -> None:
    spark = get_spark("zipf_probe")
    out = {"vocab": VOCAB, "doc_tokens": DOC_TOKENS, "zipf_s": S,
           "threshold": THRESHOLD, "scales": {}}
    for tag, n in SCALES.items():
        out["scales"][tag] = probe_scale(spark, tag, n)
        print(tag, out["scales"][tag], flush=True)
    a, b = out["scales"]["1x"], out["scales"]["10x"]
    out["df_ratio_10x"] = round(
        b["mean_prefix_df"] / max(a["mean_prefix_df"], 1e-9), 2)
    out["cand_per_doc_1x"] = round(a["n_candidate_pairs"] / a["docs"], 4)
    out["cand_per_doc_10x"] = round(b["n_candidate_pairs"] / b["docs"], 4)
    out["wall_ratio_10x"] = round(
        b["cand_wall_s"] / max(a["cand_wall_s"], 1e-9), 2)
    path = Path(__file__).parent / "zipf_probe_results.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print("written", path, flush=True)


if __name__ == "__main__":
    main()
