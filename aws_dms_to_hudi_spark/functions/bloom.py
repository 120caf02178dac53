"""Bloom-filter semi-join reduction (runtime row-level filtering).

The scale problem: a semi join ``big WHERE key IN (SELECT key FROM
small)`` shuffles the *entire* big side on the join key even though only
a sliver of its rows survive. When ``small`` is too large to broadcast
as rows but its *membership bitmap* is not, the classic fix — what
Spark's own runtime bloom-filter rewrite
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and every MPP
engine's "semi-join reduction" do — is:

1. aggregate ``small``'s keys into an m-bit Bloom filter (k hash
   probes per key, OR'd into a bitmap);
2. broadcast the bitmap and pre-filter ``big`` map-side — false
   positives pass, false negatives are impossible;
3. run the exact join on the (hugely reduced) survivor set, which
   removes the false positives.

The output is therefore *bit-identical* to the plain semi join — the
bloom stage is pure shuffle-volume reduction — which is exactly what
makes it oracle-gateable: the DuckDB oracle is the plain semi join.

Implementation notes (all JVM-side, no Python in the hot path):

- the bitmap lives as a ``(word, bits)`` relation of at most
  ``m_bits/64`` rows (8 KiB of longs for the default 2^16 bits), built
  with one tiny shuffle: explode k probe positions per key →
  ``groupBy(word).agg(bit_or(mask))`` with map-side partial OR;
- probing is k successive **broadcast left-semi joins** of big against
  that word relation (equi on the word index + a bitmask residual
  filter) — each one a map-side hash-table lookup, no shuffle of big;
- probe positions use ``xxhash64(key, seed_i) mod m`` — engine-local
  (the oracle never needs to reproduce them, since the exact join
  erases every bloom artifact from the result).

Sizing at 100 TB: m_bits chosen for ~1% FP at |small| keys is
``m ≈ 10·|small|`` bits (k=5 ≈ ln2·m/n) — 1.25 GB of bitmap per 10^9
keys, still broadcastable where 10^9 *rows* are not; the driver never
materializes big-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bloom(small: DataFrame, key: str, m_bits: int = 1 << 16,
                k: int = 5) -> DataFrame:
    """Aggregate ``small[key]`` into a sparse ``(word, bits)`` Bloom
    bitmap relation (``word`` indexes 64-bit lanes; at most
    ``m_bits/64`` rows). One narrow shuffle with map-side partial
    ``bit_or``."""
    probes = F.explode(
        F.array(*[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ])
    ).alias("pos")
    return (
        small.select(probes)
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   "CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(big: DataFrame, key: str, bloom: DataFrame,
                    m_bits: int = 1 << 16, k: int = 5) -> DataFrame:
    """Keep only big-side rows whose key passes all ``k`` Bloom probes.
    Each probe is a broadcast left-semi join: equi-match on the word
    lane plus a bitmask residual — a map-side hash lookup against the
    ≤ ``m_bits/64``-row bitmap, never a shuffle of ``big``. Guarantees
    no false negatives; false positives survive (the caller's exact
    join removes them)."""
    out = big
    for i in range(k):
        pos = f"pmod(xxhash64({key}, {i}), {m_bits})"
        word = F.expr(f"({pos}) div 64")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                      f"CAST(pmod({pos}, 64) AS INT))")
        b = bloom.select(
            F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
        )
        out = out.join(
            F.broadcast(b),
            (word == F.col(f"_bw{i}"))
            & (F.col(f"_bb{i}").bitwiseAND(mask) != 0),
            "left_semi",
        )
    return out


def bloom_semi_join(big: DataFrame, small: DataFrame, big_key: str,
                    small_key: str, m_bits: int = 1 << 16,
                    k: int = 5) -> DataFrame:
    """Exact semi join of ``big`` against ``small`` with a Bloom
    pre-reduction: build the bitmap from ``small``, map-side-filter
    ``big`` through it, then run the exact semi join on the survivors.
    Result is identical to ``big SEMI JOIN small`` by construction."""
    keys = small.select(small_key).distinct()
    bloom = build_bloom(keys, small_key, m_bits, k)
    reduced = bloom_prefilter(big, big_key, bloom, m_bits, k)
    return reduced.join(
        keys, reduced[big_key] == keys[small_key], "left_semi"
    )
