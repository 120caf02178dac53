"""CDC dead-letter quarantine: malformed change rows split out of the
merge path instead of corrupting it or killing the run.

A production change stream carries garbage — replication glitches emit
unknown ``Op`` codes, serialization bugs null out key columns. The
reference stack simply fails the DeltaStreamer step on such rows
(surfaced via the Step Function's catch-all failure path,
``emr1.json:124-130``); the kinder production pattern is the
dead-letter queue: route malformed rows to a quarantine relation with a
machine-readable reason, let the clean subset merge, and let operators
replay the quarantine after a fix.

Semantics (:func:`split_quarantine`):

- a row is quarantined iff its ``Op`` code (when the envelope carries
  one) is outside ``I``/``U``/``D``, or ANY record-key column is NULL
  (an unkeyable row can neither upsert nor delete);
- the quarantine carries ``dlq_reason`` (first matching reason, fixed
  order, so the split is deterministic);
- ``clean ∪ quarantine ≡ input`` — nothing is dropped silently.

Scale: both outputs are row-level filters over one scan — no shuffle,
fused into whole-stage codegen, and the reason expression is evaluated
map-side. At 100 TB the quarantine write is just a second filtered sink
of the same pass (classic multi-sink split); quarantine volume is
error-rate-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")
OP_COL = "Op"
REASON_COL = "dlq_reason"


def _reason(df: DataFrame, key_cols: list[str], op_col: str):
    """First-matching quarantine reason, NULL for clean rows."""
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    reason = F.when(null_key, F.lit("null_key"))
    if op_col in df.columns:
        reason = F.when(
            ~F.col(op_col).isin(*VALID_OPS) | F.col(op_col).isNull(),
            F.lit("bad_op"),
        ).otherwise(reason)
    return reason


def split_quarantine(
    df: DataFrame, key_cols: list[str], op_col: str = OP_COL
) -> tuple[DataFrame, DataFrame]:
    """Split a change batch into ``(clean, quarantined)``.

    ``quarantined`` keeps every input column plus ``dlq_reason``;
    ``clean`` is schema-identical to the input. The two partitions are
    disjoint and exhaustive.
    """
    tagged = df.withColumn(REASON_COL, _reason(df, key_cols, op_col))
    clean = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    quarantined = tagged.filter(F.col(REASON_COL).isNotNull())
    return clean, quarantined
