"""Physical-plan dataclasses for the engine driver.

The reference's "physical plan" is the Step Function input JSON the
launcher compiles from DynamoDB config (``handler.py:125-198``: one
spark-submit argv per enabled table, plus pipeline metadata). In the
Spark-native engine that plan is a list of :class:`MergePlan` — the C3
Hudi-conf synthesis target — consumed by ``engine.Engine``'s
thread-pooled step loop (C9), which reports a :class:`RunReport` (C10,
the SNS-notification equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from aws_dms_to_hudi_spark.config import TableConfig


@dataclass
class MergePlan:
    """C3: everything one table merge job needs (the 'spark-submit argv')."""

    step_name: str  # "<schema>.<table>" (handler.py:171)
    table_name: str  # "<identifier>_<schema>_<table>" (handler.py:132)
    config: TableConfig
    source_root: Path  # raw change-log dir (D1)
    target_root: Path  # curated table dir
    operation: str  # "bulk_insert" | "upsert" (handler.py:85-89,157-160)
    continuous: bool  # handler.py:166-167
    spark_conf: dict[str, str] = field(default_factory=dict)


@dataclass
class StepResult:
    step_name: str
    status: str  # "SUCCEEDED" | "FAILED" | "SKIPPED_NO_DATA"
    version: int | None = None
    error: str | None = None
    seconds: float = 0.0


@dataclass
class RunReport:
    """C10: structured run outcome (the SNS notification equivalent)."""

    execution_id: str
    pipeline_type: str
    steps: list[StepResult] = field(default_factory=list)
    chained: list["RunReport"] = field(default_factory=list)

    @property
    def succeeded(self) -> bool:
        return all(s.status != "FAILED" for s in self.steps)


class ConcurrentRunError(RuntimeError):
    """C6: a pipeline execution is already RUNNING (handler.py:211-213)."""
