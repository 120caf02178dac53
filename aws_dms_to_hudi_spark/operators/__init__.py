"""Data-plane operators (SURVEY.md §2.1 D1-D18)."""

from aws_dms_to_hudi_spark.operators.keygen import record_key_expr
from aws_dms_to_hudi_spark.operators.merge import (
    apply_deletes,
    precombine,
    upsert_merge,
)
from aws_dms_to_hudi_spark.operators.transformer import apply_transformer_sql

__all__ = [
    "record_key_expr",
    "precombine",
    "upsert_merge",
    "apply_deletes",
    "apply_transformer_sql",
]
