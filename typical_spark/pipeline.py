"""End-to-end validation pipeline: every check class, one violations table.

This is the production shape of the engine: row-level checks (fused
projection), uniqueness, per-conversation ordering, and referential
integrity all emit into ONE violations stream with a common schema

    (conv_id, turn_idx, column, check_id, observed, expected)

so a run is a small, fixed number of Spark jobs regardless of how many
checks are configured — crucial at scale, where each extra action is an
extra full scan. The row-level pass is scan-local; uniqueness shuffles
only the narrow key columns (groupBy prefilter with map-side combine,
then windows over just the duplicate candidates); ordering shuffles the
conv-keyed columns once for its window; referential is a broadcast
anti-join (zero shuffle of the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typical_spark.operators.ordering import ordering_violations
from typical_spark.operators.referential import referential_violations
from typical_spark.operators.uniqueness import duplicate_rows
from typical_spark.plans.validation import ValidationPlan

VIOLATION_SCHEMA_COLS = ("conv_id", "turn_idx", "column", "check_id", "observed", "expected")


def full_validation(
    plan: ValidationPlan,
    transcripts: DataFrame,
    conversations: DataFrame | None = None,
    salt_buckets: int = 1,
) -> DataFrame:
    """All violation classes as one DataFrame (see module docstring)."""
    key = list(plan.spec.key_columns)

    row_vio = plan.violations(transcripts, with_message=False)

    dup = duplicate_rows(
        transcripts, key, order_by=["ts", "role"], salt_buckets=salt_buckets
    ).select(
        *key,
        F.lit(key[-1]).alias("column"),
        F.lit("unique_key").alias("check_id"),
        F.col("dup_rank").cast("string").alias("observed"),
        F.lit(f"unique {tuple(key)}").alias("expected"),
    )

    order = ordering_violations(
        transcripts.where(F.col("conv_id").isNotNull()),
        ["conv_id"], "turn_idx", ts_col="ts",
    ).select(
        "conv_id",
        F.col("turn_idx"),
        F.lit("turn_idx").alias("column"),
        "check_id",
        "observed",
        "expected",
    )

    parts = [row_vio, dup, order]

    if conversations is not None:
        ref = referential_violations(
            transcripts, conversations, ["conv_id"]
        ).select(
            *key,
            F.lit("conv_id").alias("column"),
            F.lit("referential").alias("check_id"),
            F.col("conv_id").cast("string").alias("observed"),
            F.lit("conv_id exists in conversations").alias("expected"),
        )
        parts.append(ref)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validation_summary(
    plan: ValidationPlan,
    transcripts: DataFrame,
    conversations: DataFrame | None = None,
    salt_buckets: int = 1,
) -> dict:
    """One-action summary: violation counts per check class."""
    vio = full_validation(plan, transcripts, conversations, salt_buckets)
    rows = vio.groupBy("check_id").agg(F.count(F.lit(1)).alias("n")).collect()
    return {r["check_id"]: r["n"] for r in rows}
