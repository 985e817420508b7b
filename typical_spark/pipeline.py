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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from typical_spark.plans.validation import ValidationPlan

VIOLATION_SCHEMA_COLS = ("conv_id", "turn_idx", "column", "check_id", "observed", "expected")


def full_validation(
    plan: ValidationPlan,
    transcripts: DataFrame,
    conversations: DataFrame | None = None,
    salt_buckets: int = 1,
) -> DataFrame:
    """All violation classes as one DataFrame (see module docstring).

    FUSED plan (optimization guide §2.4 "remove shuffles outright"): the
    previous shape ran four independent subplans — row checks (1 scan),
    duplicate_rows (scan + groupBy-prefilter shuffle of every key + join
    + candidate window), ordering_violations (scan + conv-window shuffle)
    and a broadcast anti-join (1 scan) — ~4 scans of the table and 2 full
    key shuffles. All four checks are decided by the same narrow columns
    (conv_id, turn_idx, ts, role) plus the scan-local row-check array, so
    one scan and ONE exchange suffice:

      scan -> fused row-check array (text etc. never leaves the scan)
           -> broadcast-join the conversations dim (scan-local, pre-shuffle)
           -> repartition(conv_id, _ns) + one sort
           -> lag()      over (conv_id)            = ordering checks
              row_number over (conv_id, turn_idx)  = keep-first dup rank
           -> concat arrays, one explode.

    `_ns` spreads conv_id-NULL rows by turn_idx so they cannot pin one
    task (they need no ordering check; their dup groups are per-turn_idx
    and stay co-located). Duplicate ranks are the plain keep-first
    row_number over (ts, role) — pytest-pinned equal to the salted
    duplicate_rows output on the transcript family. `salt_buckets` is
    kept for API stability; the fused pass's only window partition key is
    conv_id — the same skew boundary ordering_violations always had — and
    a genuinely pathological key group can still use
    duplicate_rows(salt_buckets=N) standalone.
    """
    key = list(plan.spec.key_columns)
    kc, oc = key[0], key[-1]

    src = transcripts.select(
        F.col(kc), F.col(oc), F.col("ts"), F.col("role"),
        plan._violation_array().alias("_rv"),
    )
    has_ref = conversations is not None
    if has_ref:
        dim = (
            conversations.select(F.col(kc))
            .dropDuplicates([kc])
            .withColumn("_dim", F.lit(True))
        )
        src = src.join(F.broadcast(dim), [kc], "left")

    # NULL-conv spread key: non-null convs cluster whole; null convs
    # scatter by the dup key so the dup groups stay intact
    src = src.withColumn("_ns", F.when(F.col(kc).isNull(), F.col(oc)))

    # The two windows are applied in sequence (separate selects) so the
    # conv-window plans BOTTOM: EnsureRequirements then inserts at most
    # ONE exchange — hash(conv_id, _ns) — and one sort; the dup window's
    # clustering ((conv_id, _ns, turn_idx) ⊇ subset rule) and ordering
    # (prefix of the conv-window's sort) are both already satisfied.
    # When the input scan is ALREADY hash-clustered on conv_id (the
    # bucketed bench table, or an Iceberg bucket(conv_id) layout), the
    # subset rule elides the exchange entirely — which is why this is
    # requirement-driven instead of an explicit repartition(), which
    # would shuffle unconditionally.
    w_ord = Window.partitionBy(kc, "_ns").orderBy(
        F.col(oc).asc(), F.col("ts").asc(), F.col("role").asc()
    )
    w_dup = Window.partitionBy(kc, "_ns", oc).orderBy(
        F.col("ts").asc(), F.col("role").asc()
    )
    ann = src.select(
        "*",
        F.lag(oc).over(w_ord).alias("_po"),
        F.lag("ts").over(w_ord).alias("_pts"),
    ).select("*", F.row_number().over(w_dup).alias("_dr"))

    conv_nn = F.col(kc).isNotNull()
    d = F.col(oc) - F.col("_po")

    def _v(check_id: str, observed, expected, column: str):
        return F.struct(
            F.lit(column).alias("column"),
            F.lit(check_id).alias("check_id"),
            observed.alias("observed"),
            expected.alias("expected"),
        )

    extras = [
        F.when(
            F.col("_dr") > 1,
            _v(
                "unique_key",
                F.col("_dr").cast("string"),
                F.lit(f"unique {tuple(key)}"),
                key[-1],
            ),
        ),
        F.when(
            conv_nn & F.col("_po").isNotNull() & (d == 0),
            _v(
                "order_duplicate",
                F.col(oc).cast("string"),
                F.concat(F.lit("!= prev "), F.col("_po")),
                oc,
            ),
        ),
        F.when(
            conv_nn & F.col("_po").isNotNull() & (d > 1),
            _v(
                "order_gap",
                F.col(oc).cast("string"),
                F.concat(F.lit("prev + 1 = "), F.col("_po") + 1),
                oc,
            ),
        ),
        F.when(
            conv_nn
            & F.col("_pts").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("ts") < F.col("_pts"))
            & (d > 0),
            _v(
                "ts_out_of_order",
                F.col("ts").cast("string"),
                F.concat(F.lit(">= prev ts "), F.col("_pts").cast("string")),
                oc,
            ),
        ),
    ]
    if has_ref:
        extras.append(
            F.when(
                conv_nn & F.col("_dim").isNull(),
                _v(
                    "referential",
                    F.col(kc).cast("string"),
                    F.lit(f"{kc} exists in conversations"),
                    kc,
                ),
            )
        )

    combined = F.concat(F.col("_rv"), F.array_compact(F.array(*extras)))
    return (
        ann.select(F.col(kc), F.col(oc), F.explode(combined).alias("v"))
        .select(kc, oc, "v.*")
    )


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
