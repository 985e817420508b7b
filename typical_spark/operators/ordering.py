"""Per-group ordering checks: monotonicity / contiguity / gap detection.

No reference analog (typical validates one value at a time); required by
the input_hint's stable-turn-ordering invariant (SURVEY.md Table B,
"Window functions" row). One window pass per group computes lag() of the
ordered columns; each violation class is a cheap comparison on the lagged
values — all in a single shuffle on the group key.

Scale: the window shuffles on `group_cols` (conv_id). Conversations are
bounded (≲10^4 turns), so per-group state is tiny; hot groups are a salt
concern only for *uniqueness* (which handles it separately) — an ordering
check cannot be salted without breaking the order, and does not need to
be at realistic conversation sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordering_violations(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    ts_col: str | None = None,
    require_contiguous: bool = True,
    require_ts_monotonic: bool = True,
) -> DataFrame:
    """Violations of per-group turn ordering.

    Emits one row per offending row with check_id in:
      order_duplicate  — same order value as previous row (row_number tie)
      order_gap        — order jumps by > 1 (contiguity break)
      order_regression — order value decreased
      ts_out_of_order  — timestamp decreased while order increased
    Output: group_cols…, order value, check_id, observed, expected.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc())
    prev_o = F.lag(order_col).over(w)
    lagged = df.select(
        *group_cols,
        F.col(order_col),
        prev_o.alias("_prev_o"),
        *( [F.col(ts_col), F.lag(ts_col).over(w).alias("_prev_ts")]
           if ts_col else [] ),
    )
    checks = []
    d = F.col(order_col) - F.col("_prev_o")
    checks.append(
        F.when(
            F.col("_prev_o").isNotNull() & (d == 0),
            F.struct(
                F.lit("order_duplicate").alias("check_id"),
                F.col(order_col).cast("string").alias("observed"),
                F.concat(F.lit("!= prev "), F.col("_prev_o")).alias("expected"),
            ),
        )
    )
    if require_contiguous:
        checks.append(
            F.when(
                F.col("_prev_o").isNotNull() & (d > 1),
                F.struct(
                    F.lit("order_gap").alias("check_id"),
                    F.col(order_col).cast("string").alias("observed"),
                    F.concat(F.lit("prev + 1 = "), F.col("_prev_o") + 1).alias(
                        "expected"
                    ),
                ),
            )
        )
    if ts_col and require_ts_monotonic:
        checks.append(
            F.when(
                F.col("_prev_ts").isNotNull()
                & F.col(ts_col).isNotNull()
                & (F.col(ts_col) < F.col("_prev_ts"))
                & (d > 0),
                F.struct(
                    F.lit("ts_out_of_order").alias("check_id"),
                    F.col(ts_col).cast("string").alias("observed"),
                    F.concat(F.lit(">= prev ts "), F.col("_prev_ts").cast("string")).alias(
                        "expected"
                    ),
                ),
            )
        )
    arr = F.array_compact(F.array(*checks))
    return (
        lagged.withColumn("_v", arr)
        .where(F.size("_v") > 0)
        .select(*group_cols, F.col(order_col), F.explode("_v").alias("v"))
        .select(*group_cols, F.col(order_col), "v.*")
    )
