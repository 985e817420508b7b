"""Run-length encoding over ordered groups (gaps-and-islands).

No reference analog (typical has no ordered-sequence surface) — this is
the relational pattern behind bot detection (a user firing the same
event 50x in a row), transcript loop detection (an agent repeating the
same tool call), and boilerplate run collapsing: collapse consecutive
equal values within an ordered group into one row per run.

Spark-first plan — the classic two-row_number difference trick, no
iteration and no per-row Python:

    rn_all  = row_number over (key             order by order)
    rn_val  = row_number over (key, run_value  order by order)
    run_id  = rn_all - rn_val      (constant within a run, per value)
    group by (key, run_value, run_id) -> one row per run

Both windows hash-partition on the key, and AQE coalesces the two
shuffles into one exchange reuse when the partitioning matches (the
second window adds the value to the PARTITION clause but Spark keeps
the sort-based window pipeline local after the first shuffle). The
aggregation is map-side combined. One ordered sort per key group —
the same cost envelope as any per-key window check in ordering.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_runs(
    df: DataFrame,
    by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    min_run_len: int = 1,
) -> DataFrame:
    """One row per maximal run of consecutive equal `value_col` values
    within each `by` group ordered by `order_by` (which must be a total
    order within the group for deterministic run boundaries — include a
    unique tiebreaker column). Rows with a NULL key, NULL order, or
    NULL value are excluded (NULL never equals NULL, so they cannot
    extend a run).

    Output: (*by, value_col, run_len, start_<first order col>,
    end_<first order col>) filtered to run_len >= min_run_len."""
    keys = list(by)
    order = list(order_by)
    not_null = F.lit(True)
    for c in (*keys, *order, value_col):
        not_null = not_null & F.col(c).isNotNull()
    base = df.where(not_null)
    ord_cols = [F.col(c).asc() for c in order]
    rn_all = F.row_number().over(Window.partitionBy(*keys).orderBy(*ord_cols))
    rn_val = F.row_number().over(
        Window.partitionBy(*keys, value_col).orderBy(*ord_cols)
    )
    anchor = order[0]
    return (
        base.select(
            *keys,
            value_col,
            F.col(anchor),
            (rn_all - rn_val).alias("_run"),
        )
        .groupBy(*keys, value_col, "_run")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.min(anchor).alias(f"start_{anchor}"),
            F.max(anchor).alias(f"end_{anchor}"),
        )
        .where(F.col("run_len") >= min_run_len)
        .drop("_run")
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: for each user, the earliest completion chain of
    `steps` — t_1 = first step-1 event, t_i = first step-i event at or
    after t_{i-1}. The product-analytics conversion primitive (ordered
    semantics, earliest-first greedy, which is the standard and — being
    a chain of min() aggregates — deterministic and engine-exact).

    Plan: one filtered map-side-combined min() aggregate per step plus
    an equi-join per transition, all on the user key — k-1 narrow joins
    of per-user scalar rows, never a window over raw events. At 10^12
    events each stage filters to its step's events before shuffling, so
    the heavy table crosses the wire once per participating step, not
    once per user.

    Output: (user_col, t_1..t_k, step_reached) — users who never did
    step 1 are absent; t_i is NULL once the chain breaks."""
    if not steps:
        raise ValueError("steps must be non-empty")
    base = df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    out = (
        base.where(F.col(event_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.where(F.col(event_col) == step)
            .join(
                out.select(user_col, F.col(f"t_{i - 1}")).where(
                    F.col(f"t_{i - 1}").isNotNull()
                ),
                user_col,
            )
            .where(F.col(ts_col) >= F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        out = out.join(nxt, user_col, "left")
    reached = F.lit(0)
    for i in range(1, len(steps) + 1):
        reached = reached + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return out.withColumn("step_reached", reached.cast("int"))


def ordered_paths(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    sep: str = " -> ",
    max_len: int | None = None,
) -> DataFrame:
    """Per-key ordered sequence assembly — the conversation/transcript
    export shape: every key's rows collected into ONE ordered array
    (plus a joined path string) for training serialization, session
    analysis, or per-conversation replay. The reference's stable-order
    iteration contract (sort within conv_id by turn_idx — SURVEY §1.2's
    per-turn-equality invariant) lifted to an exported artifact.

    Determinism requires a TOTAL order: pass tie-breaking order_cols
    (e.g. [ts, event_id]). Rows with a NULL key, NULL value, or any
    NULL order column are EXCLUDED (no defined identity/position — and
    engines disagree on NULL-first vs NULL-last inside collations, so
    keeping them would break cross-engine equality).

    Scale shape: ONE map-side-combinable collect_list aggregation —
    each row shuffles once; ordering happens INSIDE the per-key array
    via sort_array (codegen'd, no window, no per-group sort task). A
    key's whole sequence must fit in one task — inherent to assembly;
    conversations are bounded, and `max_len` caps pathological keys
    (truncates AFTER the sort: keep-first semantics).

    Output: (key_col, n_items bigint, items array, path string) where
    n_items counts the FULL sequence (pre-truncation).
    """
    cond = F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
    for c in order_cols:
        cond = cond & F.col(c).isNotNull()
    order_struct = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("_v")
    )
    agg = df.where(cond).groupBy(key_col).agg(
        F.sort_array(F.collect_list(order_struct)).alias("_s")
    )
    items = F.transform(F.col("_s"), lambda s: s["_v"])
    if max_len is not None:
        items = F.slice(items, 1, int(max_len))
    return agg.select(
        F.col(key_col),
        F.size("_s").cast("bigint").alias("n_items"),
        items.alias("items"),
        F.array_join(items, sep).alias("path"),
    )
