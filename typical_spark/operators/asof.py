"""As-of (most-recent-match) join — the temporal attribution primitive.

No reference analog (typical validates single values; SURVEY Table B
"Joins" names only equi/anti shapes) — this is one of the custom
operators the engine adds for transcript/event analytics: attach to each
left row the single right row with the greatest right timestamp <= the
left timestamp (direction='backward'; 'forward' is the mirror), per key.

Spark-first plan — NO per-key loop, NO range self-join blowup:

    union(left-tagged, right-tagged)
      -> ONE shuffle on the key (window partition)
      -> ONE sort by (ts, side)  [right rows sort before left on ties,
                                  giving the inclusive <= semantics]
      -> last(right_payload, ignorenulls=True) over rows-unbounded-
         preceding carries the most recent right row forward
      -> keep left rows, unpack

Cost is identical to one sort-merge-join shuffle of both inputs; there
is no candidate-pair explosion at ANY key cardinality (a naive
left.join(right, ts >= r_ts) range join is O(n*m) per key). Duplicate
right rows on (key, ts) are broken deterministically (greatest payload
struct wins), so the operator is reproducible run-to-run; DuckDB's ASOF
JOIN picks an ARBITRARY duplicate, so dedupe the right side on
(key, ts) when an exact cross-engine oracle match is required.

Skew: a hot key serializes into one task's sort, same as every ordered
per-key operator (see ordering.py for the range-partition escape hatch
pattern); transcript/event keys are bounded in practice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, the most recent right row at-or-before its
    timestamp (direction='backward'), or the earliest at-or-after it
    ('forward'). Right columns (except the keys) come back prefixed;
    unmatched left rows keep NULLs (left-join semantics). Rows with a
    NULL key or NULL timestamp on either side never match.

    tolerance_seconds: when set, a match farther than this is nulled out
    (pandas merge_asof tolerance semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = list(by)
    payload_cols = [c for c in right.columns if c not in keys]
    # a left column named like a prefixed right column would silently
    # duplicate in the output (pandas merge_asof raises on suffix
    # clashes for the same reason) — fail loudly instead
    clashes = sorted(
        c for c in payload_cols if f"{right_prefix}{c}" in left.columns
    )
    if clashes:
        raise ValueError(
            "asof_join output column collision: left already has "
            f"{[right_prefix + c for c in clashes]}; pass a different "
            "right_prefix or rename the left columns"
        )
    # NULL stand-in structs are cast to the DataType OBJECT — a
    # simpleString()/DDL round-trip would choke on column names that
    # need quoting (spaces, commas)
    r_struct_type = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("s")
    ).schema["s"].dataType
    l_struct_type = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_type).alias("_l"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
    )
    keys_ok = F.lit(True)
    for k in keys:
        keys_ok = keys_ok & F.col(k).isNotNull()
    both = l_tagged.unionByName(r_tagged).where(
        F.col("_ts").isNotNull() & keys_ok
    )
    asc = direction == "backward"
    order = [
        F.col("_ts").asc() if asc else F.col("_ts").desc(),
        # on equal ts the right row must be visible to the left row
        F.col("_side").asc(),
        # duplicate right (key, ts) rows: greatest payload struct wins —
        # deterministic, engine-independent
        F.col("_r").asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    ).withColumn(
        "_m_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")),
                        ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - F.col("_m_ts").cast("double")
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("_m"))
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    result = matched.select(*out_cols)
    # true left-join semantics: left rows with a NULL key or NULL
    # timestamp cannot match, but they are NOT dropped — they come back
    # with NULL right columns (pandas merge_asof would refuse such keys
    # outright; a distributed attribution pass must not lose rows)
    l_ok = F.col(left_ts).isNotNull()
    for k in keys:
        l_ok = l_ok & F.col(k).isNotNull()
    unmatched = left.where(~l_ok).select(
        *[F.col(c) for c in left.columns],
        *[
            F.lit(None).cast(f.dataType).alias(f"{right_prefix}{f.name}")
            for f in r_struct_type.fields
        ],
    )
    return result.unionByName(unmatched)
