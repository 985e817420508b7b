"""Point-in-interval join (windowed attribution / containment join).

No reference analog (typical validates single values; SURVEY Table B
"Joins" names equi/anti shapes only) — this is the multi-match sibling
of operators/asof.py: attach to each left "point" row EVERY right
interval row whose [start, end] contains the point's timestamp, per
key. As-of answers "the most recent click"; this answers "all click
windows a purchase falls into" — attribution, promo overlap, SLA
windows, session containment.

Spark-first plan — the naive spelling
    points.join(intervals, keys & (pt >= start) & (pt <= end))
compiles to a join on the equi-keys with the range as a post-filter:
fine when keys are selective, catastrophic on hot keys (one user with
k points and m intervals materializes k*m candidate pairs). This
operator BUCKETIZES time instead:

    intervals -> explode(sequence(floor(start/W), floor(end/W)))
    points    -> one bucket: floor(pt/W)
    equi-join on (keys..., bucket)  ->  exact containment filter

Each candidate pair now shares a W-wide bucket, so the blowup is
bounded by interval_density_per_bucket regardless of key cardinality,
and Catalyst runs it as a plain shuffled (or broadcast) hash join.
Choose W near the typical interval length: each interval lands in
~(len/W)+1 buckets (its replication factor), and each point probes
exactly one bucket. A pathological interval spanning the whole corpus
would replicate into every bucket — `max_interval_buckets` guards that
loudly instead of silently exploding the build side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_INTERVAL_BUCKETS = 4096


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_seconds: int = 3600,
    right_prefix: str = "r_",
    max_interval_buckets: int = DEFAULT_MAX_INTERVAL_BUCKETS,
) -> DataFrame:
    """Inner join: each point row x each interval row (same keys) with
    start <= point_ts <= end. Interval columns (except the keys) come
    back prefixed. NULL keys/timestamps never match. Intervals with
    end < start are dropped (empty). An interval wider than
    max_interval_buckets * bucket_seconds raises at runtime rather than
    fanning out unboundedly."""
    keys = list(by)
    payload = [c for c in intervals.columns if c not in keys]

    def bucket(df: DataFrame, name: str):
        # ANSI-safe epoch seconds: timestamp->double casts are banned in
        # ANSI mode, unix_micros is legal in both (session tz is UTC,
        # so the NTZ->TZ cast is offset-free)
        dt = dict(df.dtypes)[name]
        c = F.col(name)
        if dt.startswith("timestamp"):
            sec = F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
        elif dt == "date":
            sec = F.unix_date(c).cast("double") * 86400.0
        else:
            sec = c.cast("double")
        return F.floor(sec / F.lit(float(bucket_seconds)))

    s_b, e_b = bucket(intervals, start_ts), bucket(intervals, end_ts)
    n_b = e_b - s_b + 1
    guard = F.when(
        n_b <= F.lit(max_interval_buckets), n_b
    ).otherwise(
        F.raise_error(F.concat(
            F.lit(
                f"interval_join: interval spans more than "
                f"{max_interval_buckets} buckets of {bucket_seconds}s — "
                f"raise bucket_seconds or max_interval_buckets (span="
            ),
            n_b.cast("string"),
            F.lit(" buckets)"),
        ))
    )
    r = (
        intervals.where(
            F.col(start_ts).isNotNull()
            & F.col(end_ts).isNotNull()
            & (F.col(end_ts) >= F.col(start_ts))
        )
        # the guard is folded into the sequence length (not a separate
        # column) so column pruning cannot optimize the raise_error away
        .withColumn("_bucket", F.explode(F.sequence(s_b, s_b + guard - 1)))
        .select(
            *keys,
            "_bucket",
            F.col(start_ts).alias("_start"),
            F.col(end_ts).alias("_end"),
            *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
        )
    )
    p = points.where(F.col(point_ts).isNotNull()).withColumn(
        "_bucket", bucket(points, point_ts)
    )
    joined = p.join(r, on=[*keys, "_bucket"], how="inner").where(
        (F.col(point_ts) >= F.col("_start"))
        & (F.col(point_ts) <= F.col("_end"))
    )
    return joined.drop("_bucket", "_start", "_end")
