"""Table IO seam.

Batch reads are plain `spark.read.parquet` over the driver-provided
testdata (TESTDATA.md). The same functions take an `iceberg://catalog.db`
style locator so a cluster deployment swaps in
`spark.read.format("iceberg").load(...)` / `df.writeTo(...).append()`
without touching operator code; the local harness has no Iceberg jar, so
that branch is exercised only when the runtime provides it.

Scans stay declarative: callers `.select()` the columns they check and put
partition-prunable filters in `.where()`, so Catalyst pushes both into the
parquet/Iceberg scan (verify with .explain(): PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if sf_dir.startswith("iceberg://"):
        return spark.read.format("iceberg").load(f"{sf_dir[len('iceberg://'):]}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def write_output(df: DataFrame, target: str, mode: str = "append") -> None:
    """Violations / verdicts / manifest sink. Iceberg `writeTo(...).append()`
    on a cluster; parquet locally."""
    if target.startswith("iceberg://"):
        w = df.writeTo(target[len("iceberg://"):])
        w.append() if mode == "append" else w.createOrReplace()
    else:
        df.write.mode("append" if mode == "append" else "overwrite").parquet(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) by its join/
    window keys — the storage-side half of shuffle elimination: two
    tables bucketed by the same keys into the same bucket count join with
    ZERO Exchange (SortMergeJoin reads co-located buckets directly), and
    window/groupBy over the bucket keys skips its shuffle too. This is
    the parquet/warehouse analog of Iceberg's `bucket(N, col)` partition
    transform named in the deployment plan; at 10^12 turns, bucketing
    transcripts AND conversations by conv_id turns every per-conv
    operator from a shuffle into a local sort.

    Uses saveAsTable (bucket metadata lives in the session catalog/
    warehouse — plain .parquet(path) cannot record bucketing)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a write_bucketed table WITH its bucket metadata (only the
    catalog path preserves it; reading the files directly would lose the
    co-location guarantee and reintroduce the shuffle)."""
    return spark.table(table)
