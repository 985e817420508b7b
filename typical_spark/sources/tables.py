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


def merge_keyed(df: DataFrame, target: str, key_cols: list[str]) -> None:
    """Exactly-once keyed upsert through the TableIO seam: rows in `df`
    REPLACE any existing target rows with the same key; everything else
    is retained. Re-applying the same batch is therefore a no-op — the
    idempotent-append primitive a retried foreachBatch micro-batch
    needs (streaming/incremental.py), where a plain .mode('append')
    duplicates rows on redelivery.

    iceberg:// targets run a real MERGE INTO (WHEN MATCHED UPDATE SET *
    / WHEN NOT MATCHED INSERT *) — atomic snapshot commit, the
    production path. The local-parquet stand-in rewrites the table
    (anti-join old rows on the keys, union the batch, write to a
    sibling tmp dir, swap): correct and idempotent, but the swap is not
    crash-atomic and the rewrite is O(table) per merge — fine for a
    sandbox index, wrong at lake scale, which is exactly why the seam
    exists. Missing target == empty table (first micro-batch).

    NOTE for repeated merges in one job: the caller must ensure `df` is
    deterministic or materialized (foreachBatch batches are), since the
    stand-in reads the target it is about to replace."""
    if not key_cols:
        raise ValueError("merge_keyed requires at least one key column")
    if target.startswith("iceberg://"):
        tbl = target[len("iceberg://"):]
        spark = df.sparkSession
        df.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {tbl} t USING _merge_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return
    import shutil
    import tempfile

    spark = df.sparkSession
    if os.path.exists(target):
        existing = spark.read.parquet(target)
        keys = df.select(*key_cols).dropDuplicates()
        merged = existing.join(keys, key_cols, "left_anti").unionByName(df)
    else:
        merged = df
    parent = os.path.dirname(os.path.abspath(target)) or "."
    os.makedirs(parent, exist_ok=True)  # first merge creates the lineage
    tmp = tempfile.mkdtemp(prefix="._merge_", dir=parent)
    try:
        # write fully before touching the target; localCheckpoint-free
        # because the tmp write IS the materialization barrier
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


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
