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
