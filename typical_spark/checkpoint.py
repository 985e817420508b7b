"""Resumable validation runs: per-partition checkpoints + lineage manifest.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics persisted to an Iceberg manifest table". The unit of work is the
table's partition bucket (the conv-hash `bucket` column the transcript
table is written with — an Iceberg `bucket(conv_id)` transform on a real
deployment). The driver walks buckets in deterministic order, runs the
fused validation pass on each (Catalyst prunes the scan to that bucket's
files — check .explain() for PartitionFilters), appends the bucket's
violations to the sink, then appends one lineage row to the manifest:

    (run_id, bucket, status, n_rows, n_violations, wall_s, finished_at)

Resume = read the manifest, subtract completed buckets, process the rest.
A bucket is only ever marked complete AFTER its violations are durably
written, so a crash between write and mark re-processes one bucket
(at-least-once; the violations sink is keyed by bucket so re-writes
overwrite that bucket's directory, keeping output exactly-once).

At cluster scale each bucket-job is itself fully parallel (a bucket holds
1/N of the table, spread over its files); bucket granularity only bounds
the blast radius of a restart, not parallelism.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typical_spark.plans.validation import ValidationPlan

MANIFEST_SCHEMA = (
    "run_id string, bucket int, status string, n_rows long, "
    "n_violations long, wall_s double, finished_at double"
)


class CheckpointedRun:
    def __init__(
        self,
        spark: SparkSession,
        plan: ValidationPlan,
        out_dir: str,
        run_id: str = "run",
        bucket_col: str = "bucket",
    ):
        self.spark = spark
        self.plan = plan
        self.out_dir = out_dir
        self.run_id = run_id
        self.bucket_col = bucket_col
        self.manifest_path = os.path.join(out_dir, "manifest")
        self.violations_path = os.path.join(out_dir, "violations")

    # -- manifest ------------------------------------------------------

    def completed_buckets(self) -> set[int]:
        if not os.path.exists(self.manifest_path):
            return set()
        m = self.spark.read.parquet(self.manifest_path)
        rows = (
            m.where((F.col("run_id") == self.run_id) & (F.col("status") == "done"))
            .select("bucket").distinct().collect()
        )
        return {r["bucket"] for r in rows}

    def _append_manifest(self, bucket: int, n_rows: int, n_vio: int, wall: float):
        row = [(self.run_id, bucket, "done", n_rows, n_vio, wall, time.time())]
        self.spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.manifest_path)

    # -- run -----------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        fail_after: int | None = None,
    ) -> dict:
        """Process every not-yet-done bucket. `fail_after` aborts after N
        buckets (test hook for kill-and-resume)."""
        buckets = sorted(
            r[0]
            for r in df.select(self.bucket_col).distinct().collect()
        )
        done = self.completed_buckets()
        todo = [b for b in buckets if b not in done]
        processed = 0
        for b in todo:
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} buckets")
            t0 = time.time()
            part = df.where(F.col(self.bucket_col) == b)
            vio = self.plan.violations(part, with_message=False)
            # per-bucket directory -> re-running a bucket overwrites, not
            # duplicates (exactly-once output under at-least-once driver)
            out_dir = os.path.join(self.violations_path, f"bucket={b}")
            vio.write.mode("overwrite").parquet(out_dir)
            # ONE expensive check-evaluation pass per bucket: the
            # violation count comes from the (tiny) written output and
            # the row count from a projection-free count — a prior
            # version ran the fused check projection twice (once for
            # counts, once for the write), doubling every bucket's cost
            nv = self.spark.read.parquet(out_dir).count()
            n = part.count()
            self._append_manifest(b, n, nv, time.time() - t0)
            processed += 1
        return {
            "run_id": self.run_id,
            "buckets_total": len(buckets),
            "buckets_previously_done": len(done),
            "buckets_processed": processed,
        }

    def violations(self) -> DataFrame:
        return self.spark.read.option("basePath", self.violations_path).parquet(
            self.violations_path
        )

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest_path)


class StageCheckpoint:
    """Stage-level resume for multi-stage pipelines (the curation job's
    analog of CheckpointedRun's per-bucket manifest): each named stage's
    output is materialized to <root>/<name> as parquet, and a
    <name>.stage.json marker (row count, wall seconds) is committed only
    AFTER the write succeeds. A re-run loads completed stages from disk
    instead of recomputing them; a crash mid-write leaves no marker, so
    that stage re-runs from scratch (mode=overwrite keeps the output
    exactly-once).

    This also serves the cost model at scale: resuming from the
    materialized stage REPLACES the upstream lineage with a parquet
    scan, so a restarted 10-stage curation run on 100 TB re-reads only
    the last incomplete stage's input instead of recomputing the whole
    DAG (the same reason production pipelines write each stage to the
    lake; on Iceberg the stage table's snapshot is the marker)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fingerprint: dict | None = None,
    ):
        """fingerprint: the parameters the staged outputs depend on
        (thresholds, input path, ...). Stored in each stage marker and
        VALIDATED on resume — without it, re-running with changed
        arguments would silently load stale stage output computed under
        the old ones (e.g. survivors deduped at a different jaccard)."""
        self.spark = spark
        self.root = root
        self.fingerprint = fingerprint
        os.makedirs(root, exist_ok=True)

    def _data_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.stage.json")

    def done(self, name: str) -> bool:
        return os.path.exists(self._marker_path(name))

    def completed(self) -> list[str]:
        return sorted(
            f[: -len(".stage.json")]
            for f in os.listdir(self.root)
            if f.endswith(".stage.json")
        )

    def stage(self, name: str, thunk) -> tuple[DataFrame, bool]:
        """Return (stage output, resumed?). Runs `thunk()` and
        materializes its DataFrame unless the stage already completed.
        Intermediates the thunk's result cached on its own behalf (the
        dedup family's _owned_cache) are unpersisted once the write has
        materialized them."""
        import json

        if self.done(name):
            with open(self._marker_path(name)) as fh:
                marker = json.load(fh)
            if self.fingerprint is not None and marker.get(
                "fingerprint"
            ) != self.fingerprint:
                raise ValueError(
                    f"stage {name!r} in {self.root} was built with "
                    f"different parameters: {marker.get('fingerprint')!r}"
                    f" vs current {self.fingerprint!r}; use a fresh "
                    "checkpoint dir (or delete the stale stage) instead "
                    "of silently mixing runs"
                )
            return self.spark.read.parquet(self._data_path(name)), True
        t0 = time.time()
        df = thunk()
        df.write.mode("overwrite").parquet(self._data_path(name))
        for cached in getattr(df, "_owned_cache", []):
            cached.unpersist(blocking=False)
        out = self.spark.read.parquet(self._data_path(name))
        marker = {
            "stage": name,
            "n_rows": out.count(),
            "wall_s": time.time() - t0,
            "finished_at": time.time(),
            "fingerprint": self.fingerprint,
        }
        tmp = self._marker_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(marker, fh)
        os.replace(tmp, self._marker_path(name))  # atomic commit
        return out, False
