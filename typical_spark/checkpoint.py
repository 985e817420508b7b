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
    "n_violations long, wall_s double, finished_at double, "
    "fingerprint long, mode string"
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

    def _append_manifest(
        self,
        bucket: int,
        n_rows: int,
        n_vio: int,
        wall: float,
        fingerprint: int | None = None,
        mode: str = "validated",
    ):
        row = [(self.run_id, bucket, "done", n_rows, n_vio, wall,
                time.time(), fingerprint, mode)]
        self.spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.manifest_path)

    # -- incremental re-validation --------------------------------------

    def bucket_fingerprints(self, df: DataFrame) -> dict[int, int]:
        """Order-independent content fingerprint per bucket: sum of a
        per-row xxhash64 over every column, folded into 31 bits per row
        so the per-bucket sum stays exact (no long overflow) up to 2^32
        rows per bucket — ONE map-side-combined pass over the table,
        the cost of a count. Any row change/insert/delete moves the sum
        (duplicate rows each contribute — XOR would let pairs cancel)."""
        h = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1 << 31))
        rows = df.groupBy(self.bucket_col).agg(F.sum(h).alias("fp")).collect()
        return {r[self.bucket_col]: r["fp"] for r in rows}

    def latest_fingerprints(self) -> dict[int, int]:
        """Last recorded fingerprint per bucket across ALL runs (the
        previous validation states to diff against)."""
        if not os.path.exists(self.manifest_path):
            return {}
        m = self.spark.read.parquet(self.manifest_path)
        rows = (
            m.where(F.col("status") == "done")
            .groupBy("bucket")
            .agg(F.max_by("fingerprint", "finished_at").alias("fp"),
                 F.max_by("n_rows", "finished_at").alias("n_rows"),
                 F.max_by("n_violations", "finished_at").alias("n_vio"))
            .collect()
        )
        self._latest_meta = {r["bucket"]: (r["n_rows"], r["n_vio"]) for r in rows}
        return {r["bucket"]: r["fp"] for r in rows}

    def run_incremental(self, df: DataFrame) -> dict:
        """Nightly-rerun mode: re-validate ONLY buckets whose content
        fingerprint changed since the last recorded validation (new
        buckets count as changed; a bucket whose previous manifest row
        predates fingerprints, i.e. fingerprint NULL, also counts as
        changed). Unchanged buckets carry their previous metrics
        forward as a mode='carried' manifest row and keep their
        already-written violations partition — so an append-mostly
        table pays only for the buckets that actually moved."""
        fps = self.bucket_fingerprints(df)
        prev = self.latest_fingerprints()
        carried = validated = 0
        for b in sorted(fps):
            if b in prev and prev[b] is not None and prev[b] == fps[b]:
                n_rows, n_vio = self._latest_meta[b]
                self._append_manifest(
                    b, n_rows, n_vio, 0.0, fps[b], mode="carried"
                )
                carried += 1
            else:
                self._validate_bucket(df, b, fps[b])
                validated += 1
        return {
            "run_id": self.run_id,
            "buckets_total": len(fps),
            "buckets_validated": validated,
            "buckets_carried": carried,
        }

    # -- run -----------------------------------------------------------

    def _validate_bucket(
        self, df: DataFrame, b: int, fingerprint: int | None = None
    ) -> None:
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
        # row count and content fingerprint in ONE projection-light pass
        # (full runs record fingerprints too, so a later run_incremental
        # can diff against them)
        h = F.pmod(
            F.xxhash64(*[F.col(c) for c in part.columns]), F.lit(1 << 31)
        )
        meta = part.agg(
            F.count(F.lit(1)).alias("n"), F.sum(h).alias("fp")
        ).head()
        fp = fingerprint if fingerprint is not None else meta["fp"]
        self._append_manifest(b, meta["n"], nv, time.time() - t0, fp)

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
            self._validate_bucket(df, b)
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
