"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- Runs every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
- Also runs the flagship transcript validation suite (row checks +
  uniqueness + ordering + referential) on the deterministic synthetic
  transcript table (~2M turns, cached parquet) and reports turns/sec —
  the BASELINE.json headline metric.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N):
  python bench.py --scaling   runs the flagship suite at local[8] and
  local[32] in separate JVMs and reports both throughputs + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "2000000"))


def _flagship(spark, n_turns: int) -> dict:
    """Full transcript check suite; returns counters + timing."""
    from pyspark.sql import functions as F

    from typical_spark import compile_table_spec
    from typical_spark.operators.ordering import ordering_violations
    from typical_spark.operators.referential import referential_violations
    from typical_spark.operators.uniqueness import duplicate_rows
    from typical_spark.operators.stats import column_stats
    from typical_spark.sources.transcripts import transcripts_dataset
    from typical_spark.specs import transcript_spec

    tdf, cdf = transcripts_dataset(spark, n_turns)  # cached parquet, not timed
    n = tdf.count()
    t0 = time.time()
    plan = compile_table_spec(transcript_spec())
    n_row_vio = plan.violations(tdf, with_message=False).count()
    n_dup = duplicate_rows(
        tdf, ["conv_id", "turn_idx"], ["ts", "role"], salt_buckets=8
    ).count()
    n_ord = ordering_violations(
        tdf.where(F.col("conv_id").isNotNull()), ["conv_id"], "turn_idx", ts_col="ts"
    ).count()
    n_ref = referential_violations(tdf, cdf, ["conv_id"]).count()
    n_stats = column_stats(tdf, ["turn_idx", "text", "ts"]).count()
    wall = time.time() - t0
    return {
        "n_turns": n,
        "violations": n_row_vio + n_dup + n_ord + n_ref,
        "stats_rows": n_stats,
        "sec": wall,
        "turns_per_sec": n / wall,
    }


def run_flagship_subprocess(cores: int) -> dict:
    """Fresh JVM at a given parallelism (for the N-vs-4N scaling proof)."""
    code = (
        "import json,sys; sys.path.insert(0,'/root/repo');"
        "from typical_spark.session import get_spark;"
        "import bench;"
        f"s=bench._flagship(get_spark('scale', cores={cores}, shuffle_partitions={cores}), {BENCH_TURNS});"
        "print('RESULT::'+json.dumps(s))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"scaling run failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if "--scaling" in sys.argv:
        r8 = run_flagship_subprocess(8)
        r32 = run_flagship_subprocess(32)
        eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cores",
            "value": round(eff, 4),
            "unit": "ratio",
            "throughput_local8": round(r8["turns_per_sec"], 1),
            "throughput_local32": round(r32["turns_per_sec"], 1),
            "n_turns": r8["n_turns"],
        }))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from typical_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", cores=cpus)
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.time() - t0, 3)

    flag = _flagship(spark, BENCH_TURNS)
    timings["transcript_validate_2m"] = round(flag["sec"], 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "turns_per_sec_validated",
        "value": round(flag["turns_per_sec"], 1),
        "unit": "sec",
        "queries": timings,
        "total_sec": total,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "bench_turns": flag["n_turns"],
    }))


if __name__ == "__main__":
    main()
