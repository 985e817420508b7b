"""Kill-and-resume: a run killed mid-way resumes from the manifest and
produces exactly the same violations as an uninterrupted run
(SURVEY.md §5 engine test plan: "kill-and-resume from manifest")."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from typical_spark import compile_table_spec
from typical_spark.checkpoint import CheckpointedRun
from typical_spark.specs import transcript_spec


@pytest.fixture()
def bucketed_df(spark, transcripts_df):
    return transcripts_df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")
    )


def test_kill_and_resume_produces_identical_output(spark, bucketed_df):
    plan = compile_table_spec(transcript_spec())
    full_expected = plan.violations(bucketed_df, with_message=False).count()

    tmp = tempfile.mkdtemp(prefix="ckpt_")
    try:
        run = CheckpointedRun(spark, plan, tmp, run_id="r1")
        with pytest.raises(RuntimeError, match="injected failure"):
            run.run(bucketed_df, fail_after=3)
        assert len(run.completed_buckets()) == 3

        # resume: picks up only the remaining buckets
        summary = CheckpointedRun(spark, plan, tmp, run_id="r1").run(bucketed_df)
        assert summary["buckets_previously_done"] == 3
        assert summary["buckets_processed"] == summary["buckets_total"] - 3

        got = run.violations().count()
        assert got == full_expected

        # manifest lineage covers every bucket exactly once, with metrics
        m = run.manifest().collect()
        assert sorted(r["bucket"] for r in m) == sorted(
            r[0] for r in bucketed_df.select("bucket").distinct().collect()
        )
        assert all(r["n_rows"] > 0 and r["wall_s"] >= 0 for r in m)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_rerun_is_noop(spark, bucketed_df):
    plan = compile_table_spec(transcript_spec())
    tmp = tempfile.mkdtemp(prefix="ckpt_")
    try:
        CheckpointedRun(spark, plan, tmp, run_id="r2").run(bucketed_df)
        again = CheckpointedRun(spark, plan, tmp, run_id="r2").run(bucketed_df)
        assert again["buckets_processed"] == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
