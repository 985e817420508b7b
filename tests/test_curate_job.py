"""The curation entrypoint (jobs/curate_documents.py) end-to-end in
process: every stage engaged, outputs written, counts monotone."""

import json

import pytest
import sys


def test_curate_job_end_to_end(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import curate_documents

    out = tmp_path / "curated"
    rc = curate_documents.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out),
        "--min-logprob", "-3.45",
        "--strata", "en=0.5",
    ])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["input"] == 500
    assert (counts["input"] >= counts["after_dedup"]
            >= counts["after_lm_gate"] >= counts["after_rebalance"]
            >= counts["train_docs"] > 0)
    assert counts["after_rebalance"] < counts["after_lm_gate"]  # en halved
    assert counts["packed_rows"] == counts["train_docs"]
    surv = spark.read.parquet(str(out / "survivors"))
    packed = spark.read.parquet(str(out / "packing"))
    assert surv.count() == counts["after_rebalance"]
    assert set(r["split"] for r in surv.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    assert {"shard", "offset", "first_seq", "last_seq"} <= set(packed.columns)
    # deterministic: re-running reproduces identical curation decisions
    out2 = tmp_path / "curated2"
    curate_documents.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out2),
        "--min-logprob", "-3.45",
        "--strata", "en=0.5",
    ])
    a = sorted(r["doc_id"] for r in surv.collect())
    b = sorted(r["doc_id"] for r in
               spark.read.parquet(str(out2 / "survivors")).collect())
    assert a == b


def test_curate_job_keeps_unscored_and_null_lang_docs(spark, tmp_path, capsys):
    """The review-fixed edge paths, exercised with counts > 0: docs too
    short for an LM score and docs with NULL lang must survive the gate
    and the rebalance (counted), not silently vanish."""
    import curate_documents

    rows = (
        [(i, "some reasonably long english document text here " * 3,
          "en", 150) for i in range(40)]
        + [(100, "short", "en", 5),          # 1 token: no LM score
           (101, "tiny", None, 4),           # 1 token AND NULL lang
           (102, "a normal length document with plenty of words inside",
            None, 52)]                       # NULL lang only
    )
    src = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).write.parquet(str(src))
    out = tmp_path / "out"
    rc = curate_documents.main([
        "--input", str(src), "--out", str(out),
        "--min-logprob", "999",              # gate rejects EVERY scored doc
        "--strata", "en=1.0",
    ])
    assert rc == 0
    import json as _json

    counts = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # only the unscored docs survive a reject-everything gate
    assert counts["lm_unscored_kept"] == 2
    assert counts["after_lm_gate"] == 2
    assert counts["null_lang_kept"] == 1     # doc 101 (102 was scored+rejected)
    assert counts["after_rebalance"] == 2
    surv = {r["doc_id"] for r in
            spark.read.parquet(str(out / "survivors")).collect()}
    assert surv == {100, 101}


def test_curate_job_kill_and_resume(spark, tmp_path, capsys, monkeypatch):
    """Stage-level checkpoint/resume (VERDICT r3 item 6): a run killed
    after the dedup stage resumes WITHOUT recomputing it (proved by
    poisoning the dedup operator on the second run) and produces output
    identical to an uncheckpointed run."""
    import json

    import pytest as _pytest

    sys.path.insert(0, "/root/repo/jobs")
    import curate_documents

    ckdir = tmp_path / "ck"
    out = tmp_path / "out"
    argv = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out),
        "--min-logprob", "-3.45",
        "--strata", "en=0.5",
        "--checkpoint-dir", str(ckdir),
    ]
    # run 1: killed right after the most expensive stage completes
    with _pytest.raises(RuntimeError, match="injected failure"):
        curate_documents.main(argv + ["--fail-after-stage", "dedup_survivors"])
    from typical_spark.checkpoint import StageCheckpoint

    ck = StageCheckpoint(spark, str(ckdir))
    assert ck.completed() == ["dedup_survivors"]
    capsys.readouterr()

    # run 2: dedup must NOT rerun — poison it and resume to completion
    def boom(*a, **k):
        raise AssertionError("dedup stage was recomputed on resume")

    monkeypatch.setattr(
        "typical_spark.operators.dedup.minhash_near_duplicates", boom
    )
    assert curate_documents.main(argv) == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["dedup_survivors_resumed"] is True
    assert ck.completed() == ["dedup_survivors", "lm_gated", "rebalanced"]
    monkeypatch.undo()

    # identical curation decisions to the uncheckpointed path
    out_ref = tmp_path / "ref"
    curate_documents.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out_ref),
        "--min-logprob", "-3.45",
        "--strata", "en=0.5",
    ])
    a = sorted(r["doc_id"] for r in
               spark.read.parquet(str(out / "survivors")).collect())
    b = sorted(r["doc_id"] for r in
               spark.read.parquet(str(out_ref / "survivors")).collect())
    assert a == b and len(a) > 0


def test_checkpoint_fingerprint_mismatch_raises(spark, tmp_path):
    """Resuming a checkpoint dir with changed parameters must fail
    loudly — silently reloading survivors deduped at a different
    threshold would mislabel the whole run."""
    import pytest as _pytest

    sys.path.insert(0, "/root/repo/jobs")
    import curate_documents

    ckdir = tmp_path / "ck"
    argv = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "out"),
        "--checkpoint-dir", str(ckdir),
    ]
    assert curate_documents.main(argv + ["--jaccard", "0.8"]) == 0
    with _pytest.raises(ValueError, match="different parameters"):
        curate_documents.main(argv + ["--jaccard", "0.95"])
    # unchanged parameters resume fine
    assert curate_documents.main(argv + ["--jaccard", "0.8"]) == 0


def test_curate_job_span_strip_stage(spark, tmp_path, capsys):
    """--strip-spans removes keep-first duplicated spans from survivor
    text before the LM gate; untouched docs keep raw text/length."""
    import json

    sys.path.insert(0, "/root/repo/jobs")
    import curate_documents

    boiler = "terms of service apply to all content here"
    rows = [
        (1, boiler + " unique alpha words one two", None, 70),
        (2, boiler + " other beta words three four", None, 71),
        (3, "completely unrelated gardening text about roses", None, 47),
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).write.parquet(str(src))
    out = tmp_path / "out"
    rc = curate_documents.main([
        "--input", str(src), "--out", str(out),
        "--strip-spans", "4",
    ])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["span_stripped_docs"] >= 1
    surv = {r["doc_id"]: r for r in
            spark.read.parquet(str(out / "survivors")).collect()}
    # doc 1 keeps the boilerplate (keep-first); doc 2 lost it
    assert "terms of service" in surv[1]["text"]
    assert "terms of service" not in surv[2]["text"]
    assert "beta" in surv[2]["text"]  # its own content survives
    assert surv[2]["n_chars"] == len(surv[2]["text"])
    # untouched doc keeps raw text + original length
    assert surv[3]["text"] == rows[2][1] and surv[3]["n_chars"] == 47


def test_curate_job_lm_bucket_gate(spark, tmp_path, capsys):
    """--lm-keep-buckets head,middle: the CCNet bucket gate keeps ~2/3 of
    each language's scored docs (ntile depths differ by <=1), passes
    unscored docs through, and is mutually exclusive with
    --min-logprob."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate_documents

    out = tmp_path / "curated_buckets"
    rc = curate_documents.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out),
        "--lm-keep-buckets", "head,middle",
    ])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    dedup, gated = counts["after_dedup"], counts["after_lm_gate"]
    unscored = counts["lm_unscored_kept"]
    # kept = unscored + ~2/3 of scored (per-language ntile, +-1 per lang)
    scored = dedup - unscored
    assert abs(gated - unscored - 2 * scored / 3) <= 5  # +-1 per language (5 langs)
    assert gated < dedup

    surv = spark.read.parquet(str(out / "survivors"))
    assert surv.count() == gated

    with pytest.raises(SystemExit):
        curate_documents.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "x"),
            "--min-logprob", "-3.45",
            "--lm-keep-buckets", "head",
        ])
