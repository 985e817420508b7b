"""The curation entrypoint (jobs/curate_documents.py) end-to-end in
process: every stage engaged, outputs written, counts monotone."""

import json
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
