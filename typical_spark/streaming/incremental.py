"""Incremental near-dup detection on a document stream, against a
PERSISTED minhash index — the streaming twin of
`dedup.minhash_cross_duplicates` (closing the loop its docstring
describes: "the corpus's banding table is computed once and persisted;
a daily run shingles only the new batch").

foreachBatch shape (streaming_verdicts bridge): each micro-batch of new
documents is

    1. shingled + banded ONCE (minhash_band_tables — the only per-batch
       shingling cost; the corpus index is read back, never recomputed),
    2. checked against the stored index via
       minhash_cross_duplicates_prebanded; near-dup pairs append to the
       output sink,
    3. appended to the index itself (shingles + bands), so every LATER
       batch deduplicates against this one.

Check-then-append ordering means a batch never matches itself;
within-batch self-dups are the batch-mode operators' job (run
minhash_near_duplicates over the batch in the same handler if wanted).

Delivery semantics: foreachBatch is at-least-once — a retried
micro-batch re-appends its index rows and may re-emit pairs. The
handler anti-joins the batch's own ids out of the corpus side before
matching, so a redelivered batch whose rows already landed in the index
can NOT match itself (no (id,id) or spurious within-batch pairs). Band
joins are dropDuplicates'd per run, so duplicated INDEX rows only cost
work, never wrong jaccard values; re-emitted (identical) pair rows are
the remaining duplicate class — consumers read DISTINCT, or key the
sink. On a real lake both appends are Iceberg MERGE INTO keyed by _id,
which restores exactly-once; plain parquet appends are the sandbox
stand-in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from typical_spark.operators.dedup import (
    minhash_band_tables,
    minhash_cross_duplicates_prebanded,
    release_cache,
)
from typical_spark.streaming.validate_stream import streaming_verdicts


def minhash_stream_dedup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.7,
    trigger_seconds: int | None = None,
):
    """Start the incremental-dedup stream. Returns the StreamingQuery.

    index_dir: the standing minhash index (shingles/ + bands/ parquet;
    created on first batch). pairs_dir: append sink of
    (new_id, corpus_id, jaccard) detections."""
    sh_path = os.path.join(index_dir, "shingles")
    band_path = os.path.join(index_dir, "bands")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return  # empty micro-batch: nothing to band or append
        spark = batch_df.sparkSession
        sh_new, band_new = minhash_band_tables(
            batch_df, id_col, text_col, n_hashes, bands, shingle_words
        )
        # local-FS existence probe; on HDFS/S3 check via the Hadoop FS
        # API or make the index an Iceberg table (read of a missing path
        # would throw, and "no index yet" is a normal first-batch state)
        if os.path.exists(sh_path):
            # RETRY GUARD: a micro-batch that crashed after its index
            # appends is redelivered with its own rows already in the
            # index; without this anti-join it would "detect" itself
            # ((id,id) pairs plus spurious within-batch pairs), which
            # read-DISTINCT cannot cure. Batch ids broadcast: tiny side.
            batch_ids = sh_new.select("_id")
            corpus_sh = spark.read.parquet(sh_path).join(
                batch_ids, "_id", "left_anti"
            )
            corpus_band = spark.read.parquet(band_path).join(
                batch_ids, "_id", "left_anti"
            )
            pairs = minhash_cross_duplicates_prebanded(
                sh_new, band_new, corpus_sh, corpus_band, jaccard_threshold
            )
            pairs.write.mode("append").parquet(pairs_dir)
        # grow the index AFTER the check: a batch never matches itself
        sh_new.write.mode("append").parquet(sh_path)
        band_new.write.mode("append").parquet(band_path)
        release_cache(band_new)  # the shared shingle persist is done

    return streaming_verdicts(stream, handle, checkpoint_dir, trigger_seconds)
