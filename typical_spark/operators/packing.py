"""Sequence packing: lay documents end-to-end into fixed token budgets.

No reference analog — pure training-data-pipeline surface: LLM
pretraining consumes fixed-length sequences (e.g. 4096 tokens), and the
dominant production strategy is CONCAT-AND-SPLIT: concatenate the
token stream of a shard in a deterministic order and cut it every B
tokens, letting documents straddle cut points. This operator computes,
for every document, exactly which training sequences its tokens land in
— without materializing tokens.

Spark-first plan: ONE window cumulative sum per shard.

    shard     = hash_bucket(id)            (stable, engine-independent)
    order     = (sort_hash, id) within shard   (deterministic shuffle-
                proof order; the hash decorrelates neighbors)
    cum       = sum(tokens) over rows-unbounded-preceding
    first_seq = floor((cum - tokens) / B)      (doc's first token)
    last_seq  = floor((cum - 1)     / B)       (doc's last token)

A document spans last_seq - first_seq + 1 consecutive sequences of its
shard. Zero-token documents are dropped (they occupy no sequence).

Scale shape: the cumulative sum is per-shard, so parallelism = number
of shards (pick n_shards >> executors; each shard's window sorts only
its own rows). Nothing is iterative, nothing is driver-side, and the
whole computation is three narrow integer expressions over one ordered
window — reproducible bit-for-bit in any SQL engine, which is how the
contract oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from typical_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 4096,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Assign each document its packed-sequence span under
    concat-and-split packing with `budget` tokens per sequence.

    Output: (id_col, tokens, shard, offset, first_seq, last_seq,
    n_seqs) where offset is the document's first-token position in its
    shard's concatenated stream and first_seq/last_seq index the
    budget-sized sequences it touches (per shard, 0-based)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = hash_bucket(F.col(id_col), seed=seed, n_buckets=n_shards)
    sort_h = hash_bucket(F.col(id_col), seed=seed + 1, n_buckets=1 << 32)
    base = (
        df.where(F.col(tokens_col).isNotNull() & (F.col(tokens_col) > 0))
        .select(
            F.col(id_col),
            F.col(tokens_col).cast("bigint").alias("tokens"),
            shard.cast("int").alias("shard"),
            sort_h.alias("_sh"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_sh").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    b = F.lit(int(budget))
    return (
        base.withColumn("_cum", cum)
        .select(
            id_col,
            "tokens",
            "shard",
            (F.col("_cum") - F.col("tokens")).alias("offset"),
            F.floor((F.col("_cum") - F.col("tokens")) / b).alias("first_seq"),
            F.floor((F.col("_cum") - 1) / b).alias("last_seq"),
        )
        .withColumn(
            "n_seqs", (F.col("last_seq") - F.col("first_seq") + 1).cast("int")
        )
    )
