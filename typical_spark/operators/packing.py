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


def _length_expr(tokens_col, tokenizer):
    """Resolve the token-length seam: `tokens_col` is either a numeric
    count column (tokenizer must be None — counts are already fixed) or
    a TEXT column counted through functions/tokenize.token_count_column
    (whitespace Catalyst expression by default; an Arrow-batched
    tokenizer callable — e.g. a real BPE encoder — when supplied).
    Budgets follow whatever tokenizer the training run actually uses."""
    if tokenizer is None:
        return F.col(tokens_col).cast("bigint")
    from typical_spark.functions.tokenize import token_count_column

    fn = None if tokenizer == "whitespace" else tokenizer
    return token_count_column(F.col(tokens_col), tokenizer=fn)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 4096,
    n_shards: int = 64,
    seed: int = 42,
    tokenizer=None,
) -> DataFrame:
    """Assign each document its packed-sequence span under
    concat-and-split packing with `budget` tokens per sequence.

    tokens_col: a numeric token-count column (default), or — when
    `tokenizer` is given — a TEXT column whose counts are computed
    through the tokenize.token_count_column seam ("whitespace" for the
    engine-native expression, or an Arrow-batched callable for real
    BPE lengths).

    Output: (id_col, tokens, shard, offset, first_seq, last_seq,
    n_seqs) where offset is the document's first-token position in its
    shard's concatenated stream and first_seq/last_seq index the
    budget-sized sequences it touches (per shard, 0-based)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = hash_bucket(F.col(id_col), seed=seed, n_buckets=n_shards)
    sort_h = hash_bucket(F.col(id_col), seed=seed + 1, n_buckets=1 << 32)
    n_tok = _length_expr(tokens_col, tokenizer)
    base = df.select(
        F.col(id_col),
        n_tok.alias("tokens"),
        shard.cast("int").alias("shard"),
        sort_h.alias("_sh"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_sh").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    b = F.lit(int(budget))
    # zero/NULL-token docs are dropped AFTER the window (they add 0 /
    # NULL-ignored to the cumsum, so every other row's offset is
    # unchanged) — a pre-window filter on the computed count would be
    # pushed through the projection and evaluate an Arrow tokenizer
    # UDF twice per row
    return (
        base.withColumn("_cum", cum)
        .where(F.col("tokens").isNotNull() & (F.col("tokens") > 0))
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


def chunk_spans(
    df: DataFrame,
    id_col: str,
    length_col: str,
    chunk_size: int = 512,
    overlap: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Fixed-size chunking with overlap — the RAG/pretraining chunker:
    split each document's [0, length) span into windows of `chunk_size`
    whose starts advance by the stride chunk_size - overlap, final
    partial window kept. Metadata-only (like pack_sequences, spans are
    computed from the length column without materializing text), so the
    chunk table is explode(sequence(...)) over pure integer expressions
    — fully parallel, no shuffle at all until something downstream
    groups it.

    A document of length L yields ceil(max(L - overlap, 1) / stride)
    chunks; the last chunk ends at min(start + chunk_size, L). Zero/
    NULL-length docs yield no chunks.

    length_col: a numeric length column (default), or — when
    `tokenizer` is given — a TEXT column measured through the
    tokenize.token_count_column seam (same contract as pack_sequences).

    Output: (id_col, chunk_idx, start, end, chunk_len)."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap}"
        )
    stride = chunk_size - overlap
    # the length is computed ONCE in its own projection, and zero/NULL
    # lengths are dropped by NULL-gating the sequence bound (sequence
    # with a NULL bound -> NULL -> explode emits nothing) instead of a
    # WHERE: predicate pushdown would substitute the alias back into
    # the filter and evaluate an Arrow tokenizer UDF twice per row
    # (plan-asserted: exactly one ArrowEvalPython node)
    ln = F.col("_len")
    n_chunks = F.when(
        ln > 0,
        F.ceil(F.greatest(ln - F.lit(overlap), F.lit(1)) / F.lit(float(stride))),
    )
    base = df.select(
        F.col(id_col), _length_expr(length_col, tokenizer).alias("_len")
    )
    start = F.col("chunk_idx") * F.lit(stride)
    return (
        base.select(
            F.col(id_col),
            ln.alias("_len"),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("start"),
            F.least(start + F.lit(chunk_size), F.col("_len")).alias("end"),
            (
                F.least(start + F.lit(chunk_size), F.col("_len")) - start
            ).cast("bigint").alias("chunk_len"),
        )
    )
