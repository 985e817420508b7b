"""Model-based document quality filtering (fasttext/CCNet-style).

The dominant quality gate in LLM data pipelines (GPT-3, LLaMA, CCNet)
is a LINEAR classifier over hashed bag-of-words features: cheap enough
to score every document in a 100 TB crawl, good enough to rank
wiki-like vs boilerplate text. This module provides that operator
Spark-first:

- **feature hashing**: token -> bucket in [0, dim) via the engine's
  hash family. Production default is `xxhash64` (one JVM codegen'd
  expression per token); the contract configuration uses
  `dedup.md5_lower64` so the bucket is bit-reproducible in DuckDB
  (`md5_number_lower(token) & (dim-1)`) — same convention as the
  simhash contract query.
- **zero-shuffle scoring** (`score_documents_expr`): when the weight of
  a bucket is a pure EXPRESSION (contract config: a deterministic
  pseudo-weight function; production: any closed-form re-weighting),
  the whole score is one codegen'd projection — tokens -> buckets ->
  weights -> mean -> sigmoid via higher-order functions. No explode, no
  join, no shuffle: the scan IS the scorer.
- **trained scoring** (`QualityModel.score`): trained weights live in a
  (bucket, weight) dim table broadcast to every executor; scoring is
  explode(tokens) -> broadcast equi-join -> groupBy(doc) partial-agg
  mean -> sigmoid. The only shuffle carries (doc_id, partial sum/count)
  pairs — map-side combined, never the text.
- **training** (`QualityModel.train`): logistic regression fitted
  driver-side (numpy, deterministic) on a BOUNDED uniform sample —
  same smallest-id-hash sample the IVF fit uses (a function of ids
  alone, independent of partition layout), so the collect is capped at
  `sample_size` rows of (bucket array, label), never the corpus.
  Training a linear model on a bounded sample + scoring the full corpus
  distributed is exactly the CCNet recipe.

Semantics mirrored from the reference: this is the model-based analog
of the reference's declarative constraint gate (typic/constraints/
common.py:147-174 validate -> violation rows): `score < threshold`
partitions the corpus into keep/drop exactly like a failed constraint
does, and the score column is the "violation evidence".
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from typical_spark.functions.text_analysis import split_normalized


def hashed_bucket(token: Column, dim: int, reproducible: bool = False) -> Column:
    """Feature-hash a token into [0, dim). `dim` must be a power of two
    (masking the low bits of the 64-bit hash is then uniform and works
    identically on Spark's signed long and DuckDB's unsigned hugeint —
    the two's-complement low bits agree)."""
    if dim & (dim - 1) or dim <= 0:
        raise ValueError(f"dim must be a power of two, got {dim}")
    if reproducible:
        from typical_spark.operators.dedup import md5_lower64

        h = md5_lower64(token)
    else:
        h = F.xxhash64(token)
    return h.bitwiseAND(F.lit(dim - 1))


def pseudo_weight(bucket: Column, dim: int) -> Column:
    """Deterministic pseudo-weight in [-0.5, 0.5): a Knuth-multiplicative
    re-scramble of the bucket id. Stands in for trained weights in the
    ORACLE configuration (a cross-engine check needs the weight to be a
    closed-form function both engines can evaluate, not a fitted
    artifact); the scoring machinery is identical either way."""
    return (
        (bucket * F.lit(2654435761)) % F.lit(dim)
    ).cast("double") / F.lit(float(dim)) - F.lit(0.5)


def score_documents_expr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 8192,
    weight_fn=None,
    reproducible: bool = False,
    hash_distinct: bool | None = None,
) -> DataFrame:
    """Zero-shuffle quality scoring: mean over ALL tokens (duplicates
    kept — bag-of-words, not set-of-words) of weight(bucket(token)),
    squashed by a sigmoid. One codegen'd projection per row; documents
    with no tokens are excluded (no feature evidence either way).

    hash_distinct (optimization guide §2.3 "shuffle keys instead of
    payloads", here applied to the HASH instead of the sum): when the
    token hash is expensive (the md5-reproducible contract config), hash
    each DISTINCT token once and broadcast-join the (token -> weight) dim
    table, so md5 cost is vocabulary-scale instead of corpus x tokens
    (A/B at sf0.1: md5-per-occurrence ~11x over xxhash64). Defaults to
    exactly that rule: on for reproducible=True with the default weight
    function, off otherwise.

    The rewrite is BIT-IDENTICAL, not merely close: every pseudo_weight
    is k/dim - 0.5 with dim a power of two, i.e. an exact dyadic
    rational with <= log2(dim) mantissa bits, so double addition over
    any number of tokens below 2^(53 - log2(dim)) is exact and therefore
    associative — groupBy(sum) equals the sequential array aggregate to
    the last bit. (A custom weight_fn has no such guarantee, hence the
    default gate.)

    Output: (id_col, n_tokens int, score double, prob double) where
    score = mean token weight and prob = sigmoid(10 * score).
    """
    if hash_distinct is None:
        hash_distinct = reproducible and weight_fn is None
    weight_fn = weight_fn or (lambda b: pseudo_weight(b, dim))
    toks = split_normalized(F.col(text_col))
    if hash_distinct:
        # n_tokens is counted IN the aggregate, never projected through
        # the Generate: a non-generator column referencing the
        # generator's input is re-evaluated per exploded row (the
        # dsir.py trap — size(toks) here re-ran the tokenizer per token
        # and was slower than the md5 it saved)
        exploded = df.select(F.col(id_col), F.explode(toks).alias("_t"))
        vocab = (
            exploded.select("_t")
            .distinct()
            .withColumn(
                "_w", weight_fn(hashed_bucket(F.col("_t"), dim, reproducible))
            )
        )
        out = (
            exploded.join(F.broadcast(vocab), "_t")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("int").alias("n_tokens"),
                F.sum("_w").alias("_s"),
            )
            .select(
                id_col,
                "n_tokens",
                (F.col("_s") / F.col("n_tokens").cast("double")).alias("score"),
            )
        )
    else:
        # explode(array(...)) Generate barrier: binds the token array
        # once per row so the n_tokens filter cannot be pushed below the
        # projection and re-run the tokenizer+weight transform per row
        bound = df.select(F.col(id_col), F.explode(F.array(toks)).alias("_tk"))
        weights = F.transform(
            F.col("_tk"), lambda t: weight_fn(hashed_bucket(t, dim, reproducible))
        )
        n = F.size("_tk")
        out = bound.where(n > 0).select(
            F.col(id_col),
            n.alias("n_tokens"),
            (
                F.aggregate(weights, F.lit(0.0), lambda acc, w: acc + w)
                / n.cast("double")
            ).alias("score"),
        )
    return out.withColumn(
        "prob", F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-10.0) * F.col("score")))
    )


class QualityModel:
    """A trained hashed-BoW logistic quality classifier.

    weights: np.ndarray of shape (dim,); bias: float. Scoring computes
    prob = sigmoid(w . (counts/n_tokens) + bias) — the mean-pooled
    fasttext-style score."""

    def __init__(self, weights: np.ndarray, bias: float, dim: int,
                 reproducible: bool = False):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.dim = int(dim)
        self.reproducible = reproducible
        if self.weights.shape != (self.dim,):
            raise ValueError("weights must have shape (dim,)")

    @classmethod
    def train(
        cls,
        labeled: DataFrame,
        id_col: str,
        text_col: str,
        label_col: str,
        dim: int = 8192,
        sample_size: int = 100_000,
        iters: int = 200,
        lr: float = 2.0,
        l2: float = 1e-4,
        seed: int = 42,
        reproducible: bool = False,
    ) -> "QualityModel":
        """Fit driver-side on a bounded uniform sample.

        The sample is the `sample_size` rows with the smallest id hash
        (TakeOrderedAndProject: per-partition heaps, no shuffle — the
        same uniform-fit discipline as IVFIndex.build; a limit() here
        would fit whichever shard answered first). Buckets are computed
        IN SPARK before collecting, so the driver never re-hashes and
        the python side needs no hash parity with the JVM. Each
        collected row is (array<int> buckets, int label) — bounded by
        sample_size * avg_tokens ints, not by the corpus."""
        from typical_spark.operators.sampling import hash_bucket

        toks = split_normalized(F.col(text_col))
        buckets = F.transform(
            toks, lambda t: hashed_bucket(t, dim, reproducible).cast("int")
        )
        h = hash_bucket(F.col(id_col), seed=seed, n_buckets=1 << 62)
        rows = (
            labeled.select(
                buckets.alias("_b"),
                F.col(label_col).cast("int").alias("_y"),
                h.alias("_h"),
            )
            .where(
                (F.size("_b") > 0) & F.col("_y").isNotNull()
                & F.col("_h").isNotNull()
            )
            .orderBy(F.col("_h").asc())
            .limit(sample_size)
            .collect()
        )
        if not rows:
            raise ValueError("no labeled rows to train on")
        # mean-pooled hashed features, one CSR-ish pass
        X = np.zeros((len(rows), dim))
        y = np.array([r["_y"] for r in rows], dtype=np.float64)
        for i, r in enumerate(rows):
            b = np.asarray(r["_b"], dtype=np.int64)
            np.add.at(X[i], b, 1.0 / len(b))
        w = np.zeros(dim)
        bias = 0.0
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
            g = p - y
            w -= lr * (X.T @ g / len(y) + l2 * w)
            bias -= lr * float(g.mean())
        return cls(w, bias, dim, reproducible)

    def score(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Distributed scoring of the full corpus against the broadcast
        weight table: explode(tokens) -> broadcast join (bucket, weight)
        -> groupBy(doc) mean -> sigmoid. The groupBy is map-side
        combined; the join never shuffles (weight side is <= dim rows).

        Output: (id_col, n_tokens, score, prob)."""
        spark = df.sparkSession
        nz = np.nonzero(self.weights)[0]
        wdf = spark.createDataFrame(
            [(int(b), float(self.weights[b])) for b in nz],
            "bucket int, weight double",
        )
        toks = split_normalized(F.col(text_col))
        exploded = (
            df.select(
                F.col(id_col),
                F.size(toks).alias("n_tokens"),
                F.explode(toks).alias("_t"),
            )
            .where(F.col("n_tokens") > 0)
            .withColumn(
                "bucket",
                hashed_bucket(F.col("_t"), self.dim, self.reproducible)
                .cast("int"),
            )
        )
        # left join: unseen buckets (weight 0 / pruned) contribute 0 but
        # still count in the mean's denominator (n_tokens)
        joined = exploded.join(F.broadcast(wdf), "bucket", "left")
        agg = joined.groupBy(id_col, "n_tokens").agg(
            (F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
             / F.col("n_tokens").cast("double")).alias("score")
        )
        return agg.select(
            id_col,
            "n_tokens",
            F.col("score"),
            (F.lit(1.0)
             / (F.lit(1.0) + F.exp(-(F.col("score") + F.lit(self.bias)))))
            .alias("prob"),
        )
