"""Document deduplication family for training-data pipelines.

Five strategies, all shuffle-disciplined for 100 TB inputs:

exact            groupBy(md5(normalized)) — map-side partial agg, one
                 shuffle of (hash, id) pairs only.
minhash LSH      shingles -> n_hashes minhash signature (nested Catalyst
                 lambdas, no UDF) -> b bands -> shuffle on (band, band
                 hash) buckets -> candidate pairs -> exact Jaccard verify.
                 Only bucket-mates ever meet: no O(n^2) compare.
simhash          64-bit signature from token hashes (bit-vote via
                 aggregate() higher-order fn); near-dups = equal 16-bit
                 chunk buckets then hamming <= threshold verify.
ngram jaccard    exact pairwise Jaccard on word shingles — the *verify*
                 kernel for candidates (never run all-pairs at scale).
embedding cosine near-dup via random-hyperplane LSH buckets + cosine
                 verify (see similarity.py for the shared kernels).

Pair outputs are canonicalized (id_a < id_b) and deduplicated, so a pair
found in several buckets reports once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typical_spark.functions.text_analysis import normalize_text, word_shingles


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Groups of byte-identical (optionally normalized) documents.
    Output: (dup_hash, n_docs, doc_ids sorted) for groups with n>=2."""
    txt = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.select(F.md5(txt).alias("dup_hash"), F.col(id_col))
        .groupBy("dup_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, n_hashes: int = 64) -> Column:
    """n_hashes-wide minhash signature: h_i(S) = min_{s in S} hash(i, s).
    Seeding by hashing the function index with the shingle keeps it one
    xxhash64 kernel — nested transform/array_min, all codegen'd."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via minhash-LSH banding + exact-Jaccard verify.

    rows-per-band r = n_hashes/bands; the S-curve midpoint is
    (1/bands)^(1/r) ~= threshold. Output:
    (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    r = n_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_words).alias("_sh"),
    ).where(F.size("_sh") > 0)
    sig = sh.withColumn("_sig", minhash_signature(F.col("_sh"), n_hashes))
    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("_sig", b * r + 1, r))
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_sh", "bb.band", "bb.bhash")
    # candidates: same (band, bhash) bucket; self-join shuffles on the
    # bucket key — bucket sizes are the skew knob (huge buckets = near-
    # identical docs, which is the signal itself)
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sh").alias("sh_a"),
            F.col("r._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = cand.withColumn(
        "jaccard",
        (
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
        ).cast("double"),
    )
    return jac.where(F.col("jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(col: Column) -> Column:
    """64-bit simhash of the normalized token stream: per-token xxhash64,
    each bit position votes +w/-w, sign of the sum sets the bit. Pure
    aggregate() expressions."""
    tokens = F.split(normalize_text(col), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    # votes[b] = sum over tokens of (bit b set ? 1 : -1). Shift amounts
    # must be literals (shiftright takes int, not Column), so the bit loop
    # unrolls driver-side into 64 aggregate expressions — still one
    # projection, all JVM-side.
    def _vote_merge(b: int):
        # NB: pyspark HOFs introspect lambda arity, so the bit index must
        # be captured by closure, never as a defaulted parameter
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return merge

    sig = F.lit(0).cast("long")
    for b in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_merge(b))
        # bit 63 is the sign bit of a signed long: its two's-complement
        # value is -(2^63)
        bitval = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + F.when(vote > 0, F.lit(bitval).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Blocking: by
    pigeonhole, two signatures within hamming 3 agree exactly on >=1 of 4
    16-bit chunks — candidates meet only in chunk buckets (1 shuffle).
    Output: (id_a, id_b, hamming)."""
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sig")
    )
    chunks = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("_sig"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("_id", "_sig", "cc.chunk", "cc.ckey")
    l, r_ = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r_,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.ckey") == F.col("r.ckey"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sig").alias("sig_a"),
            F.col("r._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", _hamming64(F.col("sig_a"), F.col("sig_b")).cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verify kernel)
# ---------------------------------------------------------------------------


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact word-k-gram Jaccard for given candidate (id_a, id_b) pairs.
    Two broadcast-or-shuffle hash joins against the docs table; the heavy
    set ops stay columnar."""
    sh = docs.select(
        F.col(id_col).alias("_jid"),
        word_shingles(F.col(text_col), k).alias("_jsh"),
    )
    out = (
        pairs.join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_jsh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_jsh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
            ).cast("double"),
        )
    )
    return out.drop("sh_a", "sh_b")
