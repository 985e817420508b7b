"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

The standard recipe for "make my 100 TB crawl look like my small
high-quality target corpus": fit two bag-of-hashed-ngram models (target
and raw), weight every raw document by its log likelihood ratio, and
resample with Gumbel-top-k. Documents whose n-gram profile resembles
the target domain get selected; generic crawl text does not.

Spark-first shape — every stage is a built-in relational op:
- feature extraction: unigrams + bigrams of the shared normalized
  tokenization (multiset — DSIR is a count model), hashed into
  `dim` buckets. Pure codegen (HOF transform), no UDF.
- model fit: one map-side-combined groupBy per corpus over the
  exploded (bucket) stream -> per-bucket counts. Counts grow with
  `dim`, not corpus size; add-alpha smoothing exactly as the paper.
- log-ratio table: FULL OUTER join of the two count tables (<= dim
  rows), log p_target(b) - log p_raw(b) per bucket. This is a tiny
  dim table -> broadcast to the scorer.
- scoring: explode raw docs' buckets -> broadcast join -> one
  map-side-combined groupBy(doc) sum = log importance weight. The
  only wide shuffle carries (doc_id, partial sum) pairs.
- selection: Gumbel-top-k (the paper's sampling-without-replacement
  trick): key = log_w + Gumbel(hash(id)) — noise is a DETERMINISTIC
  function of the id, so selection is reproducible across runs and
  engines; top-k via TakeOrderedAndProject (per-partition heaps, no
  global sort). For k beyond driver scale, switch to a key-threshold
  filter (select where key >= cutoff) — same scores, no ordering.

The md5-derived bucket/noise hash (reproducible=True) makes the whole
pipeline replayable in any SQL engine — the contract configuration;
production uses xxhash64 (cheaper, same distribution).

Mirrors the reference's constraint-gate shape (typic/constraints/
common.py:147-174): "selected" is a verdict column derived from a
declarative score, like a passed check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typical_spark.functions.text_analysis import normalize_text


def _features(text_col: Column) -> Column:
    """Unigram + bigram multiset of the shared normalized tokenization
    (duplicates kept — counts are the model). The token array is
    LET-BOUND (text_analysis._bind) before the bigram lambda touches it:
    an expression referenced inside a HOF lambda re-evaluates per
    element, so an unbound `element_at(split(normalize(text)), i)` would
    re-run the 3 regex passes per bigram — O(tokens^2) per document
    (the text_analysis.py PERFORMANCE NOTE, re-measured here: the
    unbound form ran minutes-not-seconds at sf0.1)."""
    from typical_spark.functions.text_analysis import _bind

    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda x: x != ""
    )

    def with_tokens(t: Column) -> Column:
        bigrams = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(t, bigrams)

    return _bind(toks, with_tokens)


def _bucket(feature: Column, dim: int, reproducible: bool) -> Column:
    from typical_spark.operators.quality_model import hashed_bucket

    return hashed_bucket(feature, dim, reproducible)


def _bucket_counts(
    df: DataFrame, text_col: str, dim: int, reproducible: bool, name: str
) -> DataFrame:
    from typical_spark.operators.dedup import _ensure_parallelism

    feats = _features(F.col(text_col))
    return (
        _ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(feats).alias("_f"))
        .select(_bucket(F.col("_f"), dim, reproducible).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(name))
    )


def _feature_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(_f, _n) distinct-feature occurrence counts — map-side-combined,
    so the shuffle carries per-partition distinct features, not the
    occurrence stream. Feeds the hash-each-distinct-feature-once path
    (see dsir_log_weights)."""
    from typical_spark.operators.dedup import _ensure_parallelism

    feats = _features(F.col(text_col))
    return (
        _ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(feats).alias("_f"))
        .groupBy("_f")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 4096,
    alpha: float = 0.5,
    reproducible: bool = False,
) -> DataFrame:
    """Per-raw-document log importance weight
    log w(x) = sum over feature occurrences of
    [log p_target(bucket) - log p_raw(bucket)], with add-alpha
    smoothed bucket models p_c(b) = (n_c(b) + alpha) / (N_c + alpha*dim).

    Output: (id_col, n_feats bigint, log_w double). Documents with no
    features are absent (no evidence). Bucket-count totals ride the
    plan as scalar subqueries folded driver-side (two tiny aggregates).
    """
    # the count tables are <= dim rows; persist so each corpus is
    # feature-hashed ONCE (the totals job materializes the cache, the
    # lr join reuses it) — released via release_cache(result)
    #
    # reproducible=True pays an md5-derived hash per feature — guide
    # §2.3/§4 applied to the hash: aggregate to DISTINCT features first
    # (map-side combine) and hash each once, so md5 cost is
    # vocabulary-scale, not corpus x features (same trick as
    # quality_model.score_documents_expr hash_distinct; A/B at sf0.1:
    # md5-per-occurrence ~11x over xxhash64). Counts, totals and the lr
    # table are bit-identical either way (integer counts reassociate
    # exactly).
    fr = None
    if reproducible:
        ft = _feature_counts(target, text_col).persist()
        fr = _feature_counts(raw, text_col).withColumn(
            "bucket", _bucket(F.col("_f"), dim, reproducible)
        ).persist()
        cnt_t = (
            ft.select(_bucket(F.col("_f"), dim, reproducible).alias("bucket"), "_n")
            .groupBy("bucket")
            .agg(F.sum("_n").alias("nt"))
        )
        cnt_r = fr.groupBy("bucket").agg(F.sum("_n").alias("nr"))
        tot_t = ft.agg(F.sum("_n")).first()[0] or 0
        tot_r = fr.agg(F.sum("_n")).first()[0] or 0
        caches = [ft, fr]
    else:
        cnt_t = _bucket_counts(target, text_col, dim, reproducible, "nt").persist()
        cnt_r = _bucket_counts(raw, text_col, dim, reproducible, "nr").persist()
        caches = [cnt_t, cnt_r]
        # totals are single-row aggregates; collected once, folded as
        # literals (bounded driver work by construction)
        tot_t = cnt_t.agg(F.sum("nt")).first()[0] or 0
        tot_r = cnt_r.agg(F.sum("nr")).first()[0] or 0
    a = float(alpha)
    lr = (
        cnt_t.join(cnt_r, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("nt"), F.lit(0)) + F.lit(a))
                    / F.lit(float(tot_t) + a * dim)
                )
                - F.log(
                    (F.coalesce(F.col("nr"), F.lit(0)) + F.lit(a))
                    / F.lit(float(tot_r) + a * dim)
                )
            ).alias("lr"),
        )
    )
    from typical_spark.operators.dedup import _ensure_parallelism

    feats = _features(F.col(text_col))
    # n_feats is NOT projected as size(feats) here: a non-generator
    # column that references the generator's input expression is
    # re-evaluated per EXPLODED row (the Generate keeps only the
    # generator output; column pruning hides this until an aggregation
    # needs the column) — measured 35s vs 0.7s at sf0.1. Counting the
    # exploded rows in the same aggregate gives the identical value for
    # one map-side-combined pass.
    exploded = (
        _ensure_parallelism(raw.where(F.col(text_col).isNotNull()))
        .select(F.col(id_col), F.explode(feats).alias("_f"))
    )
    if reproducible:
        # per-feature lr dim table: every raw feature is in fr, its
        # bucket is in cnt_r, hence in the full-outer lr table — the
        # occurrence stream joins on the feature STRING and never
        # re-hashes; row order through the aggregate is unchanged, so
        # log_w is bit-identical to the per-occurrence-hash plan
        flr = fr.join(F.broadcast(lr), "bucket").select("_f", "lr")
        probed = exploded.join(F.broadcast(flr), "_f")
    else:
        # every raw bucket is present in cnt_r, hence in the full-outer
        # lr table — the inner broadcast join loses no rows by
        # construction
        probed = exploded.withColumn(
            "bucket", _bucket(F.col("_f"), dim, reproducible)
        ).join(F.broadcast(lr), "bucket")
    out = (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("log_w"),
        )
        .select(id_col, F.col("n_feats").cast("bigint"), "log_w")
    )
    out._owned_cache = caches  # dedup.release_cache(out) after use
    return out


def gumbel_key(id_col: Column, seed: int = 42) -> Column:
    """Deterministic Gumbel(0,1) noise from the id hash: u uniform in
    (0,1) from the 62-bit masked md5 hash, g = -ln(-ln(u)). A pure
    function of (id, seed) — selection is reproducible across runs,
    cluster layouts, and engines (DuckDB replays it exactly)."""
    from typical_spark.operators.sampling import hash_bucket

    u = (hash_bucket(id_col, seed=seed, n_buckets=1 << 62)
         .cast("double") + F.lit(0.5)) / F.lit(float(1 << 62))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    dim: int = 4096,
    alpha: float = 0.5,
    seed: int = 42,
    reproducible: bool = False,
) -> DataFrame:
    """Gumbel-top-k importance resampling: the k raw documents with the
    largest (log_w + Gumbel(hash(id))) — a sample WITHOUT replacement
    proportional to the importance weights (the Gumbel-max trick), made
    reproducible by deterministic noise. Ties break by id.

    Output: (id_col, n_feats, log_w, sel_key), exactly k rows (or all,
    when fewer score). k is driver-bounded (TakeOrderedAndProject);
    for corpus-scale selection use dsir_log_weights + a precomputed
    key cutoff instead of a global ordering."""
    w = dsir_log_weights(
        raw, target, id_col, text_col, dim=dim, alpha=alpha,
        reproducible=reproducible,
    )
    keyed = w.withColumn(
        "sel_key", F.col("log_w") + gumbel_key(F.col(id_col), seed=seed)
    )
    out = keyed.orderBy(
        F.col("sel_key").desc(), F.col(id_col).asc()
    ).limit(int(k))
    out._owned_cache = list(getattr(w, "_owned_cache", []))
    return out
