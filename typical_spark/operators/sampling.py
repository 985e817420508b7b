"""Deterministic sampling / dataset splitting for training pipelines.

Random `df.sample()` is useless for corpus curation at scale: it changes
under retries, partition layout, and Spark versions, so eval sets leak.
These operators derive membership from a HASH of the row's id — stable
across runs, engines, cluster sizes, and insert order, and exactly
reproducible outside Spark (the md5-derived hash equals DuckDB's
md5_number_lower, see dedup.md5_lower64), so held-out splits can be
audited by any SQL engine.

n_buckets must be a power of two: bucket = hash & (n_buckets-1) picks
the low bits, which are identical for the signed (Spark long) and
unsigned (DuckDB UBIGINT) views of the same 64-bit value — a modulo by a
non-power-of-two would NOT agree across the two representations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typical_spark.operators.dedup import md5_lower64


def hash_bucket(
    id_col: Column, seed: int = 42, n_buckets: int = 8192
) -> Column:
    """Stable bucket in [0, n_buckets) from the id (power-of-two buckets
    only — see module docstring)."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    h = md5_lower64(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return h.bitwiseAND(F.lit(n_buckets - 1))


def split_cutoffs(
    splits: Sequence[tuple[str, float]], n_buckets: int
) -> list[tuple[str, int, int]]:
    """(name, lo, hi) bucket ranges for the requested weights; weights
    must sum to ~1. Exposed so oracles/audits can recompute the exact
    integer boundaries."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out, cum = [], 0.0
    lo = 0
    for name, w in splits:
        cum += w
        hi = n_buckets if cum >= 1.0 - 1e-12 else int(round(cum * n_buckets))
        out.append((name, lo, hi))
        lo = hi
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01),
    ),
    seed: int = 42,
    n_buckets: int = 8192,
) -> DataFrame:
    """Assign every row a deterministic split label. Pure projection —
    no shuffle, no state; re-running on a grown corpus keeps every
    previously-assigned row in its split (membership depends only on
    the id), which is the property that prevents train/test leaks as a
    crawl grows.

    NULL-id policy: a NULL id gets split = NULL (and hash_sample drops
    it) — deliberately NOT assigned to any split, because a stable
    assignment is impossible without an identity. Enforce non-null ids
    upstream with a NotNullCheck if id-less rows must be violations
    rather than unassigned."""
    b = hash_bucket(F.col(id_col), seed, n_buckets)
    expr = None
    for name, lo, hi in split_cutoffs(list(splits), n_buckets):
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
    n_buckets: int = 8192,
) -> DataFrame:
    """Deterministic ~fraction sample (same stability contract as
    hash_split): keeps rows whose bucket < fraction*n_buckets."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cut = int(round(fraction * n_buckets))
    return df.where(hash_bucket(F.col(id_col), seed, n_buckets) < cut)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """EXACT-count stratified sampling: from each stratum keep exactly
    ceil(fraction * stratum_size) rows, chosen by hash rank — the
    deterministic lift of `df.sampleBy()` (which is Bernoulli: its
    per-stratum counts vary run to run and its selection depends on
    partition layout). Training-mixture rebalancing ("keep 100% of
    code, 30% of web") needs the exact-count, audit-reproducible form.

    Plan: one window count + one row_number per stratum, ordered by
    (md5-hash, id) so the chosen subset is a uniform, engine-checkable
    function of the ids alone. The rank window sorts each stratum in
    one task — exact selection is inherently an ordered cut, so this is
    the bounded-strata exact twin; at pathological stratum sizes use
    hash_sample per stratum instead (hash-threshold, approximate count,
    no sort) — the same exact/sketch pairing as ks_two_sample vs
    drift_report.

    Unlisted strata get default_fraction. fraction=1.0 keeps the whole
    stratum, 0.0 drops it. Rows with a NULL stratum are EXCLUDED (there
    is no stratum identity to rank within) — union them back explicitly
    if "undetected" should mean "kept" (see jobs/curate_documents.py).
    Output: input columns + (stratum_n, rank).
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} not in [0,1]: {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction not in [0,1]: {default_fraction}")
    from pyspark.sql import Window

    frac_col = F.lit(float(default_fraction))
    for name, frac in sorted(fractions.items()):
        frac_col = F.when(
            F.col(stratum_col) == name, F.lit(float(frac))
        ).otherwise(frac_col)
    # 62-bit mask: the full 64-bit hash ORDERS differently under
    # Spark's signed vs DuckDB's unsigned view; low 62 bits are
    # non-negative in both, so the rank order is engine-identical
    h = hash_bucket(F.col(id_col), seed=seed, n_buckets=1 << 62)
    w = Window.partitionBy(stratum_col)
    w_rank = w.orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.where(F.col(stratum_col).isNotNull())
        .withColumn("stratum_n", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= F.ceil(frac_col * F.col("stratum_n")))
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training order.

    Training runs need the corpus in a REPRODUCIBLE pseudo-random order
    (epoch shuffling, resumable data loaders, bitwise-comparable reruns).
    `df.orderBy(rand())` is neither reproducible nor scalable (a global
    sort, and rand() changes under retries). Here every row gets:

      shard = id_hash & (n_shards - 1)        -- which output file
      pos   = rank of id_hash within its shard -- order inside the file

    computed with ONE window per shard partition — ranking is
    partitionBy(shard), so the only exchange is a hash partition on
    shard and each task sorts ~n/n_shards rows. There is never a
    single-partition global sort: the global order is (shard, pos) by
    construction, a training loader reads shards in index order (or any
    fixed permutation per epoch).

    The hash is the engine's md5-derived id hash (a function of the id
    and seed alone), so the assignment is stable across runs, cluster
    sizes, partition layouts, AND reproducible in any SQL engine for
    audits. Ordering uses the 62-bit masked view (signed/unsigned
    agreement — see exact_stratified_sample). Different seeds give
    independent epoch orders. NULL ids are excluded (no stable
    identity). Positions are contiguous 1..shard_size; note that
    inserting new rows shifts later positions within a shard (inherent
    to contiguous ranks — shard membership, however, never changes).

    Mirrors the reference's deterministic-iteration contract
    (typic/gen.py order-stable protocol emission) at corpus scale.

    Output: input columns + (shard int, pos bigint).
    """
    if n_shards & (n_shards - 1) or n_shards <= 0:
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    from pyspark.sql import Window

    h = hash_bucket(F.col(id_col), seed=seed, n_buckets=1 << 62)
    shard = h.bitwiseAND(F.lit(n_shards - 1)).cast("int")
    out = df.where(F.col(id_col).isNotNull()).withColumn(
        "shard", shard
    ).withColumn("_h", h)
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "pos", F.row_number().over(w).cast("bigint")
    ).drop("_h")


def rank_buckets(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str | None = None,
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
    ascending: bool = True,
) -> DataFrame:
    """CCNet-style per-group quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3 head/middle/tail): within each group (per
    language, per source ...) rank rows by (value, id) and cut the
    ranking into n_buckets equal-depth buckets — ntile semantics, so
    depths differ by at most one row and the assignment is an EXACT,
    engine-checkable function of the input (id tie-break, no RNG).
    Training pipelines keep 'head', downsample 'middle', drop 'tail'
    (compose with stratified_sample on bucket_label). With
    ascending=False bucket 1 holds the HIGHEST values (the usual
    quality-score orientation).

    Exact equal-depth is inherently an ordered rank, so each group
    sorts in one task — the bounded-groups exact twin (same discipline
    as stratified_sample / ks_two_sample); when one group is too large
    for a single sort, use quantile_buckets below (approx-depth,
    cutpoint comparisons, no sort). Rows with a NULL group are excluded
    (no bucket identity); NULL values sort last in their group either
    way (Spark default NULLS LAST on both asc and desc).

    Output: input columns + (bucket int 1..n[, bucket_label]).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(
            f"labels length {len(labels)} != n_buckets {n_buckets}"
        )
    from pyspark.sql import Window

    v = F.col(value_col)
    order = [v.asc_nulls_last() if ascending else v.desc_nulls_last(),
             F.col(id_col).asc()]
    parts = [group_col] if group_col else []
    w = Window.partitionBy(*parts).orderBy(*order)
    out = df
    if group_col:
        out = out.where(F.col(group_col).isNotNull())
    out = out.withColumn("bucket", F.ntile(n_buckets).over(w))
    if labels is not None:
        out = out.withColumn(
            "bucket_label",
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col("bucket")
            ),
        )
    return out


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
    ascending: bool = True,
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate-depth twin of rank_buckets for groups too large to
    rank in one task: per-group approx_percentile cutpoints (a tiny
    aggregate, broadcast back) and a codegen'd cutpoint-comparison fold
    assigns the bucket — no sort, no window, one map-side-combined
    aggregate plus a broadcast join. Depths are approximate within the
    sketch's relative_error; bucket assignment is still MONOTONE in the
    value by construction. Use rank_buckets when exact equal depth or
    cross-engine equality matters.

    Output: input columns + (bucket int 1..n[, bucket_label]); NULL
    values get a NULL bucket.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(
            f"labels length {len(labels)} != n_buckets {n_buckets}"
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if not ascending:
        probs = [1.0 - p for p in probs]
    acc = int(1.0 / relative_error)
    cuts = F.percentile_approx(value_col, probs, acc).alias("_cuts")
    if group_col:
        cut_tbl = df.groupBy(group_col).agg(cuts)
        j = df.join(F.broadcast(cut_tbl), group_col)
    else:
        j = df.crossJoin(F.broadcast(df.groupBy().agg(cuts)))
    v = F.col(value_col)
    crossed = F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda a, c: a + F.when(v > c if ascending else v < c, 1).otherwise(0),
    )
    out = j.withColumn(
        "bucket",
        F.when(v.isNotNull(), crossed + F.lit(1)).cast("int"),
    ).drop("_cuts")
    if labels is not None:
        out = out.withColumn(
            "bucket_label",
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col("bucket")
            ),
        )
    return out


def write_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int = 1024,
    seed: int = 42,
) -> None:
    """Materialize the deterministic training order (global_shuffle) as
    shard-partitioned parquet: `shard=<s>/` directories whose files are
    physically sorted by pos, so a data loader streams shard dirs in
    index order (or any fixed per-epoch permutation) with ZERO read-time
    sorting — the "resumable data loader" layout global_shuffle's
    docstring promises, written down.

    Plan: one hash exchange on shard + a per-task sort bounded by shard
    size (repartition(shard) -> sortWithinPartitions(shard, pos) ->
    partitionBy(shard)); parquet preserves within-file row order, and
    sorting by (shard, pos) keeps each shard's rows ordered even when
    the hash lands several shards in one task. Re-running over the same
    input produces byte-identical (id, shard, pos) assignments — the
    whole point (epoch reproducibility, bitwise-comparable reruns).
    """
    out = global_shuffle(df, id_col, n_shards, seed)
    (
        out.repartition(min(n_shards, 256), "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
