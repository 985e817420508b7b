"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one engine operator from SURVEY.md §2
against the driver-provided testdata tables; ``oracle_sql()`` holds the
DuckDB-equivalent SQL. Engine code lives in ``typical_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the engine package lives next to this file; make the import robust to
# whatever cwd the driver harness runs from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typical_spark.compiler import compile_table_spec
from typical_spark.operators.ordering import ordering_violations
from typical_spark.operators.referential import referential_violations
from typical_spark.operators.stats import column_stats, grouped_stats
from typical_spark.operators.uniqueness import duplicate_key_counts, duplicate_rows
from typical_spark.sources.tables import load_table
from typical_spark.specs import (
    EnumCheck,
    FieldSpec,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    TextCheck,
    TimestampRangeCheck,
)

# ---------------------------------------------------------------------------
# Validation specs for the driver-provided tables (the same CheckSpec ->
# ValidationPlan machinery the transcript engine uses; SURVEY.md Table A).
# ---------------------------------------------------------------------------

import datetime as _dt

EVENTS_SPEC = TableSpec(
    name="events",
    key_columns=("event_id",),
    fields=(
        FieldSpec("event_id", "long", nullable=False, checks=(NotNullCheck(), NumberCheck(ge=0))),
        FieldSpec("event_type", "string", nullable=False,
                  checks=(NotNullCheck(),
                          EnumCheck(values=("click", "view", "signup", "purchase")))),
        FieldSpec("user_id", "long", nullable=False, checks=(NotNullCheck(), NumberCheck(ge=0))),
        FieldSpec("value", "double", checks=(NumberCheck(ge=0.0, lt=1000.0),)),
        FieldSpec("props", "string", checks=(TextCheck(regex=r"\{.*\}$"),)),
        FieldSpec("ts", "timestamp", nullable=False,
                  checks=(NotNullCheck(),
                          TimestampRangeCheck(min_ts=_dt.datetime(2020, 1, 1),
                                              max_ts=_dt.datetime(2030, 1, 1)))),
    ),
)

ORDERS_SPEC = TableSpec(
    name="orders",
    key_columns=("o_orderkey",),
    fields=(
        FieldSpec("o_orderkey", "long", nullable=False, checks=(NotNullCheck(),)),
        FieldSpec("o_orderstatus", "string", nullable=False,
                  checks=(NotNullCheck(), EnumCheck(values=("O", "F", "P")))),
        FieldSpec("o_totalprice", "double", checks=(NumberCheck(gt=0.0),)),
        FieldSpec("o_orderpriority", "string",
                  checks=(TextCheck(regex=r"[1-5]-[A-Z]+$", min_length=3, max_length=20),)),
    ),
)


def _violations_query(spec: TableSpec, table: str):
    plan = compile_table_spec(spec)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        return plan.violations(df, with_message=False)

    return run


def _violations_oracle(selects: list[str]) -> str:
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_events_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _violations_query(EVENTS_SPEC, "events")(spark, sf_dir)


def q_orders_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _violations_query(ORDERS_SPEC, "orders")(spark, sf_dir)


def q_lineitem_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return duplicate_key_counts(li, ["l_orderkey", "l_linenumber"]).select(
        "l_orderkey", "l_linenumber", F.col("n_rows").cast("long").alias("n_rows")
    )


def q_orders_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duplicate detection beyond first occurrence, keep-first by o_orderdate
    od = load_table(spark, sf_dir, "orders")
    return duplicate_rows(od, ["o_custkey"], order_by=["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "o_custkey", F.col("dup_rank").cast("int").alias("dup_rank")
    )


def q_orders_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return referential_violations(od, cust, ["o_custkey"], ["c_custkey"]).select(
        "o_orderkey", "o_custkey"
    )


def q_lineitem_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    return referential_violations(li, od, ["l_orderkey"], ["o_orderkey"]).select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )


def q_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    s = column_stats(li, exact=True)
    return s.select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
        F.round("avg_value", 4).alias("avg_r"),
        F.round("stddev_value", 4).alias("std_r"),
    )


def q_orders_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    g = grouped_stats(od, "o_orderstatus", "o_totalprice", exact=True)
    return g.select(
        "o_orderstatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round("min_value", 4).alias("min_r"),
        F.round("max_value", 4).alias("max_r"),
        F.round("avg_value", 4).alias("avg_r"),
        F.round("stddev_value", 4).alias("std_r"),
    )


def q_events_ts_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ordering_violations(
        ev, ["user_id"], "event_id", ts_col="ts",
        require_contiguous=False, require_ts_monotonic=True,
    )
    return v.where(F.col("check_id") == "ts_out_of_order").select(
        "user_id", "event_id", "check_id", "observed"
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings tables)
# ---------------------------------------------------------------------------


def q_documents_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typical_spark.operators.dedup import exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs, "doc_id", "text").select(
        "dup_hash", F.col("n_docs").cast("long").alias("n_docs")
    )


def q_documents_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typical_spark.functions.text_analysis import token_count_bpe, token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("long").alias("n_tokens_ws"),
        token_count_bpe(F.col("text")).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )


def q_documents_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typical_spark.functions.text_analysis import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(lang_id(F.col("text")).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q_documents_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typical_spark.functions.text_analysis import quality_signals

    docs = load_table(spark, sf_dir, "documents")
    s = quality_signals(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(s["alpha_ratio"], 4).alias("alpha_r"),
        F.round(s["stopword_ratio"], 4).alias("stop_r"),
        F.round(s["mean_token_len"], 4).alias("mtl_r"),
    )


def q_embeddings_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typical_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    top = cosine_topk(emb, qvec, k=10)
    return top.select("vec_id", F.round("cosine_sim", 3).alias("sim_r"))


def q_documents_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via minhash-LSH banding + exact-Jaccard verify,
    keep-first exact-group collapse. Oracle: exact all-pairs Jaccard in
    DuckDB over the identical shingle definition — valid because the
    verify stage makes LSH output exact up to banding recall, which at
    (64 hashes, 16 bands) is >0.999 for pairs at the 0.8 threshold."""
    from typical_spark.operators.dedup import minhash_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    out = minhash_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))


def q_documents_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via simhash hamming<=3, keep-first collapse. Uses
    the md5-derived token hash (dedup.md5_lower64) so the signature is
    bit-reproducible in DuckDB (md5_number_lower): the oracle recomputes
    the full simhash + all-pairs hamming. Chunk blocking is EXACT for
    hamming<=3 (pigeonhole over 4 16-bit chunks), so Spark == oracle.
    Production callers keep the default xxhash64 token hash."""
    from typical_spark.operators.dedup import md5_lower64, simhash_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=3, token_hash=md5_lower64
    )


def q_embeddings_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via hyperplane LSH + exact cosine verify.
    The fixture has no natural near-dups (max pairwise cosine ~0.51), so
    the query plants one deterministic near-duplicate per vector — a
    +0.05 perturbation of the first component, reproducible in SQL —
    giving a non-vacuous result (one pair per vector at cosine ~0.9988)
    that an exact all-pairs DuckDB oracle verifies for both completeness
    (LSH recall: miss prob < 1e-7 per pair at 8 planes x 8 tables) and
    precision."""
    from typical_spark.operators.similarity import embedding_near_duplicates

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    pert = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("emb", 1) + F.lit(0.05)),
            F.slice("emb", 2, 1_000_000),
        ).alias("emb"),
    )
    corpus = emb.unionByName(pert)
    # 16-bit bucket keys x 12 tables: with the Arrow matmul the extra
    # projections are ~free, random-pair bucket collisions drop ~2^8x
    # (the exact-cosine verify was the cost center at 8-bit keys), and
    # planted-pair recall stays >= 1 - 2e-8 at cosine ~0.9988.
    out = embedding_near_duplicates(
        corpus, id_col="vec_id", vec_col="emb",
        n_planes=16, n_tables=12, cosine_threshold=0.99,
    )
    return out.select("id_a", "id_b", F.round("cosine_sim", 4).alias("cos_r"))


# ---------------------------------------------------------------------------
# analytic operator coverage (SURVEY.md Table B: aggregations, joins,
# sorts/top-k, grouping sets, windows) — exercised as engine queries with
# DuckDB oracles on the shared tables.
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate: grouped sums/avgs with map-side partial
    aggregation (two-level hash agg; one shuffle of the tiny group keys)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join + agg + top-k: broadcast the filtered customer
    dim; TakeOrderedAndProject caps the sort at k."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("o_orderdate") < F.lit("1995-03-15"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status), (priority), ()) — marginals + grand total
    in ONE aggregation pass (Expand feeds a single shuffle)."""
    od = load_table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_r
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window sessionization: per-user session ids from >30-min gaps
    (lag + cumulative sum over one user-keyed window shuffle)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # epoch seconds as double (NOT unix_timestamp, which truncates to whole
    # seconds): the 30-min cutoff must see sub-second gaps exactly as the
    # oracle's epoch() does. TIMESTAMP_NTZ can't cast to double directly;
    # hop through TIMESTAMP (session tz is UTC, so this is value-preserving).
    tsd = F.col("ts").cast("timestamp").cast("double")
    gap = tsd - F.lag(tsd).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.select(
        "user_id", "event_id", "ts", new_sess.alias("_new")
    ).withColumn(
        "session_seq", F.sum("_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long")
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
    )


def q_documents_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (exceptAll): doc ids present in documents but absent from
    the near-dup survivor set after exact dedup keep-first."""
    from typical_spark.operators.dedup import exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    dups = exact_duplicates(docs, "doc_id", "text")
    # ids dropped by keep-first dedup = all ids in groups minus group mins
    dropped = dups.select(
        F.explode(F.slice("doc_ids", 2, 1_000_000)).alias("doc_id")
    )
    return docs.select("doc_id").exceptAll(dropped)


def q_orders_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition pass/fail verdicts (north_star output b): one agg
    pass over a deterministic partition key; every (partition, check)
    pair reported, zeros included."""
    plan = compile_table_spec(ORDERS_SPEC)
    od = load_table(spark, sf_dir, "orders")
    v = plan.verdicts(od, partition_col=F.pmod(F.col("o_orderkey"), F.lit(8)))
    return v.select(
        F.col("partition_id").cast("long").alias("partition_id"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "check_id",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("pass").alias("pass_flag"),
    )


def q_events_props_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON coercion at the gate: parse props into a typed struct
    (from_json), coerce k to long, flag rows where k < 0 or parse failed."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k long").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p").isNull() | F.col("p.k").isNull()).alias("parse_failed"),
        F.when(F.col("p.k") < 0, True).otherwise(False).alias("negative_k"),
    )


def q_documents_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy keep-first survivor set over the minhash near-dup pairs:
    every doc that pairs with a smaller id is dropped. Oracle: same
    exact all-pairs Jaccard pair set, NOT IN on the dominated side."""
    from typical_spark.operators.dedup import (
        minhash_near_duplicates,
        near_dup_survivors,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.8)
    return near_dup_survivors(docs, "doc_id", pairs).select("doc_id")


def q_documents_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph (iterative
    min-label propagation — a genuinely non-single-pass-SQL operator).
    Oracle: recursive-CTE transitive closure in DuckDB over the same
    exact pair set."""
    from typical_spark.operators.dedup import (
        dedup_groups_connected,
        minhash_near_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.8)
    return dedup_groups_connected(pairs)


def q_documents_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (hash-bucket membership,
    stable under corpus growth and cluster layout). Oracle recomputes the
    identical md5-derived bucket in DuckDB — the auditability property
    the operator exists for."""
    from typical_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "split")


def q_documents_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetitious-text signals (C4/Gopher-style loop filters): total
    3-grams and the duplicate-3-gram ratio per document."""
    from typical_spark.functions.text_analysis import repetition_signals

    docs = load_table(spark, sf_dir, "documents")
    s = repetition_signals(F.col("text"))
    isnull = F.col("text").isNull()
    return docs.select(
        "doc_id",
        F.when(isnull, F.lit(None).cast("int")).otherwise(s["n_ngrams"]).alias("n_ngrams"),
        F.when(isnull, F.lit(None).cast("double"))
        .otherwise(F.round(s["dup_ngram_ratio"], 4)).alias("dup_r"),
    )


def q_documents_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing at the gate: the fixture has no PII, so the query
    plants a deterministic footer (email, IP, phone derived from doc_id)
    on each document — reproducible in SQL — then counts and redacts.
    The md5 of the redacted text makes the oracle byte-exact."""
    from typical_spark.functions.text_analysis import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" end"),
    )
    c = pii_counts(planted)
    return docs.select(
        "doc_id",
        c["email"].alias("n_email"),
        c["ipv4"].alias("n_ipv4"),
        c["phone"].alias("n_phone"),
        F.md5(redact_pii(planted)).alias("redacted_md5"),
    )


def q_documents_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= 8 distinct
    3-grams with a 'benchmark' set (here: the first 12 normalized words
    of every 20th document — every benchmark doc therefore contaminates
    at least its own source). Corpus scanned once; benchmark shingles
    broadcast."""
    from typical_spark.functions.text_analysis import normalize_text
    from typical_spark.operators.dedup import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 12)
        ).alias("bench_text"),
    )
    return ngram_contamination(
        docs, bench, "doc_id", "text", "bench_id", "bench_text",
        k=3, min_overlap=8,
    )


def q_documents_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus vocabulary stats: top-20 normalized tokens (explode
    -> map-side-combined count -> TakeOrdered top-k; ties broken by
    token so the cut is deterministic on both engines)."""
    from typical_spark.functions.text_analysis import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(20)
    )


def q_events_value_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS drift between the value distributions of two
    event types — the exact twin of the t-digest drift path, verifiable
    in SQL (identical cumulative-window computation in DuckDB)."""
    from typical_spark.operators.drift import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    return ks_two_sample(ev, "value", "event_type", "click", "purchase")


def q_events_ks_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition drift VERDICTS: exact KS of each event type's value
    distribution against the global one — the pass/fail-per-partition
    form of the drift check (north-star contract), exact twin of the
    t-digest drift_report."""
    from typical_spark.operators.drift import ks_by_group

    ev = load_table(spark, sf_dir, "events")
    return ks_by_group(ev, "value", "event_type", threshold=0.02)


def q_documents_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-certified top-15 tokens via the Misra-Gries bounded-shuffle
    path (stats.heavy_hitters): per-partition summaries of <= capacity
    rows + exact recount of survivors — the scale twin of the full
    distinct-token shuffle in documents_top_tokens. The operator RAISES
    if the MG bound cannot certify exactness, so a green row here means
    the sketch path provably equals the plain exact SQL."""
    from typical_spark.functions.text_analysis import normalize_text
    from typical_spark.operators.stats import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )
    return heavy_hitters(toks, "tok", k=15, capacity=4096)


def q_events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type sequences (runs.ordered_paths) — the
    conversation/transcript-assembly export shape: one map-side-combined
    collect_list per key, ordered INSIDE the array under the total order
    (ts, event_id), no window and no per-group sort task. Rows with a
    NULL key/value/order column are excluded (engines disagree on NULL
    collation placement)."""
    from typical_spark.operators.runs import ordered_paths

    ev = load_table(spark, sf_dir, "events")
    return ordered_paths(ev, "user_id", ["ts", "event_id"], "event_type")


def q_events_psi_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition PSI drift verdicts: each event type's value
    histogram against the global one (drift.psi_by_group) — the binned
    whole-density complement of events_ks_by_type's worst-point
    statistic; bins are equal-width over the global exact extent so
    both engines bin identically."""
    from typical_spark.operators.drift import psi_by_group

    ev = load_table(spark, sf_dir, "events")
    return psi_by_group(ev, "value", "event_type", n_bins=10, threshold=0.05)


def q_documents_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via the Bloom-prefilter scale path
    (benchmark too big to broadcast): same exact output contract as
    documents_contamination but with a different benchmark slice (every
    15th doc's first 14 normalized words, >= 6 shared 3-grams), so the
    two queries cannot pass by accident off each other's rows. The Bloom
    stage only prunes; the result is exact, hence SQL-oracled."""
    from typical_spark.functions.text_analysis import normalize_text
    from typical_spark.operators.dedup import bloom_contamination

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 15 == 1).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 14)
        ).alias("bench_text"),
    )
    return bloom_contamination(
        docs, bench, "doc_id", "text", "bench_id", "bench_text",
        k=3, min_overlap=6,
    )


def q_documents_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation user story in one query: keep-first
    near-dup survivors -> quality gate (alpha ratio + token floor) ->
    deterministic split assignment. Oracle composes the same three
    stages from their already-verified SQL twins."""
    from typical_spark.functions.text_analysis import quality_signals
    from typical_spark.operators.dedup import (
        minhash_near_duplicates,
        near_dup_survivors,
    )
    from typical_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.8)
    surv = near_dup_survivors(docs, "doc_id", pairs)
    s = quality_signals(F.col("text"))
    good = surv.where(
        (s["alpha_ratio"] >= 0.6) & (s["n_tokens"] >= 20)
    )
    return hash_split(good, "doc_id").select("doc_id", "split")


def q_events_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-duration + time-of-day round trip at the gate (A32/A33
    deserialize halves): serialize a per-event seconds value to ISO-8601
    "PnDTnHnMnS" / "HH:mm:ss", parse back with the strict grammars.
    Known-answer oracle: the parsed value must equal the source seconds
    exactly; every 7th event gets its (JSON) props string instead, which
    the strict grammar must reject to NULL."""
    from typical_spark.functions.coerce import (
        iso_duration_seconds,
        time_of_day_seconds,
    )
    from typical_spark.operators.dedup import _ensure_parallelism
    from typical_spark.serde import iso_duration_from_seconds, iso_time_from_seconds

    # regex-parse kernels are CPU-bound: a single small parquet split
    # would run them serially (the narrow repartition is ~free)
    ev = _ensure_parallelism(load_table(spark, sf_dir, "events"))
    n = F.floor(F.col("value") * 10).cast("long")
    n_signed = F.when(F.col("event_id") % 3 == 0, -n).otherwise(n)
    dur_str = F.when(
        F.col("event_id") % 7 == 0, F.col("props")
    ).otherwise(iso_duration_from_seconds(n_signed))
    tod = F.floor(F.col("value") * 80).cast("long")
    tod_str = iso_time_from_seconds(tod)
    # Staged projections: the parse kernels embed their input expression
    # per capture group, so inlining the serializer trees here multiplies
    # serializer-tree size by the parse fan-out and the eager per-op
    # ANALYSIS of that product tree cost ~1.6s of driver time (profiled;
    # execution was fine — codegen CSE already shared the subtrees).
    # Projecting the serialized strings first keeps every analyzed tree
    # O(kernel) instead of O(kernel x fan-out); CollapseProject leaves
    # the split in place (non-cheap refs used more than once), still one
    # WholeStageCodegen span. An explode-barrier rewrite (the net.py
    # trick, which pays off when extraction happens in a *separate*
    # operator) was A/B-measured 2x SLOWER here (interleaved warm
    # min-of-3: 2.55s vs 4.8s at sf0.1) — the Generate breaks
    # whole-stage codegen for no sharing gain; the plain projection
    # split keeps the exact same fused-stage execution.
    staged = ev.select(
        "event_id", dur_str.alias("_ds"), tod_str.alias("_ts")
    ).select(
        "event_id",
        iso_duration_seconds(F.col("_ds")).alias("dur_secs"),
        time_of_day_seconds(F.col("_ts")).alias("tod_secs"),
    )
    return staged.select(
        "event_id",
        "dur_secs",
        F.col("dur_secs").isNotNull().alias("parse_ok"),
        "tod_secs",
    )


def q_events_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction (reference NetAddrInfo, typic/types/url.py:
    104-166 properties over NET_ADDR_PATTERN url.py:49-80) as a
    known-answer contract query: deterministic URL strings of five shapes
    (absolute with auth+port+params, default-port domain, internal IPv4,
    relative, invalid) are synthesized per event, parsed with the
    single-regex-pass kernel, and the oracle recomputes every component
    and derived predicate directly in SQL."""
    from typical_spark.functions.net import (
        attach_parsed_url,
        url_base,
        url_is_absolute,
        url_is_internal,
    )
    from typical_spark.operators.dedup import _ensure_parallelism

    ev = _ensure_parallelism(load_table(spark, sf_dir, "events"))
    m = F.col("event_id") % 5
    s7 = (F.col("event_id") % 7).cast("string")
    s3 = (F.col("event_id") % 3).cast("string")
    a = (F.col("event_id") % 256).cast("string")
    b = (F.col("event_id") % 100).cast("string")
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://user:pw@site"), s7,
            F.lit(".example.com:8443/a/b;k=v?x="), s3, F.lit("#sec")))
        .when(m == 1, F.concat(F.lit("http://example"), s7, F.lit(".com/p/q")))
        .when(m == 2, F.concat(
            F.lit("http://192.168."), a, F.lit("."), b, F.lit("/x?y=2")))
        .when(m == 3, F.lit("/rel/path;a=b?q=1#top"))
        .otherwise(F.concat(F.lit("not a url "), F.col("event_id").cast("string")))
    )
    # parse once per row behind the Generate barrier: 14 component reads
    # of an inline parse_url(url) would otherwise duplicate the whole
    # two-regex tree per column (see attach_parsed_url docstring)
    parsed = attach_parsed_url(ev.select("event_id"), url, alias="_u")
    u = F.col("_u")
    return parsed.select(
        "event_id",
        u.isNotNull().alias("is_valid"),
        u["scheme"].alias("scheme"),
        u["auth"].alias("auth"),
        u["host"].alias("host"),
        u["port"].alias("port"),
        u["path"].alias("path"),
        u["params"].alias("params"),
        u["qs"].alias("qs"),
        u["fragment"].alias("fragment"),
        u["is_ip"].alias("is_ip"),
        url_is_absolute(u).alias("absolute"),
        url_is_internal(u).alias("internal"),
        url_base(u).alias("base"),
    )


def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase->click attribution via the as-of join operator
    (operators/asof.py): each purchase gets the most recent click by the
    same user at-or-before its timestamp. The right side is deduped on
    (user_id, ts) keep-max-id so the cross-engine oracle (DuckDB's
    native ASOF LEFT JOIN) is exactly reproducible."""
    from typical_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    base = F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    clicks = (
        ev.where((F.col("event_type") == "click") & base)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where((F.col("event_type") == "purchase") & base).select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    j = asof_join(purchases, clicks, by=["user_id"])
    return j.select(
        "purchase_id",
        "user_id",
        F.col("r_click_id").alias("click_id"),
        # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The
        # session timezone is pinned UTC (session.py), so the NTZ->TZ
        # cast is offset-free and the difference is exact
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("r_ts").cast("timestamp"))
        ).alias("us_since_click"),
    )


def q_documents_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF
    (text_analysis.tfidf_top_terms) — keyword extraction over the shared
    corpus tokenization, ranked on the rounded score for cross-engine
    determinism."""
    from typical_spark.functions.text_analysis import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


def q_documents_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k bigram LM quality score per document
    (text_analysis.bigram_logprob_score) — the CCNet-style perplexity
    filter over the shared corpus tokenization."""
    from typical_spark.functions.text_analysis import bigram_logprob_score

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_score(docs, "doc_id", "text", k=0.5)


def q_documents_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality buckets per language
    (sampling.rank_buckets over the bigram-LM score): bucket 1 = head =
    highest avg_logprob in its language. The ordering key is the
    already double-rounded avg_logprob (engine-identical to 4dp —
    documents_lm_score is hash-green on it) with doc_id tie-break, so
    the exact ntile cut is cross-engine-stable."""
    from typical_spark.functions.text_analysis import bigram_logprob_score
    from typical_spark.operators.sampling import rank_buckets

    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_logprob_score(docs, "doc_id", "text", k=0.5)
    withlang = scored.join(docs.select("doc_id", "lang"), "doc_id")
    return rank_buckets(
        withlang, "doc_id", "avg_logprob", group_col="lang",
        n_buckets=3, labels=("head", "middle", "tail"), ascending=False,
    ).select("doc_id", "lang", "avg_logprob", "bucket", "bucket_label")


def q_documents_cross_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-corpus) near-dup detection
    (dedup.minhash_cross_duplicates): a synthetic 'daily crawl' —
    lightly-mutated copies of every 7th document plus genuinely novel
    docs — checked against the standing corpus. Oracle: exact all-pairs
    Jaccard between the same two sides (valid for the same recall
    reason as documents_minhash_pairs: pairs are bimodal around the
    0.8 threshold)."""
    from typical_spark.operators.dedup import minhash_cross_duplicates

    docs = load_table(spark, sf_dir, "documents")
    mutated = docs.where(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" freshly crawled mirror copy")
        ).alias("text"),
    )
    novel = docs.where(F.col("doc_id") % 7 == 4).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.lit("novel document "),
            F.col("doc_id").cast("string"),
            F.lit(" entirely fresh content stream alpha beta gamma delta"),
        ).alias("text"),
    )
    out = minhash_cross_duplicates(
        mutated.unionByName(novel), docs, "doc_id", "text",
        jaccard_threshold=0.8,
    )
    return out.select(
        "new_id", "corpus_id", F.round("jaccard", 4).alias("jaccard_r")
    )


def q_documents_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking with overlap (packing.chunk_spans): 512-char
    windows advancing by stride 448 over each document's length —
    metadata-only span computation, the RAG/pretraining chunker."""
    from typical_spark.operators.packing import chunk_spans

    docs = load_table(spark, sf_dir, "documents")
    return chunk_spans(docs, "doc_id", "n_chars", chunk_size=512, overlap=64)


def q_documents_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (text_analysis.nfc_normalize, the
    Arrow-batched pandas-UDF escape hatch) on deterministically-planted
    decomposed text ('e'+combining-acute, 'A'+combining-ring — the
    corpus itself is ASCII), verified against DuckDB's nfc_normalize:
    changed flag, normalized-text md5, and composed-pair count."""
    from typical_spark.functions.text_analysis import nfc_normalize

    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" café Å"),
    )
    n = nfc_normalize(planted)
    return docs.select(
        "doc_id",
        (n != planted).alias("changed"),
        F.md5(n).alias("nfc_md5"),
        (F.length(planted) - F.length(n)).cast("int").alias("n_composed"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel per user
    (runs.funnel_steps): chained earliest-completion min() aggregates,
    engine-exact by construction."""
    from typical_spark.operators.runs import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def q_events_rolling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour event velocity per user (stats.rolling_time_agg):
    a RANGE frame over epoch seconds, so simultaneous events share the
    same window — burst/bot detection features. Emitted per event."""
    from typical_spark.operators.stats import rolling_time_agg

    ev = load_table(spark, sf_dir, "events")
    r = rolling_time_agg(
        ev.where(F.col("user_id").isNotNull()),
        "ts", by=["user_id"], window_seconds=3600, value_col="value",
    )
    return r.select(
        "event_id",
        "user_id",
        "n_trailing",
        F.round("sum_trailing", 4).alias("sum_trailing"),
    )


def q_embeddings_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding table
    (similarity.quantize_embeddings), emitted as exploded scalar rows
    (vec_id, scale, pos, q) so the cross-engine compare never depends
    on array stringification."""
    from typical_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb.where(F.col("embedding").isNotNull()))
    return qz.select(
        "vec_id",
        F.round("scale", 4).alias("scale_r"),
        F.posexplode("q").alias("pos0", "q"),
    ).select(
        "vec_id", "scale_r", (F.col("pos0") + 1).alias("pos"), "q"
    )


def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantile summary (stats.group_quantiles): Spark
    percentile() and DuckDB quantile_cont share the (n-1)*q linear
    interpolation, so values match bit-for-bit after rounding; the
    approx=True twin is the unbounded-group path."""
    from typical_spark.operators.stats import group_quantiles

    ev = load_table(spark, sf_dir, "events")
    q = group_quantiles(ev, "value", by=["event_type"])
    return q.select(
        "event_type",
        "n",
        F.round("q_0_5", 4).alias("p50"),
        F.round("q_0_9", 4).alias("p90"),
        F.round("q_0_99", 4).alias("p99"),
    )


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style tumbling rollup (stats.time_rollup): per
    (event_type, hour) counts and value sum/avg — one map-side-combined
    groupBy whose partials re-aggregate exactly to coarser buckets."""
    from typical_spark.operators.stats import time_rollup

    ev = load_table(spark, sf_dir, "events")
    r = time_rollup(ev, "ts", by=["event_type"], value_col="value", unit="hour")
    return r.select(
        "event_type",
        "bucket",
        "n_rows",
        F.round("value_sum", 4).alias("value_sum"),
        F.round("value_avg", 4).alias("value_avg"),
    )


def q_events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flags (stats.zscore_outliers):
    two-pass group stats + join, no window — the monitoring twin of the
    drift checks. The cut compares the ROUNDED |z| so both engines keep
    the same boundary rows."""
    from typical_spark.operators.stats import zscore_outliers

    ev = load_table(spark, sf_dir, "events")
    # threshold 0 here; the contract cut is on the rounded z below so
    # the boundary is engine-exact
    z = zscore_outliers(ev, "value", by=["event_type"], threshold=0.0)
    return (
        z.select(
            "event_id",
            "event_type",
            "value",
            F.round("zscore", 4).alias("zscore"),
        )
        .where(F.abs(F.col("zscore")) > 3.0)
    )


def q_documents_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-mixture pipeline end-to-end: bigram-LM quality gate
    (drop gibberish-scoring docs) -> exact-count stratified rebalance
    (halve the dominant en stratum) -> concat-and-split sequence
    packing. Each stage is individually oracle-verified
    (documents_lm_score / documents_stratified / documents_packing);
    this query pins their composition. The LM cut compares the
    4dp-ROUNDED avg_logprob, so the kept set is engine-exact."""
    from typical_spark.functions.text_analysis import bigram_logprob_score
    from typical_spark.operators.packing import pack_sequences
    from typical_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    lm = bigram_logprob_score(docs, "doc_id", "text", k=0.5)
    kept = docs.join(
        lm.where(F.col("avg_logprob") >= -3.45).select("doc_id"), "doc_id"
    )
    bal = stratified_sample(
        kept, "doc_id", "lang", {"en": 0.5}, default_fraction=1.0
    )
    packed = pack_sequences(bal, "doc_id", "n_chars", budget=2048, n_shards=4)
    return packed.select("doc_id", "shard", "offset", "first_seq", "last_seq")


def q_events_click_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match windowed attribution via the bucketized interval
    join (operators/interval.py): EVERY purchase x click pair where the
    purchase falls inside [click_ts, click_ts + 1h] for the same user —
    the all-matches complement of events_asof_attribution's most-recent
    match. Oracle is the plain inequality join (safe at oracle scale;
    the engine's bucketization exists precisely because that spelling
    blows up on hot keys)."""
    from typical_spark.operators.interval import interval_join

    ev = load_table(spark, sf_dir, "events")
    base = F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    clicks = ev.where((F.col("event_type") == "click") & base).select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where((F.col("event_type") == "purchase") & base).select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    j = interval_join(
        purchases, clicks, by=["user_id"],
        point_ts="ts", start_ts="start", end_ts="end", bucket_seconds=3600,
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("r_click_id").alias("click_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("r_start").cast("timestamp"))
        ).alias("us_after_click"),
    )


def q_documents_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (operators/packing.py): which
    budget-2048 training sequences each document's tokens land in,
    per hash shard — one window cumsum, reproduced exactly in SQL."""
    from typical_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "n_chars", budget=2048, n_shards=8)


def q_events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between view/error value
    distributions (drift.psi_drift): equal-width bins over the
    reference extent, epsilon-smoothed — the binned complement of the
    exact-KS and t-digest drift paths."""
    from typical_spark.operators.drift import psi_drift

    ev = load_table(spark, sf_dir, "events")
    out = psi_drift(ev, "value", "event_type", "view", "error", n_bins=10)
    # double-round on BOTH sides (6dp in the operator, 4dp here and in
    # the oracle) keeps the cross-engine hash stable despite libm ln()
    return out.select("n_ref", "n_cur", F.round("psi", 4).alias("psi"))


def q_events_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run-length encoding (operators/runs.py): runs
    of >=3 consecutive same-type events per user ordered by (ts,
    event_id) — the bot-burst / repeated-tool-call detector."""
    from typical_spark.operators.runs import value_runs

    ev = load_table(spark, sf_dir, "events")
    return value_runs(
        ev, ["user_id"], ["ts", "event_id"], "event_type", min_run_len=3
    )


def q_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling (sampling.stratified_sample):
    keep 25% of en and 50% of zh documents, everything else whole —
    deterministic hash-rank selection, the training-mixture rebalance
    primitive. Fractions are picked binary-exact (0.25/0.5) so the
    ceil() cut cannot float-drift across engines."""
    from typical_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    s = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.25, "zh": 0.5}, default_fraction=1.0
    )
    return s.select("doc_id", "lang", "stratum_n", "rank")


def q_documents_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-level exact dedup detector (operators/spans.py): token
    windows of the normalized stream shared by >=2 distinct documents —
    the boilerplate-span family whole-document minhash misses. Narrow
    (md5, doc_id) shuffle + group join-back; no all-pairs at any
    duplication rate."""
    from typical_spark.operators.spans import span_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return span_duplicates(docs, "doc_id", "text", span_tokens=10)


def q_documents_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first span-dedup rewrite (operators/spans.py): duplicated
    windows survive only at their first (doc_id, span_idx) occurrence;
    documents are re-concatenated from their kept windows — the
    reference's keep-first array-dedup contract
    (typic/constraints/array.py:30-87) at corpus granularity."""
    from typical_spark.operators.spans import strip_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return strip_duplicate_spans(docs, "doc_id", "text", span_tokens=10)


def q_documents_span_dups_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phase span detector (spans.py n_offsets=2): the union of
    the phase-0 and phase-5 grids lands in ONE hash-grouped table, so a
    span carried at offset 0 (mod 10) in one document and offset 5
    (mod 10) in another is still counted as shared — the part of the
    round-4 operator the n_offsets=1 contract query cannot see. Same
    narrow (hash, doc_id) shuffle; cost is exactly one extra windowing
    pass, never pair explosion."""
    from typical_spark.operators.spans import span_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return span_duplicates(
        docs, "doc_id", "text", span_tokens=10, n_offsets=2
    )


def q_documents_span_para(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-anchored span detector (spans.py): every sentence/
    paragraph restarts its own window grid, so boilerplate pasted
    mid-document at an arbitrary global offset is caught in ONE pass
    when it starts at a boundary (the dominant real-world case; the
    fixed grid needs luck or n_offsets passes). The synthetic corpus
    carries no punctuation, so the contract pins a deterministic token
    boundary (the literal token 'spark') — semantics identical to
    sentence punctuation, and it yields real unaligned mid-document
    boundaries for the cross-engine check. Positions are GLOBAL offsets
    in the concatenated normalized stream (per-paragraph prefix sums
    computed document-locally — no extra shuffle)."""
    from typical_spark.operators.spans import span_duplicates_anchored

    docs = load_table(spark, sf_dir, "documents")
    return span_duplicates_anchored(
        docs, "doc_id", "text", span_tokens=10, boundary=r"\bspark\b"
    )


def q_documents_span_para_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored keep-first strip rewrite (spans.py): the strip-capable
    answer to mid-document boilerplate — anchored grids still partition
    the normalized stream, so kept windows re-concatenate exactly,
    while the multi-phase detector's overlapping phases never could.
    Same deterministic 'spark'-token boundary as documents_span_para."""
    from typical_spark.operators.spans import strip_duplicate_spans_anchored

    docs = load_table(spark, sf_dir, "documents")
    return strip_duplicate_spans_anchored(
        docs, "doc_id", "text", span_tokens=10, boundary=r"\bspark\b"
    )


def q_documents_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (doc-inside-doc): shingle containment
    |S(a)&S(b)|/|S(a)| >= 0.8 via lossless rarest-shingle prefix
    filtering + exact array_intersect verify (dedup.py). The excerpt
    case Jaccard near-dup structurally misses; keep-first semantics per
    the reference's typic/constraints/array.py:30-87."""
    from typical_spark.operators.dedup import containment_duplicates, release_cache

    docs = load_table(spark, sf_dir, "documents")
    out = containment_duplicates(docs, "doc_id", "text", threshold=0.8)
    res = out.select(
        "id_a", "id_b", F.round("containment", 4).alias("containment_r")
    )
    res._owned_cache = getattr(out, "_owned_cache", [])
    return res


def q_embeddings_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN probe, exact configuration: IVFIndex.query_batch with
    nprobe == n_cells probes EVERY cell, so the one-job batch path
    (broadcast-centroid cell assignment -> explode -> cell_id equi-join
    -> per-query row_number top-k) is exact brute-force top-k and can be
    graded cross-engine — the batch machinery itself, not just its
    single-vector twin, gets an oracle."""
    from typical_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex.build(emb, n_cells=8)
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = idx.query_batch(queries_df, k=5, nprobe=8)
    return out.select(
        "query_id", "vec_id", F.round("cosine_sim", 3).alias("sim_r")
    )


def q_documents_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (quality_model.score_documents_expr):
    the fasttext/CCNet-style hashed bag-of-words linear gate as ONE
    zero-shuffle codegen'd projection — tokens -> md5-reproducible
    buckets -> weights -> mean -> sigmoid. Oracle config uses the
    closed-form pseudo-weight function (a fitted artifact cannot be
    replayed cross-engine); the trained path (QualityModel.train/score,
    broadcast weight dim table) is pytest-verified with the same
    machinery. Mirrors the reference's constraint-gate shape
    (typic/constraints/common.py:147-174): score below threshold ==
    violation row."""
    from typical_spark.operators.quality_model import score_documents_expr

    docs = load_table(spark, sf_dir, "documents")
    out = score_documents_expr(
        docs, "doc_id", "text", dim=8192, reproducible=True
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("score", 4).alias("score_r"),
        F.round("prob", 4).alias("prob_r"),
    )


def q_embeddings_semantic_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup verdicts (similarity.semantic_duplicates):
    per-row keep/drop with keep-first (min-id) attribution. Same planted
    near-dup corpus as embeddings_near_dups (the fixture has no natural
    eps-pairs); contract config n_cells=1 makes cluster blocking
    complete, so an exact all-pairs oracle grades the eps-ball +
    keep-first semantics; the k-means blocking path (n_cells > 1) is
    pytest-verified (parity on separated clusters)."""
    from typical_spark.operators.similarity import semantic_duplicates

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    pert = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("emb", 1) + F.lit(0.05)),
            F.slice("emb", 2, 1_000_000),
        ).alias("emb"),
    )
    corpus = emb.unionByName(pert)
    return semantic_duplicates(
        corpus, id_col="vec_id", vec_col="emb",
        n_cells=1, eps_cosine=0.99,
    )


def q_documents_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training order
    (sampling.global_shuffle): every doc gets a (shard, pos) — stable
    across runs/cluster sizes, per-shard windows only (no global sort;
    plan-pinned in test_physical_plans). The oracle replays the same
    62-bit-masked md5 hash rank per shard."""
    from typical_spark.operators.sampling import global_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return global_shuffle(docs, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos"
    )


def q_documents_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/dsir.py): select the 50 raw
    docs whose hashed unigram+bigram profile best matches a small target
    slice (en docs with doc_id % 5 == 0), via Gumbel-top-k over
    deterministic log-likelihood-ratio weights. The oracle replays the
    ENTIRE pipeline — both bucket-count models, smoothing, per-doc
    weight sums, and the hash-derived Gumbel noise — in SQL."""
    from typical_spark.operators.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(
        (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)
    )
    out = dsir_select(
        docs, target, "doc_id", "text", k=50, dim=4096,
        reproducible=True,
    )
    res = out.select(
        "doc_id",
        "n_feats",
        F.round("log_w", 4).alias("log_w_r"),
        F.round("sel_key", 4).alias("sel_key_r"),
    )
    res._owned_cache = getattr(out, "_owned_cache", [])
    return res


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused multi-check validation pass over events at sf0.001."""
    return q_events_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict order is the driver's grading order and it grades the FIRST
    50 entries. There are more green queries than driver slots, so the
    back-of-queue set ROTATES each round (round 5: the 5 TPC-style
    aggregation queries are back inside the window per the round-4
    verdict, and the round-5-new queries (span_para_clean, containment,
    batch_topk, quality_model, semantic_dups, shuffle, dsir,
    ks_by_type, psi_by_type, user_paths, heavy_hitters,
    contamination_bloom, lm_buckets) are in-window; 10 long-stable
    text-analysis queries plus events_hourly_rollup,
    events_rolling_counts, events_funnel, documents_chunks,
    documents_exact_dups, documents_except, events_sessionize,
    events_click_windows, events_value_outliers and
    events_value_quantiles rotate out and
    return in round 6) so every
    entry gets a driver-graded row at least every other round. Entries
    past the cut stay under an AUTOMATIC local gate:
    tests/test_transcripts_oracle.py::test_rotated_out_queries_still_green
    runs the full oracle comparison for every past-cut entry on each
    pytest run (plus tools/check_oracles.py, which always checks all)."""
    return {
        "events_violations": q_events_violations,
        "orders_violations": q_orders_violations,
        "lineitem_dup_keys": q_lineitem_dup_keys,
        "orders_dup_rows": q_orders_dup_rows,
        "orders_referential": q_orders_referential,
        "lineitem_referential": q_lineitem_referential,
        "events_ts_ordering": q_events_ts_ordering,
        "embeddings_topk": q_embeddings_topk,
        "documents_minhash_pairs": q_documents_minhash_pairs,
        "documents_simhash_pairs": q_documents_simhash_pairs,
        "embeddings_near_dups": q_embeddings_near_dups,
        "orders_verdicts": q_orders_verdicts,
        "events_props_coerce": q_events_props_coerce,
        "events_durations": q_events_durations,
        "documents_dedup_survivors": q_documents_dedup_survivors,
        "documents_dup_groups": q_documents_dup_groups,
        "documents_split": q_documents_split,
        "documents_contamination": q_documents_contamination,
        "events_value_ks": q_events_value_ks,
        "documents_curated": q_documents_curated,
        "events_urls": q_events_urls,
        "events_asof_attribution": q_events_asof_attribution,
        "documents_cross_dups": q_documents_cross_dups,
        "events_ks_by_type": q_events_ks_by_type,
        "events_psi_by_type": q_events_psi_by_type,
        "events_user_paths": q_events_user_paths,
        "documents_heavy_hitters": q_documents_heavy_hitters,
        "documents_contamination_bloom": q_documents_contamination_bloom,
        "documents_lm_buckets": q_documents_lm_buckets,
        "embeddings_quantized": q_embeddings_quantized,
        "documents_packing": q_documents_packing,
        "events_value_psi": q_events_value_psi,
        "events_runs": q_events_runs,
        "documents_stratified": q_documents_stratified,
        "documents_span_dups": q_documents_span_dups,
        "documents_span_clean": q_documents_span_clean,
        "documents_span_dups_mp": q_documents_span_dups_mp,
        "documents_span_para": q_documents_span_para,
        "documents_span_para_clean": q_documents_span_para_clean,
        "documents_containment": q_documents_containment,
        "embeddings_batch_topk": q_embeddings_batch_topk,
        "documents_quality_model": q_documents_quality_model,
        "embeddings_semantic_dups": q_embeddings_semantic_dups,
        "documents_shuffle": q_documents_shuffle,
        "documents_dsir": q_documents_dsir,
        "lineitem_stats": q_lineitem_stats,
        "orders_grouped_stats": q_orders_grouped_stats,
        "pricing_summary": q_pricing_summary,
        "top_unshipped_orders": q_top_unshipped_orders,
        "orders_grouping_sets": q_orders_grouping_sets,
        # ---- past the driver's 50-entry grading window this round
        # (rotated out; driver-green in rounds 2-4, still gated by
        # test_rotated_out_queries_still_green + tools/check_oracles.py)
        "documents_exact_dups": q_documents_exact_dups,
        "documents_except": q_documents_except,
        "events_sessionize": q_events_sessionize,
        "events_click_windows": q_events_click_windows,
        "events_value_outliers": q_events_value_outliers,
        "events_value_quantiles": q_events_value_quantiles,
        "events_hourly_rollup": q_events_hourly_rollup,
        "events_rolling_counts": q_events_rolling_counts,
        "events_funnel": q_events_funnel,
        "documents_chunks": q_documents_chunks,
        "documents_token_stats": q_documents_token_stats,
        "documents_lang_id": q_documents_lang_id,
        "documents_quality": q_documents_quality,
        "documents_repetition": q_documents_repetition,
        "documents_pii": q_documents_pii,
        "documents_top_tokens": q_documents_top_tokens,
        "documents_nfc": q_documents_nfc,
        "documents_tfidf": q_documents_tfidf,
        "documents_lm_score": q_documents_lm_score,
        "documents_mixture": q_documents_mixture,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL on the same tables)
# ---------------------------------------------------------------------------

_EVENTS_VIOLATIONS_SQL = _violations_oracle([
    """SELECT event_id, 'event_id' AS "column", 'not_null' AS check_id,
              CAST(NULL AS VARCHAR) AS observed, 'value is not null' AS expected
       FROM events WHERE event_id IS NULL""",
    """SELECT event_id, 'event_id', 'number_range', CAST(event_id AS VARCHAR),
              'number: ge=0' FROM events WHERE event_id IS NOT NULL AND NOT (event_id >= 0)""",
    """SELECT event_id, 'event_type', 'not_null', CAST(NULL AS VARCHAR),
              'value is not null' FROM events WHERE event_type IS NULL""",
    """SELECT event_id, 'event_type', 'enum', event_type,
              'one of [''click'', ''purchase'', ''signup'', ''view'']'
       FROM events WHERE event_type IS NOT NULL
         AND event_type NOT IN ('click','view','signup','purchase')""",
    """SELECT event_id, 'user_id', 'not_null', CAST(NULL AS VARCHAR),
              'value is not null' FROM events WHERE user_id IS NULL""",
    """SELECT event_id, 'user_id', 'number_range', CAST(user_id AS VARCHAR),
              'number: ge=0' FROM events WHERE user_id IS NOT NULL AND NOT (user_id >= 0)""",
    """SELECT event_id, 'value', 'number_range', CAST(value AS VARCHAR),
              'number: ge=0.0, lt=1000.0'
       FROM events WHERE value IS NOT NULL AND NOT (value >= 0.0 AND value < 1000.0)""",
    """SELECT event_id, 'props', 'text_regex', props, 'matches ''^\\{.*\\}$'''
       FROM events WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\\{.*\\}$')""",
    """SELECT event_id, 'ts', 'not_null', CAST(NULL AS VARCHAR),
              'value is not null' FROM events WHERE ts IS NULL""",
    """SELECT event_id, 'ts', 'ts_range', CAST(ts AS VARCHAR),
              'ts in [2020-01-01 00:00:00, 2030-01-01 00:00:00]'
       FROM events WHERE ts IS NOT NULL
         AND NOT (ts >= TIMESTAMP '2020-01-01' AND ts < TIMESTAMP '2030-01-01')""",
])

_ORDERS_VIOLATIONS_SQL = _violations_oracle([
    """SELECT o_orderkey, 'o_orderkey' AS "column", 'not_null' AS check_id,
              CAST(NULL AS VARCHAR) AS observed, 'value is not null' AS expected
       FROM orders WHERE o_orderkey IS NULL""",
    """SELECT o_orderkey, 'o_orderstatus', 'not_null', CAST(NULL AS VARCHAR),
              'value is not null' FROM orders WHERE o_orderstatus IS NULL""",
    """SELECT o_orderkey, 'o_orderstatus', 'enum', o_orderstatus,
              'one of [''F'', ''O'', ''P'']'
       FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')""",
    """SELECT o_orderkey, 'o_totalprice', 'number_range', CAST(o_totalprice AS VARCHAR),
              'number: gt=0.0'
       FROM orders WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice > 0.0)""",
    """SELECT o_orderkey, 'o_orderpriority', 'text_length',
              CAST(length(o_orderpriority) AS VARCHAR), '3 <= length <= 20'
       FROM orders WHERE o_orderpriority IS NOT NULL
         AND NOT (length(o_orderpriority) BETWEEN 3 AND 20)""",
    """SELECT o_orderkey, 'o_orderpriority', 'text_regex', o_orderpriority,
              'matches ''^[1-5]-[A-Z]+$'''
       FROM orders WHERE o_orderpriority IS NOT NULL
         AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')""",
])


def _documents_split_oracle() -> str:
    """Built from the SAME split_cutoffs the operator uses, so the
    integer boundaries cannot drift between engine and oracle.
    md5_number_lower & (2^k - 1) equals the engine's signed
    md5_lower64 & mask (identical low bits of the same 64-bit value)."""
    from typical_spark.operators.sampling import split_cutoffs

    cuts = split_cutoffs(
        [("train", 0.98), ("val", 0.01), ("test", 0.01)], 8192
    )
    whens = " ".join(
        f"WHEN b >= {lo} AND b < {hi} THEN '{name}'" for name, lo, hi in cuts
    )
    return f"""
        SELECT doc_id, CASE {whens} END AS split
        FROM (
            SELECT doc_id,
                   md5_number_lower(CAST(doc_id AS VARCHAR) || ':42') & 8191 AS b
            FROM documents
        )
    """


def _documents_pii_oracle() -> str:
    """Built from the SAME PII_PATTERNS the engine redacts with (the
    patterns are deliberately valid in both Java regex and RE2), over the
    same planted footer, so counts and the redacted-text md5 must match
    byte-for-byte."""
    from typical_spark.functions.text_analysis import PII_PATTERNS

    planted = (
        "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 or 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' end'"
    )
    red = "t"
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(f"len(regexp_extract_all(t, '{pat}')) AS n_{name}")
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
        SELECT doc_id, {', '.join(counts)}, md5({red}) AS redacted_md5
        FROM (SELECT doc_id, {planted} AS t FROM documents)
    """


def _documents_curated_oracle() -> str:
    """Composes the three already-verified stage twins: minhash keep-first
    survivors (shared CTE), the quality gate (same NULL alignment as the
    documents_quality oracle), and the split CASE from split_cutoffs."""
    from typical_spark.operators.sampling import split_cutoffs

    cuts = split_cutoffs(
        [("train", 0.98), ("val", 0.01), ("test", 0.01)], 8192
    )
    whens = " ".join(
        f"WHEN b >= {lo} AND b < {hi} THEN '{name}'" for name, lo, hi in cuts
    )
    return f"""
        WITH {_MINHASH_PAIR_CTES},
        q AS (
            SELECT doc_id,
                   CAST(coalesce(len(regexp_extract_all(text, '[A-Za-z]')), 0) AS DOUBLE)
                       / GREATEST(coalesce(length(text), 0), 1) AS alpha_r,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS n_tokens
            FROM documents
        ),
        surv AS (
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id_b FROM allpairs)
        ),
        kept AS (
            SELECT s.doc_id FROM surv s JOIN q USING (doc_id)
            WHERE q.alpha_r >= 0.6 AND q.n_tokens >= 20
        )
        SELECT doc_id, CASE {whens} END AS split
        FROM (
            SELECT doc_id,
                   md5_number_lower(CAST(doc_id AS VARCHAR) || ':42') & 8191 AS b
            FROM kept
        )
    """


# Shared DuckDB twin of the minhash near-dup pair set (keep-first exact
# collapse + exact all-pairs Jaccard among representatives); reused by the
# pair, survivor, and connected-components oracles so all three verify
# against the SAME ground-truth pair graph.
_MINHASH_PAIR_CTES = """
            norm AS (
                SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS n
                FROM documents WHERE text IS NOT NULL
            ),
            hk AS (SELECT doc_id, md5(n) AS h, n FROM norm),
            grp AS (SELECT h, min(doc_id) AS rep FROM hk GROUP BY 1),
            star AS (
                SELECT g.rep AS id_a, k.doc_id AS id_b,
                       CAST(1.0 AS DOUBLE) AS jaccard_r
                FROM hk k JOIN grp g USING (h) WHERE k.doc_id <> g.rep
            ),
            reps AS (SELECT k.doc_id, k.n FROM hk k JOIN grp g ON k.doc_id = g.rep),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' '))) AS s
                FROM (SELECT doc_id, string_split(n, ' ') AS w FROM reps)
            ),
            jpairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            ),
            allpairs AS (
                SELECT id_a, id_b, round(j, 4) AS jaccard_r
                FROM jpairs WHERE j >= 0.8
                UNION ALL
                SELECT id_a, id_b, jaccard_r FROM star
            )
"""


def oracle_sql() -> dict[str, str]:
    return {
        "events_violations": _EVENTS_VIOLATIONS_SQL,
        "orders_violations": _ORDERS_VIOLATIONS_SQL,
        "lineitem_dup_keys": """
            SELECT l_orderkey, l_linenumber, count(*) AS n_rows
            FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "orders_dup_rows": """
            SELECT o_orderkey, o_custkey, dup_rank FROM (
                SELECT o_orderkey, o_custkey,
                       CAST(row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS INT) AS dup_rank
                FROM orders
            ) WHERE dup_rank > 1
        """,
        "orders_referential": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        """,
        "lineitem_referential": """
            SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem l
            WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        """,
        "lineitem_stats": """
            SELECT * FROM (
              SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
                     count(*) - count(l_orderkey) AS n_null,
                     count(DISTINCT l_orderkey) AS n_distinct,
                     CAST(min(l_orderkey) AS VARCHAR) AS min_value,
                     CAST(max(l_orderkey) AS VARCHAR) AS max_value,
                     round(avg(l_orderkey), 4) AS avg_r,
                     round(stddev_samp(l_orderkey), 4) AS std_r
              FROM lineitem
              UNION ALL
              SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
                     count(DISTINCT l_quantity),
                     CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR),
                     round(avg(l_quantity), 4), round(stddev_samp(l_quantity), 4)
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
                     count(DISTINCT l_extendedprice),
                     CAST(min(l_extendedprice) AS VARCHAR), CAST(max(l_extendedprice) AS VARCHAR),
                     round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
              FROM lineitem
              UNION ALL
              SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
                     count(DISTINCT l_returnflag),
                     CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR),
                     CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
              FROM lineitem
            )
        """,
        "orders_grouped_stats": """
            SELECT o_orderstatus, count(*) AS n_rows,
                   count(*) - count(o_totalprice) AS n_null,
                   count(DISTINCT o_totalprice) AS n_distinct,
                   round(min(o_totalprice), 4) AS min_r,
                   round(max(o_totalprice), 4) AS max_r,
                   round(avg(o_totalprice), 4) AS avg_r,
                   round(stddev_samp(o_totalprice), 4) AS std_r
            FROM orders GROUP BY ROLLUP (o_orderstatus)
        """,
        "documents_exact_dups": """
            WITH norm AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(regexp_replace(lower(text),
                           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS dup_hash
                FROM documents
            )
            SELECT dup_hash, count(*) AS n_docs
            FROM norm GROUP BY 1 HAVING count(*) >= 2
        """,
        "documents_token_stats": """
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS n_tokens_ws,
                   coalesce(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')), 0) AS n_tokens_bpe,
                   length(text) AS n_chars
            FROM documents
        """,
        "documents_lang_id": """
            WITH s AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS n_tokens,
                       len(regexp_extract_all(text, '(?i)\\b(the|and|is|of|to|you|that|with)\\b')) AS s_en,
                       len(regexp_extract_all(text, '(?i)\\b(der|die|und|das|ist|nicht|ein|ich)\\b')) AS s_de,
                       len(regexp_extract_all(text, '(?i)\\b(le|la|les|et|est|que|pour|vous)\\b')) AS s_fr,
                       len(regexp_extract_all(text, '(?i)\\b(el|los|que|es|por|una|para|con)\\b')) AS s_es
                FROM documents
            )
            SELECT CASE WHEN n_tokens IS NULL OR n_tokens = 0 THEN 'und'
                        WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                        WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                        WHEN s_de > s_en THEN 'de'
                        WHEN s_en > 0 THEN 'en'
                        ELSE 'und' END AS lang,
                   count(*) AS n_docs
            FROM s GROUP BY 1
        """,
        "documents_quality": """
            WITH s AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS n_tokens,
                       len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                       len(regexp_extract_all(text,
                           '(?i)\\b(the|of|and|a|to|in|is|it|you|that|he|was|for|on|are|as|with|his|they|i|at|be|this|have|from|or|one|had|by|word|but|not|what|all|were|we|when|your|can|said|there|use|an|each|which|she|do|how|their|if)\\b')) AS n_stop
                FROM documents
            )
            -- NULL-text alignment with the Spark kernel: counts are
            -- coalesced to 0 and Spark's greatest() ignores NULLs, so
            -- alpha_r/stop_r are 0.0 for NULL text while mtl_r (whose
            -- numerator is NULL arithmetic) stays NULL.
            SELECT doc_id,
                   round(CAST(coalesce(n_alpha, 0) AS DOUBLE)
                         / GREATEST(coalesce(n_chars, 0), 1), 4) AS alpha_r,
                   round(CAST(coalesce(n_stop, 0) AS DOUBLE)
                         / GREATEST(coalesce(n_tokens, 0), 1), 4) AS stop_r,
                   round(CAST(n_chars - n_tokens + 1 AS DOUBLE)
                         / GREATEST(coalesce(n_tokens, 0), 1), 4) AS mtl_r
            FROM s
        """,
        # exact twin of the engine's minhash-LSH + keep-first collapse:
        # identical-normalized-text groups emit (rep, member, 1.0) star
        # pairs; representatives pair by EXACT all-pairs Jaccard over the
        # same distinct 3-word shingles (LSH banding + verify is exact up
        # to >0.999 recall at the 0.8 threshold).
        "documents_minhash_pairs": f"""
            WITH {_MINHASH_PAIR_CTES}
            SELECT id_a, id_b, jaccard_r FROM allpairs
        """,
        "documents_dedup_survivors": f"""
            -- greedy keep-first: a doc survives iff it is never the
            -- dominated (larger-id) side of a near-dup pair
            WITH {_MINHASH_PAIR_CTES}
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id_b FROM allpairs)
        """,
        "documents_dup_groups": f"""
            -- transitive closure over the same pair graph: group_id =
            -- min doc_id of each connected component
            WITH RECURSIVE {_MINHASH_PAIR_CTES},
            edges AS (
                SELECT id_a AS a, id_b AS b FROM allpairs
                UNION
                SELECT id_b, id_a FROM allpairs
            ),
            reach(src, dst) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
            )
            SELECT src AS doc_id, least(src, min(dst)) AS group_id
            FROM reach GROUP BY src
        """,
        "documents_simhash_pairs": """
            -- full simhash recomputation: md5_number_lower is bit-identical
            -- to the engine's md5_lower64 token hash, so signatures match
            -- exactly; chunk blocking in the engine is EXACT for hamming<=3
            -- (pigeonhole), so all-pairs hamming here is the same set.
            WITH norm AS (
                SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS n
                FROM documents WHERE text IS NOT NULL
            ),
            hk AS (SELECT doc_id, md5(n) AS h FROM norm),
            grp AS (SELECT h, min(doc_id) AS rep FROM hk GROUP BY 1),
            star AS (
                SELECT g.rep AS id_a, k.doc_id AS id_b, CAST(0 AS INT) AS hamming
                FROM hk k JOIN grp g USING (h) WHERE k.doc_id <> g.rep
            ),
            reps AS (SELECT nn.doc_id, nn.n FROM norm nn JOIN grp g ON nn.doc_id = g.rep),
            toks AS (SELECT doc_id, unnest(string_split(n, ' ')) AS t FROM reps),
            th AS (SELECT doc_id, md5_number_lower(t) AS hh FROM toks),
            votes AS (
                SELECT doc_id, b,
                       sum(CASE WHEN ((hh >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
                FROM th, (SELECT unnest(range(0, 64)) AS b) bits
                GROUP BY 1, 2
            ),
            sigs AS (
                SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN
                       CASE WHEN b = 63 THEN CAST(-9223372036854775807 - 1 AS HUGEINT)
                            ELSE CAST(CAST(1 AS BIGINT) << b AS HUGEINT) END
                       ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS sig
                FROM votes GROUP BY 1
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
                FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
            UNION ALL
            SELECT id_a, id_b, hamming FROM star
        """,
        "embeddings_near_dups": """
            -- planted near-dups (+0.05 on component 1, ids offset by 1e6)
            -- verified by exact all-pairs cosine: completeness (every
            -- planted pair found) AND precision (nothing else).
            WITH base AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
            ),
            pert AS (
                SELECT vec_id + 1000000 AS vec_id,
                       list_concat([emb[1] + 0.05], emb[2:]) AS emb
                FROM base
            ),
            corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(a.emb, b.emb) AS c
                FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 4) AS cos_r FROM pairs WHERE c >= 0.99
        """,
        "embeddings_topk": """
            SELECT b.vec_id,
                   round(list_cosine_similarity(b.embedding, a.embedding), 3) AS sim_r
            FROM embeddings b,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) a
            ORDER BY list_cosine_similarity(b.embedding, a.embedding) DESC, b.vec_id
            LIMIT 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "top_unshipped_orders": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "orders_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_r
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "events_sessionize": """
            WITH lagged AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS _new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, session_seq,
                   count(*) AS n_events, min(event_id) AS first_event
            FROM (
                SELECT user_id, event_id,
                       CAST(sum(_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                FROM lagged
            )
            GROUP BY 1, 2
        """,
        "documents_except": """
            WITH norm AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(regexp_replace(lower(text),
                           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
                FROM documents
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY h)
            SELECT doc_id FROM keep
        """,
        "orders_verdicts": """
            WITH parts AS (
                SELECT o_orderkey % 8 AS partition_id, count(*) AS n_rows
                FROM orders GROUP BY 1
            ),
            checks(check_id) AS (
                VALUES ('not_null'), ('enum'), ('number_range'),
                       ('text_length'), ('text_regex')
            ),
            vio AS (
                SELECT o_orderkey % 8 AS pid, 'not_null' AS check_id
                FROM orders WHERE o_orderstatus IS NULL
                UNION ALL
                SELECT o_orderkey % 8, 'enum' FROM orders
                WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')
                UNION ALL
                SELECT o_orderkey % 8, 'number_range' FROM orders
                WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice > 0.0)
                UNION ALL
                SELECT o_orderkey % 8, 'text_length' FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND length(o_orderpriority) NOT BETWEEN 3 AND 20
                UNION ALL
                SELECT o_orderkey % 8, 'text_regex' FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
            ),
            vc AS (SELECT pid, check_id, count(*) AS n FROM vio GROUP BY 1, 2)
            SELECT p.partition_id, p.n_rows, c.check_id,
                   coalesce(vc.n, 0) AS n_violations,
                   coalesce(vc.n, 0) = 0 AS pass_flag
            FROM parts p
            CROSS JOIN checks c
            LEFT JOIN vc ON vc.pid = p.partition_id AND vc.check_id = c.check_id
        """,
        "events_props_coerce": """
            WITH j AS (
                SELECT event_id, TRY_CAST(props AS JSON) AS pj FROM events
            )
            -- parse_failed must track whether k coerced to BIGINT (Spark's
            -- from_json nulls the long field for non-integer values), not
            -- merely whether the key exists as a string.
            SELECT event_id,
                   TRY_CAST(json_extract_string(pj, '$.k') AS BIGINT) AS k,
                   (pj IS NULL OR
                    TRY_CAST(json_extract_string(pj, '$.k') AS BIGINT) IS NULL)
                       AS parse_failed,
                   coalesce(
                       TRY_CAST(json_extract_string(pj, '$.k') AS BIGINT) < 0,
                       FALSE) AS negative_k
            FROM j
        """,
        "documents_split": _documents_split_oracle(),
        "documents_curated": _documents_curated_oracle(),
        "documents_top_tokens": """
            SELECT tok, count(*) AS n
            FROM (
                SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
                    lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                    '\\s+', ' ', 'g')), ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            )
            GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
        """,
        "events_value_ks": """
            WITH v AS (
                SELECT value, event_type FROM events
                WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
            ),
            agg AS (
                SELECT value,
                       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
                       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
                FROM v GROUP BY value
            ),
            cum AS (
                SELECT sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cca,
                       sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ccb
                FROM agg
            ),
            tot AS (
                SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
                FROM v
            )
            SELECT n_a, n_b,
                   round(max(abs(CAST(cca AS DOUBLE) / n_a
                                 - CAST(ccb AS DOUBLE) / n_b)), 6) AS ks_stat
            FROM cum, tot GROUP BY n_a, n_b
        """,
        "documents_repetition": """
            WITH g AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE list_transform(
                                range(1, greatest(len(w) - 2, 1) + 1),
                                i -> array_to_string(w[i:i+2], ' ')) END AS grams
                FROM (
                    SELECT doc_id, text,
                           string_split(trim(regexp_replace(regexp_replace(
                               lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                               '\\s+', ' ', 'g')), ' ') AS w
                    FROM documents
                )
            )
            SELECT doc_id,
                   CAST(len(grams) AS INT) AS n_ngrams,
                   round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                         / GREATEST(len(grams), 1), 4) AS dup_r
            FROM g
        """,
        "documents_pii": _documents_pii_oracle(),
        "documents_contamination": """
            WITH words AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ),
            dsh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' ')))) AS g
                FROM words
            ),
            bsh AS (
                SELECT doc_id AS bench_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(w[1:12]) - 2, 1) + 1),
                    i -> array_to_string(w[1:12][i:i+2], ' ')))) AS g
                FROM words WHERE doc_id % 20 = 0
            )
            SELECT d.doc_id, b.bench_id, count(*) AS n_overlap
            FROM dsh d JOIN bsh b USING (g)
            GROUP BY 1, 2 HAVING count(*) >= 8
        """,
        "documents_contamination_bloom": """
            -- exact contract of the Bloom-prefiltered scale path: the
            -- Bloom stage only prunes, so the oracle is the plain exact
            -- containment join (bench = every 15th doc's first 14
            -- normalized words, >= 6 shared 3-grams)
            WITH words AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ),
            dsh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' ')))) AS g
                FROM words
            ),
            bsh AS (
                SELECT doc_id AS bench_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(w[1:14]) - 2, 1) + 1),
                    i -> array_to_string(w[1:14][i:i+2], ' ')))) AS g
                FROM words WHERE doc_id % 15 = 1
            )
            SELECT d.doc_id, b.bench_id, count(*) AS n_overlap
            FROM dsh d JOIN bsh b USING (g)
            GROUP BY 1, 2 HAVING count(*) >= 6
        """,
        "events_ks_by_type": """
            -- per-group exact KS vs the GLOBAL value distribution; the
            -- per-group CDF is evaluated on the full distinct-value
            -- grid (the sup can sit at a value the group lacks)
            WITH cnt AS (
                SELECT event_type AS group_id, value AS v, count(*) AS c
                FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ),
            dv AS (SELECT v, sum(c) AS gc FROM cnt GROUP BY v),
            dvc AS (
                SELECT v, sum(gc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum_all
                FROM dv
            ),
            tot AS (
                SELECT group_id, CAST(sum(c) AS BIGINT) AS n_group
                FROM cnt GROUP BY 1
            ),
            grand AS (SELECT sum(c) AS n_all FROM cnt),
            grid AS (
                SELECT t.group_id, t.n_group, d.v, d.cum_all, g.n_all
                FROM dvc d CROSS JOIN tot t CROSS JOIN grand g
            ),
            j AS (
                SELECT grid.group_id, grid.n_group, grid.v, grid.cum_all,
                       grid.n_all, coalesce(cnt.c, 0) AS c
                FROM grid LEFT JOIN cnt
                  ON cnt.group_id = grid.group_id AND cnt.v = grid.v
            ),
            cum AS (
                SELECT group_id, n_group,
                       abs(CAST(sum(c) OVER (PARTITION BY group_id ORDER BY v
                                             ROWS UNBOUNDED PRECEDING)
                                AS DOUBLE) / n_group
                           - CAST(cum_all AS DOUBLE) / n_all) AS gap
                FROM j
            )
            SELECT group_id, n_group, round(max(gap), 6) AS ks_stat,
                   round(max(gap), 6) > 0.02 AS drifted
            FROM cum GROUP BY group_id, n_group
        """,
        "events_psi_by_type": """
            -- per-group PSI vs the GLOBAL histogram; equal-width bins
            -- over the global exact [min, max] (exact extremes bin
            -- identically on both engines), epsilon-smoothed, grid
            -- left-join fills bins a group never hits
            WITH v AS (
                SELECT event_type AS group_id, CAST(value AS DOUBLE) AS v
                FROM events WHERE value IS NOT NULL
            ),
            ext AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
            cells AS (
                SELECT group_id,
                       CAST(greatest(0, least(9,
                           CASE WHEN (hi - lo) / 10 > 0
                                THEN floor((v - lo) / ((hi - lo) / 10))
                                ELSE 0 END)) AS BIGINT) AS bin,
                       count(*) AS c
                FROM v CROSS JOIN ext GROUP BY 1, 2
            ),
            gbin AS (SELECT bin, sum(c) AS gc FROM cells GROUP BY bin),
            tot AS (
                SELECT group_id, CAST(sum(c) AS BIGINT) AS n_group
                FROM cells GROUP BY 1
            ),
            grand AS (SELECT sum(c) AS n_all FROM cells),
            grid AS (
                SELECT t.group_id, t.n_group, g.bin, g.gc, gr.n_all
                FROM gbin g CROSS JOIN tot t CROSS JOIN grand gr
            ),
            j AS (
                SELECT grid.group_id, grid.n_group,
                       CAST(coalesce(cells.c, 0) AS DOUBLE) / grid.n_group
                           + 1e-06 AS p_g,
                       CAST(grid.gc AS DOUBLE) / grid.n_all + 1e-06 AS p_ref
                FROM grid LEFT JOIN cells
                  ON cells.group_id = grid.group_id AND cells.bin = grid.bin
            ),
            s AS (
                SELECT group_id, n_group,
                       round(sum((p_g - p_ref) * ln(p_g / p_ref)), 6) AS psi
                FROM j GROUP BY 1, 2
            )
            SELECT group_id, n_group, psi, psi > 0.05 AS drifted FROM s
        """,
        "documents_heavy_hitters": """
            -- the MG path's certified-exact contract: plain exact top-k
            -- (k=15, ties broken by token) — identical semantics to the
            -- one-pass path, different physical plan
            WITH toks AS (
                SELECT unnest(string_split(trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                    '\\s+', ' ', 'g')), ' ')) AS tok
                FROM documents
            )
            SELECT tok, CAST(count(*) AS BIGINT) AS n
            FROM toks WHERE tok IS NOT NULL
            GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 15
        """,
        "events_user_paths": """
            -- ordered sequence assembly under the total order
            -- (ts, event_id); NULL key/value/order rows excluded (NULL
            -- collation placement differs across engines)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_items,
                   list(event_type ORDER BY ts, event_id) AS items,
                   array_to_string(
                       list(event_type ORDER BY ts, event_id), ' -> '
                   ) AS path
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              AND ts IS NOT NULL AND event_id IS NOT NULL
            GROUP BY user_id
        """,
        "events_durations": """
            -- known-answer oracle for the ISO-duration/time round trip:
            -- the strict grammar must recover the exact source seconds,
            -- reject the every-7th JSON-props injection, and NULL the
            -- out-of-range times.
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 OR value IS NULL
                        THEN CAST(NULL AS DOUBLE)
                        -- 0 - x, not -x: avoids IEEE -0.0 when x = 0
                        ELSE CAST(CASE WHEN event_id % 3 = 0
                                       THEN 0 - floor(value * 10)
                                       ELSE floor(value * 10) END AS DOUBLE)
                   END AS dur_secs,
                   coalesce(event_id % 7 <> 0, TRUE) AND value IS NOT NULL
                       AS parse_ok,
                   CASE WHEN value IS NOT NULL
                             AND floor(value * 80) >= 0
                             AND floor(value * 80) < 86400
                        THEN CAST(floor(value * 80) AS DOUBLE)
                   END AS tod_secs
            FROM events
        """,
        "events_ts_ordering": """
            SELECT user_id, event_id, 'ts_out_of_order' AS check_id,
                   CAST(ts AS VARCHAR) AS observed
            FROM (
                SELECT user_id, event_id, ts,
                       lag(ts) OVER w AS prev_ts,
                       lag(event_id) OVER w AS prev_id
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            )
            WHERE prev_ts IS NOT NULL AND ts IS NOT NULL
              AND ts < prev_ts AND event_id - prev_id > 0
        """,
        "documents_tfidf": """
            -- smoothed TF-IDF (idf = ln((1+N)/(1+df)) + 1), same
            -- tokenization as documents_top_tokens; rank on the ROUNDED
            -- score so both engines cut the same top-3
            WITH toks AS (
                SELECT doc_id, unnest(string_split(trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                    '\\s+', ' ', 'g')), ' ')) AS t
                FROM documents WHERE text IS NOT NULL
            ),
            tf AS (
                SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
                FROM toks WHERE t <> '' GROUP BY doc_id, t
            ),
            dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
            n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
            scored AS (
                SELECT tf.doc_id, tf.t AS token, tf.tf, dfq.df,
                       round(tf.tf * (ln((1.0 + n_docs) / (1.0 + dfq.df)) + 1),
                             4) AS score
                FROM tf JOIN dfq USING (t) CROSS JOIN n
            )
            SELECT doc_id, token, tf, df, score, CAST(rank AS INT) AS rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
                FROM scored
            ) WHERE rank <= 3
        """,
        "events_asof_attribution": """
            -- DuckDB's native ASOF LEFT JOIN is the oracle for the
            -- union-sort-window as-of operator; right side deduped on
            -- (user_id, ts) because DuckDB picks an arbitrary duplicate
            WITH clicks AS (
                SELECT user_id, ts, max(event_id) AS click_id
                FROM events
                WHERE event_type = 'click'
                  AND ts IS NOT NULL AND user_id IS NOT NULL
                GROUP BY user_id, ts
            ),
            purchases AS (
                SELECT user_id, ts, event_id AS purchase_id
                FROM events
                WHERE event_type = 'purchase'
                  AND ts IS NOT NULL AND user_id IS NOT NULL
            )
            SELECT p.purchase_id, p.user_id, c.click_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS us_since_click
            FROM purchases p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "documents_lm_score": """
            -- add-k bigram LM: same tokenization, context counts folded
            -- from bigram counts, V over the full filtered stream;
            -- double-rounded (6dp->4dp) before AND after exp so both
            -- engines exponentiate identical inputs
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split(trim(regexp_replace(
                           regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ),
            pos AS (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS i
                FROM d WHERE len(toks) >= 2
            ),
            bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
            cb AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                FROM bg GROUP BY w1, w2
            ),
            cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw FROM cb GROUP BY w1),
            v AS (
                SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
                FROM (SELECT unnest(toks) AS w FROM d)
            ),
            sc AS (
                SELECT bg.doc_id,
                       CAST(count(*) AS BIGINT) AS n_bigrams,
                       round(round(avg(ln(
                           (cb.cb + 0.5) / (cu.cw + 0.5 * vocab))), 6), 4)
                           AS avg_logprob
                FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
                GROUP BY bg.doc_id
            )
            SELECT doc_id, n_bigrams, avg_logprob,
                   round(round(exp(-avg_logprob), 6), 4) AS ppl
            FROM sc
        """,
        "documents_lm_buckets": """
            -- CCNet head/middle/tail per language: exact ntile over the
            -- double-rounded (engine-identical) LM score, doc_id
            -- tie-break; same LM replay as documents_lm_score
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split(trim(regexp_replace(
                           regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ),
            pos AS (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS i
                FROM d WHERE len(toks) >= 2
            ),
            bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
            cb AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                FROM bg GROUP BY w1, w2
            ),
            cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw FROM cb GROUP BY w1),
            v AS (
                SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
                FROM (SELECT unnest(toks) AS w FROM d)
            ),
            sc AS (
                SELECT bg.doc_id,
                       round(round(avg(ln(
                           (cb.cb + 0.5) / (cu.cw + 0.5 * vocab))), 6), 4)
                           AS avg_logprob
                FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
                GROUP BY bg.doc_id
            ),
            scl AS (
                SELECT sc.doc_id, doc.lang, sc.avg_logprob
                FROM sc JOIN documents doc ON doc.doc_id = sc.doc_id
                WHERE doc.lang IS NOT NULL
            ),
            b AS (
                SELECT doc_id, lang, avg_logprob,
                       CAST(ntile(3) OVER (
                           PARTITION BY lang
                           ORDER BY avg_logprob DESC, doc_id
                       ) AS INT) AS bucket
                FROM scl
            )
            SELECT doc_id, lang, avg_logprob, bucket,
                   CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket_label
            FROM b
        """,
        "documents_cross_dups": """
            -- exact all-pairs Jaccard between the synthetic crawl and
            -- the corpus, same shingle spelling as the minhash oracle
            WITH newb AS (
                SELECT doc_id + 1000000 AS doc_id,
                       text || ' freshly crawled mirror copy' AS text
                FROM documents WHERE doc_id % 7 = 3
                UNION ALL
                SELECT doc_id + 2000000,
                       'novel document ' || CAST(doc_id AS VARCHAR)
                       || ' entirely fresh content stream alpha beta gamma delta'
                FROM documents WHERE doc_id % 7 = 4
            ),
            nn AS (
                SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS n
                FROM newb WHERE text IS NOT NULL
            ),
            cn AS (
                SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS n
                FROM documents WHERE text IS NOT NULL
            ),
            shn AS (
                SELECT doc_id, list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' '))) AS s
                FROM (SELECT doc_id, string_split(n, ' ') AS w FROM nn)
            ),
            shc AS (
                SELECT doc_id, list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' '))) AS s
                FROM (SELECT doc_id, string_split(n, ' ') AS w FROM cn)
            )
            SELECT new_id, corpus_id, round(j, 4) AS jaccard_r
            FROM (
                SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
                       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                           AS j
                FROM shn a, shc b
            ) WHERE j >= 0.8
        """,
        "documents_chunks": """
            -- 512-char chunks, stride 448 (overlap 64), final partial
            -- kept; ceil(max(len-overlap,1)/stride) chunks per doc
            WITH d AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) AS len
                FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
            ),
            c AS (
                SELECT doc_id, len,
                       unnest(generate_series(0,
                           CAST(ceil(greatest(len - 64, 1) / 448.0)
                                AS BIGINT) - 1)) AS chunk_idx
                FROM d
            )
            SELECT doc_id, chunk_idx,
                   chunk_idx * 448 AS start,
                   least(chunk_idx * 448 + 512, len) AS "end",
                   least(chunk_idx * 448 + 512, len) - chunk_idx * 448
                       AS chunk_len
            FROM c
        """,
        "documents_nfc": """
            -- same planted decomposed suffix (chr 769 = U+0301 acute,
            -- chr 778 = U+030A ring), DuckDB's native nfc_normalize
            SELECT doc_id,
                   planted <> nfc_normalize(planted) AS changed,
                   md5(nfc_normalize(planted)) AS nfc_md5,
                   CAST(length(planted) - length(nfc_normalize(planted))
                        AS INT) AS n_composed
            FROM (
                SELECT doc_id,
                       coalesce(text, '') || ' cafe' || chr(769)
                       || ' A' || chr(778) AS planted
                FROM documents
            )
        """,
        "events_funnel": """
            -- earliest-completion ordered funnel, same min() chain
            WITH s1 AS (
                SELECT user_id, min(ts) AS t_1 FROM events
                WHERE event_type = 'view'
                  AND ts IS NOT NULL AND user_id IS NOT NULL
                GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t_2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click'
                  AND e.ts IS NOT NULL AND e.ts >= s1.t_1
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t_3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND e.ts IS NOT NULL AND e.ts >= s2.t_2
                GROUP BY e.user_id
            )
            SELECT s1.user_id, t_1, t_2, t_3,
                   CAST(CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN t_2 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN t_3 IS NOT NULL THEN 1 ELSE 0 END
                      AS INT) AS step_reached
            FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        """,
        "events_rolling_counts": """
            -- RANGE frame over epoch seconds: ties share the window
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_trailing,
                   round(sum(value) OVER w, 4) AS sum_trailing
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            WINDOW w AS (
                PARTITION BY user_id
                ORDER BY epoch_us(ts) / 1000000.0
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
            )
        """,
        "embeddings_quantized": """
            -- same double-widened arithmetic, exploded to scalar rows
            WITH s AS (
                SELECT vec_id,
                       coalesce(list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))), 0.0) AS scale,
                       embedding
                FROM embeddings WHERE embedding IS NOT NULL
            ),
            p AS (
                SELECT vec_id, scale, embedding,
                       unnest(generate_series(1, len(embedding))) AS pos
                FROM s
            )
            SELECT vec_id, round(scale, 4) AS scale_r, pos,
                   CASE WHEN scale > 0
                        THEN CAST(round(CAST(embedding[pos] AS DOUBLE)
                                        / scale * 127) AS TINYINT)
                        ELSE CAST(0 AS TINYINT) END AS q
            FROM p
        """,
        "events_value_quantiles": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(quantile_cont(value, 0.99), 4) AS p99
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        "events_hourly_rollup": """
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   round(sum(value), 4) AS value_sum,
                   round(avg(value), 4) AS value_avg
            FROM events WHERE ts IS NOT NULL
            GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_value_outliers": """
            -- two-pass z-score; the cut compares the ROUNDED |z| so
            -- boundary rows are engine-exact
            WITH stats AS (
                SELECT event_type, avg(value) AS m, stddev_samp(value) AS s
                FROM events WHERE value IS NOT NULL GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   round((e.value - m) / s, 4) AS zscore
            FROM events e JOIN stats USING (event_type)
            WHERE e.value IS NOT NULL AND s IS NOT NULL AND s > 0
              AND abs(round((e.value - m) / s, 4)) > 3.0
        """,
        "documents_mixture": """
            -- composition of the three individually-verified stages:
            -- LM gate (documents_lm_score CTEs) -> stratified rebalance
            -- (documents_stratified spelling) -> packing
            -- (documents_packing spelling), parameters inline
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split(trim(regexp_replace(
                           regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ),
            pos AS (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS i
                FROM d WHERE len(toks) >= 2
            ),
            bgr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
            cb AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                FROM bgr GROUP BY w1, w2
            ),
            cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw FROM cb GROUP BY w1),
            v AS (
                SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
                FROM (SELECT unnest(toks) AS w FROM d)
            ),
            sc AS (
                SELECT bgr.doc_id,
                       round(round(avg(ln(
                           (cb.cb + 0.5) / (cu.cw + 0.5 * vocab))), 6), 4)
                           AS avg_logprob
                FROM bgr JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
                GROUP BY bgr.doc_id
            ),
            kept AS (
                SELECT doc.* FROM documents doc
                JOIN sc ON doc.doc_id = sc.doc_id
                WHERE sc.avg_logprob >= -3.45
            ),
            ranked AS (
                SELECT doc_id, lang, n_chars,
                       CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                           AS stratum_n,
                       CAST(row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5_number_lower(
                               CAST(doc_id AS VARCHAR) || ':42')
                               & 4611686018427387903,
                               doc_id) AS BIGINT) AS rank
                FROM kept WHERE lang IS NOT NULL
            ),
            bal AS (
                SELECT doc_id, n_chars FROM ranked
                WHERE rank <= ceil(
                    (CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END) * stratum_n)
            ),
            pbase AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) AS tokens,
                       CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':42')
                            & 3 AS INT) AS shard,
                       md5_number_lower(CAST(doc_id AS VARCHAR) || ':43')
                            & 4294967295 AS sh
                FROM bal WHERE n_chars IS NOT NULL AND n_chars > 0
            ),
            pc AS (
                SELECT doc_id, tokens, shard,
                       CAST(sum(tokens) OVER (
                           PARTITION BY shard ORDER BY sh, doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM pbase
            )
            SELECT doc_id, shard, cum - tokens AS "offset",
                   CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS first_seq,
                   CAST(floor((cum - 1) / 2048.0) AS BIGINT) AS last_seq
            FROM pc
        """,
        "events_click_windows": """
            -- plain inequality join is the oracle for the bucketized
            -- interval join (the engine bucketizes to avoid exactly
            -- this spelling's hot-key blowup)
            SELECT p.event_id AS purchase_id, p.user_id,
                   c.event_id AS click_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS us_after_click
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND p.ts IS NOT NULL AND c.ts IS NOT NULL
              AND p.user_id IS NOT NULL
        """,
        "documents_packing": """
            -- concat-and-split packing: identical shard hash, identical
            -- (sort_hash, id) order, one window cumsum; the 32-bit sort
            -- mask keeps signed/unsigned hash views order-identical
            WITH base AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) AS tokens,
                       CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':42')
                            & 7 AS INT) AS shard,
                       md5_number_lower(CAST(doc_id AS VARCHAR) || ':43')
                            & 4294967295 AS sh
                FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
            ),
            c AS (
                SELECT doc_id, tokens, shard,
                       CAST(sum(tokens) OVER (
                           PARTITION BY shard ORDER BY sh, doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM base
            )
            SELECT doc_id, tokens, shard, cum - tokens AS "offset",
                   CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS first_seq,
                   CAST(floor((cum - 1) / 2048.0) AS BIGINT) AS last_seq,
                   CAST(floor((cum - 1) / 2048.0)
                        - floor((cum - tokens) / 2048.0) + 1 AS INT) AS n_seqs
            FROM c
        """,
        "events_value_psi": """
            -- PSI with equal-width bins over the reference extent;
            -- binning arithmetic spelled in the engine's exact order
            -- ((v-lo)/width, width=(hi-lo)/10); double-rounded 6dp->4dp
            -- on both sides to absorb libm ln() differences
            WITH vals AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       event_type = 'view' AS is_ref
                FROM events
                WHERE event_type IN ('view', 'error') AND value IS NOT NULL
            ),
            ext AS (SELECT min(v) AS lo, max(v) AS hi FROM vals WHERE is_ref),
            binned AS (
                SELECT greatest(0, least(9,
                           CASE WHEN (hi - lo) / 10 > 0
                                THEN CAST(floor((v - lo) / ((hi - lo) / 10))
                                          AS BIGINT)
                                ELSE 0 END)) AS bin,
                       is_ref
                FROM vals CROSS JOIN ext
            ),
            counts AS (
                SELECT bin,
                       CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
                       CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
                FROM binned GROUP BY bin
            ),
            tot AS (
                SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
                       CAST(sum(c_cur) AS BIGINT) AS n_cur
                FROM counts
            )
            SELECT n_ref, n_cur,
                   round(round(sum(
                       (c_cur / CAST(n_cur AS DOUBLE) + 1e-6
                        - c_ref / CAST(n_ref AS DOUBLE) - 1e-6)
                       * ln((c_cur / CAST(n_cur AS DOUBLE) + 1e-6)
                            / (c_ref / CAST(n_ref AS DOUBLE) + 1e-6))
                   ), 6), 4) AS psi
            FROM counts CROSS JOIN tot
            GROUP BY n_ref, n_cur
        """,
        "events_runs": """
            -- two-row_number gaps-and-islands, the textbook spelling
            WITH base AS (
                SELECT user_id, event_type, ts, event_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_type IS NOT NULL AND event_id IS NOT NULL
            ),
            rn AS (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS run
                FROM base
            )
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS run_len,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM rn GROUP BY user_id, event_type, run
            HAVING count(*) >= 3
        """,
        "documents_stratified": """
            -- exact-count stratified sample: same 62-bit-masked hash
            -- rank (signed/unsigned order-identical), same binary-exact
            -- fractions, same ceil() cut
            WITH ranked AS (
                SELECT doc_id, lang,
                       CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                           AS stratum_n,
                       CAST(row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5_number_lower(
                               CAST(doc_id AS VARCHAR) || ':42')
                               & 4611686018427387903,
                               doc_id) AS BIGINT) AS rank
                FROM documents WHERE lang IS NOT NULL
            )
            SELECT doc_id, lang, stratum_n, rank FROM ranked
            WHERE rank <= ceil(
                (CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.5
                      ELSE 1.0 END) * stratum_n)
        """,
        "documents_span_dups": """
            -- span-level exact dedup detector: identical normalization,
            -- fixed 10-token grid windows (tail kept), md5 grouping key
            WITH words AS (
                SELECT doc_id,
                       str_split(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ), spans AS (
                SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                       CAST(i * 10 AS BIGINT) AS start_token,
                       CAST(least((i + 1) * 10, len(w)) AS BIGINT)
                           AS end_token,
                       md5(array_to_string(
                           list_slice(w, i * 10 + 1, i * 10 + 10), ' ')) AS h
                FROM words,
                     unnest(range(CAST((len(w) + 9) // 10 AS BIGINT))) AS t(i)
                WHERE len(w) > 0 AND w[1] <> ''
            ), grp AS (
                SELECT h, count(DISTINCT doc_id) AS n_docs_sharing
                FROM spans GROUP BY h
            )
            SELECT s.doc_id, s.span_idx, s.start_token, s.end_token,
                   g.n_docs_sharing
            FROM spans s JOIN grp g USING (h)
            WHERE g.n_docs_sharing >= 2
        """,
        "documents_span_clean": """
            -- keep-first span rewrite: first (doc_id, span_idx)
            -- occurrence of each window survives; kept windows rejoin
            -- in span order
            WITH words AS (
                SELECT doc_id,
                       str_split(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ), spans AS (
                SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                       array_to_string(
                           list_slice(w, i * 10 + 1, i * 10 + 10), ' ')
                           AS span
                FROM words,
                     unnest(range(CAST((len(w) + 9) // 10 AS BIGINT))) AS t(i)
                WHERE len(w) > 0 AND w[1] <> ''
            ), flagged AS (
                SELECT doc_id, span_idx, span,
                       (row_number() OVER (
                            PARTITION BY md5(span)
                            ORDER BY doc_id, span_idx) = 1) AS kept
                FROM spans
            )
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_dropped,
                   coalesce(string_agg(CASE WHEN kept THEN span END,
                                       ' ' ORDER BY span_idx), '')
                       AS clean_text
            FROM flagged GROUP BY doc_id
        """,
        "documents_span_dups_mp": """
            -- multi-phase span detector (n_offsets=2): phase-0 and
            -- phase-5 grids UNION into one hash-grouped table, so
            -- cross-phase sharing counts; span_idx is per-phase (rows
            -- unique by (doc_id, start_token))
            WITH words AS (
                SELECT doc_id,
                       str_split(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ), spans AS (
                SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                       CAST(i * 10 AS BIGINT) AS start_token,
                       CAST(least((i + 1) * 10, len(w)) AS BIGINT)
                           AS end_token,
                       md5(array_to_string(
                           list_slice(w, i * 10 + 1, i * 10 + 10), ' ')) AS h
                FROM words,
                     unnest(range(CAST((len(w) + 9) // 10 AS BIGINT))) AS t(i)
                WHERE len(w) > 0 AND w[1] <> ''
                UNION ALL
                SELECT doc_id, CAST(i AS BIGINT),
                       CAST(5 + i * 10 AS BIGINT),
                       CAST(least(5 + (i + 1) * 10, len(w)) AS BIGINT),
                       md5(array_to_string(
                           list_slice(w, 5 + i * 10 + 1, 5 + i * 10 + 10),
                           ' '))
                FROM words,
                     unnest(range(CAST((len(w) - 5 + 9) // 10 AS BIGINT)))
                         AS t(i)
                WHERE len(w) > 0 AND w[1] <> ''
            ), grp AS (
                SELECT h, count(DISTINCT doc_id) AS n_docs_sharing
                FROM spans GROUP BY h
            )
            SELECT s.doc_id, s.span_idx, s.start_token, s.end_token,
                   g.n_docs_sharing
            FROM spans s JOIN grp g USING (h)
            WHERE g.n_docs_sharing >= 2
        """,
        "documents_span_para": """
            -- boundary-anchored span detector: split RAW text on the
            -- contract boundary token, normalize each segment
            -- independently, window each segment on its own grid;
            -- global positions = per-doc prefix sums of segment token
            -- counts (empty segments contribute 0 but keep their
            -- para_idx slot)
            WITH segs AS (
                SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
                       a[i + 1] AS seg
                FROM (SELECT doc_id,
                             regexp_split_to_array(text, '\\bspark\\b') AS a
                      FROM documents WHERE text IS NOT NULL),
                     unnest(range(len(a))) AS t(i)
            ), words AS (
                SELECT doc_id, para_idx,
                       str_split(trim(regexp_replace(regexp_replace(
                           lower(seg), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM segs
            ), counted AS (
                SELECT doc_id, para_idx, w,
                       CASE WHEN len(w) > 0 AND w[1] <> ''
                            THEN len(w) ELSE 0 END AS n
                FROM words
            ), based AS (
                SELECT doc_id, para_idx, w, n,
                       CAST(coalesce(sum(n) OVER (
                           PARTITION BY doc_id ORDER BY para_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS base
                FROM counted
            ), spans AS (
                SELECT doc_id, para_idx, CAST(i AS BIGINT) AS span_idx,
                       CAST(base + i * 10 AS BIGINT) AS start_token,
                       CAST(base + least((i + 1) * 10, n) AS BIGINT)
                           AS end_token,
                       md5(array_to_string(
                           list_slice(w, i * 10 + 1, i * 10 + 10), ' ')) AS h
                FROM based,
                     unnest(range(CAST((n + 9) // 10 AS BIGINT))) AS t(i)
                WHERE n > 0
            ), grp AS (
                SELECT h, count(DISTINCT doc_id) AS n_docs_sharing
                FROM spans GROUP BY h
            )
            SELECT s.doc_id, s.para_idx, s.span_idx, s.start_token,
                   s.end_token, g.n_docs_sharing
            FROM spans s JOIN grp g USING (h)
            WHERE g.n_docs_sharing >= 2
        """,
        "documents_span_para_clean": """
            -- anchored keep-first rewrite: first (doc_id, start_token)
            -- occurrence of each anchored window survives; kept windows
            -- rejoin in global start_token order
            WITH segs AS (
                SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
                       a[i + 1] AS seg
                FROM (SELECT doc_id,
                             regexp_split_to_array(text, '\\bspark\\b') AS a
                      FROM documents WHERE text IS NOT NULL),
                     unnest(range(len(a))) AS t(i)
            ), words AS (
                SELECT doc_id, para_idx,
                       str_split(trim(regexp_replace(regexp_replace(
                           lower(seg), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')), ' ') AS w
                FROM segs
            ), counted AS (
                SELECT doc_id, para_idx, w,
                       CASE WHEN len(w) > 0 AND w[1] <> ''
                            THEN len(w) ELSE 0 END AS n
                FROM words
            ), based AS (
                SELECT doc_id, para_idx, w, n,
                       CAST(coalesce(sum(n) OVER (
                           PARTITION BY doc_id ORDER BY para_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS base
                FROM counted
            ), spans AS (
                SELECT doc_id,
                       CAST(base + i * 10 AS BIGINT) AS start_token,
                       array_to_string(
                           list_slice(w, i * 10 + 1, i * 10 + 10), ' ')
                           AS span
                FROM based,
                     unnest(range(CAST((n + 9) // 10 AS BIGINT))) AS t(i)
                WHERE n > 0
            ), flagged AS (
                SELECT doc_id, start_token, span,
                       (row_number() OVER (
                            PARTITION BY md5(span)
                            ORDER BY doc_id, start_token) = 1) AS kept
                FROM spans
            )
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_dropped,
                   coalesce(string_agg(CASE WHEN kept THEN span END,
                                       ' ' ORDER BY start_token), '')
                       AS clean_text
            FROM flagged GROUP BY doc_id
        """,
        # exact all-pairs twin of the engine's prefix-filtered
        # containment join: same normalization + distinct 3-word
        # shingles as the minhash oracles; prefix filtering is lossless
        # so the outputs are identical sets.
        "documents_containment": r"""
            WITH w AS (
                SELECT doc_id, string_split(trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                    '\s+', ' ', 'g')), ' ') AS w
                FROM documents WHERE text IS NOT NULL
            ),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                    range(1, greatest(len(w) - 2, 1) + 1),
                    i -> array_to_string(w[i:i+2], ' '))) AS s
                FROM w
            ),
            sized AS (SELECT doc_id, s, len(s) AS sz FROM sh WHERE len(s) > 0),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / a.sz AS c
                FROM sized a JOIN sized b ON a.doc_id <> b.doc_id
            )
            SELECT id_a, id_b, round(c, 4) AS containment_r
            FROM pairs WHERE c >= 0.8
        """,
        # exact twin of query_batch at nprobe == n_cells (all cells
        # probed == brute force); ties at the k boundary break by vec_id
        # in both engines.
        "embeddings_batch_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < 8
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qv) AS s
                FROM embeddings e, q
            ),
            rk AS (
                SELECT query_id, vec_id, s,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY s DESC, vec_id ASC) AS r
                FROM scored
            )
            SELECT query_id, vec_id, round(s, 3) AS sim_r
            FROM rk WHERE r <= 5
        """,
        # closed-form twin of the zero-shuffle hashed-BoW scorer: same
        # normalization as every token oracle, bucket via the shared
        # md5_number_lower & (dim-1) convention (low 13 bits agree
        # between DuckDB's unsigned and Spark's signed view), Knuth
        # pseudo-weights, sequential list_sum == Spark's aggregate fold
        # over the same token order.
        "documents_quality_model": r"""
            WITH toks AS (
                SELECT doc_id, string_split(trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                    '\s+', ' ', 'g')), ' ') AS t
                FROM documents WHERE text IS NOT NULL
            ),
            scored AS (
                SELECT doc_id, len(t) AS n_tokens,
                       list_sum(list_transform(t, x ->
                           CAST(((md5_number_lower(x) & 8191)
                                 * 2654435761) % 8192 AS DOUBLE) / 8192.0
                           - 0.5)) / len(t) AS score
                FROM toks WHERE len(t) > 0
            )
            SELECT doc_id, n_tokens, round(score, 4) AS score_r,
                   round(1.0 / (1.0 + exp(-10.0 * score)), 4) AS prob_r
            FROM scored
        """,
        # exact all-pairs twin of semantic_duplicates at n_cells=1
        # (blocking complete): dup_of = min smaller-id eps-neighbor,
        # kept = no such neighbor. Same planted corpus as
        # embeddings_near_dups; pairs are bimodal around 0.99.
        "embeddings_semantic_dups": """
            WITH base AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
            ),
            pert AS (
                SELECT vec_id + 1000000 AS vec_id,
                       list_concat([emb[1] + 0.05], emb[2:]) AS emb
                FROM base
            ),
            corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
            dup AS (
                SELECT b.vec_id AS id_b, min(a.vec_id) AS dup_of
                FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.emb, b.emb) >= 0.99
                GROUP BY b.vec_id
            )
            SELECT c.vec_id, d.dup_of IS NULL AS kept, d.dup_of
            FROM corpus c LEFT JOIN dup d ON c.vec_id = d.id_b
        """,
        # deterministic shuffle: same 62-bit-masked hash (signed and
        # unsigned views order identically), shard = low 3 bits, pos =
        # per-shard hash rank with id tie-break
        "documents_shuffle": """
            WITH h AS (
                SELECT doc_id,
                       md5_number_lower(CAST(doc_id AS VARCHAR) || ':42')
                           & 4611686018427387903 AS hv
                FROM documents WHERE doc_id IS NOT NULL
            )
            SELECT doc_id, CAST(hv & 7 AS INT) AS shard,
                   CAST(row_number() OVER (
                       PARTITION BY hv & 7 ORDER BY hv, doc_id
                   ) AS BIGINT) AS pos
            FROM h
        """,
        # full DSIR replay: both hashed-ngram count models (add-0.5
        # smoothing), per-doc log-likelihood-ratio sums, deterministic
        # hash-Gumbel noise, top-50 by (key desc, id)
        "documents_dsir": r"""
            WITH tok AS (
                SELECT doc_id, list_filter(string_split(trim(
                    regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS t
                FROM documents WHERE text IS NOT NULL
            ),
            feats AS (
                SELECT doc_id, list_concat(t,
                    CASE WHEN len(t) >= 2 THEN list_transform(
                        range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                    ELSE [] END) AS f
                FROM tok
            ),
            rawb AS (
                SELECT doc_id, md5_number_lower(ff) & 4095 AS bucket
                FROM (SELECT doc_id, unnest(f) AS ff FROM feats)
            ),
            tb AS (
                SELECT r.bucket
                FROM rawb r JOIN documents d USING (doc_id)
                WHERE d.lang = 'en' AND d.doc_id % 5 = 0
            ),
            cnt_r AS (SELECT bucket, count(*) AS nr FROM rawb GROUP BY 1),
            cnt_t AS (SELECT bucket, count(*) AS nt FROM tb GROUP BY 1),
            lr AS (
                SELECT coalesce(r.bucket, t.bucket) AS bucket,
                       ln((coalesce(nt, 0) + 0.5)
                          / ((SELECT coalesce(sum(nt), 0) FROM cnt_t)
                             + 0.5 * 4096))
                     - ln((coalesce(nr, 0) + 0.5)
                          / ((SELECT coalesce(sum(nr), 0) FROM cnt_r)
                             + 0.5 * 4096)) AS lr
                FROM cnt_r r FULL JOIN cnt_t t ON r.bucket = t.bucket
            ),
            w AS (
                SELECT doc_id, count(*) AS n_feats, sum(lr) AS log_w
                FROM rawb JOIN lr USING (bucket) GROUP BY doc_id
            ),
            keyed AS (
                SELECT doc_id, n_feats, log_w,
                       log_w + (-ln(-ln(
                           (CAST(md5_number_lower(
                                CAST(doc_id AS VARCHAR) || ':42')
                                & 4611686018427387903 AS DOUBLE) + 0.5)
                           / 4611686018427387904.0))) AS sel_key
                FROM w
            )
            SELECT doc_id, n_feats, round(log_w, 4) AS log_w_r,
                   round(sel_key, 4) AS sel_key_r
            FROM keyed ORDER BY sel_key DESC, doc_id LIMIT 50
        """,
        "events_urls": """
            -- known-answer oracle for the URL parse-to-struct kernel:
            -- every component/predicate recomputed from the same
            -- deterministic five-shape synthesis (see q_events_urls)
            WITH u AS (
                SELECT event_id, event_id % 5 AS m,
                       CAST(event_id % 7 AS VARCHAR) AS s7,
                       CAST(event_id % 3 AS VARCHAR) AS s3,
                       CAST(event_id % 256 AS VARCHAR) AS a,
                       CAST(event_id % 100 AS VARCHAR) AS b
                FROM events
            )
            SELECT event_id,
                   coalesce(m IN (0, 1, 2, 3), FALSE) AS is_valid,
                   CASE WHEN m = 0 THEN 'https' WHEN m IN (1, 2) THEN 'http'
                        WHEN m = 3 THEN '' END AS scheme,
                   CASE WHEN m = 0 THEN 'user:pw'
                        WHEN m IN (1, 2, 3) THEN '' END AS auth,
                   CASE WHEN m = 0 THEN 'site' || s7 || '.example.com'
                        WHEN m = 1 THEN 'example' || s7 || '.com'
                        WHEN m = 2 THEN '192.168.' || a || '.' || b
                        WHEN m = 3 THEN '' END AS host,
                   CASE WHEN m = 0 THEN 8443 WHEN m IN (1, 2) THEN 80
                        WHEN m = 3 THEN 0 END AS port,
                   CASE WHEN m = 0 THEN '/a/b' WHEN m = 1 THEN '/p/q'
                        WHEN m = 2 THEN '/x'
                        WHEN m = 3 THEN '/rel/path' END AS path,
                   CASE WHEN m = 0 THEN 'k=v' WHEN m = 3 THEN 'a=b'
                        WHEN m IN (1, 2) THEN '' END AS params,
                   CASE WHEN m = 0 THEN 'x=' || s3 WHEN m = 2 THEN 'y=2'
                        WHEN m = 3 THEN 'q=1' WHEN m = 1 THEN '' END AS qs,
                   CASE WHEN m = 0 THEN 'sec' WHEN m = 3 THEN 'top'
                        WHEN m IN (1, 2) THEN '' END AS fragment,
                   CASE WHEN m IN (0, 1, 3) THEN FALSE
                        WHEN m = 2 THEN TRUE END AS is_ip,
                   CASE WHEN m IN (0, 1, 2) THEN TRUE
                        WHEN m = 3 THEN FALSE END AS absolute,
                   CASE WHEN m IN (0, 1, 3) THEN FALSE
                        WHEN m = 2 THEN TRUE END AS internal,
                   CASE WHEN m = 0
                             THEN 'https://user:pw@site' || s7
                                  || '.example.com:8443'
                        WHEN m = 1 THEN 'http://example' || s7 || '.com'
                        WHEN m = 2 THEN 'http://192.168.' || a || '.' || b
                        WHEN m = 3 THEN '' END AS base
            FROM u
        """,
    }
