"""Engine vs single-node pandas reference on the flagship transcript
table — the correctness gate named by BASELINE.json input_hint: exact
violation parity under stable ordering (sort by conv_id, turn_idx),
including per-turn text equality between engine input/output rows.
"""

import pandas as pd
from pyspark.sql import functions as F

from typical_spark import compile_table_spec
from typical_spark.operators.ordering import ordering_violations
from typical_spark.operators.uniqueness import dedup_keep_first, duplicate_rows
from typical_spark.oracle import (
    duplicate_rows_ref,
    ordering_violations_ref,
    transcript_violations,
)
from typical_spark.specs import transcript_spec


def _sorted_tuples(pdf, cols):
    return sorted(
        tuple("NULL" if pd.isna(v) else str(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )


def test_row_level_violations_match_reference(spark, transcripts_pdf, transcripts_df):
    plan = compile_table_spec(transcript_spec())
    got = plan.violations(transcripts_df, with_message=False).toPandas()
    want = transcript_violations(transcripts_pdf)
    cols = ["conv_id", "turn_idx", "column", "check_id", "observed", "expected"]
    assert _sorted_tuples(got, cols) == _sorted_tuples(want, cols)
    assert len(want) > 50  # the seeded dirt actually exercises every check


def test_per_turn_text_equality_stable_order(spark, transcripts_pdf, transcripts_df):
    """input_hint invariant: per-turn text equality under stable turn
    ordering — the engine's pass-through of valid rows must preserve every
    text byte, compared after ORDER BY conv_id, turn_idx."""
    plan = compile_table_spec(transcript_spec())
    valid, _ = plan.split(transcripts_df)
    got = (
        valid.orderBy("conv_id", "turn_idx", "ts")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    # reference: rows with zero violations, same stable order
    vio = transcript_violations(transcripts_pdf)
    bad = set(zip(vio.conv_id, vio.turn_idx))
    mask = [
        (c, t) not in bad for c, t in zip(transcripts_pdf.conv_id, transcripts_pdf.turn_idx)
    ]
    want = (
        transcripts_pdf[mask]
        .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        .reset_index(drop=True)[["conv_id", "turn_idx", "text"]]
    )
    assert len(got) == len(want)
    assert (got["text"].fillna("\0") == want["text"].fillna("\0")).all()


def test_duplicate_rows_salted_equals_unsalted(spark, transcripts_df):
    keys, order = ["conv_id", "turn_idx"], ["ts", "role"]
    plain = duplicate_rows(transcripts_df, keys, order).select(*keys, "dup_rank")
    salted = duplicate_rows(transcripts_df, keys, order, salt_buckets=8).select(
        *keys, "dup_rank"
    )
    norm = lambda rows: sorted(
        tuple("NULL" if v is None else str(v) for v in r) for r in rows
    )
    a = norm(plain.collect())
    b = norm(salted.collect())
    assert a == b
    assert len(a) > 0  # seeded dup injection present


def test_duplicate_rows_match_reference(spark, transcripts_pdf, transcripts_df):
    keys, order = ["conv_id", "turn_idx"], ["ts", "role", "conv_id", "turn_idx"]
    got = (
        duplicate_rows(transcripts_df, keys, order)
        .groupBy(*keys).count().toPandas()
    )
    want = (
        duplicate_rows_ref(transcripts_pdf, keys, order)
        .groupby(keys, dropna=False).size().reset_index(name="count")
    )
    # identical dup multiplicity per key (conv_id may be None)
    g = {(r.conv_id, r.turn_idx): r.count for r in got.itertuples(index=False)}
    w = {
        (None if pd.isna(r.conv_id) else r.conv_id, r.turn_idx): r.count
        for r in want.itertuples(index=False)
    }
    assert g == w


def test_salted_keep_first_with_differing_duplicates(spark):
    """Duplicates that DIFFER in order_by: the salted path must keep the
    same global order_by-first row as the unsalted path (regression test:
    bucket offsets were previously ordered by salt index, so rank 1 could
    land on the wrong row)."""
    rows = [
        ("k1", 0, f"2025-01-01 00:00:{s:02d}", f"payload{s}") for s in range(12)
    ] + [("k2", 1, "2025-01-01 00:01:00", "only")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plain = duplicate_rows(df, ["conv_id", "turn_idx"], ["ts", "text"])
    salted = duplicate_rows(
        df, ["conv_id", "turn_idx"], ["ts", "text"], salt_buckets=4
    )
    # same DUPLICATE row set => same kept row (the one not returned)
    key = lambda r: (r["conv_id"], r["turn_idx"], str(r["ts"]), r["text"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))
    # the kept row is payload0 (earliest ts) in both
    kept_p = {key(r) for r in df.collect()} - {key(r) for r in plain.collect()}
    kept_s = {key(r) for r in df.collect()} - {key(r) for r in salted.collect()}
    assert kept_p == kept_s
    assert any("payload0" in k[3] for k in kept_p)


def test_dedup_keep_first(spark, transcripts_df):
    keys = ["conv_id", "turn_idx"]
    deduped = dedup_keep_first(transcripts_df, keys, ["ts"])
    assert deduped.count() == transcripts_df.dropDuplicates(keys).count()
    # exactly one row per key
    assert (
        deduped.groupBy(*keys).count().where(F.col("count") > 1).count() == 0
    )


def test_ordering_violations_match_reference(spark, transcripts_pdf, transcripts_df):
    got = (
        ordering_violations(
            transcripts_df.where(F.col("conv_id").isNotNull()),
            ["conv_id"], "turn_idx", ts_col="ts",
        )
        .groupBy("check_id").count().toPandas()
    )
    want = ordering_violations_ref(transcripts_pdf).groupby("check_id").size()
    g = {r.check_id: r.count for r in got.itertuples(index=False)}
    assert g == want.to_dict()
    assert set(g) >= {"order_duplicate", "order_gap"}


def test_rotated_out_queries_still_green(spark):
    """Automatic local gate for driver-board rotation (ADVICE r4): every
    queries() entry PAST the driver's 50-entry grading window must still
    pass the full oracle comparison (row count + schema + value
    multiset) at sf0.001 on every pytest run — rotated-out coverage is
    CI-gated, not ad-hoc. The membership of the past-cut set changes
    per round; this test follows dict order automatically."""
    import duckdb

    import __spark_entry__ as entrymod
    from typical_spark.sources.tables import TABLE_NAMES

    sf_dir = "/root/testdata/sf0.001"
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    past_cut = list(qs)[50:]
    assert past_cut, "board has <=50 entries; drop this gate if permanent"

    def norm_cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    def multiset(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            tuple(norm_cell(r[i]) for i in order) for r in rows
        )

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in past_cut:
        sdf = qs[name](spark, sf_dir)
        scols = [c.lower() for c in sdf.columns]
        srows = sdf.collect()
        assert name in oracles, f"past-cut {name} lost its oracle"
        rel = con.sql(oracles[name])
        ocols = [d[0].lower() for d in rel.description]
        orows = rel.fetchall()
        if sorted(scols) != sorted(ocols) or multiset(scols, srows) != multiset(ocols, orows):
            bad.append(name)
    assert not bad, f"rotated-out queries no longer match oracle: {bad}"
