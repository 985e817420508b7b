"""Serialization surface (A52-A58) + new scalar kernels: decimal digits
(A3), untagged unions (A25/A47), named string formats (custom string
types)."""

import json

import pytest
from pyspark.sql import functions as F

from typical_spark.compiler import compile_table_spec
from typical_spark.serde import (
    case_transform,
    iso_duration_from_seconds,
    iso_timestamp,
    redact_secret,
    rows_to_json,
)
from typical_spark.specs import (
    DecimalCheck,
    EnumCheck,
    FieldSpec,
    FormatCheck,
    NumberCheck,
    TableSpec,
    TextCheck,
    UnionCheck,
)


def run_check(spark, dtype, checks, values):
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("v", dtype, checks=tuple(checks)),),
    )
    plan = compile_table_spec(spec)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"row_id int, v {dtype}"
    )
    return {(r["row_id"], r["check_id"])
            for r in plan.violations(df, with_message=False).collect()}


def test_decimal_digits(spark):
    # reference number.py:144-215: max_digits=5, decimal_places=2 ->
    # at most 3 whole digits; overflow violates. Scale overflow rounds in
    # Spark's cast, whole-digit overflow nulls.
    got = run_check(spark, "double", [DecimalCheck(max_digits=5, decimal_places=2)],
                    [123.45, 999.99, 1234.5, 12345.0, None])
    assert got == {(2, "decimal"), (3, "decimal")}


def test_union_any_member_accepts(spark):
    # Optional[enum | ge-100 number-as-string] style: valid if enum OR numeric
    got = run_check(
        spark, "string",
        [UnionCheck(members=(EnumCheck(values=("a", "b")),
                             TextCheck(regex=r"[0-9]+$")))],
        ["a", "42", "zz", None],
    )
    assert got == {(2, "union")}


@pytest.mark.parametrize(
    "fmt,good,bad",
    [
        ("email", "a.b+c@example.co.uk", "not-an-email@"),
        ("url", "https://spark.apache.org/docs?x=1#y", "htt p://x"),
        ("uuid", "7468D8B4-31E5-4E4C-A8A9-02FFE5C4A0DA", "7468d8b4"),
        ("ipv4", "192.168.0.255", "256.1.1.1"),
        ("hostname", "a-1.example.com", "-bad.example"),
    ],
)
def test_string_formats(spark, fmt, good, bad):
    got = run_check(spark, "string", [FormatCheck(format=fmt)], [good, bad, None])
    assert got == {(1, f"format_{fmt}")}


def test_iso_serializers(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2025, 3, 2, 19, 48, 10, 123456), 93784, -61)],
        "ts timestamp, dur long, neg long",
    )
    r = df.select(
        iso_timestamp(F.col("ts")).alias("t"),
        iso_duration_from_seconds(F.col("dur")).alias("d"),
        iso_duration_from_seconds(F.col("neg")).alias("n"),
    ).collect()[0]
    assert r["t"] == "2025-03-02T19:48:10.123456"
    assert r["d"] == "P1DT2H3M4S"  # 93784 = 1d 2h 3m 4s
    assert r["n"] == "-PT1M1S"


def test_redact_secret(spark):
    df = spark.createDataFrame([("hunter2",), (None,)], "pw string")
    vals = [r[0] for r in df.select(redact_secret(F.col("pw"))).collect()]
    assert vals == ["******", None]


def test_case_transform_and_tojson(spark):
    df = spark.createDataFrame(
        [(1, "x", None)], "user_id int, display_name string, opt_field string"
    )
    camel = case_transform(df, "camel")
    assert camel.columns == ["userId", "displayName", "optField"]
    j = json.loads(rows_to_json(df, omit_nulls=True, case="camel").collect()[0][0])
    assert j == {"userId": 1, "displayName": "x"}  # null omitted
    j2 = json.loads(
        rows_to_json(df, omit_nulls=False, exclude=("opt_field",)).collect()[0][0]
    )
    assert j2 == {"user_id": 1, "display_name": "x"}
