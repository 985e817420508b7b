"""translate/iterate (A59-A60), custom check registry (A49), strict mode
(A64), safe_eval primitive parse (A29)."""

import pytest
from pyspark.sql import functions as F

from typical_spark.compiler import compile_table_spec
from typical_spark.functions.coerce import parse_primitive
from typical_spark.specs import (
    CustomCheck,
    FieldSpec,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    register_check,
)
from typical_spark.translate import TranslationError, iterate, translate


TARGET = TableSpec(
    name="t", key_columns=("uid",),
    fields=(
        FieldSpec("uid", "long", nullable=False),
        FieldSpec("name", "string", nullable=False),
        FieldSpec("score", "double", nullable=True),
        FieldSpec("tag", "string", nullable=True),
    ),
)


def test_translate_maps_renames_defaults(spark):
    src = spark.createDataFrame(
        [(1, "a", "3.5")], "user_id long, name string, points string"
    )
    out = translate(
        src, TARGET,
        field_map={"uid": "user_id", "score": "points"},
        defaults={"tag": "none"},
    )
    assert out.columns == ["uid", "name", "score", "tag"]
    r = out.collect()[0]
    assert (r["uid"], r["name"], r["score"], r["tag"]) == (1, "a", 3.5, "none")


def test_translate_strict_raises_on_missing_required(spark):
    src = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(TranslationError, match="name"):
        translate(src, TARGET, field_map={"uid": "user_id"})


def test_iterate(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    rows = {(r["field"], r["value"]) for r in iterate(df).collect()}
    assert rows == {("a", "1"), ("b", "x")}


def test_custom_check_registry(spark):
    register_check("even", lambda c: c % 2 == 0)
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("v", "int", checks=(CustomCheck(name="even"),)),),
    )
    plan = compile_table_spec(spec)
    df = spark.createDataFrame([(0, 2), (1, 3), (2, None)], "row_id int, v int")
    got = {(r["row_id"], r["check_id"])
           for r in plan.violations(df, with_message=False).collect()}
    assert got == {(1, "custom_even")}


def test_custom_check_unregistered_fails_loud(spark):
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("v", "int", checks=(CustomCheck(name="nope"),)),),
    )
    with pytest.raises(KeyError, match="register_check"):
        compile_table_spec(spec)


def test_strict_vs_coerce_mode(spark):
    """mode='coerce' repairs "5"->5 then range-checks; mode='strict'
    flags any value that would have needed repair (typic/strict.py)."""
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("v", "long", coerce_from="string",
                          checks=(NumberCheck(ge=0),)),),
    )
    df = spark.createDataFrame(
        [(0, "5"), (1, "-3"), (2, "zzz"), (3, None)], "row_id int, v string"
    )
    coerce_plan = compile_table_spec(spec, mode="coerce")
    got = {(r["row_id"], r["check_id"])
           for r in coerce_plan.violations(df, with_message=False).collect()}
    # "5" repairs cleanly; "-3" repairs but violates ge=0; "zzz" can't coerce
    assert got == {(1, "number_range"), (2, "coerce")}
    repaired = coerce_plan.coerce(df)
    assert dict(repaired.collect()[0].asDict())["v"] == 5

    strict_plan = compile_table_spec(spec, mode="strict")
    got_s = {(r["row_id"], r["check_id"])
             for r in strict_plan.violations(df, with_message=False).collect()}
    # strict: unparseable "zzz" violates strict_type; "-3" still violates
    # the range check (evaluated on the raw column); nothing is repaired
    assert got_s == {(1, "number_range"), (2, "strict_type")}
    assert strict_plan.coerce(df).collect()[0]["v"] == "5"  # not mutated


def test_parse_primitive_safe_eval(spark):
    df = spark.createDataFrame(
        [("1",), ("2.5",), ("true",), ("null",), ('{"a": 1}',), ("plain",)],
        "s string",
    )
    rows = df.select(parse_primitive(F.col("s")).alias("p")).collect()
    kinds = [r["p"]["kind"] for r in rows]
    assert kinds == ["int", "float", "bool", "null", "json", "string"]
    assert rows[0]["p"]["long_value"] == 1
    assert rows[1]["p"]["double_value"] == 2.5
    assert rows[2]["p"]["bool_value"] is True
    assert rows[5]["p"]["string_value"] == "plain"
