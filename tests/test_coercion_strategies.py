"""Coercion-strategy wiring: ordered union try-each (A47, reference
des.py:732-764), keyed map coercion (A41, des.py:447-508), ISO-duration
and time-of-day coerce_from (A32/A33 deserialize halves), and automatic
tag discovery (A67, util.py:760-819)."""

import pytest
from pyspark.sql import functions as F

from typical_spark.compiler import compile_table_spec
from typical_spark.specs import (
    FieldSpec,
    NumberCheck,
    TableSpec,
    discover_tag,
)


def _plan(fields):
    return compile_table_spec(
        TableSpec(name="t", key_columns=("row_id",), fields=tuple(fields))
    )


def test_union_ordered_coercion(spark):
    """union:epoch|iso_strict — first strategy that parses wins, in
    declared order (reference try-each des.py:732-764)."""
    plan = _plan([
        FieldSpec("ts", "timestamp", coerce_from="union:epoch|iso_strict"),
    ])
    df = spark.createDataFrame(
        [(0, "1600000000"), (1, "2021-03-02T19:48:10"), (2, "zzz"), (3, None)],
        "row_id int, ts string",
    )
    out = {r["row_id"]: r["ts"] for r in plan.coerce(df).collect()}
    assert out[0].year == 2020          # epoch seconds branch
    assert out[1].isoformat() == "2021-03-02T19:48:10"
    assert out[2] is None and out[3] is None
    got = {(r["row_id"], r["check_id"])
           for r in plan.violations(df, with_message=False).collect()}
    assert got == {(2, "coerce")}       # unparseable by every member


def test_union_empty_spec_rejected(spark):
    with pytest.raises(ValueError, match="empty union"):
        _plan([FieldSpec("x", "long", coerce_from="union:")])


def test_map_keyed_coercion(spark):
    """map<string,string> -> map<int,long>: keys AND values coerce; any
    failing key/value (or key collision after coercion) nulls the whole
    map -> coerce violation, the columnar analog of transmute raising."""
    plan = _plan([FieldSpec("m", "map<int,long>", coerce_from="map")])
    df = spark.createDataFrame(
        [
            (0, {"1": "10", "2": "20"}),
            (1, {"x": "1"}),            # bad key
            (2, {"1": "1", "01": "2"}),  # keys collide after cast
            (3, {"1": "abc"}),          # bad value
            (4, {"3": None}),           # null value is preserved
            (5, None),
        ],
        "row_id int, m map<string,string>",
    )
    out = {r["row_id"]: r["m"] for r in plan.coerce(df).collect()}
    assert out[0] == {1: 10, 2: 20}
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == {3: None}
    assert out[5] is None
    got = {(r["row_id"], r["check_id"])
           for r in plan.violations(df, with_message=False).collect()}
    assert got == {(1, "coerce"), (2, "coerce"), (3, "coerce")}


def test_map_coercion_requires_map_dtype(spark):
    with pytest.raises(ValueError, match="map<k,v>"):
        _plan([FieldSpec("m", "long", coerce_from="map")])


def test_iso_duration_coercion_with_range_check(spark):
    plan = _plan([
        FieldSpec("dur", "double", coerce_from="iso_duration",
                  checks=(NumberCheck(ge=0),)),
    ])
    df = spark.createDataFrame(
        [(0, "PT30S"), (1, "-PT30S"), (2, "junk"), (3, "P1DT2H3M4S")],
        "row_id int, dur string",
    )
    out = {r["row_id"]: r["dur"] for r in plan.coerce(df).collect()}
    assert out[0] == 30.0 and out[3] == 93784.0
    got = {(r["row_id"], r["check_id"])
           for r in plan.violations(df, with_message=False).collect()}
    assert got == {(1, "number_range"), (2, "coerce")}


def test_time_coercion(spark):
    plan = _plan([FieldSpec("t", "double", coerce_from="time")])
    df = spark.createDataFrame(
        [(0, "19:48:10"), (1, "25:00:00")], "row_id int, t string"
    )
    out = {r["row_id"]: r["t"] for r in plan.coerce(df).collect()}
    assert out[0] == 71290.0 and out[1] is None


def test_degenerate_number_check_is_vacuous(spark):
    """NumberCheck() with no bound must compile (no IndexError) and flag
    nothing."""
    plan = _plan([FieldSpec("v", "long", checks=(NumberCheck(),))])
    df = spark.createDataFrame([(0, 1), (1, None)], "row_id int, v long")
    assert plan.violations(df, with_message=False).count() == 0


def test_utf8_decode_coercion(spark):
    """A35 bytes->str: valid UTF-8 decodes, invalid sequences coerce to
    NULL (never mojibake, never a thrown job under ANSI)."""
    plan = _plan([FieldSpec("b", "string", coerce_from="utf8")])
    rows = [
        (0, bytearray("héllo".encode("utf-8"))),
        (1, bytearray(b"\xff\xfe\x00bad")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "row_id int, b binary")
    out = {r["row_id"]: r["b"] for r in plan.coerce(df).collect()}
    assert out[0] == "héllo" and out[1] is None and out[2] is None
    got = {(r["row_id"], r["check_id"])
           for r in plan.violations(df, with_message=False).collect()}
    assert got == {(1, "coerce")}

    from typical_spark.functions.coerce import utf8_encode

    back = df.where("row_id = 0").select(utf8_encode(F.lit("héllo")).alias("e"))
    assert bytes(back.collect()[0]["e"]) == "héllo".encode("utf-8")


def test_discover_tag():
    tag, mapping = discover_tag({
        "click": {"kind": "click", "weight": 1},
        "view": {"kind": "view", "weight": 1},
        "buy": {"kind": "buy", "weight": 2},
    })
    assert tag == "kind"
    assert mapping == {"click": "click", "view": "view", "buy": "buy"}


def test_discover_tag_no_discriminator():
    with pytest.raises(ValueError, match="discriminates"):
        discover_tag({"a": {"k": 1}, "b": {"k": 1}})
    with pytest.raises(ValueError, match="at least one"):
        discover_tag({})
