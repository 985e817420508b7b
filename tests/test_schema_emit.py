"""JSON-Schema + StructType emission (reference A62:
typic/ext/schema/schema.py). The emitted schema must actually validate/
reject the same inputs the engine's checks do."""

import json

from typical_spark.schema import spec_to_json_schema, spec_to_structtype
from typical_spark.specs import transcript_spec
from typical_spark.model_records import model_spec


def test_transcript_json_schema_shape():
    sch = spec_to_json_schema(transcript_spec())
    assert sch["type"] == "object"
    p = sch["properties"]
    # enum fragments mirror reference common.py:472-518 -> {"enum": [...]}
    role = p["role"]
    assert role.get("enum") == ["system", "user", "assistant", "tool"]
    turn = p["turn_idx"]
    assert turn.get("minimum") == 0 and turn["type"] == "integer"
    # nullable fields wrap in anyOf [.., {"type":"null"}]
    tool = p["tool"]
    assert {"type": "null"} in tool["anyOf"]
    assert "conv_id" in sch["required"] and "ts" in sch["required"]
    cid = p["conv_id"]
    assert cid.get("pattern") == r"c[0-9]{8}$"
    text = p["text"]
    inner = text["anyOf"][0]
    assert inner.get("maxLength") == 4000


def test_model_json_schema_nested():
    sch = spec_to_json_schema(model_spec())
    p = sch["properties"]
    g = p["grecaptcha_response"]["anyOf"][0]
    assert g["minLength"] == 10 and g["maxLength"] == 1000
    loc = p["location"]["anyOf"][0]
    lat = loc["properties"]["latitude"]["anyOf"][0]
    assert lat["minimum"] == -90.0 and lat["maximum"] == 90.0
    assert "id" in sch["required"] and "client_name" in sch["required"]
    assert json.dumps(sch)  # serializable


def test_structtype_roundtrip(spark):
    st = spec_to_structtype(transcript_spec())
    names = [f.name for f in st.fields]
    assert names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert not st["conv_id"].nullable and st["tool"].nullable
    # usable as a real Spark schema
    df = spark.createDataFrame([], st)
    assert df.schema == st


def test_jsonschema_agrees_with_engine(spark):
    """Cross-validation: a third-party JSON-Schema validator (if present)
    must agree with the engine's verdicts on the same rows."""
    try:
        import jsonschema
    except ImportError:
        import pytest

        pytest.skip("jsonschema not installed")
    sch = spec_to_json_schema(transcript_spec())
    ok_doc = {"conv_id": "c00000001", "turn_idx": 0, "role": "user",
              "text": "hi", "tool": None, "ts": "2025-01-01T00:00:00"}
    bad_doc = {**ok_doc, "role": "robot", "turn_idx": -1}
    jsonschema.validate(ok_doc, sch)
    errs = list(jsonschema.Draft7Validator(sch).iter_errors(bad_doc))
    bad_fields = {list(e.path)[0] for e in errs if e.path}
    assert bad_fields == {"role", "turn_idx"}


def test_defs_and_refs_shared_spec():
    """$defs/$ref for nested/reused specs (reference
    typic/ext/schema/schema.py:398-430 definitions): a spec referenced by
    two fields is emitted ONCE under $defs; both fields $ref it; a
    third-party validator accepts/rejects accordingly."""
    from typical_spark.specs import FieldSpec, NumberCheck, TableSpec, TextCheck

    address = TableSpec(
        name="address", key_columns=(),
        fields=(
            FieldSpec("street", "string", nullable=False,
                      checks=(TextCheck(min_length=1),)),
            FieldSpec("zipcode", "string", nullable=False,
                      checks=(TextCheck(regex=r"^[0-9]{5}$"),)),
        ),
    )
    person = TableSpec(
        name="person", key_columns=("pid",),
        fields=(
            FieldSpec("pid", "long", nullable=False, checks=(NumberCheck(ge=0),)),
            FieldSpec("home", "struct", nullable=True),
            FieldSpec("work", "struct", nullable=True),
        ),
    )
    sch = spec_to_json_schema(
        person,
        refs={"address": address},
        field_refs={"home": "address", "work": "address"},
    )
    assert list(sch["$defs"].keys()) == ["address"]
    assert sch["properties"]["home"]["anyOf"][0] == {"$ref": "#/$defs/address"}
    assert sch["properties"]["work"]["anyOf"][0] == {"$ref": "#/$defs/address"}
    assert json.dumps(sch)  # serializable
    try:
        import jsonschema
    except ImportError:
        import pytest

        pytest.skip("jsonschema not installed")
    ok = {"pid": 1, "home": {"street": "a st", "zipcode": "12345"},
          "work": None}
    bad = {"pid": 1, "home": {"street": "a st", "zipcode": "nope"}}
    jsonschema.validate(ok, sch)
    import pytest

    with pytest.raises(jsonschema.ValidationError):
        jsonschema.validate(bad, sch)


def test_field_refs_must_resolve():
    from typical_spark.specs import FieldSpec, TableSpec
    import pytest

    spec = TableSpec(name="t", key_columns=(),
                     fields=(FieldSpec("x", "struct"),))
    with pytest.raises(ValueError, match="undefined"):
        spec_to_json_schema(spec, refs={}, field_refs={"x": "nope"})


def test_schema_conformance(spark):
    from typical_spark.schema import schema_conformance
    from typical_spark.specs import FieldSpec, TableSpec

    spec = TableSpec(
        name="t", key_columns=("a",),
        fields=(
            FieldSpec("a", "bigint", nullable=False),
            FieldSpec("b", "string"),
            FieldSpec("c", "double", coerce_from="string"),  # exempt: arrives as string
            FieldSpec("nested.x", "int"),
        ),
    )
    ok = spark.createDataFrame(
        [], "a bigint, b string, c string, nested struct<x:int>"
    )
    assert schema_conformance(ok, spec) == []

    bad = spark.createDataFrame(
        [], "a int, c string, nested struct<y:int>, junk string"
    )
    got = {(v["column"], v["check_id"]) for v in schema_conformance(bad, spec)}
    assert got == {
        ("a", "type_mismatch"),       # int != bigint
        ("b", "missing_column"),
        ("nested.x", "missing_column"),
    }
    got_total = {(v["column"], v["check_id"])
                 for v in schema_conformance(bad, spec, total=True)}
    assert ("junk", "extra_column") in got_total
