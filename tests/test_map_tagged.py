"""Mapping constraints (reference mapping.py kernels A12-A19) and
tagged-union dispatch (A25/A46) compiled to map_*/forall/CASE chains."""

from typical_spark.compiler import compile_table_spec
from typical_spark.specs import (
    EnumCheck,
    FieldSpec,
    MapCheck,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    TaggedCheck,
)


def _violations(spark, spec, rows, ddl):
    plan = compile_table_spec(spec)
    df = spark.createDataFrame(rows, ddl)
    return {
        (r["row_id"], r["check_id"])
        for r in plan.violations(df, with_message=False).collect()
    }


def test_map_size_required_total_pattern(spark):
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("m", "map<string,int>", checks=(
            MapCheck(
                min_items=1, max_items=3,
                required_keys=("a",),
                total=True, defined_keys=("a", "b", "c"),
                key_regex=r"[a-z]+$",
            ),
        )),),
    )
    rows = [
        (0, {"a": 1}),                      # ok
        (1, {}),                            # too small + missing required
        (2, {"a": 1, "b": 2, "c": 3, "d": 4}),  # too big + extra key 'd'
        (3, {"b": 1}),                      # missing required 'a'
        (4, {"a": 1, "B2": 5}),             # bad key pattern + not defined
        (5, None),                          # null short-circuit
    ]
    got = _violations(spark, spec, rows, "row_id int, m map<string,int>")
    assert got == {
        (1, "map_size"), (1, "map_required_keys"),
        (2, "map_size"), (2, "map_total"),
        (3, "map_required_keys"),
        (4, "map_total"), (4, "map_key_pattern"),
    }


def test_map_values_and_dependencies(spark):
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("m", "map<string,int>", checks=(
            MapCheck(
                values_check=NumberCheck(ge=0),
                key_dependencies=(("user", ("email",)),),
            ),
        )),),
    )
    rows = [
        (0, {"user": 1, "email": 2}),   # ok
        (1, {"user": 1}),               # dependency violated
        (2, {"x": -5}),                 # negative value
        (3, {"email": 9}),              # email alone is fine
    ]
    got = _violations(spark, spec, rows, "row_id int, m map<string,int>")
    assert got == {(1, "map_key_dependency"), (2, "map_values")}


def test_tagged_union_dispatch(spark):
    """role='tool' requires a tool name from the enum; any other role
    requires tool to be null (reference tagged-union semantics: dispatch
    the check by the tag column)."""
    class NullCheck(NotNullCheck):
        # inverse: value must BE null -> reuse scalar pred via enum of []
        pass

    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("tool", "string", checks=(
            TaggedCheck(
                tag_column="role",
                cases=(("tool", NotNullCheck()),),
                unknown_tag_violates=False,
            ),
        )),),
    )
    rows = [
        (0, "tool", "tool_01"),   # ok
        (1, "tool", None),        # tool role but no tool name
        (2, "user", None),        # ok
        (3, "user", "tool_01"),   # allowed: no case for 'user'
    ]
    got = _violations(spark, spec, rows, "row_id int, role string, tool string")
    assert got == {(1, "tagged[role=tool]_not_null")}


def test_tagged_unknown_tag(spark):
    spec = TableSpec(
        name="t", key_columns=("row_id",),
        fields=(FieldSpec("payload", "string", checks=(
            TaggedCheck(
                tag_column="kind",
                cases=(("num", NumberCheck(ge=0)), ("word", NotNullCheck())),
                unknown_tag_violates=True,
            ),
        )),),
    )
    # NB: payload is string; NumberCheck on string compares lexically ->
    # use numeric-looking strings consistently
    rows = [
        (0, "num", "5"),
        (1, "mystery", "x"),   # unknown tag
        (2, "word", None),     # word requires non-null
    ]
    got = _violations(spark, spec, rows, "row_id int, kind string, payload string")
    assert (1, "tagged[kind]_unknown_tag") in got
    assert (2, "tagged[kind=word]_not_null") in got


def test_transcript_spec_with_tool_tagging(spark):
    """Extend the flagship spec: tool must be set for role='tool' rows."""
    from typical_spark.specs import transcript_spec

    base = transcript_spec()
    tool_field = base.field("tool").with_checks(
        TaggedCheck(tag_column="role", cases=(("tool", NotNullCheck()),))
    )
    fields = tuple(
        tool_field if f.name == "tool" else f for f in base.fields
    )
    spec = TableSpec(name=base.name, key_columns=base.key_columns, fields=fields)
    plan = compile_table_spec(spec)
    from typical_spark.sources.transcripts import generate_transcripts_pdf

    pdf = generate_transcripts_pdf(3000, seed=11)
    df = spark.createDataFrame(pdf)
    vio = plan.violations(df, with_message=False)
    n_tagged = vio.where(
        vio.check_id == "tagged[role=tool]_not_null"
    ).count()
    # the generator nulls some tools on tool-rows via the invalid-injection;
    # at minimum the check executes cleanly end-to-end
    assert vio.count() > 0 and n_tagged >= 0
