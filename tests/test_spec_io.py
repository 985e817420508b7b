"""Spec JSON round-trip: every check type survives spec -> JSON -> spec
exactly, and the reloaded spec compiles to the same verdicts."""

import datetime as dt

from typical_spark.compiler import compile_table_spec
from typical_spark.spec_io import spec_from_json, spec_to_json
from typical_spark.specs import (
    ArrayCheck,
    ArrayElementsCheck,
    DecimalCheck,
    EnumCheck,
    FieldSpec,
    FormatCheck,
    MapCheck,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    TaggedCheck,
    TextCheck,
    TimestampRangeCheck,
    UnionCheck,
)

KITCHEN_SINK = TableSpec(
    name="sink", key_columns=("rid",),
    fields=(
        FieldSpec("rid", "long", nullable=False, checks=(NotNullCheck(),)),
        FieldSpec("n", "double", coerce_from="string",
                  checks=(NumberCheck(gt=0, le=100, multiple_of=5),)),
        FieldSpec("s", "string", checks=(
            TextCheck(min_length=1, max_length=10, regex="^a",
                      strip_whitespace=True),
            EnumCheck(values=("aa", "ab")),
            FormatCheck(format="hostname"),
        )),
        FieldSpec("ts", "timestamp", checks=(
            TimestampRangeCheck(min_ts=dt.datetime(2020, 1, 1),
                                max_ts=dt.datetime(2030, 1, 1)),
        )),
        FieldSpec("arr", "array<int>", checks=(
            ArrayCheck(min_items=1, max_items=5, unique=True),
            ArrayElementsCheck(inner=NumberCheck(ge=0)),
        )),
        FieldSpec("m", "map<string,string>", checks=(
            MapCheck(min_items=1, required_keys=("k",), total=True,
                     defined_keys=("k", "v"), key_regex="^[kv]$",
                     values_check=TextCheck(max_length=3),
                     key_dependencies=(("k", ("v",)),)),
        )),
        FieldSpec("d", "decimal(10,2)", checks=(
            DecimalCheck(max_digits=10, decimal_places=2),
        )),
        FieldSpec("u", "string", checks=(
            UnionCheck(members=(TextCheck(regex="^x"), EnumCheck(values=("y",)))),
        )),
        FieldSpec("tagged", "string", checks=(
            TaggedCheck(tag_column="s",
                        cases=(("aa", TextCheck(min_length=2)),
                               ("ab", NotNullCheck())),
                        else_check=NotNullCheck(),
                        unknown_tag_violates=True),
        )),
    ),
)


def test_spec_json_roundtrip_exact():
    j = spec_to_json(KITCHEN_SINK, indent=2)
    back = spec_from_json(j)
    assert back == KITCHEN_SINK           # frozen dataclasses: deep equality
    assert spec_to_json(back) == spec_to_json(KITCHEN_SINK)  # stable


def test_validate_job_accepts_spec_file(spark, transcripts_df, tmp_path):
    """The cluster entrypoint's --spec flag: a JSON spec file must drive
    the job and produce output identical to the equivalent built-in spec
    (the reference's declarative-config story, typic/api.py:112 — the
    spec is data, not code)."""
    from jobs.validate_transcripts import main
    from typical_spark.spec_io import spec_to_json
    from typical_spark.specs import transcript_spec

    inp = str(tmp_path / "in")
    transcripts_df.limit(500).write.parquet(inp)
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(spec_to_json(transcript_spec()))

    out_default = str(tmp_path / "out_default")
    out_spec = str(tmp_path / "out_spec")
    assert main(["--input", inp, "--out", out_default, "--run-id", "t"]) == 0
    assert main(["--input", inp, "--out", out_spec, "--run-id", "t",
                 "--spec", str(spec_path)]) == 0

    a = spark.read.parquet(f"{out_default}/violations")
    b = spark.read.parquet(f"{out_spec}/violations")
    assert a.schema == b.schema
    key = lambda rows: sorted(tuple(map(str, r)) for r in rows)  # noqa: E731
    assert key(a.collect()) == key(b.collect()) and a.count() > 0


def test_reloaded_spec_compiles_identically(spark):
    back = spec_from_json(spec_to_json(KITCHEN_SINK))
    df = spark.createDataFrame(
        [(1, "15", "aa", dt.datetime(2025, 1, 1), [1, 2], {"k": "x", "v": "y"},
          None, "x1", "zz"),
         (2, "7", "zz", dt.datetime(1999, 1, 1), [], {"bad": "x"},
          None, "nope", None)],
        "rid long, n string, s string, ts timestamp, arr array<int>, "
        "m map<string,string>, d decimal(10,2), u string, tagged string",
    )
    a = compile_table_spec(KITCHEN_SINK).violations(df, with_message=False)
    b = compile_table_spec(back).violations(df, with_message=False)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) > 0
