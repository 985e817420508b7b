"""Secret-field redaction: a FieldSpec(secret=True) column's raw value
must NEVER appear in violation observed/message text — the distributed
lift of SecretStr's repr-masking contract (reference
typic/types/secret.py:35-90: repr is '*' * len(value); the value itself
still participates in validation and serialization, matching the
reference where json.dumps(SecretStr) emits the real value)."""

from pyspark.sql import functions as F

from typical_spark import compile_table_spec
from typical_spark.spec_io import spec_from_json, spec_to_json
from typical_spark.specs import (
    FieldSpec,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    TextCheck,
)

PLANTED = "hunter2-super-secret"

SPEC = TableSpec(
    name="creds", key_columns=("rid",),
    fields=(
        FieldSpec("rid", "long", nullable=False, checks=(NotNullCheck(),)),
        FieldSpec("api_key", "string", secret=True,
                  checks=(TextCheck(min_length=64),)),     # planted fails
        FieldSpec("pin", "long", secret=True, coerce_from="string",
                  checks=(NumberCheck(ge=1000),)),
        FieldSpec("note", "string", checks=(TextCheck(max_length=3),)),
    ),
)


def _violation_rows(spark):
    df = spark.createDataFrame(
        [(1, PLANTED, "42", "long-note"),        # text_length + number_range
         (2, PLANTED, "not-a-pin", "ok")],       # text_length + coerce
        "rid long, api_key string, pin string, note string",
    )
    plan = compile_table_spec(SPEC)
    return plan.violations(df, with_message=True).collect()


def test_secret_never_leaks_into_violations(spark):
    rows = _violation_rows(spark)
    assert len(rows) >= 4
    for r in rows:
        blob = " ".join(str(v) for v in r.asDict().values())
        assert PLANTED not in blob
        assert "not-a-pin" not in blob
        assert "42" not in blob.replace("len=", "")  # pin value masked too


def test_secret_masks_are_star_runs_of_value_length(spark):
    rows = {(r["rid"], r["column"], r["check_id"]): r for r in _violation_rows(spark)}
    got = rows[(1, "api_key", "text_length")]
    assert got["observed"] == "*" * len(PLANTED)       # SecretStr repr shape
    got_pin = rows[(2, "pin", "coerce")]
    assert got_pin["observed"] == "*" * len("not-a-pin")
    # non-secret fields keep real observed values (text_length reports
    # the offending LENGTH by convention)
    got_note = rows[(1, "note", "text_length")]
    assert got_note["observed"] == str(len("long-note"))


def test_secret_flag_roundtrips_and_still_validates(spark):
    back = spec_from_json(spec_to_json(SPEC))
    assert back == SPEC
    # checks still run against the REAL value: a valid row yields none
    df = spark.createDataFrame(
        [(3, "x" * 64, "2024", "ok")],
        "rid long, api_key string, pin string, note string",
    )
    assert compile_table_spec(back).violations(df).count() == 0


def test_secret_masked_in_verdicts_and_annotate(spark):
    """Every consumer of the compiled checks inherits the mask."""
    df = spark.createDataFrame(
        [(1, PLANTED, "7", "ok")],
        "rid long, api_key string, pin string, note string",
    )
    plan = compile_table_spec(SPEC)
    ann = plan.annotate(df).select(F.col("_violations").cast("string")).collect()
    assert PLANTED not in ann[0][0]
