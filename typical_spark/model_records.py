"""Reference-parity fixture: the benchmark `Model` schema as an engine spec.

Mirrors /root/reference/benchmark/models/functional.py:10-57 (constrained
str/int subtypes, nested Optional[Location], List[Skill]) so the engine's
row-level kernels can be checked against typical's own valid/invalid
goldens (benchmark/valid.json must yield 0 violations; invalid.json must
violate client_name max_length=255? no — grecaptcha_response max_length,
and last_updated ISO format, per benchmark/test_benchmarks.py:60-84).

Pipeline: JSON line -> from_json(MODEL_SCHEMA) -> coercions
(contractor: str->int PositiveInt, last_updated: strict ISO -> timestamp)
-> fused validation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typical_spark.compiler import compile_table_spec
from typical_spark.specs import (
    ArrayElementsCheck,
    FieldSpec,
    NotNullCheck,
    NumberCheck,
    TableSpec,
    TextCheck,
)

# All leaves land as strings first; coercion is the engine's job (the
# reference receives parsed-JSON dicts and transmutes field-wise).
MODEL_SCHEMA = (
    "id long, client_name string, sort_index double, client_phone string, "
    "grecaptcha_response string, "
    "location struct<latitude:double, longitude:double>, "
    "contractor string, upstream_http_referrer string, last_updated string, "
    "skills array<struct<subject:string, subject_id:long, category:string, "
    "qual_level:string, qual_level_id:long, qual_level_ranking:double>>"
)


_SKILLS_DTYPE = (
    "array<struct<subject:string,subject_id:bigint,category:string,"
    "qual_level:string,qual_level_id:bigint,qual_level_ranking:double>>"
)
# the REAL element struct type (matches MODEL_SCHEMA): a prior
# placeholder string needed a special case in schema.spec_to_structtype
# and broke schema_conformance / from_rows for this spec


def model_spec() -> TableSpec:
    return TableSpec(
        name="model_records",
        key_columns=("id",),
        fields=(
            FieldSpec("id", "long", nullable=False, checks=(NotNullCheck(),)),
            # DBString: max_length=255 (functional.py:10-12)
            FieldSpec("client_name", "string", nullable=False,
                      checks=(NotNullCheck(), TextCheck(max_length=255))),
            FieldSpec("sort_index", "double", nullable=False,
                      checks=(NotNullCheck(),)),
            FieldSpec("client_phone", "string",
                      checks=(TextCheck(max_length=255),)),
            # GReCaptchaResponse: 10..1000 (functional.py:20-22)
            FieldSpec("grecaptcha_response", "string",
                      checks=(TextCheck(min_length=10, max_length=1000),)),
            FieldSpec("location.latitude", "double",
                      checks=(NumberCheck(ge=-90.0, le=90.0),)),
            FieldSpec("location.longitude", "double",
                      checks=(NumberCheck(ge=-180.0, le=180.0),)),
            # PositiveInt from string input (valid.json: "contractor": "1407")
            FieldSpec("contractor", "long", coerce_from="string",
                      checks=(NumberCheck(ge=0),)),
            # HTTPReferer: max_length=1023 (functional.py:14-16)
            FieldSpec("upstream_http_referrer", "string",
                      checks=(TextCheck(max_length=1023),)),
            # Optional[datetime]; "2013-3-2T19:48:10" must fail (invalid.json)
            FieldSpec("last_updated", "timestamp", coerce_from="iso_strict"),
            # List[Skill]: required member fields (functional.py:36-43)
            FieldSpec("skills", _SKILLS_DTYPE, checks=(
                ArrayElementsCheck(inner=NotNullCheck(), element_field="subject"),
                ArrayElementsCheck(inner=NotNullCheck(), element_field="subject_id"),
                ArrayElementsCheck(inner=NumberCheck(ge=0), element_field="qual_level_id"),
            )),
        ),
    )


def parse_model_json(spark: SparkSession, json_lines: DataFrame, col: str = "value") -> DataFrame:
    """JSON-line DataFrame -> typed model records (flattened one level so
    coercions/checks address columns; nested paths stay nested). Keeps the
    raw line in `_raw` so unparseable input gets its own violation class
    instead of masquerading as missing required fields."""
    # PERMISSIVE from_json yields an all-null struct (never a null struct)
    # for garbage input; the corrupt-record column is the reliable signal.
    parsed = json_lines.select(
        F.from_json(
            F.col(col),
            MODEL_SCHEMA + ", _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r"),
    ).select("r.*")
    return parsed


def validate_models(spark: SparkSession, json_lines: DataFrame) -> DataFrame:
    plan = compile_table_spec(model_spec())
    df = parse_model_json(spark, json_lines)
    parse_fail = df.where(F.col("_corrupt").isNotNull()).select(
        F.col("id"),
        F.lit("_corrupt").alias("column"),
        F.lit("json_parse").alias("check_id"),
        F.substring("_corrupt", 1, 64).alias("observed"),
        F.lit("parseable JSON object").alias("expected"),
    )
    ok = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    return plan.violations(ok, with_message=False).unionByName(parse_fail)
