"""Reference-golden parity: the benchmark Model fixtures must produce the
same pass/fail outcomes as typical's own benchmark assertions
(reference benchmark/test_benchmarks.py:60-84: valid.json validates
cleanly; invalid.json fails).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from typical_spark.model_records import validate_models

REF_VALID = "/root/reference/benchmark/valid.json"
REF_INVALID = "/root/reference/benchmark/invalid.json"

# Self-contained equivalents (same constraint-relevant properties) so the
# suite runs without the reference checkout.
VALID_DOC = {
    "id": 1853,
    "client_name": "A" * 80,
    "sort_index": 125.18,
    "client_phone": None,
    "grecaptcha_response": "x" * 90,
    "location": {"latitude": 52.28, "longitude": 126.75},
    "contractor": "1407",                      # str -> PositiveInt coercion
    "upstream_http_referrer": "ref",
    "last_updated": "1960-09-22T00:44:19",
    "skills": [
        {"subject": "s", "subject_id": 0, "category": "c",
         "qual_level": "q", "qual_level_id": 450, "qual_level_ranking": 10.2},
    ],
}
INVALID_DOC = {
    **VALID_DOC,
    "id": 1121,
    "grecaptcha_response": "y" * 1500,        # > max_length 1000
    "last_updated": "2013-3-2T19:48:10",      # non-padded month: must fail
    "contractor": "-5",                        # coerces but violates ge=0
}


def _validate_doc(spark, doc):
    df = spark.createDataFrame([(json.dumps(doc),)], "value string")
    rows = validate_models(spark, df).collect()
    return {(r["column"], r["check_id"]) for r in rows}


def test_valid_doc_zero_violations(spark):
    assert _validate_doc(spark, VALID_DOC) == set()


def test_invalid_doc_expected_violations(spark):
    got = _validate_doc(spark, INVALID_DOC)
    assert ("grecaptcha_response", "text_length") in got
    assert ("last_updated", "coerce") in got
    assert ("contractor", "number_range") in got
    # nothing else should fire
    assert got == {
        ("grecaptcha_response", "text_length"),
        ("last_updated", "coerce"),
        ("contractor", "number_range"),
    }


def test_nested_and_element_checks(spark):
    doc = {
        **VALID_DOC,
        "location": {"latitude": 99.0, "longitude": 0.0},   # lat out of range
        "skills": [
            {"subject": None, "subject_id": 1, "category": "c",
             "qual_level": "q", "qual_level_id": -3, "qual_level_ranking": 0.0},
        ],
    }
    got = _validate_doc(spark, doc)
    assert ("location.latitude", "number_range") in got
    assert ("skills", "elements.subject_not_null") in got
    assert ("skills", "elements.qual_level_id_number_range") in got


@pytest.mark.skipif(not os.path.exists(REF_VALID), reason="reference not present")
def test_reference_golden_files(spark):
    """Byte-for-byte reference fixtures: valid.json -> 0 violations;
    invalid.json -> fails (same outcome as typic.validate)."""
    with open(REF_VALID) as f:
        valid = json.load(f)
    with open(REF_INVALID) as f:
        invalid = json.load(f)
    assert _validate_doc(spark, valid) == set()
    got = _validate_doc(spark, invalid)
    assert ("grecaptcha_response", "text_length") in got
    assert ("last_updated", "coerce") in got


def test_corrupt_json_gets_own_violation_class(spark):
    df = spark.createDataFrame(
        [("{not json",), ('{"id": 1, "client_name": "x", "sort_index": 1.0}',)],
        "value string",
    )
    rows = validate_models(spark, df).collect()
    assert len(rows) == 1
    assert rows[0]["check_id"] == "json_parse"
    assert rows[0]["observed"] == "{not json"


def test_coercion_kernels(spark):
    """Scalar coercion matrix (FIXTURES.md §4; golden pairs lifted from
    reference tests/test_typed.py:56-157 semantics)."""
    from typical_spark.functions import (
        bool_like,
        epoch_timestamp,
        iso_timestamp_strict,
        uuid_normalize,
    )

    df = spark.createDataFrame(
        [("true", "1", "0", "maybe")], "a string, b string, c string, d string"
    )
    r = df.select(
        bool_like(F.col("a")).alias("a"),
        bool_like(F.col("b")).alias("b"),
        bool_like(F.col("c")).alias("c"),
        bool_like(F.col("d")).alias("d"),
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, True, False, None)

    df2 = spark.createDataFrame([(0,)], "e long")
    ts = df2.select(epoch_timestamp(F.col("e")).alias("t")).collect()[0]["t"]
    assert ts.year == 1970 and ts.month == 1 and ts.day == 1

    df3 = spark.createDataFrame(
        [("2013-03-02T19:48:10", "2013-3-2T19:48:10", "2013-03-02", "nope")],
        "g string, h string, i string, j string",
    )
    r3 = df3.select(
        iso_timestamp_strict(F.col("g")).alias("g"),
        iso_timestamp_strict(F.col("h")).alias("h"),
        iso_timestamp_strict(F.col("i")).alias("i"),
        iso_timestamp_strict(F.col("j")).alias("j"),
    ).collect()[0]
    assert r3["g"] is not None and r3["i"] is not None
    assert r3["h"] is None and r3["j"] is None  # strict: non-padded fails

    df4 = spark.createDataFrame(
        [("7468D8B4-31E5-4E4C-A8A9-02FFE5C4A0DA",
          "7468d8b431e54e4ca8a902ffe5c4a0da", "xyz")],
        "u string, v string, w string",
    )
    r4 = df4.select(
        uuid_normalize(F.col("u")).alias("u"),
        uuid_normalize(F.col("v")).alias("v"),
        uuid_normalize(F.col("w")).alias("w"),
    ).collect()[0]
    assert r4["u"] == r4["v"] == "7468d8b4-31e5-4e4c-a8a9-02ffe5c4a0da"
    assert r4["w"] is None
