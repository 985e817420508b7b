"""Columnar coercion kernels — the distributed "transmute" path.

Each function re-expresses one of the reference's deserializer builders
(typic/serde/des.py) as a native Catalyst expression: a failed coercion
yields NULL (callers convert source-non-null & result-null into a
`coerce` violation — the analog of transmute raising, strict-mode
semantics typic/strict.py:6-68). No Python UDFs anywhere here: these are
the hot path and must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# epoch int/float -> timestamp (reference des.py:178-196: number ->
# datetime.fromtimestamp)
def epoch_timestamp(col: Column) -> Column:
    return F.timestamp_seconds(col.try_cast("double"))


# ISO-8601 string -> timestamp, STRICT: zero-padded fields required, so
# the reference's invalid fixture "2013-3-2T19:48:10" fails (reference
# benchmark/invalid.json; pendulum.parse raises -> transmute error).
# Spark's default to_timestamp is lenient about nothing under the
# CORRECTED parser policy with an explicit pattern, which is what we want.
def iso_timestamp_strict(col: Column) -> Column:
    s = col.cast("string")
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        # RFC3339 offset forms ('Z', '+01:00', '+0100') — the reference's
        # pendulum parser accepts these; XXX/XX match both Z and numeric
        # offsets, converting into the (UTC-pinned) session zone
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )


# "true"/"1"/"yes" style bool coercion (reference des.py:281-288 via
# safe_eval util.py:100-131; tests/test_typed.py:72-78)
def bool_like(col: Column) -> Column:
    low = F.lower(F.trim(col.cast("string")))
    return (
        F.when(low.isin("true", "1", "yes", "y", "on"), F.lit(True))
        .when(low.isin("false", "0", "no", "n", "off"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


# JSON string -> typed struct (reference safe_eval's json.loads branch,
# util.py:100-131, + TypedDict des des.py:383-413)
def json_object(col: Column, schema: str) -> Column:
    return F.from_json(col.cast("string"), schema)


# safe_eval analog (reference typic/util.py:100-131: ast.literal_eval then
# json.loads fallback, so "1", "1.5", "true", "null", '"x"', '{...}' all
# coerce). Columnar form: classify + parse into a typed variant struct.
def parse_primitive(col: Column) -> Column:
    """string -> struct<kind, bool_value, long_value, double_value,
    string_value> — the typed-variant result of safe_eval. kind in
    (null, bool, int, float, json, string)."""
    s = F.trim(col.cast("string"))
    low = F.lower(s)
    as_long = s.try_cast("long")
    as_double = s.try_cast("double")
    is_json = F.when(
        s.rlike(r"^[\[\{]"), F.from_json(s, "map<string,string>").isNotNull()
        | F.from_json(s, "array<string>").isNotNull()
    ).otherwise(F.lit(False))
    kind = (
        F.when(s.isNull() | low.isin("null", "none"), "null")
        .when(low.isin("true", "false"), "bool")
        .when(as_long.isNotNull(), "int")
        .when(as_double.isNotNull(), "float")
        .when(is_json, "json")
        .otherwise("string")
    )
    return F.struct(
        kind.alias("kind"),
        F.when(kind == "bool", low == "true").alias("bool_value"),
        F.when(kind == "int", as_long).alias("long_value"),
        F.when(kind.isin("int", "float"), as_double).alias("double_value"),
        F.when(kind.isin("string", "json"), s).alias("string_value"),
    )


# ISO-8601 duration "P[nW][nD][T[nH][nM][n[.f]S]]" -> total seconds
# (double). The deserialize half of A33 (reference des.py:253-261 parses
# durations via pendulum; serializer twin: serde.iso_duration_from_seconds).
# An optional leading '-' negates the whole duration, matching the
# serializer's output for negative timedeltas. Weeks are exact (604800 s)
# and — matching pendulum's permissive reading rather than strict
# ISO-8601, which makes PnW exclusive — may combine with the other
# designators. Year/month designators stay rejected: they have no fixed
# second length, and the reference's timedelta carrier cannot represent
# them either. Anything else that doesn't match the grammar (or is an
# empty "P"/"PT") -> NULL.
_ISO_DUR_RE = (
    r"^P(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def iso_duration_seconds(col: Column) -> Column:
    s = F.upper(F.trim(col.cast("string")))
    sign = F.when(s.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    b = F.regexp_replace(s, "^-", "")
    # at least one component must be present (bare "P"/"PT" is invalid)
    ok = b.rlike(_ISO_DUR_RE) & b.rlike(r"\d")
    # ONE capture pass: rewrite the (anchored, so single) match to
    # "W,D,H,M,S" and split — 2 regex evaluations per row instead of the
    # 6 that one rlike + five regexp_extract(group=i) calls would cost
    # (Catalyst does not share regex work across expressions).
    packed = F.split(F.regexp_replace(b, _ISO_DUR_RE, "$1,$2,$3,$4,$5"), ",")
    part = lambda i: F.coalesce(  # noqa: E731
        F.element_at(packed, i).try_cast("double"), F.lit(0.0)
    )
    total = (
        part(1) * 604800.0 + part(2) * 86400.0 + part(3) * 3600.0
        + part(4) * 60.0 + part(5)
    )
    return F.when(ok, sign * total).otherwise(F.lit(None).cast("double"))


def iso_duration_interval(col: Column) -> Column:
    """Same parse, materialized as a DayTimeIntervalType — use when the
    target field is declared `interval day to second`."""
    secs = iso_duration_seconds(col)
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


# Time-of-day "HH:mm:ss[.ffffff]" -> seconds since midnight (double) —
# the deserialize half of A32 (reference des.py time handling; Spark has
# no first-class TIME type, so seconds-of-day is the columnar carrier;
# serializer twin: serde.iso_time_from_seconds). Strict zero-padded
# fields with range validation; invalid -> NULL.
_TIME_RE = r"^([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.\d{1,6})?$"


def time_of_day_seconds(col: Column) -> Column:
    s = F.trim(col.cast("string"))
    ok = s.rlike(_TIME_RE)
    # same 2-regex-pass trick as iso_duration_seconds ($4 keeps its
    # leading '.', which try_cast('.5') reads as 0.5)
    packed = F.split(F.regexp_replace(s, _TIME_RE, "$1,$2,$3,$4"), ",")
    g = lambda i: F.coalesce(  # noqa: E731
        F.element_at(packed, i).try_cast("double"), F.lit(0.0)
    )
    total = g(1) * 3600.0 + g(2) * 60.0 + g(3) + g(4)
    return F.when(ok, total).otherwise(F.lit(None).cast("double"))


# bytes -> str (A35 deserialize, reference des.py text des:
# bytes.decode('utf-8')): invalid UTF-8 byte sequences coerce to NULL
# (transmute-failure semantics) instead of mojibake or a thrown job —
# is_valid_utf8 gates the decode so this is safe under ANSI.
def utf8_decode(col: Column) -> Column:
    return F.when(F.is_valid_utf8(col), F.decode(col, "UTF-8")).otherwise(
        F.lit(None).cast("string")
    )


# str -> bytes (A35 serialize twin; str.encode('utf-8'))
def utf8_encode(col: Column) -> Column:
    return F.encode(col.cast("string"), "UTF-8")


_UUID_RE = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"


# UUID canonicalization (reference des.py:263-279: str/bytes/int -> UUID).
# Accepts canonical or 32-hex form; anything else -> NULL.
def uuid_normalize(col: Column) -> Column:
    s = F.lower(F.trim(col.cast("string")))
    bare = F.regexp_replace(s, "-", "")
    canon = F.concat_ws(
        "-",
        F.substring(bare, 1, 8),
        F.substring(bare, 9, 4),
        F.substring(bare, 13, 4),
        F.substring(bare, 17, 4),
        F.substring(bare, 21, 12),
    )
    return F.when(bare.rlike("^[0-9a-f]{32}$"), canon).otherwise(
        F.lit(None).cast("string")
    )
