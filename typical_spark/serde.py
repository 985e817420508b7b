"""Columnar serialization — the engine's "primitive()/tojson" surface.

Re-expresses typical's serializer factory (reference typic/serde/ser.py:
67-94 defined-scalar serializers, :153-246 list/dict/class serializers,
:248-289 enum unwrap; JSON encoding ext/json.py:33-109) as native Spark
expressions: `to_json` is the Jackson-backed columnar analog of
orjson-over-primitive(), and case transforms mirror SerdeConfig's field
case mapping (reference typic/common.py:36-68, resolver.py:297-370).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# scalar serializers (reference ser.py:67-94)
# ---------------------------------------------------------------------------


def iso_timestamp(col: Column) -> Column:
    """timestamp -> RFC3339/ISO-8601 string (reference: datetime.isoformat)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def iso_date(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def iso_duration_from_seconds(col: Column) -> Column:
    """total seconds -> ISO-8601 duration "PnDTnHnMnS" (reference
    util.py:726-757 timedelta isoformat). Negative durations prefix '-'."""
    total = col.cast("double")
    a = F.abs(total)
    # microsecond-exact fraction (the parse twin iso_duration_seconds
    # accepts 'PT0.5S'; an earlier long cast silently truncated it, so
    # serialize(parse(x)) lost sub-second precision)
    whole0 = F.floor(a).cast("long")
    frac_us0 = F.round((a - whole0) * 1e6).cast("long")
    whole = whole0 + (frac_us0 / 1000000).cast("long")  # carry on .9999995+
    frac_us = frac_us0 % 1000000
    d, rem = (whole / 86400).cast("long"), whole % 86400
    h, m, s = (rem / 3600).cast("long"), ((rem % 3600) / 60).cast("long"), rem % 60
    frac_str = F.when(
        frac_us > 0,
        F.concat(
            F.lit("."),
            F.regexp_replace(
                F.lpad(frac_us.cast("string"), 6, "0"), "0+$", ""
            ),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit("P"),
        F.when(d > 0, F.concat(d.cast("string"), F.lit("D"))).otherwise(F.lit("")),
        F.lit("T"),
        F.when(h > 0, F.concat(h.cast("string"), F.lit("H"))).otherwise(F.lit("")),
        F.when(m > 0, F.concat(m.cast("string"), F.lit("M"))).otherwise(F.lit("")),
        F.concat(s.cast("string"), frac_str, F.lit("S")),
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).when(
        total < 0, F.concat(F.lit("-"), body)
    ).otherwise(body)


def iso_time_from_seconds(col: Column) -> Column:
    """seconds-since-midnight -> "HH:mm:ss" time-of-day string (the
    serialize half of A32; parse twin coerce.time_of_day_seconds).
    Out-of-range input (<0 or >=86400) -> NULL."""
    t = col.cast("double")
    whole = F.floor(t).cast("long")
    h = (whole / 3600).cast("long")
    m = ((whole % 3600) / 60).cast("long")
    s = whole % 60
    out = F.concat_ws(
        ":",
        F.lpad(h.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(s.cast("string"), 2, "0"),
    )
    return F.when((t >= 0) & (t < 86400), out).otherwise(
        F.lit(None).cast("string")
    )


def redact_secret(col: Column, placeholder: str = "******") -> Column:
    """SecretStr-style masking (reference typic/types/secret.py:35-90:
    repr shows stars, .secret reveals). NULL stays NULL so nullability
    survives serialization."""
    return F.when(col.isNotNull(), F.lit(placeholder)).otherwise(
        F.lit(None).cast("string")
    )


# ---------------------------------------------------------------------------
# case transforms (reference typic/common.py:36-68 Case enum)
# ---------------------------------------------------------------------------


def _to_camel(name: str) -> str:
    parts = re.split(r"[_\-\s]+", name)
    return parts[0].lower() + "".join(p.title() for p in parts[1:])


def _to_pascal(name: str) -> str:
    return "".join(p.title() for p in re.split(r"[_\-\s]+", name))


def _to_kebab(name: str) -> str:
    return re.sub(r"[_\s]+", "-", re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "-", name)).lower()


def _to_snake(name: str) -> str:
    return re.sub(r"[-\s]+", "_", re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name)).lower()


CASES = {
    "camel": _to_camel,
    "pascal": _to_pascal,
    "kebab": _to_kebab,
    "snake": _to_snake,
}


def case_transform(df: DataFrame, case: str) -> DataFrame:
    """Rename every column per the case style (serialization field
    mapping, analog of SerdeConfig fields_out)."""
    fn = CASES[case]
    return df.select(*[F.col(c).alias(fn(c)) for c in df.columns])


# ---------------------------------------------------------------------------
# row serialization (reference ser.py:210-246 class serializer + tojson)
# ---------------------------------------------------------------------------


def rows_to_json(
    df: DataFrame,
    omit_nulls: bool = True,
    case: str | None = None,
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """Serialize each row to a JSON string column `json` — the columnar
    `protocol.tojson`. omit_nulls mirrors the reference's `omit` /
    exclude-None behavior; `exclude` mirrors field exclusion
    (ser.py:210-246); `case` applies output field casing."""
    out = df.drop(*[c for c in exclude if c in df.columns])
    if case:
        out = case_transform(out, case)
    opts = {"ignoreNullFields": "true" if omit_nulls else "false"}
    return out.select(
        F.to_json(F.struct(*[F.col(c) for c in out.columns]), opts).alias("json")
    )
