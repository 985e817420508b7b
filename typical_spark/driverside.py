"""Driver-side conveniences over the compiled validation plan — the
reference's call-surface sugar, re-expressed by running the SAME
distributed plan on tiny local DataFrames (the spec compiles once and
applies anywhere; nothing here re-implements validation logic):

- from_rows   (A38 from_dict, reference typic/serde/des.py:379-381):
              plain python mappings -> typed, coerced, validated DataFrame.
- enforce     (A61 bind/enforcer, reference typic/serde/binder.py:62-271):
              decorator that transmutes + validates a function's keyword
              arguments against a TableSpec before the call.
- load_env_settings (A63 typed env settings, reference typic/env.py:79-116):
              environment variables -> coerced, validated settings dict.

These run on whatever SparkSession is active; at cluster scale they cost
one local-relation job each (no scan, no shuffle — Catalyst folds a
single-row LocalRelation through the same expressions the big jobs use).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from typical_spark.compiler import compile_table_spec
from typical_spark.schema import spec_to_structtype
from typical_spark.specs import TableSpec


class TransmuteError(ValueError):
    """A value could not be coerced/validated (the driver-side analog of
    the reference's transmute raising; distributed jobs report violation
    ROWS instead — raising is only correct when the caller is a single
    python call-site)."""


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession; pass spark= explicitly")
    return s


def _coerce_input_type(how: str):
    """Source type a coercion strategy reads from: most parse strings,
    but 'map' coerces an existing map<string,string> and 'utf8' decodes
    binary — declaring those as StringType would stringify the raw value
    (repr mojibake) or fail analysis on map_keys."""
    import pyspark.sql.types as T

    if how == "map":
        return T.MapType(T.StringType(), T.StringType())
    if how == "utf8":
        return T.BinaryType()
    return T.StringType()


def _input_struct(spec: TableSpec):
    """Input schema for raw mappings: declared dtype per field, except
    coerce_from fields, which arrive as the strategy's SOURCE
    representation (string for parses, map/binary for map/utf8)."""
    import pyspark.sql.types as T

    base = spec_to_structtype(spec)
    fields = []
    by_name = {fs.name: fs for fs in spec.fields}
    for f in base.fields:
        fs = by_name.get(f.name)
        if fs is not None and fs.coerce_from is not None:
            fields.append(
                T.StructField(f.name, _coerce_input_type(fs.coerce_from), True)
            )
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def from_rows(
    rows: Sequence[Mapping[str, object]],
    spec: TableSpec,
    mode: str = "coerce",
    spark: SparkSession | None = None,
    raise_on_violation: bool = True,
) -> DataFrame:
    """Typed construction from plain mappings (A38): unknown keys are
    dropped, missing fields become NULL, declared coercions repair the
    values, and the spec's checks run. With raise_on_violation (default)
    any violation raises TransmuteError listing the offenders — the
    from_dict/transmute contract; otherwise the coerced DataFrame is
    returned and violations are the caller's to query."""
    import pyspark.sql.types as T

    s = _active_spark(spark)
    schema = _input_struct(spec)

    def conv(v, f):
        if v is None:
            return None
        if isinstance(f.dataType, T.StringType) and not isinstance(v, str):
            # messy input welcome where a coercion is declared — but
            # str() of a dict/list is Python repr (single quotes), which
            # a json: coercion can never parse, and str(bytes) is
            # "b'..'"; serialize each to the form the coercions expect
            if isinstance(v, (dict, list, tuple)):
                import json as _json

                return _json.dumps(v)
            if isinstance(v, (bytes, bytearray)):
                return bytes(v).decode("utf-8", errors="replace")
            return str(v)
        return v

    cleaned = [
        tuple(conv(m.get(f.name), f) for f in schema.fields) for m in rows
    ]
    df = s.createDataFrame(cleaned, schema)
    plan = compile_table_spec(spec, mode=mode)
    if raise_on_violation:
        bad = plan.violations(df, with_message=True).limit(20).collect()
        if bad:
            msgs = "; ".join(str(r.asDict()) for r in bad[:5])
            raise TransmuteError(
                f"{len(bad)}+ violation(s) constructing {spec.name}: {msgs}"
            )
    return plan.coerce(df)


def enforce(
    spec: TableSpec,
    mode: str = "coerce",
    spark: SparkSession | None = None,
) -> Callable:
    """Decorator (A61): transmute + validate keyword arguments against
    `spec` before calling the function; the function receives the
    COERCED values (reference binder semantics, keyword binding only —
    positional-shape specialization is CPython calling-convention sugar
    with no distributed analog)."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(**kwargs):
            out = from_rows([kwargs], spec, mode=mode, spark=spark)
            coerced = out.collect()[0].asDict()
            # spec fields the caller passed arrive coerced; kwargs outside
            # the spec pass through untouched; absent fields stay absent
            # so the function's own defaults apply
            merged = {k: coerced.get(k, v) for k, v in kwargs.items()}
            return fn(**merged)

        return wrapper

    return deco


def load_env_settings(
    spec: TableSpec,
    prefix: str = "",
    environ: Mapping[str, str] | None = None,
    mode: str = "coerce",
    spark: SparkSession | None = None,
) -> dict:
    """Typed settings from the environment (A63): each spec field reads
    `{PREFIX}{NAME}` (upper-cased) from the environment, coerces it per
    the field's declaration, validates, and returns a plain dict.
    Missing vars fall back to NULL (a NotNullCheck on the field makes
    them mandatory). Raises TransmuteError on any violation.

    Every environment value arrives as a STRING, so fields that declare
    no coercion strategy are defaulted to a plain try_cast parse
    (coerce_from='cast') — otherwise createDataFrame would reject the
    string against the declared Spark type with a TypeError instead of
    surfacing a proper `coerce` violation (reference typic/env.py
    transmutes every var through the field's deserializer the same way)."""
    from dataclasses import replace

    env = os.environ if environ is None else environ
    spec = replace(
        spec,
        fields=tuple(
            fs if fs.coerce_from is not None else replace(fs, coerce_from="cast")
            for fs in spec.fields
        ),
    )
    raw = {
        fs.name: env.get(f"{prefix}{fs.name}".upper())
        for fs in spec.fields
    }
    out = from_rows([raw], spec, mode=mode, spark=spark)
    return out.collect()[0].asDict()
