"""Structural translation between schemas — the distributed analog of
typical's translate/iterate protocol (reference typic/serde/
translator.py:146-291: source fields -> target ctor args with a
required-field subset check; resolver.py:155-176 iterate).

`translate` = select + rename + nested restructuring between two specs;
`iterate` = row explode into (field, value) pairs. Both pure projections
(no shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from typical_spark.specs import TableSpec


class TranslationError(ValueError):
    """Target requires fields the source cannot supply (reference
    translator.py:256-268 raises on missing required fields)."""


def translate(
    df: DataFrame,
    target: TableSpec,
    field_map: dict[str, str] | None = None,
    defaults: dict[str, object] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Reshape df's columns into the target spec's top-level fields.

    field_map: target field -> source column (the reference's fields_in);
    unmapped target fields take the same-named source column, then a
    default, else (strict) raise / (lenient) NULL.
    """
    field_map = dict(field_map or {})
    defaults = dict(defaults or {})
    cols = []
    available = set(df.columns)
    for fs in target.fields:
        if "." in fs.name:
            continue  # nested fields come from their root struct mapping
        castable = "..." not in fs.dtype  # "..." = schema placeholder
        src = field_map.get(fs.name, fs.name)
        if src in available:
            c = F.col(src)
            cols.append((c.try_cast(fs.dtype) if castable else c).alias(fs.name))
        elif fs.name in defaults:
            cols.append(F.lit(defaults[fs.name]).cast(fs.dtype).alias(fs.name))
        elif fs.nullable:
            dtype = fs.dtype if castable else "string"
            cols.append(F.lit(None).cast(dtype).alias(fs.name))
        elif strict:
            raise TranslationError(
                f"target field '{fs.name}' is required but has no source "
                f"column, mapping, or default"
            )
        else:
            cols.append(F.lit(None).alias(fs.name))
    return df.select(*cols)


def iterate(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Row -> (field, value) pairs, values stringified (the reference's
    iterate yields (name, value) tuples; resolver.py:155-176)."""
    columns = columns or df.columns
    pairs = F.array(*[
        F.struct(F.lit(c).alias("field"), F.col(c).cast("string").alias("value"))
        for c in columns
    ])
    return df.select(F.explode(pairs).alias("kv")).select("kv.field", "kv.value")
