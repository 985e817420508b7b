"""Declarative constraint specs — the engine's schema language.

These frozen dataclasses are the distributed analog of typical's
constraint classes (reference: typic/constraints/number.py:36-109,
text.py:12-73, array.py:92-173, common.py:472-561). A user declares a
`TableSpec` of `FieldSpec`s; `typical_spark.compiler.compile_table_spec`
turns it into a `ValidationPlan` of Catalyst expressions.

Semantics faithfully mirrored from the reference:
- nullable short-circuit: None is always valid for a nullable field
  (reference: typic/constraints/common.py:91 NULLABLES, :272-287) —
  compiled as `col.isNull() OR (pred)` so predicates stay pushable.
- text: anchored-at-start regex match (`re.match` semantics,
  reference: typic/constraints/text.py:41-42), strip_whitespace and
  curtail_length are MUTATING pre-checks (text.py:48-52) — compiled as
  projections applied before predicates.
- number: gt/ge/lt/le/multiple_of (number.py:49-95).
- enum/Literal: membership (common.py:472-561) -> `isin`.
- arrays: size bounds + unique-as-dedup (array.py:30-141).
- coercion ("transmute", reference typic/serde/des.py): declared per
  field via `coerce_from`; failures become violations in strict mode or
  nulls+violations in coerce mode (reference strict-mode analog:
  typic/strict.py:6-68).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field, replace
from typing import Sequence


@dataclass(frozen=True)
class Check:
    """Base class for per-field checks. `check_id` names the check in
    violation rows (analog of the constraint repr embedded in
    ConstraintValueError messages, reference common.py:169-173)."""

    def check_id(self) -> str:
        return type(self).__name__

    def describe(self) -> str:  # "expected" payload of a violation row
        return self.check_id()


@dataclass(frozen=True)
class NotNullCheck(Check):
    def check_id(self) -> str:
        return "not_null"

    def describe(self) -> str:
        return "value is not null"


@dataclass(frozen=True)
class NumberCheck(Check):
    """gt/ge/lt/le/multiple_of — reference typic/constraints/number.py:49-95."""

    gt: float | int | None = None
    ge: float | int | None = None
    lt: float | int | None = None
    le: float | int | None = None
    multiple_of: int | None = None

    def check_id(self) -> str:
        return "number_range"

    def describe(self) -> str:
        parts = []
        for name in ("gt", "ge", "lt", "le", "multiple_of"):
            v = getattr(self, name)
            if v is not None:
                parts.append(f"{name}={v}")
        return "number: " + ", ".join(parts)


@dataclass(frozen=True)
class TextCheck(Check):
    """Length bounds + anchored regex — reference typic/constraints/text.py.

    strip_whitespace / curtail_length are mutating transforms applied
    before validation (text.py:48-52): the compiler emits them as
    projections on the value column.
    """

    min_length: int | None = None
    max_length: int | None = None
    regex: str | None = None  # anchored at start, re.match semantics
    strip_whitespace: bool = False
    curtail_length: int | None = None

    def check_id(self) -> str:
        return "text"

    def describe(self) -> str:
        parts = []
        if self.min_length is not None:
            parts.append(f"min_length={self.min_length}")
        if self.max_length is not None:
            parts.append(f"max_length={self.max_length}")
        if self.regex is not None:
            parts.append(f"regex={self.regex!r}")
        return "text: " + ", ".join(parts)


@dataclass(frozen=True)
class EnumCheck(Check):
    """Membership in a closed value set — reference common.py:472-561
    (EnumConstraints / LiteralConstraints) -> Catalyst `isin`."""

    values: tuple = ()

    def check_id(self) -> str:
        return "enum"

    def describe(self) -> str:
        return f"one of {sorted(map(str, self.values))}"


@dataclass(frozen=True)
class TimestampRangeCheck(Check):
    """Timestamp parse + range — reference des.py:178-233 date handling
    generalized with sanity bounds for the transcript domain."""

    min_ts: dt.datetime | None = None
    max_ts: dt.datetime | None = None

    def check_id(self) -> str:
        return "ts_range"

    def describe(self) -> str:
        return f"ts in [{self.min_ts}, {self.max_ts}]"


@dataclass(frozen=True)
class ArrayCheck(Check):
    """Array size bounds / uniqueness — reference array.py:121-141.
    `unique=True` follows the reference's MUTATING semantics (dedup,
    don't reject — array.py:139-141): compiler emits array_distinct
    projection; `reject_dupes=True` instead emits a violation when
    size(array_distinct(c)) < size(c)."""

    min_items: int | None = None
    max_items: int | None = None
    unique: bool = False
    reject_dupes: bool = False

    def check_id(self) -> str:
        return "array"

    def describe(self) -> str:
        return f"array: min_items={self.min_items}, max_items={self.max_items}"


@dataclass(frozen=True)
class CustomCheck(Check):
    """User-registered check (reference: the FIFO deserializer registry,
    typic/serde/des.py:122-130 `register(des, check)`). `name` looks up a
    predicate factory registered via `register_check(name, fn)` where
    fn(Column) -> Column<boolean> is the OK-predicate (null handling is
    added by the compiler, same as built-ins)."""

    name: str = ""
    expected: str = ""

    def check_id(self) -> str:
        return f"custom_{self.name}"

    def describe(self) -> str:
        return self.expected or f"passes custom check '{self.name}'"


_CUSTOM_CHECKS: dict[str, object] = {}


def register_check(name: str, ok_predicate) -> None:
    """Register fn(Column) -> Column<boolean> under `name` (plugin
    CheckSpec registry, SURVEY.md A49)."""
    _CUSTOM_CHECKS[name] = ok_predicate


def get_custom_check(name: str):
    try:
        return _CUSTOM_CHECKS[name]
    except KeyError:
        raise KeyError(
            f"no custom check registered under {name!r}; call "
            f"register_check(name, fn) first"
        ) from None


@dataclass(frozen=True)
class DecimalCheck(Check):
    """Decimal digit constraints — reference typic/constraints/number.py:
    144-215 (max_digits / decimal_places via Decimal.as_tuple counting).
    Columnar form: a value conforms iff it survives a cast to
    DecimalType(max_digits, decimal_places) — Spark nulls on overflow,
    which is exactly the reference's whole-digits check; scale is enforced
    by the type."""

    max_digits: int = 38
    decimal_places: int = 0

    def check_id(self) -> str:
        return "decimal"

    def describe(self) -> str:
        return (
            f"decimal: max_digits={self.max_digits}, "
            f"decimal_places={self.decimal_places}"
        )


@dataclass(frozen=True)
class UnionCheck(Check):
    """Untagged union: value is valid if ANY member check accepts it —
    reference MultiConstraints (typic/constraints/common.py:312-407) /
    generic-union try-each deserialization (des.py:732-764). Compiled to
    an OR of member predicates (order irrelevant for validity, unlike the
    reference's try-order which matters only for coercion)."""

    members: tuple[Check, ...] = ()

    def check_id(self) -> str:
        return "union"

    def describe(self) -> str:
        return "any of: " + " | ".join(m.describe() for m in self.members)


# Named string formats — reference typic/types custom strings:
# Email (email.py:32-99), URL/NetworkAddress (url.py:49-80),
# uuid (des.py:263-279), ipv4 (factory.py:410-433 / ser.py:67-94).
# Patterns are fresh simplified implementations of the same formats.
STRING_FORMATS: dict[str, str] = {
    "email": r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$",
    "url": r"(?i)(?:[a-z][a-z0-9+.-]*)://(?:[^\s:@/]+(?::[^\s:@/]*)?@)?(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*|\[[0-9A-Fa-f:.]+\])(?::\d+)?(?:[/?#]\S*)?$",
    "uuid": r"(?i)[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
    "ipv4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "hostname": r"(?i)[a-z0-9](?:[a-z0-9-]{0,61}[a-z0-9])?(?:\.[a-z0-9](?:[a-z0-9-]{0,61}[a-z0-9])?)*$",
    # DSN (reference typic/types/dsn.py:72-95): scheme://[user[:pass]@]
    # host[:port][/db][?params] — fresh simplified pattern, same format.
    "dsn": r"(?i)[a-z][a-z0-9+.-]*://(?:[^\s:@/]+(?::[^\s:@/]*)?@)?(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*|\[[0-9A-Fa-f:.]+\])(?::\d{1,5})?(?:/[^\s?#]*)?(?:\?\S*)?$",
}


def discover_tag(
    cases: "dict[str, dict[str, object]]",
) -> tuple[str, dict[object, str]]:
    """Automatic tag discovery for tagged unions (A67, reference
    typic/util.py:760-819 get_tag_for_types): given each union member's
    literal field values ({member_name: {field: value, ...}}), find the
    first common field whose value is a distinct hashable literal per
    member. Returns (tag_column, {tag_value: member_name}); raises
    ValueError when no field discriminates — the caller then must pass
    TaggedCheck.tag_column explicitly (the reference falls back to
    untagged try-each the same way)."""
    if not cases:
        raise ValueError("discover_tag needs at least one union member")
    common = set.intersection(*[set(m.keys()) for m in cases.values()])
    for field in sorted(common):
        vals = {name: m[field] for name, m in cases.items()}
        if all(
            isinstance(v, (str, int, bool)) for v in vals.values()
        ) and len(set(vals.values())) == len(vals):
            return field, {v: name for name, v in vals.items()}
    raise ValueError(
        "no common field uniquely discriminates the union members; "
        "set TaggedCheck.tag_column explicitly"
    )


@dataclass(frozen=True)
class FormatCheck(Check):
    """Named string-format membership (email/url/uuid/ipv4/hostname) —
    the engine's version of the reference's constrained string types."""

    format: str = "email"

    def check_id(self) -> str:
        return f"format_{self.format}"

    def describe(self) -> str:
        return f"valid {self.format}"


@dataclass(frozen=True)
class MapCheck(Check):
    """Mapping constraints — reference typic/constraints/mapping.py:
    size bounds (:222-241), required keys (:228-235,259-267), total/closed
    mapping (:89-96), key_pattern (:159-191), all-keys/all-values checks
    (:76-86,113-121), key dependencies (:195-220). Compiled to
    map_keys/map_values/forall — no UDF."""

    min_items: int | None = None
    max_items: int | None = None
    required_keys: tuple[str, ...] = ()
    defined_keys: tuple[str, ...] = ()  # total=True: no keys outside these
    total: bool = False
    key_regex: str | None = None
    values_check: "Check | None" = None
    # key -> keys that must also be present when it is (A19)
    key_dependencies: tuple[tuple[str, tuple[str, ...]], ...] = ()

    def check_id(self) -> str:
        return "mapping"

    def describe(self) -> str:
        parts = []
        if self.min_items is not None or self.max_items is not None:
            parts.append(f"size in [{self.min_items}, {self.max_items}]")
        if self.required_keys:
            parts.append(f"required={sorted(self.required_keys)}")
        if self.total:
            parts.append(f"total over {sorted(self.defined_keys)}")
        if self.key_regex:
            parts.append(f"keys match '{self.key_regex}'")
        return "mapping: " + ", ".join(parts)


@dataclass(frozen=True)
class TaggedCheck(Check):
    """Tagged-union dispatch: which check applies to THIS column depends on
    the value of a tag column — reference tagged-union deserializer
    des.py:680-730 + get_tag_for_types util.py:760-819, compiled to a
    CASE WHEN chain on the tag. Unknown tag values optionally violate
    (reference raises on unknown tag, des.py:726-729)."""

    tag_column: str = ""
    cases: tuple[tuple[object, "Check"], ...] = ()  # (tag_value, check)
    else_check: "Check | None" = None
    unknown_tag_violates: bool = False

    def check_id(self) -> str:
        return f"tagged_{self.tag_column}"

    def describe(self) -> str:
        return (
            f"by {self.tag_column}: "
            + ", ".join(f"{v}->{c.check_id()}" for v, c in self.cases)
        )


@dataclass(frozen=True)
class ArrayElementsCheck(Check):
    """Apply a scalar check to every element of an array column (or to one
    struct field of each element) — reference array.py:144-161 item
    validation, compiled to `F.filter` higher-order functions (no UDF).
    A row violates when >=1 element fails; observed = failing-element count.
    """

    inner: Check = None  # type: ignore[assignment]
    element_field: str | None = None

    def check_id(self) -> str:
        base = self.inner.check_id() if self.inner else "?"
        fld = f".{self.element_field}" if self.element_field else ""
        return f"elements{fld}_{base}"

    def describe(self) -> str:
        return f"all elements{('.' + self.element_field) if self.element_field else ''}: {self.inner.describe()}"


@dataclass(frozen=True)
class FieldSpec:
    """One column's type + checks. The analog of a resolved annotation +
    constraints pair (reference typic/serde/resolver.py:372-510)."""

    name: str
    dtype: str = "string"  # Spark SQL type string, e.g. "int", "timestamp"
    nullable: bool = True
    checks: tuple[Check, ...] = ()
    # Coercion: source representation to try_cast / parse from. If set, the
    # compiler emits a repair projection (try_cast etc.); rows where the
    # source is non-null but the coercion yields null get a `coerce` violation
    # (the distributed transmute-failure, reference des.py + strict.py).
    coerce_from: str | None = None  # e.g. "string", "epoch", "json:<schema>"
    # Secret field (reference SecretStr, typic/types/secret.py:35-90: repr
    # masks with '*' * len, serialization still carries the value): the
    # compiler star-masks this column in every violation row's
    # observed/message text, so the raw value can never leak through the
    # diagnostics channel. Checks still evaluate against the real value.
    secret: bool = False

    def with_checks(self, *checks: Check) -> "FieldSpec":
        return replace(self, checks=self.checks + tuple(checks))


@dataclass(frozen=True)
class TableSpec:
    """A table's validation spec: per-field checks plus the key columns
    used to identify rows in violation output."""

    name: str
    fields: tuple[FieldSpec, ...] = ()
    key_columns: tuple[str, ...] = ()  # copied into every violation row

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


def transcript_spec() -> TableSpec:
    """The flagship spec: multi-turn conversation/agent transcripts
    (BASELINE.json input_hint). Checks per SURVEY.md §2 composition list."""
    return TableSpec(
        name="transcripts",
        key_columns=("conv_id", "turn_idx"),
        fields=(
            FieldSpec(
                "conv_id",
                "string",
                nullable=False,
                checks=(NotNullCheck(), TextCheck(regex=r"c[0-9]{8}$")),
            ),
            FieldSpec(
                "turn_idx",
                "int",
                nullable=False,
                checks=(NotNullCheck(), NumberCheck(ge=0)),
            ),
            FieldSpec(
                "role",
                "string",
                nullable=False,
                checks=(
                    NotNullCheck(),
                    EnumCheck(values=("system", "user", "assistant", "tool")),
                ),
            ),
            FieldSpec(
                "text",
                "string",
                nullable=True,
                checks=(TextCheck(max_length=4000),),
            ),
            FieldSpec(
                "tool",
                "string",
                nullable=True,  # Optional[ToolEnum] — union: null | enum
                checks=(
                    EnumCheck(
                        values=tuple(f"tool_{i:02d}" for i in range(12))
                    ),
                ),
            ),
            FieldSpec(
                "ts",
                "timestamp",
                nullable=False,
                checks=(
                    NotNullCheck(),
                    TimestampRangeCheck(
                        min_ts=dt.datetime(2000, 1, 1),
                        max_ts=dt.datetime(2035, 1, 1),
                    ),
                ),
            ),
        ),
    )
