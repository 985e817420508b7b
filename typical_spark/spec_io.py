"""Spec (de)serialization: TableSpec <-> JSON, so validation specs live
as versionable config instead of Python code. The inverse of the
JSON-Schema emitter: schema.py tells the WORLD what the spec means;
spec_io round-trips the spec itself (the reference's analog is resolving
annotations — a config-driven engine needs the declarative form to be
data). Round-trip is exact: spec_from_dict(spec_to_dict(s)) == s for
every check type, asserted by test.

Format: {"name": ..., "key_columns": [...], "fields": [{"name": ...,
"dtype": ..., "nullable": ..., "coerce_from": ..., "checks": [{"type":
"NumberCheck", ...fields...}]}]}. Nested checks (union members, map
value checks, tagged cases, array element checks) recurse; datetimes
are ISO strings; CustomCheck serializes by registry name (the callable
must be register_check'd in the loading process, same contract as at
compile time).
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import json

from typical_spark import specs as S

def _check_types() -> dict[str, type]:
    """Registry derived from the live Check subclass tree (recursive), so
    a check type added to specs.py — or a user-defined subclass imported
    in this process — round-trips without touching this module. A type
    must be importable at LOAD time in the loading process; encode never
    writes a name decode can't resolve in the same environment."""
    out: dict[str, type] = {}
    stack = list(S.Check.__subclasses__())
    while stack:
        cls = stack.pop()
        out[cls.__name__] = cls
        stack.extend(cls.__subclasses__())
    return out


def _enc(v):
    if isinstance(v, S.Check):
        return check_to_dict(v)
    if isinstance(v, dt.datetime):
        return {"$dt": v.isoformat()}
    if isinstance(v, tuple):
        return [_enc(x) for x in v]
    return v


def _dec(v):
    if isinstance(v, dict):
        if "$dt" in v:
            return dt.datetime.fromisoformat(v["$dt"])
        return check_from_dict(v)
    if isinstance(v, list):
        return tuple(_dec(x) for x in v)
    return v


def check_to_dict(chk: S.Check) -> dict:
    return {
        "type": type(chk).__name__,
        **{
            f.name: _enc(getattr(chk, f.name))
            for f in dataclasses.fields(chk)
        },
    }


def check_from_dict(d: dict) -> S.Check:
    d = dict(d)
    tname = d.pop("type")
    types = _check_types()
    if tname not in types:
        raise ValueError(
            f"unknown check type {tname!r}: import the module defining it "
            "before loading the spec"
        )
    return types[tname](**{k: _dec(v) for k, v in d.items()})


def spec_to_dict(spec: S.TableSpec) -> dict:
    return {
        "name": spec.name,
        "key_columns": list(spec.key_columns),
        "fields": [
            {
                "name": fs.name,
                "dtype": fs.dtype,
                "nullable": fs.nullable,
                "coerce_from": fs.coerce_from,
                "secret": fs.secret,
                "checks": [check_to_dict(c) for c in fs.checks],
            }
            for fs in spec.fields
        ],
    }


def spec_from_dict(d: dict) -> S.TableSpec:
    return S.TableSpec(
        name=d["name"],
        key_columns=tuple(d.get("key_columns", ())),
        fields=tuple(
            S.FieldSpec(
                name=f["name"],
                dtype=f.get("dtype", "string"),
                nullable=f.get("nullable", True),
                coerce_from=f.get("coerce_from"),
                secret=f.get("secret", False),
                checks=tuple(check_from_dict(c) for c in f.get("checks", ())),
            )
            for f in d.get("fields", ())
        ),
    )


def spec_to_json(spec: S.TableSpec, **kw) -> str:
    return json.dumps(spec_to_dict(spec), sort_keys=True, **kw)


def spec_from_json(s: str) -> S.TableSpec:
    return spec_from_dict(json.loads(s))


def spec_from_json_file(path: str) -> S.TableSpec:
    """Load a TableSpec from a JSON file — the cluster-job entry for
    config-file-driven validation (jobs/*.py --spec), the distributed
    analog of the reference resolving a user-supplied annotation at the
    call site (typic/api.py:112)."""
    with open(path, encoding="utf-8") as fh:
        return spec_from_json(fh.read())
