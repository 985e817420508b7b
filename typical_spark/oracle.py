"""Single-node reference implementation (pandas) of the transcript checks.

This is the engine's in-repo stand-in for running `typic.validate` row by
row (reference semantics: typic/constraints/common.py validate loop): a
straightforward, unoptimized, per-rule pandas implementation whose output
the distributed engine must match exactly — per-turn text equality under
stable ordering (sort by conv_id, turn_idx), per BASELINE.json input_hint.

Deliberately simple and independent of the Spark code paths: no shared
expression logic, so a bug in the compiler cannot hide in the oracle.
"""

from __future__ import annotations

import re

import pandas as pd

ROLE_VALUES = ("system", "user", "assistant", "tool")
TOOL_VALUES = tuple(f"tool_{i:02d}" for i in range(12))
CONV_RE = re.compile(r"^c[0-9]{8}$")
TS_MIN = pd.Timestamp("2000-01-01")
TS_MAX = pd.Timestamp("2035-01-01")
TEXT_MAX = 4000


def transcript_violations(pdf: pd.DataFrame) -> pd.DataFrame:
    """Row-level violations, one row per (row, failed check), matching the
    engine's schema: conv_id, turn_idx, column, check_id, observed, expected."""
    out: list[dict] = []

    def emit(row, column, check_id, observed, expected):
        out.append(
            dict(
                conv_id=row.conv_id,
                turn_idx=row.turn_idx,
                column=column,
                check_id=check_id,
                observed=None if observed is None else str(observed),
                expected=expected,
            )
        )

    for row in pdf.itertuples(index=False):
        if row.conv_id is None:
            emit(row, "conv_id", "not_null", None, "value is not null")
        elif not CONV_RE.match(row.conv_id):
            emit(row, "conv_id", "text_regex", row.conv_id, "matches '^c[0-9]{8}$'")
        if row.turn_idx is None:
            emit(row, "turn_idx", "not_null", None, "value is not null")
        elif row.turn_idx < 0:
            emit(row, "turn_idx", "number_range", row.turn_idx, "number: ge=0")
        if row.role is None:
            emit(row, "role", "not_null", None, "value is not null")
        elif row.role not in ROLE_VALUES:
            emit(row, "role", "enum", row.role,
                 f"one of {sorted(ROLE_VALUES)}")
        if row.text is not None and len(row.text) > TEXT_MAX:
            emit(row, "text", "text_length", len(row.text),
                 f"0 <= length <= {TEXT_MAX}")
        if row.tool is not None and row.tool not in TOOL_VALUES:
            emit(row, "tool", "enum", row.tool, f"one of {sorted(TOOL_VALUES)}")
        ts = row.ts
        if ts is None or pd.isna(ts):
            emit(row, "ts", "not_null", None, "value is not null")
        elif not (TS_MIN <= ts < TS_MAX):
            emit(row, "ts", "ts_range", ts, f"ts in [{TS_MIN}, {TS_MAX}]")
    cols = ["conv_id", "turn_idx", "column", "check_id", "observed", "expected"]
    return pd.DataFrame(out, columns=cols)


def duplicate_rows_ref(pdf: pd.DataFrame, keys, order_by) -> pd.DataFrame:
    """Keep-first dedup reference: rows beyond the first per key."""
    s = pdf.sort_values(list(order_by), kind="mergesort")  # stable
    ranked = s.assign(dup_rank=s.groupby(list(keys), dropna=False).cumcount() + 1)
    return ranked[ranked["dup_rank"] > 1]


def ordering_violations_ref(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-conv ordering reference over (conv_id, turn_idx, ts)."""
    out = []
    s = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    for conv_id, g in s.groupby("conv_id", dropna=True):
        prev_o, prev_ts = None, None
        for row in g.itertuples(index=False):
            if prev_o is not None:
                d = row.turn_idx - prev_o
                if d == 0:
                    out.append((conv_id, row.turn_idx, "order_duplicate"))
                elif d > 1:
                    out.append((conv_id, row.turn_idx, "order_gap"))
                if (
                    prev_ts is not None
                    and row.ts is not None
                    and not pd.isna(row.ts)
                    and row.ts < prev_ts
                    and d > 0
                ):
                    out.append((conv_id, row.turn_idx, "ts_out_of_order"))
            prev_o, prev_ts = row.turn_idx, row.ts
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "check_id"])
