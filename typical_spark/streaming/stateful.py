"""Custom stateful streaming operator: per-conversation ordering checks
with cross-microbatch state (applyInPandasWithState).

Contract: batch-identical results per conversation, independent of
arrival order. A conversation's turns BUFFER in state until its session
closes (event-time timeout: no new turns before the watermark passes its
last activity + session_gap); at close the buffered turns are sorted in
data order ((turn_idx, ts) — the batch operator's sort) and checked in
one pass. This is the session-window pattern: incremental checking
against a running max cannot work here because the anomalous timestamps
being *detected* would themselves reorder incremental finalization.

State per conversation = its turn buffer (two parallel arrays, ~12
bytes/turn). Bounded by conversation length, not stream length; state
for closed conversations is removed at flush. Callers should bound event
time first (absurd future timestamps are a row-level ts_range violation
AND would yank the global watermark forward — standard practice is to
filter them before any watermarked operator).

Arrow-batched grouped kernel; no per-row Python outside it.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "conv_id string, turn_idx int, check_id string, observed string, "
    "expected string"
)
STATE_SCHEMA = "pend_turn array<int>, pend_ts array<double>, last_seen double"

SESSION_GAP_S = 1.0  # flush when watermark passes last activity + gap


def _check_conversation(conv_id, turns):
    """Batch-identical transition checks over the full, data-ordered
    conversation (mirrors operators/ordering.py semantics)."""
    rows = []
    max_turn, max_ts = None, None
    ordered = sorted(
        turns, key=lambda p: (p[0], p[1] if p[1] is not None else float("-inf"))
    )
    prev_turn, prev_ts = None, None
    for turn_idx, ts_s in ordered:
        if prev_turn is not None:
            d = turn_idx - prev_turn
            if d == 0:
                rows.append((conv_id, turn_idx, "order_duplicate",
                             str(turn_idx), f"!= prev {prev_turn}"))
            elif d > 1:
                rows.append((conv_id, turn_idx, "order_gap",
                             str(turn_idx), f"prev + 1 = {prev_turn + 1}"))
            if (
                ts_s is not None and prev_ts is not None
                and d > 0 and ts_s < prev_ts
            ):
                rows.append((conv_id, turn_idx, "ts_out_of_order",
                             str(ts_s), ">= prev ts"))
        prev_turn, prev_ts = turn_idx, ts_s
    return rows


def _check_group(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    conv_id = key[0]
    if state.exists:
        pend_turn, pend_ts, last_seen = state.get
        pending = list(zip(pend_turn, pend_ts))
    else:
        pending, last_seen = [], 0.0

    if state.hasTimedOut:
        state.remove()
        rows = _check_conversation(conv_id, pending)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "check_id", "observed", "expected"],
            )
        return

    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            ts_s = r.ts.timestamp() if pd.notna(r.ts) else None
            pending.append((int(r.turn_idx), ts_s))
            if ts_s is not None and ts_s > last_seen:
                last_seen = ts_s

    wm_s = state.getCurrentWatermarkMs() / 1000.0
    state.update((
        [p[0] for p in pending],
        [p[1] for p in pending],
        last_seen,
    ))
    state.setTimeoutTimestamp(
        int((max(last_seen, wm_s) + SESSION_GAP_S) * 1000)
    )
    return


def stateful_ordering_violations(
    stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-conversation ordering violations, arrival-order
    independent (see module docstring). Violations for a conversation
    emit when its session closes (watermark passes last activity)."""
    return (
        stream.withWatermark("ts", watermark)
        .select("conv_id", "turn_idx", "ts")
        .where(F.col("conv_id").isNotNull())
        .groupBy("conv_id")
        .applyInPandasWithState(
            _check_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
