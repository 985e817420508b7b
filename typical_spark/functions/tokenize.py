"""Pluggable token-length seam for sequence budgets.

`pack_sequences` / `chunk_spans` (operators/packing.py) budget in
TOKENS, but which tokens is a policy decision: whitespace words are
cheap and engine-native (JVM codegen, oracle-reproducible), while a
real pretraining pipeline budgets in BPE tokens from the model's actual
tokenizer. This module is the seam between the two:

- ``token_count_column(col)`` — the default: whitespace counting, a
  pure Catalyst expression (identical to text_analysis.token_count_ws),
  zero Python in the hot path. This is what every contract oracle pins.
- ``token_count_column(col, tokenizer=fn)`` — an Arrow-batched escape
  hatch: `fn` maps a pandas Series of strings to an int64 Series of
  token counts and runs inside a `pandas_udf` (vectorized batch
  transfer; never row-at-a-time). Plug `tiktoken`/`tokenizers` here in
  production — e.g. ``lambda s: s.map(lambda t: len(enc.encode(t)))``.
- ``stub_bpe_token_count`` — the deterministic sandbox stand-in for a
  BPE tokenizer (no tokenizer libs in this container): a GPT-2-style
  pre-tokenizer regex splits the text into word/number/punctuation
  pieces, and each piece costs ceil(len/4) subword tokens (the ~4
  chars/token heuristic). Deterministic, order-independent, and
  intentionally DIFFERENT from whitespace counts so tests can verify
  the seam actually changes budgets.

No reference analog (the reference is not a text engine); this is the
Table-C tokenizer-faithful-budgets gap named by the round-4 verdict.
"""

from __future__ import annotations

import math
import re
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from typical_spark.functions.text_analysis import token_count_ws

# GPT-2-style pre-tokenization (ASCII subset — the stdlib `re` has no
# \p{L}): leading-space word / number / punctuation-run / whitespace-run
_PRETOKEN = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")


def _stub_bpe_count_one(text: str) -> int:
    n = 0
    for piece in _PRETOKEN.findall(text):
        piece = piece.strip()
        if piece:
            n += max(1, math.ceil(len(piece) / 4))
    return n


def stub_bpe_token_count(texts: pd.Series) -> pd.Series:
    """Deterministic BPE-ish batch counter (see module docstring).
    NULLs stay NULL; empty/blank strings count 0."""
    return texts.map(
        lambda t: None if t is None else _stub_bpe_count_one(t),
        na_action="ignore",
    ).astype("Int64")


def token_count_column(
    col: Column,
    tokenizer: Callable[[pd.Series], pd.Series] | None = None,
) -> Column:
    """Token-count expression over a text column.

    tokenizer=None (default) -> whitespace counting as a pure Catalyst
    expression — stays inside whole-stage codegen, and is the exact
    count every green packing/chunking oracle reproduces in DuckDB.

    tokenizer=<callable> -> the callable is wrapped in an Arrow-batched
    `pandas_udf` (bigint). It must be deterministic and map a pandas
    Series[str] (NULLs possible) to integer counts."""
    if tokenizer is None:
        return token_count_ws(col).cast("bigint")

    @pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        return tokenizer(texts).astype("Int64")

    return _count(col)
