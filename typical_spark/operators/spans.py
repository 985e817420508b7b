"""Sequence-level (span) exact deduplication.

Whole-document near-dup (minhash/simhash, dedup.py) misses the other
dominant duplication mode in web corpora: repeated SPANS — boilerplate
headers/footers, license blocks, navigation text — pasted into otherwise
distinct documents. The standard counter (suffix-array / "dedup any
50-token duplicate" style) removes the repeated span, not the document.
This module is that family's scalable exact-window form: the reference's
keep-first array-dedup contract (typic/constraints/array.py:30-87)
applied at ELEMENT granularity — the corpus is an array of token
windows, and duplicates of a window keep only their first occurrence.

Spark-first shape, same discipline as dedup.py — never all-pairs:

    normalize -> token windows of span_tokens (non-overlapping,
    tail kept) -> md5(window) -> groupBy(hash) with map-side partial
    distinct-count -> join narrow span metadata back

Shuffles move only (32-byte hash, doc_id, span_idx) rows; window TEXT
never rides a shuffle except in `strip_duplicate_spans`, which rebuilds
cleaned documents and therefore must move each kept window's text once
(inherent to rewriting the corpus; the detector + stats views are the
metadata-only twins). Non-overlapping windows make reconstruction exact:
kept windows concatenated in span order ARE the cleaned normalized
document. At 100 TB the group-by key is 8-byte xxhash64 instead of md5
hex (same plan; md5 here because the contract oracle must reproduce the
grouping in another engine, exactly like dedup.exact_duplicates).

Windowing is FIXED-GRID (span boundaries at multiples of span_tokens),
so two documents sharing a span detect it only when aligned to the same
grid offset — the classic cost of grid chunking vs suffix arrays. That
is the right trade at scale (suffix arrays are superlinear memory and
resist distribution); boilerplate repeats overwhelmingly start at
document or paragraph heads, which the grid catches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from typical_spark.functions.text_analysis import _bind, split_normalized
from typical_spark.operators.dedup import _ensure_parallelism


def _span_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int,
    offset: int = 0,
) -> DataFrame:
    """(doc_id, span_idx, start_token, end_token, _span) token windows
    starting at `offset` (grid phase) and advancing by span_tokens.

    The token split is let-bound (`_bind`) so the 3-regex normalization
    runs ONCE per document, not once per window (higher-order-function
    lambdas re-evaluate captured expressions per element — the measured
    ~100x shingling trap, text_analysis.py:137-144). Empty/NULL-text
    documents yield no windows; `sequence()` is only built for n>=1
    windows (sequence(0,-1) would count DOWN). Output order columns are
    bigint so the oracle's DuckDB types line up."""
    if span_tokens <= 0:
        raise ValueError(f"span_tokens must be positive, got {span_tokens}")
    if not 0 <= offset < span_tokens:
        raise ValueError(
            f"offset must be in [0, span_tokens), got {offset}"
        )
    w = F.lit(int(span_tokens))
    off = F.lit(int(offset))

    def windows(words: Column) -> Column:
        n = F.size(words)
        n_spans = F.ceil((n - off) / w.cast("double")).cast("bigint")
        # guard BEFORE building the range: sequence(0, -1) counts DOWN
        # (a NULL/empty split must yield no windows, not window -1), and
        # split('') == [''] must not produce an empty pseudo-span that
        # would group all blank documents as duplicates of each other
        return F.when(
            (n_spans >= 1) & (F.element_at(words, 1) != ""),
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), n_spans - 1),
                lambda i: F.struct(
                    i.alias("span_idx"),
                    (off + i * w).cast("bigint").alias("start_token"),
                    F.least(off + (i + 1) * w, n.cast("bigint"))
                    .cast("bigint").alias("end_token"),
                    F.concat_ws(
                        " ",
                        F.slice(words, (off + i * w + 1).cast("int"), span_tokens),
                    ).alias("_span"),
                ),
            ),
        )

    # NULL-id documents are EXCLUDED (hash_split's NULL-id policy): the
    # keep-first rule orders groups by (doc_id, span_idx), and a NULL id
    # in a group makes the keeper comparison NULL — every member would
    # silently drop the span (kept nowhere). No identity, no membership;
    # enforce non-null ids upstream if such rows must be violations.
    base = _ensure_parallelism(df.where(F.col(id_col).isNotNull())).select(
        F.col(id_col).alias("doc_id"),
        _bind(split_normalized(F.col(text_col)), windows).alias("_ww"),
    )
    return base.select("doc_id", F.explode("_ww").alias("s")).select(
        "doc_id", "s.span_idx", "s.start_token", "s.end_token", "s._span"
    )


def span_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 10,
    min_docs: int = 2,
    n_offsets: int = 1,
) -> DataFrame:
    """Every window of every document whose text is shared by >= min_docs
    DISTINCT documents (the detector; feed its output to curation policy
    or to `strip_duplicate_spans` for the rewrite).

    Output: (doc_id, span_idx, start_token, end_token, n_docs_sharing).
    Token positions index the NORMALIZED token stream (the dedup space),
    not raw character offsets; span_idx is the window's index within its
    grid phase (rows are unique by (doc_id, start_token)).

    n_offsets: number of grid PHASES to window at (starts shifted by
    span_tokens/n_offsets each). The single-grid default only detects
    spans that two documents carry at the same alignment modulo
    span_tokens; boilerplate pasted mid-document misses the grid. Each
    extra phase costs one more full windowing pass (cost scales
    linearly, still no pair explosion — phases all land in the one
    hash-grouped table) and shrinks the maximum undetected shared run
    from 2*span_tokens-2 tokens toward span_tokens-1; suffix-array
    completeness is the n_offsets=span_tokens limit, which is exactly
    why suffix arrays don't distribute. The contract query pins the
    n_offsets=1 grid; the rewrite (`strip_duplicate_spans`) is
    single-grid by construction (overlapping phases cannot be
    re-concatenated).

    Plan: one narrow shuffle of (hash, doc_id) for the distinct-count
    (partial aggregation map-side), one equi-join of the narrow span
    table back to the >=min_docs groups — broadcastable when boilerplate
    is rare, AQE-handled when it is not. No candidate-pair explosion at
    any duplication rate: a span repeated k times contributes k rows,
    never k^2."""
    if not 1 <= n_offsets <= span_tokens:
        raise ValueError(
            f"n_offsets must be in [1, span_tokens], got {n_offsets}"
        )
    phases = sorted({p * span_tokens // n_offsets for p in range(n_offsets)})
    spans = _span_rows(df, id_col, text_col, span_tokens, offset=phases[0])
    for off in phases[1:]:
        spans = spans.unionByName(
            _span_rows(df, id_col, text_col, span_tokens, offset=off)
        )
    # the span table feeds BOTH the distinct-count and the join-back —
    # persist the NARROW keyed form (no span text, 32-byte hash) so the
    # corpus is scanned/normalized/hashed once, not once per branch
    # (same write-the-table-first discipline as dedup._shingle_sig_bands;
    # callers release via dedup.release_cache)
    keyed = spans.select(
        "doc_id", "span_idx", "start_token", "end_token",
        F.md5(F.col("_span")).alias("_h"),
    ).persist()
    groups = (
        keyed.groupBy("_h")
        .agg(F.countDistinct("doc_id").alias("n_docs_sharing"))
        .where(F.col("n_docs_sharing") >= int(min_docs))
    )
    out = keyed.join(groups, "_h").select(
        "doc_id", "span_idx", "start_token", "end_token", "n_docs_sharing"
    )
    out._owned_cache = [keyed]
    return out


def _anchored_span_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int,
    boundary: str,
) -> DataFrame:
    """(doc_id, para_idx, span_idx, start_token, end_token, _span) token
    windows anchored at PARAGRAPH/SENTENCE boundaries: the raw text is
    split on `boundary` (a regex, applied BEFORE normalization — the
    normalizer strips the very punctuation that marks boundaries), each
    segment is normalized independently, and every segment gets its own
    fixed grid starting at its head. Boilerplate pasted mid-document at
    an arbitrary global offset is detected as long as it starts at a
    boundary — the dominant real-world case — with a SINGLE windowing
    pass (the multi-phase n_offsets fallback costs one pass per phase
    and still only shrinks, not closes, the alignment hole).

    start/end_token are GLOBAL positions in the concatenated normalized
    stream (per-paragraph offsets = exclusive prefix sums of paragraph
    token counts, computed with an array aggregate — no shuffle, no
    per-doc window function); span_idx is the window's index within its
    paragraph, so rows are unique by (doc_id, start_token) and by
    (doc_id, para_idx, span_idx).

    All computed inside nested `_bind` scopes: the paragraph token
    arrays and the offset array are each evaluated once per document
    (higher-order lambdas re-evaluate captured expressions per element —
    the measured ~100x trap, text_analysis.py:137-144)."""
    if span_tokens <= 0:
        raise ValueError(f"span_tokens must be positive, got {span_tokens}")
    w = F.lit(int(span_tokens))

    def para_windows(ws: Column, base: Column, p: Column) -> Column:
        n = F.size(ws)
        n_spans = F.ceil(n / w.cast("double")).cast("bigint")
        return F.transform(
            F.sequence(F.lit(0).cast("bigint"), n_spans - 1),
            lambda i: F.struct(
                p.cast("bigint").alias("para_idx"),
                i.alias("span_idx"),
                (base + i * w).cast("bigint").alias("start_token"),
                (base + F.least((i + 1) * w, n.cast("bigint")))
                .cast("bigint").alias("end_token"),
                F.concat_ws(
                    " ", F.slice(ws, (i * w + 1).cast("int"), span_tokens)
                ).alias("_span"),
            ),
        )

    def windows(ws_all: Column) -> Column:
        # paragraph token counts (0 for empty segments: split('') == [''])
        counts = F.transform(
            ws_all,
            lambda ws: F.when(
                (F.size(ws) >= 1) & (F.element_at(ws, 1) != ""), F.size(ws)
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        # exclusive prefix sums -> each paragraph's global start offset
        offsets = F.aggregate(
            counts,
            F.struct(
                F.lit(0).cast("bigint").alias("acc"),
                F.array().cast("array<bigint>").alias("out"),
            ),
            lambda a, c: F.struct(
                (a["acc"] + c).alias("acc"),
                F.concat(a["out"], F.array(a["acc"])).alias("out"),
            ),
            lambda a: a["out"],
        )
        # filter FIRST, then flatten: flatten() of an array containing a
        # NULL element is NULL, which would silently drop every window
        # of a document with one empty trailing segment
        def build(offs: Column) -> Column:
            valid = F.filter(
                F.sequence(F.lit(0), F.size(ws_all) - 1),
                lambda p: F.element_at(counts, (p + 1).cast("int")) > 0,
            )
            return F.flatten(
                F.transform(
                    valid,
                    lambda p: para_windows(
                        F.element_at(ws_all, (p + 1).cast("int")),
                        F.element_at(offsets, (p + 1).cast("int")),
                        p,
                    ),
                )
            )

        return _bind(offsets, build)

    base = _ensure_parallelism(df.where(F.col(id_col).isNotNull())).select(
        F.col(id_col).alias("doc_id"),
        _bind(
            F.transform(
                F.split(F.col(text_col), boundary),
                lambda seg: split_normalized(seg),
            ),
            windows,
        ).alias("_ww"),
    )
    return base.select("doc_id", F.explode("_ww").alias("s")).select(
        "doc_id", "s.para_idx", "s.span_idx", "s.start_token",
        "s.end_token", "s._span",
    )


def span_duplicates_anchored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 10,
    min_docs: int = 2,
    boundary: str = r"[.!?\n]+",
) -> DataFrame:
    """Paragraph-anchored span-dedup detector: every boundary-anchored
    window shared by >= min_docs distinct documents. Same keep-first
    family contract as `span_duplicates` (reference
    typic/constraints/array.py:30-87 at corpus granularity), but windows
    align to natural text boundaries instead of a document-global grid,
    so boilerplate pasted mid-document at unaligned offsets is caught in
    one pass (the fixed grid misses it unless the paste lands on the
    grid; see the golden test in tests/test_spans.py).

    Output: (doc_id, para_idx, span_idx, start_token, end_token,
    n_docs_sharing); positions index the concatenated normalized token
    stream. Plan shape identical to span_duplicates: persist the narrow
    keyed table once, one (hash, doc_id) shuffle with map-side partial
    distinct-count, one equi-join back — no pair explosion at any
    duplication rate (k rows for a k-way-shared span, never k^2).
    Callers release the keyed cache via dedup.release_cache."""
    spans = _anchored_span_rows(df, id_col, text_col, span_tokens, boundary)
    keyed = spans.select(
        "doc_id", "para_idx", "span_idx", "start_token", "end_token",
        F.md5(F.col("_span")).alias("_h"),
    ).persist()
    groups = (
        keyed.groupBy("_h")
        .agg(F.countDistinct("doc_id").alias("n_docs_sharing"))
        .where(F.col("n_docs_sharing") >= int(min_docs))
    )
    out = keyed.join(groups, "_h").select(
        "doc_id", "para_idx", "span_idx", "start_token", "end_token",
        "n_docs_sharing",
    )
    out._owned_cache = [keyed]
    return out


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 10,
) -> DataFrame:
    """Keep-first span-level dedup rewrite: within each group of
    identical windows, only the occurrence with the smallest
    (doc_id, span_idx) survives; every other occurrence is dropped from
    its document, and the survivors are re-concatenated in span order.
    This is the reference's keep-first array-dedup semantics
    (typic/constraints/array.py:30-87) with the corpus as the array —
    the first document to use a boilerplate block keeps it, later
    documents lose it.

    Output: (doc_id, n_spans, n_dropped, clean_text), one row per
    document that produced >=1 window; clean_text is the kept windows of
    the NORMALIZED token stream joined by single spaces (empty when
    every window was dropped). min(struct(doc_id, span_idx)) gives the
    keeper per group in one map-side-combinable aggregate — no window
    sort, no quadratic membership; the only wide shuffle is the final
    per-document regroup carrying each kept window's text once."""
    spans = _span_rows(df, id_col, text_col, span_tokens)
    # persisted for the same two-branch reason as span_duplicates; this
    # variant must carry the span TEXT (reconstruction needs it), so the
    # cache is ~the normalized corpus — the price of a rewrite operator
    keyed = spans.withColumn("_h", F.md5(F.col("_span"))).persist()
    keepers = keyed.groupBy("_h").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("_keep")
    )
    flagged = keyed.join(keepers, "_h").withColumn(
        "_kept",
        (F.col("doc_id") == F.col("_keep.doc_id"))
        & (F.col("span_idx") == F.col("_keep.span_idx")),
    )
    out = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(~F.col("_kept"), 1).otherwise(0)).alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_kept"),
                                F.struct("span_idx", F.col("_span").alias("t")),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("clean_text"),
        )
        .select("doc_id", "n_spans", "n_dropped", "clean_text")
    )
    out._owned_cache = [keyed]
    return out


def strip_duplicate_spans_anchored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 10,
    boundary: str = r"[.!?\n]+",
) -> DataFrame:
    """Keep-first rewrite over BOUNDARY-ANCHORED windows: the anchored
    twin of `strip_duplicate_spans` (same reference keep-first contract,
    typic/constraints/array.py:30-87). Anchored grids partition each
    document's normalized stream exactly like the fixed grid does
    (paragraph grids are non-overlapping and paragraphs partition the
    stream), so reconstruction stays exact: kept windows concatenated
    in start_token order ARE the cleaned normalized document — but now
    a boilerplate block pasted mid-document at an unaligned offset is
    actually in the dedup space, so the rewrite removes the dominant
    real-world case the fixed grid misses (the multi-phase detector
    can only FLAG those; overlapping phases cannot be re-concatenated,
    which is why anchoring, not phases, is the strip-capable answer).

    Keep-first identity is the smallest (doc_id, start_token) in each
    window group — one map-side-combinable min(struct) aggregate, no
    window sort. Output matches strip_duplicate_spans:
    (doc_id, n_spans, n_dropped, clean_text). Same cache price: the
    keyed table carries window text (~the normalized corpus); callers
    release via dedup.release_cache."""
    spans = _anchored_span_rows(df, id_col, text_col, span_tokens, boundary)
    keyed = spans.withColumn("_h", F.md5(F.col("_span"))).persist()
    keepers = keyed.groupBy("_h").agg(
        F.min(F.struct("doc_id", "start_token")).alias("_keep")
    )
    flagged = keyed.join(keepers, "_h").withColumn(
        "_kept",
        (F.col("doc_id") == F.col("_keep.doc_id"))
        & (F.col("start_token") == F.col("_keep.start_token")),
    )
    out = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(~F.col("_kept"), 1).otherwise(0)).alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_kept"),
                                F.struct(
                                    "start_token", F.col("_span").alias("t")
                                ),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("clean_text"),
        )
        .select("doc_id", "n_spans", "n_dropped", "clean_text")
    )
    out._owned_cache = [keyed]
    return out
