"""Text-analysis kernels for training-data curation over `documents`.

All pure Catalyst expressions (whole-stage codegen, zero Python in the
hot path): token counting, quality scoring, language-ID heuristic, and
shingle/fingerprint primitives shared with the dedup operators.

These have no reference analog (typical validates structure, not
content); they are the "operations a large-scale training-data pipeline
needs" component of the brief, built in the same columnar style as the
check kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank, NULL for NULL)."""
    t = F.trim(col)
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
    )


# BPE-ish: words, numbers, or single non-space symbols — approximates a
# subword tokenizer's pre-tokenization split (GPT-2 style regex, simplified
# to Java regex syntax).
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col: Column) -> Column:
    return F.coalesce(F.regexp_count(col, F.lit(_BPE_RE)), F.lit(0))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS_EN = (
    "the of and a to in is it you that he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if"
).split()


def quality_signals(col: Column) -> dict[str, Column]:
    """Raw quality signals; each is a separate Column so callers project
    only what they need (column pruning stays effective)."""
    n_chars = F.length(col)
    n_tokens = token_count_ws(col)
    n_alpha = F.coalesce(F.regexp_count(col, F.lit(r"[A-Za-z]")), F.lit(0))
    n_punct = F.coalesce(
        F.regexp_count(col, F.lit(r"[\.,;:!\?\(\)\[\]\{\}'\"]")), F.lit(0)
    )
    stop_re = r"(?i)\b(" + "|".join(_STOPWORDS_EN) + r")\b"
    n_stop = F.coalesce(F.regexp_count(col, F.lit(stop_re)), F.lit(0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": (n_alpha / F.greatest(n_chars, F.lit(1))).cast("double"),
        "punct_ratio": (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"),
        "stopword_ratio": (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double"),
        "mean_token_len": (
            (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1))
        ).cast("double"),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough length, mostly alphabetic,
    sane punctuation density, some stopwords (C4-style filters folded into
    one score)."""
    s = quality_signals(col)
    len_ok = F.least(s["n_tokens"] / F.lit(20.0), F.lit(1.0))
    alpha_ok = s["alpha_ratio"]
    punct_ok = F.lit(1.0) - F.least(s["punct_ratio"] * 5.0, F.lit(1.0))
    stop_ok = F.least(s["stopword_ratio"] * 4.0, F.lit(1.0))
    return ((len_ok + alpha_ok + punct_ok + stop_ok) / 4.0).cast("double")


# ---------------------------------------------------------------------------
# language ID (n-gram / stopword-profile heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to", "you", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "vous"],
    "es": ["el", "los", "que", "es", "por", "una", "para", "con"],
}


def lang_scores(col: Column) -> dict[str, Column]:
    out = {}
    for lang, words in _LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        out[lang] = F.coalesce(F.regexp_count(col, F.lit(pat)), F.lit(0))
    return out


def lang_id(col: Column) -> Column:
    """Best-scoring language, 'und' (undetermined) when nothing matches.
    Ties break by fixed language order (en, de, fr, es) — deterministic."""
    scores = lang_scores(col)
    n_tokens = token_count_ws(col)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in _LANG_MARKERS:  # fixed order: first-wins on ties
        s = scores[lang]
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return F.when(n_tokens > 0, best).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# shingles & fingerprints (shared with dedup operators)
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip non-alphanumerics (standard near-dup normalization)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# PERFORMANCE NOTE: an expression referenced inside a higher-order
# function's lambda is RE-EVALUATED per element (no common-subexpression
# elimination through lambda scopes). Shingling over `slice(split(
# normalize(text)), i, k)` therefore re-ran 3 regex passes per shingle
# index — ~100x slowdown, measured. The *_from variants take an already-
# bound words/string column (one projection hop); the convenience
# wrappers nest the bind inside a single-element transform so the parse
# happens once per row.


def _bind(col: Column, fn):
    """Evaluate `col` once per row, then apply fn to the bound value
    (transform over a 1-element array scopes the evaluation)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def char_shingles_from(norm: Column, k: int = 5) -> Column:
    """k-char shingles of an ALREADY-normalized string column (distinct)."""
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def char_shingles(col: Column, k: int = 5) -> Column:
    """Array of k-character shingles of the normalized text (distinct)."""
    return _bind(normalize_text(col), lambda norm: char_shingles_from(norm, k))


def word_shingles_from(words: Column, k: int = 3) -> Column:
    """k-word shingles of an ALREADY-split words array column (distinct)."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def split_normalized(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def word_shingles(col: Column, k: int = 3) -> Column:
    """Array of k-word shingles (distinct)."""
    return _bind(split_normalized(col), lambda w: word_shingles_from(w, k))


def doc_fingerprint(col: Column, k: int = 5) -> Column:
    """64-bit winnowing-style document fingerprint: min of hashed k-gram
    shingles of the normalized text (documents sharing it are near-identical
    up to normalization; rolling-hash analog done set-wise)."""
    sh = char_shingles(col, k)
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))


# ---------------------------------------------------------------------------
# repetition signals (C4/Gopher-style repetitious-text filters)
# ---------------------------------------------------------------------------


def word_ngrams_from(words: Column, n: int = 3) -> Column:
    """n-gram MULTISET of an already-split words array (duplicates kept —
    the repetition signal lives in the duplicates; `word_shingles_from`
    is the distinct variant used for Jaccard).

    Documents shorter than n words contribute their whole text as one
    short gram (same deliberate choice as word_shingles_from: short
    exact-duplicates must still collide in dedup; consumers needing
    strict-length grams filter `size(split) >= n` upstream)."""
    size = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(size - n, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))


def repetition_signals(col: Column, n: int = 3) -> dict[str, Column]:
    """Repetitious-text measures over the normalized token stream:
    dup_ngram_ratio = 1 - distinct/total n-grams (0 = all fresh, ->1 =
    loops of boilerplate), top_word_ratio = frequency of the most common
    token. Pure Catalyst expressions; the standard filters that drop
    looping/spammy documents from training corpora."""
    words = split_normalized(col)
    grams = _bind(words, lambda w: word_ngrams_from(w, n))
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))

    # max token frequency in O(n log n): sort, then one run-length pass
    # (a nested distinct x filter scan would be O(distinct * total) per
    # row — quadratic on long web documents)
    def _longest_run(w):
        sw = F.sort_array(w)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc, x):
            new_run = F.when(
                acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
            ).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                new_run.alias("run"),
                F.greatest(acc["best"], new_run).alias("best"),
            )

        return F.aggregate(sw, init, step, lambda acc: acc["best"])

    top_ratio = (
        _bind(words, _longest_run) / F.greatest(F.size(words), F.lit(1))
    ).cast("double")
    return {
        "n_ngrams": n_grams,
        "dup_ngram_ratio": (
            (n_grams - n_distinct) / F.greatest(n_grams, F.lit(1))
        ).cast("double"),
        "top_word_ratio": top_ratio,
    }


# ---------------------------------------------------------------------------
# PII redaction (training-corpus scrubbing)
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB
# oracle): no lookarounds, no backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_counts(col: Column) -> dict[str, Column]:
    return {
        name: F.coalesce(F.regexp_count(col, F.lit(pat)), F.lit(0))
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder (<EMAIL> etc.).
    Order matters: emails first, so user@host never half-matches as a
    hostname-ish IP later."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


# ---------------------------------------------------------------------------
# corpus-level term weighting
# ---------------------------------------------------------------------------


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn convention: idf = ln((1+N)/(1+df)) + 1) over the corpus
    tokenization shared with the vocabulary stats (normalize_text +
    whitespace split, empty tokens dropped).

    No reference analog (typical has no corpus statistics) — this is
    training-data-pipeline surface: keyword extraction / topic drift /
    boilerplate spotting all start from per-doc characteristic terms.

    Scale shape: two hash-aggregation shuffles (doc-term counts, then
    document frequency over the already-unique (doc, term) rows — both
    map-side combined), one scalar count job for N, one equi-join of tf
    with the vocab-sized idf table (AQE broadcasts it when small), and a
    per-document window bounded by each document's distinct-term count.
    Nothing is quadratic in corpus size; the doc-term table is
    localCheckpoint'd once and shared by the N-count and the join.

    Determinism: ranking orders by the 4-dp-ROUNDED score then token, so
    the emitted top-k is reproducible bit-for-bit across engines (raw
    double ordering could flip mathematically-tied scores computed via
    different ln() code paths).

    Output: (id_col, token, tf, df, score, rank), rank 1..k.
    """
    from pyspark.sql import Window

    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("_t"),
        )
        .where(F.col("_t") != "")
    )
    tf = (
        toks.groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    n_docs = tf.select(id_col).distinct().count()
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "_t").select(
        F.col(id_col),
        F.col("_t").alias("token"),
        "tf",
        "df",
        F.round(
            F.col("tf")
            * (F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + 1.0),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


def bigram_logprob_score(df, id_col: str, text_col: str, k: float = 0.5):
    """Per-document add-k-smoothed bigram language-model score — the
    CCNet/Gopher-style LM quality filter: documents whose token
    transitions are unlike the corpus (gibberish, boilerplate soup,
    wrong-language fragments) get low average log-probability / high
    perplexity.

    Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1.) + k*V), context counts
    c(w1.) folded from the bigram counts themselves (one less corpus
    scan) and V = distinct token count of the filtered stream. Score =
    mean log P over the document's bigrams; ppl = exp(-score).

    No reference analog — training-data-pipeline surface. Scale shape:
    tokens never leave the JVM (HOF split/filter); bigram counting is
    one map-side-combined groupBy; context counts fold the (already
    distinct) bigram table; scoring joins each document's bigrams to
    the count tables on (w1,w2) — AQE broadcasts small vocabularies
    and skew-splits hot bigrams. At open-web scale, train the counts
    on a hash_sample of the corpus (standard CCNet practice) and score
    the full corpus with the same joins; counts grow with distinct
    bigrams, not corpus size. Documents with <2 tokens produce no
    bigrams and are absent from the output (no defined score).

    Determinism: avg log-prob is double-rounded (6dp then 4dp) before
    ppl = exp(-avg) is computed FROM THE ROUNDED value and rounded the
    same way, so both engines exponentiate identical inputs.

    Output: (id_col, n_bigrams, avg_logprob, ppl).
    """
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
    )
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("_t"))
        .localCheckpoint()
    )
    # sequence(1, n-1) DESCENDS when n-1 < 1 — guard short docs to an
    # empty pair list (explode then drops them)
    pairs = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - 1),
            lambda i: F.struct(
                F.element_at("_t", i).alias("w1"),
                F.element_at("_t", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = base.select(
        F.col(id_col), F.explode(pairs).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    cnt_b = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cnt_u = cnt_b.groupBy("w1").agg(F.sum("cb").alias("cw"))
    vocab = base.select(F.explode("_t").alias("w")).distinct().count()
    kk = F.lit(float(k))
    logp = F.log(
        (F.col("cb") + kk) / (F.col("cw") + kk * F.lit(float(vocab)))
    )
    scored = (
        bg.join(cnt_b, ["w1", "w2"])
        .join(cnt_u, ["w1"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.round(F.avg(logp), 6), 4).alias("avg_logprob"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "avg_logprob",
        F.round(F.round(F.exp(-F.col("avg_logprob")), 6), 4).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# unicode normalization (the one text kernel Catalyst cannot express)
# ---------------------------------------------------------------------------


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF — the
    engine's documented escape hatch (SURVEY Table B, UDF row): Spark
    has no canonical-composition expression, so this is a genuine
    cannot-express-in-Catalyst kernel, batched through Arrow (never
    row-at-a-time `udf()`). Web text mixes composed and decomposed
    forms of the same grapheme ('e'+U+0301 vs 'é'); dedup hashes,
    shingles, and tokenizers all disagree on un-normalized input, so
    NFC-at-ingest is standard corpus hygiene. Cross-engine exact:
    CPython's unicodedata and DuckDB's nfc_normalize implement the same
    Unicode canonical composition (oracle-checked)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # explicit annotations (not PEP-563 strings: this module has
    # `from __future__ import annotations`, under which pandas_udf's
    # hint inference cannot resolve 'pd.Series' from a local import)
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")(col)
