"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure Catalyst expressions except the rolling
hash (Arrow-vectorized pandas UDF) — designed to run over billions of
documents without Python in the hot path.

Each helper returns Columns so callers compose them into one projection
(single pass over the text, whole-stage codegen)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deliberately small, deterministic stopword lists (public knowledge)
STOPWORDS_EN = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
)
_PUNCT = ".,;:!?'\"()[]{}"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def whitespace_token_count(col) -> Column:
    """Tokens by whitespace runs (0 for empty/blank text)."""
    t = F.trim(_c(col))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish count: runs of letters, digits, or single punctuation
    (a cheap stand-in for BPE token counts; deterministic regex)."""
    arr = F.split(_c(col), r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(arr, lambda s: (s != "") & (s != " ")))


def char_count(col, ch: str) -> Column:
    """Occurrences of a single character (replace-based; engine-agnostic)."""
    c = _c(col)
    return F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit("")))


def punct_ratio(col) -> Column:
    c = _c(col)
    total = sum([char_count(c, ch) for ch in _PUNCT], F.lit(0))
    return total / F.greatest(F.length(c), F.lit(1))


def _words(col) -> Column:
    """Whitespace tokenization of the trimmed text (the shared subtree)."""
    return F.split(F.trim(_c(col)), r"\s+")


def _words_lower(col) -> Column:
    return F.split(F.lower(F.trim(_c(col))), r"\s+")


def _stopword_count_w(words: Column, stopwords=STOPWORDS_EN) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def stopword_count(col, stopwords=STOPWORDS_EN) -> Column:
    return _stopword_count_w(_words_lower(col), stopwords)


def _ws_token_count_w(col, words: Column) -> Column:
    return F.when(F.trim(_c(col)) == "", 0).otherwise(F.size(words))


def _stopword_ratio_w(col, words: Column, words_lower: Column,
                      stopwords=STOPWORDS_EN) -> Column:
    return _stopword_count_w(words_lower, stopwords) / F.greatest(
        _ws_token_count_w(col, words), F.lit(1)
    )


def stopword_ratio(col, stopwords=STOPWORDS_EN) -> Column:
    return _stopword_ratio_w(col, _words(col), _words_lower(col), stopwords)


def _mean_word_length_w(words: Column) -> Column:
    total = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return total / F.greatest(F.size(words), F.lit(1))


def mean_word_length(col) -> Column:
    return _mean_word_length_w(_words(col))


def _quality_score_w(col, words: Column, words_lower: Column) -> Column:
    c = _c(col)
    len_ok = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    stop_ok = F.least(
        _stopword_ratio_w(c, words, words_lower) * 5.0, F.lit(1.0)
    )
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    wl = _mean_word_length_w(words)
    wl_ok = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.3)
    return (len_ok + stop_ok + punct_ok + wl_ok) / 4.0


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: long enough, some stopwords,
    sane punctuation, sane word lengths. Deterministic, monotone pieces.

    As a single inline expression this re-splits the text per consumer
    (the HOFs are CodegenFallback, no CSE); scan-heavy callers use
    :func:`document_stats`, which hoists the tokenizations."""
    return _quality_score_w(col, _words(col), _words_lower(col))


# --- language identification ---------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "that"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
}


def _lang_id_w(words_lower: Column) -> Column:
    scores = {
        lang: F.size(F.filter(words_lower, lambda w: w.isin(*marks)))
        for lang, marks in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse order => earlier languages win ties
    for lang in reversed(list(scores)):
        out = F.when((best > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def lang_id(col) -> Column:
    """Marker-word heuristic language ID ('und' when nothing matches).

    The real-world version would use fasttext/cld3 via a pandas UDF; the
    marker heuristic keeps it engine-mirrorable and dependency-free."""
    return _lang_id_w(_words_lower(col))


# --- fingerprinting -------------------------------------------------------------


def normalized_text(col) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def fingerprint_md5(col) -> Column:
    """Normalized-content digest (exact-dup key after normalization)."""
    return F.md5(normalized_text(col))


POLY_BASES = (1000003, 999983)  # two independent 31-bit streams
POLY_MOD = (1 << 31) - 1  # Mersenne-31: byte*power products fit in uint64

_POW_CACHE: dict[int, np.ndarray] = {}


def _pows(base: int, n: int) -> np.ndarray:
    """base^0..base^(n-1) mod M31 (cached, grown geometrically). The only
    loop is over the power table — amortized O(1) per hashed byte."""
    cur = _POW_CACHE.get(base)
    if cur is None or len(cur) < n:
        size = max(n, 1024, 0 if cur is None else 2 * len(cur))
        out = np.empty(size, dtype=np.uint64)
        out[0] = 1
        acc = 1
        for i in range(1, size):
            acc = (acc * base) % POLY_MOD
            out[i] = acc
        _POW_CACHE[base] = cur = out
    return cur[:n]


def _poly_hash(b: np.ndarray, base: int) -> int:
    """sum(b[i] * base^(n-1-i)) mod M31, fully vectorized: products are
    < 2^39 so partial sums of up to 2^24 terms stay below 2^63 — fold a
    mod in per chunk, no per-byte Python."""
    n = len(b)
    pows = _pows(base, n)[::-1]
    acc = np.uint64(0)
    chunk = 1 << 24
    for s in range(0, n, chunk):
        # powers encode the absolute position, so chunk sums just add
        part = (b[s:s + chunk].astype(np.uint64) * pows[s:s + chunk]).sum()
        acc = (acc + part) % np.uint64(POLY_MOD)
    return int(acc)


def rolling_hash_udf():
    """Polynomial rolling hash of the text bytes (order-sensitive 62-bit
    fingerprint): two independent 31-bit Horner streams packed as
    h1 * 2^31 + h2. numpy-vectorized — one multiply + sum per row over
    precomputed base powers; no per-byte Python loop."""

    @F.pandas_udf(T.LongType())
    def _roll(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            h1 = _poly_hash(b, POLY_BASES[0])
            h2 = _poly_hash(b, POLY_BASES[1])
            out[i] = (h1 << 31) | h2
        return pd.Series(out)

    return _roll


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection of all text statistics.

    The two whitespace tokenizations (cased for word lengths, lowered
    for stopwords/lang markers) are hoisted into their own projection:
    the consuming HOFs are CodegenFallback and interpreted Catalyst does
    not CSE the repeated split subtrees, so the inline form re-split the
    text up to 5x per row (same defect class as the round-5 minhash fix;
    measured 1.15x on the sf0.1 corpus scan, checksum-identical)."""
    c = F.col(text_col)
    pre = df.select(
        "doc_id",
        c,
        _words(c).alias("_w"),
        _words_lower(c).alias("_wl"),
    )
    w, wl = F.col("_w"), F.col("_wl")
    return pre.select(
        "doc_id",
        F.length(c).alias("n_chars_computed"),
        _ws_token_count_w(c, w).alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        punct_ratio(c).alias("punct_ratio"),
        _stopword_ratio_w(c, w, wl).alias("stopword_ratio"),
        _quality_score_w(c, w, wl).alias("quality"),
        _lang_id_w(wl).alias("lang_pred"),
        fingerprint_md5(c).alias("fingerprint"),
    )
