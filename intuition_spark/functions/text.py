"""Text-analysis operators for large-scale training-data pipelines.

All built-in-first: language ID, quality scoring, token counting and document
fingerprinting are pure `pyspark.sql.functions` column expressions wherever
possible (JVM-side, whole-stage codegen); only the rolling-hash fingerprint
uses a vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword profiles for the n-gram/stopword-ratio language
# heuristic (public common-word lists)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "zh": (),  # CJK detected by codepoint range, not stopwords
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (JVM-side)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: GPT-2-style regex pieces (letters runs,
    digit runs, punctuation runs) — a cheap JVM-side stand-in for a real BPE."""
    pieces = F.split(text, r"(?=[^\w\s])|(?<=[^\w\s])|\s+")
    return F.size(F.filter(pieces, lambda t: t != ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition quality signals per doc —
    the usual pre-training filters, all as column expressions."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    return df.select(
        "*",
        F.length(text_col).alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        (F.length(text_col) / F.greatest(n_tok, F.lit(1))).alias("q_avg_token_len"),
        (
            F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
        ).alias("q_distinct_ratio"),
        (
            F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", ""))
            / F.greatest(F.length(text_col), F.lit(1))
        ).alias("q_punct_ratio"),
        (
            F.size(F.filter(toks, lambda t: t.isin(list(_LANG_PROFILES["en"]))))
            / F.greatest(n_tok, F.lit(1))
        ).alias("q_en_stopword_ratio"),
    )


def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile + CJK-codepoint language heuristic (column exprs only).

    Picks the language whose profile words are most frequent; CJK codepoints
    dominate → zh. Deliberately simple — the contract (tested) is determinism
    and the column plumbing, not linguistic accuracy.
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    def profile_score(words: tuple[str, ...]):
        # NB: F.filter lambdas must be unary — a second param is interpreted
        # as the array index, not a closure default
        return F.size(F.filter(toks, lambda t: t.isin(list(words)))) / n_tok

    scores = [
        F.struct(profile_score(words).alias("s"), F.lit(lang).alias("l"))
        for lang, words in _LANG_PROFILES.items()
        if words
    ]
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(cjk > F.length(text_col) * 0.25, F.lit("zh")).otherwise(
            F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
        ),
    )


FINGERPRINT_SCHEMA = T.ArrayType(T.LongType())


def make_fingerprint_udf(window: int = 8):
    """Rolling (Rabin-Karp-style) hash fingerprint: one int64 per `window`
    consecutive tokens — the winnowing-style document fingerprint used for
    plagiarism/near-dup detection. Vectorized pandas UDF."""

    BASE = np.uint64(1_000_003)
    MASK = np.uint64((1 << 61) - 1)

    def _fp(text: str | None) -> list[int]:
        if not text:
            return []
        toks = text.lower().split()
        if len(toks) < window:
            toks = toks + [""] * (window - len(toks))
        hs = np.array([hash_token(t) for t in toks], dtype=np.uint64)
        out = []
        h = np.uint64(0)
        pw = np.uint64(1)
        for _ in range(window - 1):
            pw = (pw * BASE) & MASK
        for i, x in enumerate(hs):
            h = (h * BASE + x) & MASK
            if i >= window:
                h = (h - (hs[i - window] * pw * BASE) & MASK) & MASK
            if i >= window - 1:
                out.append(int(h & np.uint64(0x7FFFFFFFFFFFFFFF)))
        return out

    def hash_token(t: str) -> np.uint64:
        h = np.uint64(1469598103934665603)
        for c in t.encode():
            h = (h ^ np.uint64(c)) * np.uint64(1099511628211)
        return h & np.uint64((1 << 61) - 1)

    @F.pandas_udf(FINGERPRINT_SCHEMA)
    def fingerprint(texts: pd.Series) -> pd.Series:
        return texts.map(_fp)

    return fingerprint


# -- F7: reverse complement (GeneMINDImpl.complement, MIND/GeneMINDImpl.java:85-95)
#
# The reference complements DNA (ACGT<->TGCA) then reverses. Transcript text
# has a 26-letter alphabet, so the gate uses the Atbash involution (a<->z) as
# the complement map — same translate(reverse(...)) machinery, still an
# involution, so strand identities (matches of q on the RC strand == matches
# of rc(q) on the forward strand) hold exactly.

DNA_SRC = "ACGTacgt"
DNA_DST = "TGCAtgca"
ATBASH_SRC = "abcdefghijklmnopqrstuvwxyz"
ATBASH_DST = ATBASH_SRC[::-1]


def reverse_complement(col: Column, src: str = ATBASH_SRC, dst: str = ATBASH_DST) -> Column:
    """Column form: reverse(translate(s)) — JVM-side, codegen'd."""
    return F.reverse(F.translate(col, src, dst))


def rc_str(s: str, src: str = ATBASH_SRC, dst: str = ATBASH_DST) -> str:
    """Driver-side twin for literals (query strings)."""
    return s.translate(str.maketrans(src, dst))[::-1]
