"""Trained-BPE token counting (r4 verdict #8).

`functions/text.py:bpe_ish_token_count` stays as the cheap JVM-side regex
estimate; this module adds the REAL thing: train a deterministic byte-pair
merge table on the corpus, then count actual BPE tokens in a vectorized
pandas UDF.

Training is the classic Sennrich et al. (ACL 2016) procedure over the WORD
HISTOGRAM — the scale-correct shape: one `groupBy(word).count()` shuffle
collapses the corpus to its distinct-word histogram (bounded: pass
``max_words`` to keep the top-V words at 10^12-turn scale; unbounded here at
test scale so the SQL oracle needs no cap mirror), then the merge loop runs
driver-side over the histogram exactly like HuggingFace's trainer. Every
decision is deterministic: the best pair maximizes summed adjacent-pair
count, ties broken by the ``"a b"`` pair string ascending.

Merge application (training AND encoding) is a left-to-right non-overlapping
scan per merge in rank order — the same semantics as SQL/Python
``replace``, which is what lets the ``text_bpe_train`` EXTRA gate entry
reproduce the full merge trajectory in pure DuckDB SQL: symbol sequences are
encoded as ``|sym||sym||sym|`` strings (every symbol wrapped in ``|``
markers), so replacing ``|a||b|`` with ``|ab|`` applies exactly the merges
BPE would — the wrapping makes occurrences disjoint and boundary-exact
(an unwrapped ``replace('a b','ab')`` would corrupt ``'ab c'`` via the
substring ``'b c'``). Words containing ``|`` or whitespace are excluded
from training by construction (ws tokens; the marker char is filtered on
both engines).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intuition_spark.functions.text import tokens_col


def _pair_key(a: str, b: str) -> str:
    return f"{a} {b}"


def _apply_merge(sym: list[str], a: str, b: str) -> list[str]:
    """One left-to-right non-overlapping merge pass (≡ str.replace on the
    marker encoding)."""
    out: list[str] = []
    i = 0
    ab = a + b
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def word_histogram(
    df: DataFrame, text_col: str = "text", max_words: int | None = None
) -> pd.DataFrame:
    """(word, n) histogram of lowercased ws tokens — the one Spark shuffle of
    training. ``max_words`` keeps the top-V (count desc, word asc) rows; at
    10^12 turns SET THIS (the distinct-word histogram of web-scale text is
    itself large); tests/gate leave it None so the oracle needs no mirror."""
    toks = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains("|"))
    )
    wc = toks.groupBy("word").agg(F.count("*").alias("n"))
    if max_words is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    return wc.toPandas()


def train_bpe(
    df: DataFrame, text_col: str = "text", n_merges: int = 8,
    max_words: int | None = None,
) -> dict:
    """Train ``n_merges`` merges on the corpus. Returns
    ``{"merges": [(a, b), ...], "tokens_after": [int, ...]}`` where
    ``tokens_after[r]`` is the corpus-wide token count after merge r — the
    per-decision invariant the SQL oracle checks."""
    hist = word_histogram(df, text_col, max_words)
    n = dict(zip(hist["word"], hist["n"].astype(int)))
    seqs: dict[str, list[str]] = {w: list(w) for w in n}
    merges: list[tuple[str, str]] = []
    totals: list[int] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, sym in seqs.items():
            cnt = n[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += cnt
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], _pair_key(*kv[0])))[0]
        merges.append(best)
        a, b = best
        for w in seqs:
            seqs[w] = _apply_merge(seqs[w], a, b)
        totals.append(sum(n[w] * len(s) for w, s in seqs.items()))
    return {"merges": merges, "tokens_after": totals}


def make_bpe_count_udf(merges: list[tuple[str, str]]):
    """Vectorized token counter for a trained merge table: per lowercased ws
    token, apply the merges in rank order (the same full-pass application
    training used, so corpus words reproduce their training segmentation
    exactly) and count the resulting symbols. Per-batch word memoization —
    Zipfian text makes the distinct-word set per Arrow batch tiny relative
    to the token stream."""
    frozen = list(merges)

    def _count_word(w: str, memo: dict) -> int:
        got = memo.get(w)
        if got is None:
            sym = list(w)
            for a, b in frozen:
                if len(sym) == 1:
                    break
                sym = _apply_merge(sym, a, b)
            got = memo[w] = len(sym)
        return got

    @F.pandas_udf(T.LongType())
    def bpe_count(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        return texts.map(
            lambda t: sum(
                _count_word(w, memo) for w in t.lower().split() if "|" not in w
            )
            if t
            else 0
        )

    return bpe_count


def bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text", out_col: str = "bpe_tokens") -> DataFrame:
    """Attach the trained-BPE token count column."""
    return df.withColumn(out_col, make_bpe_count_udf(merges)(F.col(text_col)))
