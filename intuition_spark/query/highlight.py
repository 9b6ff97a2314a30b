"""Highlighting + keyword-sentence extraction.

Q10: Solr highlighting (`SolrClientTool.java:176-189, 280-326`) — wrap every
analyzed-token match in ``<mark>…</mark>`` over the stored text of result
docs. Matching is analyzer-aware: a query stem matches every surface form
("inhibit" marks "inhibitors"), exactly like Lucene highlighting over an
analyzed field. Applied post-retrieval to the top-k only — never a scan op.

Q11/Q14/W3: sentence segmentation (OpenNLP in the reference,
`TextServiceImpl.getSentences:93-149`) re-expressed as a regex sentence
splitter UDF + a real Spark window for hit "islands": consecutive hit
sentences (gap ≤ 2) group into one island
(`TextServiceImpl.findKeywordSentences:520-610`).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intuition_spark.analysis.analyzers import ANALYZERS, _TOKEN_RE, _WS_RE, analyze_text

# sentence boundary: ./!/? + space, but not after common abbreviations
# (mirrors the reference's "et al." handling, TextServiceImpl.java:561-564)
_SENT_RE = re.compile(
    r"(?<=[.!?])(?<!\bet al\.)(?<!\be\.g\.)(?<!\bi\.e\.)(?<!\bvs\.)(?<!\bFig\.)(?<!\bDr\.)\s+"
)


def make_highlight_udf(terms: list[str], analyzer: str = "standard"):
    """pandas UDF: text → text with <mark> around analyzer-matched tokens."""
    a = ANALYZERS[analyzer]
    want = set(terms)
    tok_re = _WS_RE if a.whitespace_only else _TOKEN_RE

    def _one(text: str | None) -> str | None:
        if text is None:
            return None
        low = text.lower()
        out = []
        last = 0
        if a.whitespace_only:
            spans = [(m.start(), m.end()) for m in re.finditer(r"\S+", low)]
        else:
            spans = [(m.start(), m.end()) for m in tok_re.finditer(low)]
        for s, e in spans:
            tok = low[s:e]
            analyzed = analyze_text(tok, analyzer)
            if analyzed and analyzed[0][0] in want:
                out.append(text[last:s])
                out.append("<mark>")
                out.append(text[s:e])
                out.append("</mark>")
                last = e
        out.append(text[last:])
        return "".join(out)

    @F.pandas_udf(T.StringType())
    def highlight(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return highlight


def highlight_results(results: DataFrame, terms: list[str], analyzer: str = "standard",
                      text_col: str = "text") -> DataFrame:
    """Attach a `highlighted` column to a (small, top-k) result DataFrame."""
    udf = make_highlight_udf(terms, analyzer)
    return results.withColumn("highlighted", udf(F.col(text_col)))


def _token_spans(text: str, whitespace_only: bool) -> list[tuple[int, int]]:
    if whitespace_only:
        return [(m.start(), m.end()) for m in re.finditer(r"\S+", text)]
    return [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text.lower())]


def best_fragments(
    text: str,
    want: set[str],
    analyzer: str = "standard",
    fragsize: int = 100,
    n_frags: int = 1,
) -> list[str]:
    """Deterministic best-fragment selection under a char budget — the
    Solr ``hl.fragsize`` mode (`SolrClientTool.java:280-294`: default
    fragsize snippets, vs the whole-field fragsize=0 mode of
    :func:`make_highlight_udf`).

    Rule (reproducible in plain SQL, see the `fts_engine_snippets` oracle):
    token spans are analyzer-matched against the query terms; every HIT
    token anchors a candidate window extending forward over tokens while
    (window_end_char - anchor_start_char) ≤ fragsize; the best window is
    the one containing the most hit tokens, leftmost on ties. Further
    fragments (``n_frags`` > 1) repeat the choice over anchors that don't
    overlap an already-chosen window. Matched tokens are ``<mark>``-wrapped;
    docs with no match return []."""
    a = ANALYZERS[analyzer]
    spans = _token_spans(text, a.whitespace_only)
    low = text.lower()
    hit = []
    for s, e in spans:
        analyzed = analyze_text(low[s:e], analyzer)
        hit.append(bool(analyzed) and analyzed[0][0] in want)
    anchors = [i for i, h in enumerate(hit) if h]
    if not anchors:
        return []
    # candidate window per anchor: [i, end(i)] under the char budget
    cands = []
    for i in anchors:
        j = i
        while j + 1 < len(spans) and spans[j + 1][1] - spans[i][0] <= fragsize:
            j += 1
        nh = sum(hit[i : j + 1])
        cands.append((nh, i, j))
    out: list[str] = []
    taken: list[tuple[int, int]] = []
    for _ in range(n_frags):
        live = [
            c for c in cands
            if not any(c[1] <= hi and lo <= c[2] for lo, hi in taken)
        ]
        if not live:
            break
        nh, i, j = max(live, key=lambda c: (c[0], -c[1]))
        taken.append((i, j))
        parts = []
        last = spans[i][0]
        for t in range(i, j + 1):
            s, e = spans[t]
            if hit[t]:
                parts += [text[last:s], "<mark>", text[s:e], "</mark>"]
                last = e
        parts.append(text[last : spans[j][1]])
        out.append("".join(parts))
    return out


def make_snippet_udf(
    terms: list[str], analyzer: str = "standard", fragsize: int = 100,
    n_frags: int = 1,
):
    """pandas UDF: text → array of best ``<mark>``-wrapped fragments (empty
    for non-matching docs). Post-retrieval over the top-k only — like
    :func:`make_highlight_udf`, never a scan op."""
    want = set(terms)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def snippets(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: best_fragments(t, want, analyzer, fragsize, n_frags)
            if t is not None
            else None
        )

    return snippets


def snippet_results(
    results: DataFrame, terms: list[str], analyzer: str = "standard",
    fragsize: int = 100, n_frags: int = 1, text_col: str = "text",
) -> DataFrame:
    """Attach a `snippets` column (best fragments under the char budget) to a
    (small, top-k) result DataFrame — `queryHighlightFragments`,
    `SolrClientTool.java:280-294`; the fq variant is the same call over a
    filtered query's results (`:296-326`), covered by the gate entry."""
    udf = make_snippet_udf(terms, analyzer, fragsize, n_frags)
    return results.withColumn("snippets", udf(F.col(text_col)))


SENTENCES_SCHEMA = T.ArrayType(T.StringType())


@F.pandas_udf(SENTENCES_SCHEMA)
def split_sentences(texts: pd.Series) -> pd.Series:
    """Regex sentence splitter (OpenNLP stand-in)."""
    return texts.map(lambda t: [s for s in _SENT_RE.split(t) if s.strip()] if t else [])


def keyword_sentence_islands(
    docs: DataFrame,
    terms: list[str],
    analyzer: str = "standard",
    doc_col: str = "doc",
    text_col: str = "text",
    gap: int = 2,
) -> DataFrame:
    """Q11 + W3: sentences containing query terms, grouped into islands.

    Plan: UDF split → posexplode to (doc, sent_idx, sentence) → analyzer-match
    flag → window lag over sent_idx computes island boundaries → island id =
    running sum of boundary flags (the reference's gap>2 rule,
    `TextServiceImpl.java:123-147`). Pure window ops after the split — this is
    the distributed form of the reference's per-doc Java loop.
    """
    want = set(terms)

    @F.pandas_udf(T.BooleanType())
    def has_hit(sents: pd.Series) -> pd.Series:
        return sents.map(lambda s: any(t in want for t, _ in analyze_text(s, analyzer)))

    sent = docs.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(split_sentences(F.col(text_col))).alias("sent_idx", "sentence"),
    ).withColumn("hit", has_hit(F.col("sentence")))
    hits = sent.filter(F.col("hit"))
    w = Window.partitionBy("doc").orderBy("sent_idx")
    return (
        hits.withColumn("prev_idx", F.lag("sent_idx").over(w))
        .withColumn(
            "new_island",
            (F.col("prev_idx").isNull() | (F.col("sent_idx") - F.col("prev_idx") > gap)).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc", "island")
        .agg(
            F.min("sent_idx").alias("first_sent"),
            F.max("sent_idx").alias("last_sent"),
            F.count("*").alias("n_hit_sentences"),
            F.concat_ws(" ", F.collect_list("sentence")).alias("island_text"),
        )
    )
