"""Property-based fuzz of the analyzer chains (the B2 Solr analysis parity).

`analyze_flat` feeds both the index builder and the query side; a contract
break here silently desynchronizes them. Pinned under generated input:

* total function on arbitrary unicode (None/empty included), parallel
  output lists, positions strictly increasing within the pre-filter stream;
* `standard` emits only `[0-9a-z]+` tokens and never a stopword's stem slot
  at a wrong position (stopword removal keeps the position gap — Lucene
  StopFilter semantics);
* `ws` is exactly lowercase + whitespace split with dense positions;
* index-side `analyze_flat` ≡ query-side `analyze_text` (zip identity) and
  `doc_postings` conserves tokens (Σ tf == token count, positions partition
  the stream).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from intuition_spark.analysis.analyzers import (
    ANALYZERS,
    analyze_flat,
    analyze_text,
    doc_postings,
)
from intuition_spark.analysis.stopwords import ENGLISH_STOPWORDS

_any_text = st.one_of(st.none(), st.text(max_size=200))


@settings(max_examples=500, deadline=None)
@given(_any_text, st.sampled_from(sorted(ANALYZERS)))
def test_analyze_flat_total_and_positions_monotonic(text, analyzer):
    terms, poss = analyze_flat(text, analyzer)
    assert len(terms) == len(poss)
    assert all(isinstance(t, str) and t for t in terms)
    assert all(b > a for a, b in zip(poss, poss[1:]))
    assert all(p >= 0 for p in poss)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_standard_tokens_are_alnum_and_stopword_free(text):
    terms, poss = analyze_flat(text, "standard")
    nostem_terms, nostem_poss = analyze_flat(text, "standard_nostem")
    for t in nostem_terms:
        assert t not in ENGLISH_STOPWORDS
        assert all(c in "0123456789abcdefghijklmnopqrstuvwxyz" for c in t)
    # stemming changes terms, never the surviving positions
    assert poss == nostem_poss


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_ws_is_lowercase_whitespace_split_with_dense_positions(text):
    terms, poss = analyze_flat(text, "ws")
    assert terms == [t for t in text.lower().split() if t]
    assert poss == list(range(len(terms)))


@settings(max_examples=300, deadline=None)
@given(_any_text, st.sampled_from(sorted(ANALYZERS)))
def test_flat_and_tupled_forms_agree_and_postings_conserve(text, analyzer):
    terms, poss = analyze_flat(text, analyzer)
    toks = analyze_text(text, analyzer)
    assert toks == list(zip(terms, poss))
    post = doc_postings(toks)
    assert sum(tf for _, tf, _ in post) == len(toks)
    assert len({term for term, _, _ in post}) == len(post)
    flat_positions = sorted(p for _, _, ps in post for p in ps)
    assert flat_positions == sorted(poss)
    for term, tf, ps in post:
        assert tf == len(ps)
        assert [terms[poss.index(p)] for p in ps] == [term] * tf
