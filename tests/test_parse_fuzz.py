"""Property-based fuzz of the query-string parser (serving surface).

The parser sits on the raw-string boundary (`SolrClientTool.find` takes the
query string verbatim, util/SolrClientTool.java:162-214), so arbitrary user
input reaches it first. Contract under fuzz:

* parse_query NEVER raises anything but QueryParseError — no bare
  IndexError/AttributeError/re.error escapes, and Query's own validation
  (ValueError) is never triggered by parser-constructed arguments;
* on grammar-valid strings it parses, picks the documented kind, and
  preserves group structure.
"""

from __future__ import annotations

import warnings

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from intuition_spark.query.ast import Query
from intuition_spark.query.parse import QueryParseError, parse_query


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=80))
def test_arbitrary_text_parses_or_raises_parse_error_only(s):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # near-miss field-name warnings
        try:
            q = parse_query(s)
        except QueryParseError:
            return
        assert isinstance(q, Query)
        assert q.groups and all(g for g in q.groups)


# printable-ish atoms that the lexer tokenizes as single bare terms: no
# whitespace, no grouping/quoting metachars, and none of the multi-term
# markers (*, ?, ~, /) that force whole-query kinds
_word = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x024F
    ),
    min_size=1,
    max_size=10,
)


@st.composite
def _and_or_query(draw):
    """(query string, expected groups) for the +(a OR b) +(c) edismax shape."""
    groups = draw(
        st.lists(st.lists(_word, min_size=1, max_size=3), min_size=1, max_size=3)
    )
    parts = []
    for g in groups:
        if len(g) == 1 and draw(st.booleans()):
            parts.append(draw(st.sampled_from(["", "+"])) + g[0])
        else:
            parts.append("+(" + " OR ".join(g) + ")")
    return " ".join(parts), groups


@settings(max_examples=300, deadline=None)
@given(_and_or_query())
def test_grammar_valid_and_or_queries_roundtrip_groups(qg):
    s, groups = qg
    q = parse_query(s)
    assert q.groups == groups
    expected_kind = "or_groups" if any(len(g) > 1 for g in groups) else "and"
    if len(groups) == 1 and len(groups[0]) == 1:
        expected_kind = "term"
    assert q.kind == expected_kind


@settings(max_examples=300, deadline=None)
@given(st.lists(_word, min_size=1, max_size=4), st.integers(min_value=0, max_value=30))
def test_quoted_atoms_lower_to_phrase_or_proximity(words, slop):
    body = " ".join(words)
    q = parse_query(f'"{body}"~{slop}' if slop else f'"{body}"')
    assert q.groups == [[body]]
    if slop:
        assert q.kind == "proximity" and q.slop == slop
    elif len(words) > 1:
        assert q.kind == "phrase"
    else:
        assert q.kind == "term"


@settings(max_examples=200, deadline=None)
@given(_word, st.sampled_from(["role", "tool", "conv_id"]), _word)
def test_field_predicates_never_leak_into_scoring_groups(term, fname, fval):
    q = parse_query(f"{term} {fname}:{fval}")
    assert q.groups == [[term]]
    assert q.field_eq == {fname: fval}


@settings(max_examples=200, deadline=None)
@given(_word, _word)
def test_negation_collects_excludes(term, neg):
    q = parse_query(f"{term} -{neg}")
    assert q.groups == [[term]] and q.exclude == [neg]


def test_fuzz_regression_corpus():
    """Pin specific shapes fuzzing has to keep passing (fast, no hypothesis)."""
    for s in ["", "   ", "(", ")", "()", "OR", "+", '""', "-", "~", "a~~",
              'text:"a b"', "/re/", "a*", "f~2", "te*t~1", "role:x role:y"]:
        try:
            q = parse_query(s)
            assert isinstance(q, Query)
        except QueryParseError:
            pass
