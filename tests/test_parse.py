"""Query-string parser: reference-style edismax strings → AST, and
end-to-end identity with hand-built Query objects through the engine."""

from __future__ import annotations

import os

import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine
from intuition_spark.query.parse import QueryParseError, parse_query


def test_parse_or_groups_reference_shape():
    # buildSearchExpression output shape (SolrServiceImpl.java:336-413)
    q = parse_query('+("braf" OR "b-raf") +("v600e" OR "val600glu")')
    assert q.kind == "or_groups"
    assert q.groups == [["braf", "b-raf"], ["v600e", "val600glu"]]


def test_parse_and_of_terms():
    q = parse_query("spark join")
    assert q.kind == "and"
    assert q.groups == [["spark"], ["join"]]


def test_parse_phrase_and_proximity():
    assert parse_query('"table part"').kind == "phrase"
    q = parse_query('"hash merge"~5')  # TextServiceImpl.java:531 "~15" shape
    assert q.kind == "proximity"
    assert q.slop == 5
    assert q.groups == [["hash merge"]]


def test_parse_multiterm_kinds():
    assert parse_query("ta*").kind == "wildcard"
    assert parse_query("t?ble").kind == "wildcard"
    assert parse_query("tble~1").kind == "fuzzy"
    assert parse_query("tble~").kind == "fuzzy"
    assert parse_query("/ta.le|v.lue/").kind == "regex"


def test_parse_quoted_single_token_is_term():
    assert parse_query('"spark"').kind == "term"


def test_parse_mixed_group_with_proximity():
    q = parse_query('+("hash merge"~4) +batch')
    assert q.kind == "proximity" and q.slop == 4
    assert q.groups == [["hash merge"], ["batch"]]


@pytest.mark.parametrize("bad", ["", "+(a OR", "(a OR )", "ta* extra", "+()"])
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


@pytest.fixture(scope="module")
def engine(spark, tmp_root):
    import pyarrow.parquet as pq

    src = os.path.join(tmp_root, "parse_corpus.parquet")
    pq.write_table(generate_transcripts(800, max_tokens=30), src)
    ix = os.path.join(tmp_root, "parse_ix")
    build_index(spark, spark.read.parquet(src), ix, analyzer="standard", n_segments=2)
    return SearchEngine(spark, {"standard": ix, "ws": ix})


def test_search_str_equals_ast(engine):
    cases = [
        ('+("braf" OR "kras") +v600e',
         Query("x", "or_groups", [["braf", "kras"], ["v600e"]], k=10)),
        ("braf v600e", Query("x", "and", [["braf"], ["v600e"]], k=10)),
        ('"braf v600e"~4', Query("x", "proximity", [["braf v600e"]], slop=4, k=10)),
        ("bra*", Query("x", "wildcard", [["bra*"]], k=10)),
    ]
    for s, q in cases:
        got = [(r["doc"], r["score"]) for r in engine.search_str(s, k=10).collect()]
        exp = [(r["doc"], r["score"]) for r in engine.search(q).collect()]
        assert got == exp, s


def test_parse_negation():
    q = parse_query('+("braf" OR "kras") +v600e -merge -window')
    assert q.kind == "or_groups"
    assert q.exclude == ["merge", "window"]
    with pytest.raises(QueryParseError):
        parse_query("-only -negations")
    # negation on multi-term queries is supported (engine anti-join)
    qw = parse_query("ta* -merge")
    assert qw.kind == "wildcard" and qw.exclude == ["merge"]
    with pytest.raises(QueryParseError):
        parse_query("tble~2")  # engine fuzzy is Levenshtein<=1 only
    with pytest.raises(QueryParseError):
        parse_query('+"hash merge"~5 +"table part"')  # one slop per query


def test_parse_fuzzy_zero_is_exact_term():
    q = parse_query("braf~0")  # Lucene lowers ~0 to an exact term query
    assert q.kind == "term" and q.groups == [["braf"]]


def test_parse_field_qualified():
    q = parse_query('+table +value role:assistant')
    assert q.kind == "and" and q.groups == [["table"], ["value"]]
    assert q.field_eq == {"role": "assistant"}
    # quoted values and the text: default-field form
    q2 = parse_query('role:"some agent" text:foo')
    assert q2.kind == "term" and q2.groups == [["foo"]]
    assert q2.field_eq == {"role": "some agent"}
    # unknown field names degrade to plain scoring atoms (edismax semantics):
    # transcripts legitimately contain colon tokens — URLs, key:value text
    q3 = parse_query("bogusfield:x table")
    assert q3.field_eq is None and q3.groups == [["bogusfield:x"], ["table"]]
    q4 = parse_query("error http://example.com")
    assert q4.groups == [["error"], ["http://example.com"]]
    with pytest.raises(QueryParseError):
        parse_query("role:a role:b table")
    with pytest.raises(QueryParseError):
        parse_query("role:assistant")  # filter only — nothing to score


def test_parse_near_miss_field_degrades_with_warning():
    """A 1-typo near-miss of a real field name ('rol:assistant') degrades to
    a scoring atom like any unknown field (edismax semantics — hard-failing
    would break legit colon tokens like 'test:runner', one edit from 'text')
    but emits a visible warning naming the likely intended field."""
    import warnings as w

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        q = parse_query("rol:assistant table")
    assert q.field_eq is None and q.groups == [["rol:assistant"], ["table"]]
    assert any("did you mean 'role'" in str(c.message) for c in caught)
    # legit near-miss colon tokens parse without error
    with w.catch_warnings(record=True):
        w.simplefilter("always")
        q2 = parse_query("error in test:runner")
    assert q2.field_eq is None and ["test:runner"] in q2.groups


def test_parse_fuzzy_rejects_metachars():
    """'te*t~1' is neither fuzzy nor wildcard (ADVICE r2)."""
    with pytest.raises(QueryParseError):
        parse_query("te*t~1")
    with pytest.raises(QueryParseError):
        parse_query("(a OR -b)")  # negation inside groups
