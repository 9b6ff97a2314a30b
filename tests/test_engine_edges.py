"""Engine edge cases: unknown terms, empty queries, tiny/huge k, stopword-only
input — every path must return an empty (or well-formed) hit frame, never
raise."""

from __future__ import annotations

import os

import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine

HIT_COLS = ["doc", "score", "conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def engine(spark, tmp_root):
    import pyarrow.parquet as pq

    src = os.path.join(tmp_root, "edges_corpus.parquet")
    pq.write_table(generate_transcripts(800, max_tokens=30), src)
    ix = os.path.join(tmp_root, "edges_ix")
    build_index(spark, spark.read.parquet(src), ix, analyzer="standard", n_segments=2)
    return SearchEngine(spark, {"standard": ix, "ws": ix})


@pytest.mark.parametrize("mode", ["auto", "wand", "exhaustive"])
def test_unknown_term_returns_empty(engine, mode):
    q = Query("e1", "term", [["zzzznotaterm"]], k=10)
    df = engine.search(q, mode=mode)
    assert df.columns == HIT_COLS
    assert df.count() == 0


@pytest.mark.parametrize("mode", ["auto", "wand", "exhaustive"])
def test_and_with_one_unknown_term_is_empty(engine, mode):
    q = Query("e2", "and", [["braf"], ["zzzznotaterm"]], k=10)
    assert engine.search(q, mode=mode).count() == 0  # mm=100%


def test_stopword_only_query_is_empty(engine):
    q = Query("e3", "term", [["the"]], k=10)  # analyzed away by StopFilter
    assert engine.search(q, "auto").count() == 0


def test_k_one(engine):
    q = Query("e4", "term", [["braf"]], k=1)
    assert engine.search(q, "auto").count() == 1


def test_huge_k_returns_all_matches(engine):
    qa = Query("e5", "term", [["braf"]], k=1_000_000)
    n_auto = engine.search(qa, "auto").count()
    n_ex = engine.search(qa, "exhaustive").count()
    assert n_auto == n_ex > 0


def test_wildcard_no_match(engine):
    q = Query("e6", "wildcard", [["zzz*"]], k=10)
    assert engine.search(q, "auto").count() == 0


def test_fuzzy_no_match(engine):
    q = Query("e7", "fuzzy", [["qqqqqqqqqq"]], k=10)
    assert engine.search(q, "auto").count() == 0


def test_phrase_unknown_pair(engine):
    q = Query("e8", "phrase", [["zzzz yyyy"]], k=10)
    assert engine.search(q, "auto").count() == 0
