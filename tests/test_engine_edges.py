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


def test_block_cache_hit_and_positional_upgrade(engine):
    """Serving block cache: a repeated term is served from the LRU (no new
    postings fetched), a later phrase query upgrades the entry with pos_bin,
    and results stay identical either way."""
    engine._block_cache.clear()
    engine._block_cache_postings = 0
    q = Query("c1", "term", [["braf"]], k=10)
    r1 = engine.search(q, mode="auto").collect()
    a = engine._route(q)
    key = (a, "braf")
    assert key in engine._block_cache
    assert "pos_bin" not in engine._block_cache[key].columns
    cached_obj = engine._block_cache[key]
    r2 = engine.search(q, mode="auto").collect()
    assert engine._block_cache[key] is cached_obj  # served from cache
    assert [(r["doc"], r["score"]) for r in r1] == [(r["doc"], r["score"]) for r in r2]
    # positional query on the same term upgrades the entry
    qp = Query("c2", "phrase", [["braf v600e"]], k=10)
    engine.search(qp, mode="auto").collect()
    ap = engine._route(qp)
    assert "pos_bin" in engine._block_cache[(ap, "braf")].columns


def test_block_cache_eviction_accounting(engine):
    engine._block_cache.clear()
    engine._block_cache_postings = 0
    old_cap = type(engine).BLOCK_CACHE_MAX_POSTINGS
    try:
        type(engine).BLOCK_CACHE_MAX_POSTINGS = 1  # force eviction
        engine.search(Query("c3", "term", [["braf"]], k=5), mode="auto").collect()
        engine.search(Query("c4", "term", [["kras"]], k=5), mode="auto").collect()
        # at most one real entry survives at cap=1 (plus nothing leaked)
        total = sum(int(v["n"].sum()) if len(v) else 0 for v in engine._block_cache.values())
        assert total == engine._block_cache_postings
        assert len(engine._block_cache) <= 2
    finally:
        type(engine).BLOCK_CACHE_MAX_POSTINGS = old_cap


def test_result_cache_identity_and_refresh(engine):
    """Query-result cache: the same semantic query returns the cached frame
    (identical object), a different k is a different entry, and refresh()
    clears it."""
    engine._result_cache.clear()
    q = Query("r1", "term", [["braf"]], k=10)
    df1 = engine.search(q)
    df2 = engine.search(Query("r1b", "term", [["braf"]], k=10))  # same semantics
    assert df2 is df1  # served from the result cache despite a different id
    df3 = engine.search(Query("r1c", "term", [["braf"]], k=5))
    assert df3 is not df1
    rows1 = [(r["doc"], r["score"]) for r in df1.collect()]
    rows2 = [(r["doc"], r["score"]) for r in df2.collect()]
    assert rows1 == rows2
    engine.refresh()
    assert len(engine._result_cache) == 0
