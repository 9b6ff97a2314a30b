"""Serving fast-path routing contract: auto mode runs small queries on the
driver (plan = LocalTableScan of the finished top-k) and routes head-term /
filtered queries to the distributed engine. Result identity between the paths
is covered by test_engine_oracle; this pins the ROUTING."""

from __future__ import annotations

import os

import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_root):
    import pyarrow.parquet as pq

    src = os.path.join(tmp_root, "serving_corpus.parquet")
    pq.write_table(generate_transcripts(1500, max_tokens=40), src)
    ix = os.path.join(tmp_root, "serving_ix")
    build_index(spark, spark.read.parquet(src), ix, analyzer="standard", n_segments=4)
    return SearchEngine(spark, {"standard": ix, "ws": ix})


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(autouse=True)
def _fresh_result_cache(engine):
    """These tests pin the ROUTING (plan shape), which the query-result cache
    deliberately hides for repeated semantic queries — clear it per test."""
    engine._result_cache.clear()
    yield


def test_small_query_runs_on_driver(engine):
    q = Query("s1", "and", [["braf"], ["v600e"]], k=10)
    plan = _plan(engine.search(q, mode="auto"))
    assert "LocalTableScan" in plan  # results computed in-process


def test_head_term_stays_distributed(engine, monkeypatch):
    monkeypatch.setattr(engine, "SMALL_QUERY_POSTINGS", 1)  # everything is "big"
    q = Query("s2", "and", [["braf"], ["v600e"]], k=10)
    plan = _plan(engine.search(q, mode="auto"))
    assert "LocalTableScan" not in plan
    assert "FlatMapGroupsInPandas" in plan  # per-segment WAND scorer


def test_filtered_query_stays_distributed(engine):
    q = Query("s3", "and", [["braf"], ["v600e"]], k=10, filter_docs=["conv_00000001:0"])
    plan = _plan(engine.search(q, mode="auto"))
    assert "LocalTableScan" not in plan


def test_forced_modes_ignore_driver_path(engine):
    q = Query("s4", "and", [["braf"], ["v600e"]], k=10)
    assert "LocalTableScan" not in _plan(engine.search(q, mode="wand"))
    assert "LocalTableScan" not in _plan(engine.search(q, mode="exhaustive"))


def test_multiterm_driver_expansion_matches_spark(engine):
    """Cached-dictionary wildcard/fuzzy expansion == distributed dictionary scan."""
    for kind, pat in [("wildcard", "inhib*"), ("fuzzy", "barf"), ("regex", "bra.")]:
        cached = engine._expand_cached("ws", pat, kind)
        scan = engine.expand_dictionary("ws", pat, kind)
        assert cached is not None
        assert sorted(cached) == sorted(scan), (kind, pat)


def test_refresh_is_lazy_and_cheap(engine):
    """refresh() must return without re-running warm-up scans (the sharded
    server refreshes N shards; eager re-warm cost N× startup). The caches
    rebuild on the first query, and results stay correct."""
    import time

    q = Query("s_refresh", "and", [["braf"], ["v600e"]], k=10)
    before = [(r["doc"], r["score"]) for r in engine.search(q).collect()]
    t0 = time.time()
    engine.refresh()
    refresh_s = time.time() - t0
    assert refresh_s < 0.2, f"refresh should defer warm-up, took {refresh_s:.2f}s"
    assert engine._needs_warm  # warm-up deferred, not skipped
    assert not engine._dict_cache and not engine._result_cache
    after = [(r["doc"], r["score"]) for r in engine.search(q).collect()]
    assert after == before
    # first search re-warmed the ROUTED analyzer lazily; others stay pending
    assert "standard" not in engine._needs_warm
