"""filterCache fallback routes: (a) predicate resolution via the pushdown
docs scan when the doc cache is absent (corpus > DOC_CACHE_MAX_DOCS — the
100 TB deployment shape), and (b) the FQ_MAX_IDS oversize bound routing the
query to the distributed exhaustive path. Both must stay rank-identical to
the oracle — the bounds are performance dials, never semantics."""

import os

import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.oracle.bm25_oracle import build_oracle_index, oracle_search
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def corpus_ix(spark, tmp_root):
    tbl = generate_transcripts(1200, max_tokens=30)
    src = os.path.join(tmp_root, "fb_corpus.parquet")
    pq.write_table(tbl, src)
    ix = os.path.join(tmp_root, "ix_fb")
    build_index(spark, spark.read.parquet(src), ix, analyzer="standard", n_segments=3)
    oracle = build_oracle_index(tbl.to_pylist(), "standard")
    return ix, oracle


_TS_MID = sorted(
    r["ts"] for r in generate_transcripts(1200, max_tokens=30).to_pylist()
)[600]

QS = [
    Query("fb_role", "term", [["data"]], k=10, field_eq={"role": "assistant"}),
    Query("fb_and", "and", [["query"], ["data"]], k=10, require_no_tool=True),
    Query("fb_both", "term", [["spark"]], k=15,
          field_eq={"role": "user"}, require_no_tool=True),
    # ts_after exercises the range branch of _fq_ids in BOTH fallback shapes:
    # pushdown `ts >= lit(bound)` scan (no doc cache) and oversize routing
    Query("fb_ts", "term", [["data"]], k=10, ts_after=_TS_MID),
    Query("fb_ts_role", "term", [["query"]], k=10, ts_after=_TS_MID,
          field_eq={"role": "assistant"}),
]


def _check(eng, oracle, q, modes=("auto", "wand", "exhaustive")):
    exp = oracle_search(oracle, q)
    for mode in modes:
        eng._result_cache.clear()
        got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], f"{q.query_id} [{mode}]"
        for (gd, gs), (ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6


def test_fq_without_doc_cache(spark, corpus_ix, monkeypatch):
    """No doc cache (the >1M-doc deployment shape): _fq_ids falls back to ONE
    pushdown-filtered docs scan per predicate; results identical."""
    ix, oracle = corpus_ix
    monkeypatch.setattr(SearchEngine, "DOC_CACHE_MAX_DOCS", 0)
    eng = SearchEngine(spark, {"standard": ix})
    eng._ensure_warm("standard")
    assert "standard" not in eng._doc_cache  # the shape under test
    for q in QS:
        _check(eng, oracle, q)


def test_fq_oversize_routes_distributed(spark, corpus_ix, monkeypatch):
    """A predicate matching more than FQ_MAX_IDS docs must not be truncated:
    the query routes to the distributed path (filter in the docs join) and
    still matches the oracle — under explicit mode=wand too (the mode is an
    optimization hint, never a semantics change)."""
    ix, oracle = corpus_ix
    monkeypatch.setattr(SearchEngine, "FQ_MAX_IDS", 5)  # everything oversize
    eng = SearchEngine(spark, {"standard": ix})
    for q in QS:
        _check(eng, oracle, q)
    # and the fq cache records the oversize marker, not a truncated array
    assert any(v is None for v in eng._fq_cache.values())
