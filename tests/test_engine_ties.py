"""Tie-plateau differential: a corpus drawn from a SMALL text pool (heavy
exact duplication -> massive score ties) must rank identically to the oracle
under every mode. Duplicated documents are the common case in web/transcript
corpora; the r3 WAND tie-boundary fix (equal-impact ranges visited
smallest-doc first, threshold skip aware of the doc_id tie-break) is pinned
here at corpus level — the unit version lives in test_wand_prune.py."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.oracle.bm25_oracle import build_oracle_index, oracle_search
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine

POOL = [
    "alpha beta gamma delta",
    "alpha beta gamma",
    "delta epsilon zeta alpha",
    "beta beta gamma theta",
    "zeta theta iota alpha beta",
    "iota kappa lambda",
    "alpha kappa beta mu",
    "mu nu alpha",
]


@pytest.fixture(scope="module")
def tie_setup(spark, tmp_root):
    rng = random.Random(42)
    tbl = generate_transcripts(2400, max_tokens=10).to_pandas()
    tbl["text"] = [rng.choice(POOL) for _ in range(len(tbl))]
    src = os.path.join(tmp_root, "ties.parquet")
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False), src)
    ix = os.path.join(tmp_root, "ix_ties")
    build_index(spark, spark.read.parquet(src), ix, analyzer="standard", n_segments=4)
    eng = SearchEngine(spark, {"standard": ix})
    oracle = build_oracle_index(tbl.to_dict("records"), "standard")
    return eng, oracle


QUERIES = [
    Query("tt_term", "term", [["alpha"]], k=10),
    Query("tt_term_k40", "term", [["beta"]], k=40),
    Query("tt_and", "and", [["alpha"], ["beta"]], k=25),
    Query("tt_or", "or_groups", [["alpha", "mu"], ["beta", "kappa"]], k=15),
    Query("tt_phrase", "phrase", [["alpha beta"]], k=20),
    Query("tt_fq", "term", [["gamma"]], k=10, field_eq={"role": "assistant"}),
    Query("tt_k1", "term", [["delta"]], k=1),
    Query("tt_k_large", "term", [["alpha"]], k=500),
]


@pytest.mark.parametrize("q", QUERIES, ids=[q.query_id for q in QUERIES])
def test_tie_plateau_rank_identity(tie_setup, q):
    eng, oracle = tie_setup
    exp = oracle_search(oracle, q)
    modes = ("auto", "exhaustive") if q.kind == "phrase" else ("auto", "wand", "exhaustive")
    for mode in modes:
        eng._result_cache.clear()
        got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"{q.query_id} [{mode}]: {[d for d, _ in got][:6]} vs {[d for d, _ in exp][:6]}"
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6
