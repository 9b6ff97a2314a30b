"""Randomized rank-identity: engine vs pure-Python oracle on seeded corpora.

test_engine_oracle.py pins the REFERENCE query set on the default corpus;
this file drives the same differential through seeded-random space — fresh
corpus seeds, queries generated from each corpus's own vocabulary (analyzed
dictionary terms AND raw pre-analysis words, so both guaranteed-hit and
miss/edge shapes occur), random fq/exclude/slop/k combinations, all three
execution modes, and random page offsets (engine page ≡ oracle slice).
Everything is seeded — a failure replays exactly."""

import os
import random
from dataclasses import replace
from datetime import timedelta

import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.oracle.bm25_oracle import build_oracle_index, oracle_search
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine

CORPUS_SEEDS = [7, 1234]
N_TURNS = 1500


@pytest.fixture(scope="module", params=CORPUS_SEEDS, ids=lambda s: f"seed{s}")
def setup(request, spark, tmp_root):
    seed = request.param
    tbl = generate_transcripts(N_TURNS, seed=seed, max_tokens=50)
    src = os.path.join(tmp_root, f"rand{seed}.parquet")
    pq.write_table(tbl, src)
    df = spark.read.parquet(src)
    std = build_index(spark, df, os.path.join(tmp_root, f"ix_r{seed}_std"),
                      analyzer="standard", n_segments=4)
    ws = build_index(spark, df, os.path.join(tmp_root, f"ix_r{seed}_ws"),
                     analyzer="ws", n_segments=4)
    eng = SearchEngine(spark, {"standard": std.root, "ws": ws.root})
    rows = tbl.to_pylist()
    oracle = {
        "standard": build_oracle_index(rows, "standard"),
        "ws": build_oracle_index(rows, "ws"),
    }
    return seed, eng, oracle, rows


def _gen_queries(seed, oracle, rows):
    rng = random.Random(0xD1FF ^ seed)
    vocab_std = sorted(oracle["standard"].postings)
    vocab_ws = sorted(oracle["ws"].postings)
    raw_words = sorted({
        w for r in rng.sample(rows, 40) for w in r["text"].split() if len(w) > 2
    })
    some_ts = sorted(r["ts"] for r in rows)

    def word():  # analyzed term, raw word, or a rare miss
        u = rng.random()
        if u < 0.45:
            return rng.choice(vocab_std)
        if u < 0.9:
            return rng.choice(raw_words)
        return rng.choice(raw_words) + "zz"

    qs = []
    for i in range(18):
        k = rng.choice([3, 10, 25])
        shape = rng.choice(
            ["term", "and", "or", "phrase", "prox", "fuzzy", "wild", "tf_sort"]
        )
        if shape == "term":
            q = Query(f"r{i}", "term", [[word()]], k=k)
        elif shape == "and":
            q = Query(f"r{i}", "and", [[word()] for _ in range(rng.randint(2, 3))], k=k)
        elif shape == "or":
            q = Query(f"r{i}", "or_groups",
                      [[word() for _ in range(rng.randint(1, 3))]
                       for _ in range(rng.randint(1, 3))], k=k)
        elif shape in ("phrase", "prox"):
            if rng.random() < 0.7:  # adjacent words from a real doc → hits
                toks = rng.choice(rows)["text"].split()
                j = rng.randrange(max(1, len(toks) - 2))
                body = " ".join(toks[j : j + 2])
            else:
                body = f"{word()} {word()}"
            slop = 0 if shape == "phrase" else rng.randint(1, 8)
            q = Query(f"r{i}", "proximity" if slop else "phrase", [[body]],
                      slop=slop, k=k)
        elif shape == "fuzzy":
            t = rng.choice(vocab_ws)
            if len(t) > 3 and rng.random() < 0.5:  # one-char mutation
                j = rng.randrange(len(t))
                t = t[:j] + rng.choice("abcdefghijklmnopqrstuvwxyz") + t[j + 1:]
            q = Query(f"r{i}", "fuzzy", [[t]], k=k)
        elif shape == "wild":
            t = rng.choice([w for w in vocab_ws if len(w) > 3])
            q = Query(f"r{i}", "wildcard", [[t[: rng.randint(2, len(t) - 1)] + "*"]], k=k)
        else:
            q = Query(f"r{i}", "tf_sort", [[rng.choice(vocab_std)]], k=k)

        if q.kind in ("term", "and", "or_groups") and rng.random() < 0.3:
            q = replace(q, field_eq={"role": rng.choice(["user", "assistant"])})
        if q.kind in ("term", "and", "or_groups") and rng.random() < 0.2:
            # exclude atoms must analyze to ONE token (_exclude_terms raises
            # on multi-token atoms); dictionary terms are single by
            # construction, raw corpus words may tokenize into several
            q = replace(q, exclude=[rng.choice(vocab_std)])
        if rng.random() < 0.2:
            q = replace(
                q, ts_after=some_ts[rng.randrange(len(some_ts))] - timedelta(seconds=1)
            )
        if rng.random() < 0.1:
            q = replace(q, require_no_tool=True)
        qs.append(q)
    return qs


def _compare(eng, oracle, q, mode):
    expected = oracle_search(oracle[q.effective_analyzer], q)
    got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
    assert len(got) == len(expected), (
        f"{q} [{mode}]: {len(got)} vs {len(expected)} hits"
    )
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expected)):
        assert gd == ed, f"{q} [{mode}] rank {i}: {gd} != {ed}"
        assert abs(gs - es) < 1e-6, f"{q} [{mode}] rank {i}: {gs} vs {es}"


def test_randomized_queries_rank_identical_all_modes(setup):
    seed, eng, oracle, rows = setup
    n_nonempty = 0
    for q in _gen_queries(seed, oracle, rows):
        expected = oracle_search(oracle[q.effective_analyzer], q)
        n_nonempty += bool(expected)
        for mode in ("auto", "wand", "exhaustive"):
            _compare(eng, oracle, q, mode)
    # the generator must actually exercise the scorer, not just agree on misses
    assert n_nonempty >= 8, f"only {n_nonempty} non-empty queries generated"


def test_randomized_paging_equals_oracle_slice(setup):
    seed, eng, oracle, rows = setup
    rng = random.Random(0xBEEF ^ seed)
    scored = [
        q for q in _gen_queries(seed, oracle, rows)
        if q.kind in ("term", "and", "or_groups", "phrase", "proximity")
    ][:6]
    for q in scored:
        offset = rng.choice([0, 3, 17])
        expected = oracle_search(
            oracle[q.effective_analyzer], replace(q, k=offset + q.k)
        )[offset:]
        got = [(r["doc"], r["score"])
               for r in eng.page(q, offset=offset, k=q.k).collect()]
        assert [d for d, _ in got] == [d for d, _ in expected], (
            f"{q} offset={offset}: paged docs diverge from oracle slice"
        )
        for (gd, gs), (ed, es) in zip(got, expected):
            assert abs(gs - es) < 1e-6
