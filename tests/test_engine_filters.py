"""fq-style filters (P2/P3/P5), regex/fuzzy expansion (Q6/Q7), get-by-id (Q12)
— engine vs oracle on the synthetic corpus."""

import os
from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.oracle.bm25_oracle import build_oracle_index, oracle_search
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    tbl = generate_transcripts(1500, max_tokens=40)
    src = os.path.join(tmp_root, "filters_corpus.parquet")
    pq.write_table(tbl, src)
    std = build_index(spark, spark.read.parquet(src), os.path.join(tmp_root, "ix_flt_std"),
                      analyzer="standard", n_segments=3)
    ws = build_index(spark, spark.read.parquet(src), os.path.join(tmp_root, "ix_flt_ws"),
                     analyzer="ws", n_segments=3)
    eng = SearchEngine(spark, {"standard": std.root, "ws": ws.root})
    rows = tbl.to_pylist()
    oracles = {"standard": build_oracle_index(rows, "standard"),
               "ws": build_oracle_index(rows, "ws")}
    return eng, oracles, rows


def _compare(eng, oracles, q, mode="auto"):
    exp = oracle_search(oracles[q.effective_analyzer], q)
    got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
    assert [d for d, _ in got] == [d for d, _ in exp], f"{q.query_id}: {got} vs {exp}"
    for (gd, gs), (ed, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6


def test_ts_after_filter(setup):
    eng, oracles, rows = setup
    mid_ts = sorted(r["ts"] for r in rows)[len(rows) // 2]
    q = Query("f_ts", "term", [["spark"]], k=10, ts_after=mid_ts)
    _compare(eng, oracles, q)


def test_require_no_tool(setup):
    eng, oracles, _ = setup
    q = Query("f_tool", "and", [["query"], ["data"]], k=10, require_no_tool=True)
    _compare(eng, oracles, q)
    # filtered results must actually be non-tool turns
    docs = [r["doc"] for r in eng.search(q).collect()]
    meta = eng.get_by_id(docs).collect()
    assert all(r["tool"] is None for r in meta)


def test_filter_docs_candidate_set(setup):
    eng, oracles, _ = setup
    base = Query("f_base", "term", [["spark"]], k=40)
    cand = [d for d, _ in oracle_search(oracles["standard"], base)][::2]  # every other hit
    q = Query("f_fq", "term", [["spark"]], k=10, filter_docs=cand)
    _compare(eng, oracles, q)


def test_combined_filters(setup):
    eng, oracles, rows = setup
    early = datetime(2025, 1, 1, tzinfo=timezone.utc)
    q = Query("f_comb", "or_groups", [["braf", "kras"], ["v600e", "g12c"]], k=10,
              ts_after=early, require_no_tool=True)
    _compare(eng, oracles, q)


def test_regex_query(setup):
    eng, oracles, _ = setup
    q = Query("f_rx", "regex", [["w000[0-9]{2}"]], k=20)
    _compare(eng, oracles, q)


def test_fuzzy_query(setup):
    eng, oracles, _ = setup
    q = Query("f_fz", "fuzzy", [["brag"]], k=20)  # braf is distance 1
    _compare(eng, oracles, q)


def test_get_by_id(setup):
    eng, _, rows = setup
    want = [f"{rows[0]['conv_id']}:{rows[0]['turn_idx']}", f"{rows[5]['conv_id']}:{rows[5]['turn_idx']}"]
    got = {r["doc"]: r["text"] for r in eng.get_by_id(want).collect()}
    assert got[want[0]] == rows[0]["text"]
    assert got[want[1]] == rows[5]["text"]


def test_must_not_exclusion_all_modes(setup):
    """MUST_NOT (`-term`): docs containing the excluded term disappear from
    the top-k, identically on driver-WAND, distributed-WAND, and exhaustive
    paths (the driver/WAND routes use the tombstone mechanism; exhaustive
    uses a distributed anti-join)."""
    eng, oracles, rows = setup
    q = Query("f_not", "term", [["spark"]], k=10, exclude=["merge"])
    for mode in ("auto", "wand", "exhaustive"):
        _compare(eng, oracles, q, mode=mode)
    # sanity: exclusion actually removed something vs the unfiltered query —
    # pick a term guaranteed to co-occur with 'spark' in some doc
    from intuition_spark.analysis.analyzers import analyze_text

    doc_with = next(
        r for r in rows
        if any(t == "spark" for t, _ in analyze_text(r["text"], "standard"))
    )
    other = next(
        t for t, _ in analyze_text(doc_with["text"], "standard") if t != "spark"
    )
    base = {r["doc"] for r in eng.search(
        Query("f_base", "term", [["spark"]], k=100000)).collect()}
    excl = {r["doc"] for r in eng.search(
        Query("f_not2", "term", [["spark"]], k=100000, exclude=[other])).collect()}
    assert excl < base


def test_must_not_with_phrase_and_groups(setup):
    eng, oracles, rows = setup
    q = Query("f_not_ph", "phrase", [["braf v600e"]], k=10, exclude=["merge"])
    _compare(eng, oracles, q, mode="auto")
    _compare(eng, oracles, q, mode="exhaustive")
    q2 = Query("f_not_or", "or_groups", [["braf", "kras"], ["v600e"]], k=10,
               exclude=["window"])
    _compare(eng, oracles, q2, mode="auto")
    _compare(eng, oracles, q2, mode="exhaustive")


def test_must_not_multi_token_atom_rejected(setup):
    eng, _, _ = setup
    with pytest.raises(ValueError):
        eng.search(Query("f_bad", "term", [["spark"]], exclude=["two words"])).collect()


def test_must_not_on_multiterm_and_tf_sort(setup):
    """MUST_NOT applies to the constant-score (wildcard/regex/fuzzy) and
    tf_sort routes too — engine vs oracle, driver and distributed paths."""
    eng, oracles, rows = setup
    for kind, atom in (("wildcard", "bra*"), ("fuzzy", "braf"), ("regex", "bra.")):
        q = Query(f"f_not_{kind}", kind, [[atom]], k=10000, exclude=["merge"])
        _compare(eng, oracles, q, mode="auto")        # driver route
        _compare(eng, oracles, q, mode="exhaustive")  # distributed anti-join route
    qt = Query("f_not_tf", "tf_sort", [["spark"]], k=10, exclude=["merge"])
    exp = oracle_search(oracles["standard"], qt)
    for mode in ("auto", "exhaustive"):
        got = [(r["doc"], r["score"]) for r in eng.search(qt, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], mode


def test_field_eq_role(setup):
    """Field-qualified predicate (SolrServiceImpl.java:397-404 authors:"…"
    shape): non-scoring exact match on the stored role column."""
    eng, oracles, _ = setup
    q = Query("f_role", "and", [["query"], ["data"]], k=10,
              field_eq={"role": "assistant"})
    _compare(eng, oracles, q)
    docs = [r["doc"] for r in eng.search(q).collect()]
    meta = eng.get_by_id(docs).collect()
    assert meta and all(r["role"] == "assistant" for r in meta)


def test_field_eq_conv_id(setup):
    eng, oracles, rows = setup
    conv = rows[len(rows) // 2]["conv_id"]
    q = Query("f_conv", "term", [["spark"]], k=10, field_eq={"conv_id": conv})
    _compare(eng, oracles, q)
    got = [r["conv_id"] for r in eng.search(q).collect()]
    assert all(c == conv for c in got)


def test_field_eq_via_parser(setup):
    """role:assistant round-trips through the string parser (VERDICT r2 #7)."""
    eng, oracles, _ = setup
    q = Query("f_rp", "and", [["query"], ["data"]], k=10,
              field_eq={"role": "assistant"})
    exp = [(r["doc"], r["score"]) for r in eng.search(q).collect()]
    got = [(r["doc"], r["score"])
           for r in eng.search_str("query data role:assistant", k=10).collect()]
    assert got == exp


def test_field_eq_unknown_field_rejected(setup):
    with pytest.raises(ValueError):
        Query("f_bad", "term", [["spark"]], field_eq={"nope": "x"})


def test_mode_identity_randomized_fq_sweep(setup):
    """Seeded randomized sweep: every query shape × fq combination must
    return identical ranked hits under auto (driver fast path), wand, and
    exhaustive modes, all rank-identical to the pure-Python oracle. This is
    the regression net for the r3 filterCache fix — pre-fix, mode="wand"
    applied fq AFTER the per-segment top-k and failed 11/30 of exactly this
    sweep shape (dropped hits, one false-empty)."""
    import random

    eng, oracles, rows = setup
    rng = random.Random(20260817)
    post = oracles["standard"].postings
    by_df = sorted(post, key=lambda t: -len(post[t]))
    head, mid = by_df[:10], [t for t in by_df if 5 <= len(post[t]) <= 50]
    roles = sorted({r["role"] for r in rows if r.get("role")})
    ts_sorted = sorted(r["ts"] for r in rows)

    def pick_terms(n):
        pool = head if rng.random() < 0.5 else mid
        return rng.sample(pool, n)

    for i in range(24):
        kind = rng.choice(["term", "and", "or_groups", "phrase", "wildcard"])
        if kind == "term":
            groups = [pick_terms(1)]
        elif kind == "and":
            groups = [[t] for t in pick_terms(2)]
        elif kind == "or_groups":
            groups = [pick_terms(2), pick_terms(2)]
        elif kind == "phrase":
            # one MULTI-TOKEN atom — two single-token atoms in a group would
            # be an OR, and the positional matcher would never run
            groups = [[" ".join(pick_terms(2))]]
        else:  # wildcard: prefix of a mid term
            t = rng.choice(mid)
            groups = [[t[: max(2, len(t) - 2)] + "*"]]
        fq = rng.randrange(6)
        kw = {}
        if fq in (1, 3, 5):
            kw["field_eq"] = {"role": rng.choice(roles)}
        if fq in (2, 3):
            kw["require_no_tool"] = True
        if fq in (4, 5):
            kw["ts_after"] = ts_sorted[len(ts_sorted) // 3]
        if rng.random() < 0.25:
            kw["exclude"] = [rng.choice(mid)]
        q = Query(f"sweep_{i:02d}", kind, groups,
                  slop=2 if kind == "phrase" and rng.random() < 0.5 else 0,
                  k=rng.choice([3, 10, 25]), **kw)
        exp = oracle_search(oracles["standard"], q)
        for mode in ("auto", "wand", "exhaustive"):
            eng._result_cache.clear()
            got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
            assert [d for d, _ in got] == [d for d, _ in exp], (
                f"sweep_{i:02d} [{mode}] {kind} fq={fq} kw={kw}: "
                f"{[d for d, _ in got]} vs {[d for d, _ in exp]}"
            )
            for (gd, gs), (ed, es) in zip(got, exp):
                assert abs(gs - es) < 1e-6, f"sweep_{i:02d} [{mode}] score {gs} vs {es}"


def test_mode_identity_ws_analyzer_sweep(setup):
    """Same mode-identity net over the ws (whitespace) analyzer route — the
    wildcard field's index. Distinct code path: different analyzer chain,
    separate index/dictionary/doc caches, q.analyzer routing."""
    import random

    eng, oracles, rows = setup
    rng = random.Random(77)
    post = oracles["ws"].postings
    by_df = sorted(post, key=lambda t: -len(post[t]))
    pool = [t for t in by_df if len(post[t]) >= 3][:60]
    roles = sorted({r["role"] for r in rows if r.get("role")})
    for i in range(10):
        kind = rng.choice(["term", "and", "wildcard"])
        if kind == "wildcard":
            t = rng.choice(pool)
            groups = [[t[: max(2, len(t) - 2)] + "*"]]
        else:
            groups = [[t] for t in rng.sample(pool, 1 if kind == "term" else 2)]
        kw = {}
        if rng.random() < 0.5:
            kw["field_eq"] = {"role": rng.choice(roles)}
        q = Query(f"ws_{i:02d}", kind, groups, k=rng.choice([5, 20]),
                  analyzer="ws", **kw)
        exp = oracle_search(oracles["ws"], q)
        for mode in ("auto", "exhaustive"):
            eng._result_cache.clear()
            got = [(r["doc"], r["score"]) for r in eng.search(q, mode=mode).collect()]
            assert [d for d, _ in got] == [d for d, _ in exp], (
                f"ws_{i:02d} [{mode}] {kind} {kw}"
            )
            for (gd, gs), (ed, es) in zip(got, exp):
                assert abs(gs - es) < 1e-6
