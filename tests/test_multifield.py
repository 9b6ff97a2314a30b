"""Multi-field scored queries (edismax qf — the reference scores one boolean
across `attr_content` AND `text`, Test1.java:577-586, with per-field boosts).

The engine scores q.groups across several analyzed-field indexes built over
the SAME corpus: doc ids and segments align by builder determinism, each
matching (field, term) contributes boost·idf_f·bm25_tf_f, and mm=100% holds
across the field union. Pinned here: mode identity (auto ≡ wand ≡
exhaustive), single-field equivalence, boost effect, a from-first-principles
numpy oracle, and fq/paging composition."""

import math
import os
from dataclasses import replace

import numpy as np
import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def mf_setup(spark, tmp_root):
    tbl = generate_transcripts(3000, max_tokens=40)
    src = os.path.join(tmp_root, "mf.parquet")
    pq.write_table(tbl, src)
    df = spark.read.parquet(src)
    ix_std = os.path.join(tmp_root, "ix_mf_std")
    ix_ws = os.path.join(tmp_root, "ix_mf_ws")
    build_index(spark, df, ix_std, analyzer="standard", n_segments=4)
    build_index(spark, df, ix_ws, analyzer="ws", n_segments=4)
    eng = SearchEngine(spark, {"standard": ix_std, "ws": ix_ws})
    return eng, tbl.to_pandas()


def _rows(df):
    return [(r["doc"], round(r["score"], 9), r["conv_id"], r["turn_idx"]) for r in df.collect()]


MF_QUERIES = [
    Query("mf_term", "term", [["query"]], k=25, fields={"standard": 1.0, "ws": 2.0}),
    Query("mf_and", "and", [["query"], ["index"]], k=25,
          fields={"standard": 2.0, "ws": 1.0}),
    Query("mf_or", "or_groups", [["query", "index"], ["search", "data"]], k=25,
          fields={"standard": 1.0, "ws": 0.5}),
    Query("mf_boost1", "term", [["token"]], k=25, fields={"standard": 1.0, "ws": 1.0}),
    Query("mf_fq", "term", [["query"]], k=25, fields={"standard": 1.0, "ws": 2.0},
          field_eq={"role": "assistant"}),
]


@pytest.mark.parametrize("q", MF_QUERIES, ids=[q.query_id for q in MF_QUERIES])
def test_mode_identity(mf_setup, q):
    eng, _ = mf_setup
    got = {m: _rows(eng.search(q, mode=m)) for m in ("auto", "wand", "exhaustive")}
    assert got["auto"] == got["exhaustive"], "auto (driver path) vs exhaustive"
    assert got["wand"] == got["exhaustive"], "wand vs exhaustive"
    assert len(got["auto"]) > 0


def test_single_field_boost1_equals_plain(mf_setup):
    """fields={'standard': 1.0} must be byte-identical to the plain
    single-field query on that index."""
    eng, _ = mf_setup
    plain = _rows(eng.search(Query("mf_p", "and", [["query"], ["index"]], k=20)))
    viafields = _rows(
        eng.search(Query("mf_f", "and", [["query"], ["index"]], k=20,
                         fields={"standard": 1.0}))
    )
    assert viafields == plain


def test_multifield_numpy_oracle(mf_setup):
    """From-first-principles check: re-tokenize the corpus with both
    analyzers in pure Python/numpy, score boost_f·idf_f·bm25_f per field,
    and compare the full ranked set for a one-term query."""
    from intuition_spark.analysis.analyzers import analyze_flat

    eng, pdf = mf_setup
    boosts = {"standard": 1.0, "ws": 3.0}
    term_by_field = {}
    for f in boosts:
        toks, _ = analyze_flat("query", f)
        term_by_field[f] = toks[0]

    docs = list(zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]))
    expected = {}
    for f, w in boosts.items():
        t = term_by_field[f]
        per_doc = []
        for conv, turn, text in docs:
            toks, _ = analyze_flat(text, f)
            per_doc.append((f"{conv}:{turn}", toks.count(t) if len(toks) else 0, len(toks)))
        N = len(per_doc)
        avgdl = sum(dl for _, _, dl in per_doc) / N
        df_t = sum(1 for _, tf, _ in per_doc if tf > 0)
        idf = math.log(1.0 + (N - df_t + 0.5) / (df_t + 0.5))
        for doc, tf, dl in per_doc:
            if tf:
                contrib = w * idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dl / avgdl))
                expected[doc] = expected.get(doc, 0.0) + contrib

    q = Query("mf_oracle", "term", [["query"]], k=10_000, fields=boosts)
    got = {r["doc"]: r["score"] for r in eng.search(q, mode="exhaustive").collect()}
    assert set(got) == set(expected)
    for doc, s in got.items():
        assert abs(s - expected[doc]) < 1e-9, doc


def test_boost_changes_ranking(mf_setup):
    """A doc matching strongly in one field must outrank under that field's
    boost: scores scale linearly per field, so doubling one boost strictly
    raises scores of docs with any contribution from it."""
    eng, _ = mf_setup
    q1 = Query("mf_b1", "term", [["braf"]], k=10_000, fields={"standard": 1.0, "ws": 1.0})
    q2 = Query("mf_b2", "term", [["braf"]], k=10_000, fields={"standard": 1.0, "ws": 3.0})
    s1 = {r["doc"]: r["score"] for r in eng.search(q1).collect()}
    s2 = {r["doc"]: r["score"] for r in eng.search(q2).collect()}
    assert set(s1) == set(s2)
    assert any(s2[d] > s1[d] + 1e-12 for d in s1), "boost had no effect"


def test_mm_across_field_union(mf_setup):
    """A group matched ONLY in the ws field (case/punct token the standard
    analyzer normalizes differently) still satisfies mm=100% — the artifact
    rows contain the raw token 'BRAF^(V600E)' which ws keeps as-is (lowercased)
    but standard splits; scoring across both fields must keep those docs."""
    eng, _ = mf_setup
    q = Query("mf_union", "and", [["braf"], ["resistant"]], k=10_000,
              fields={"standard": 1.0, "ws": 1.0})
    both = _rows(eng.search(q, mode="exhaustive"))
    std_only = _rows(eng.search(Query("mf_std", "and", [["braf"], ["resistant"]],
                                      k=10_000, analyzer="standard"), mode="exhaustive"))
    assert {r[0] for r in std_only} <= {r[0] for r in both}


def test_multifield_paging(mf_setup):
    eng, _ = mf_setup
    q = Query("mf_pg", "term", [["query"]], k=10_000, fields={"standard": 1.0, "ws": 2.0})
    full = _rows(eng.search(q))
    paged = []
    for off in range(0, len(full) + 5, 6):
        paged.extend(_rows(eng.search(replace(q, k=6, offset=off))))
    assert paged[: len(full)] == full


def test_mismatched_corpora_rejected(spark, tmp_root):
    tbl_a = generate_transcripts(400, max_tokens=10)
    tbl_b = generate_transcripts(500, max_tokens=10)
    pa_, pb = os.path.join(tmp_root, "mfa.parquet"), os.path.join(tmp_root, "mfb.parquet")
    pq.write_table(tbl_a, pa_)
    pq.write_table(tbl_b, pb)
    ixa, ixb = os.path.join(tmp_root, "ix_mfa"), os.path.join(tmp_root, "ix_mfb")
    build_index(spark, spark.read.parquet(pa_), ixa, analyzer="standard", n_segments=2)
    build_index(spark, spark.read.parquet(pb), ixb, analyzer="ws", n_segments=2)
    eng = SearchEngine(spark, {"standard": ixa, "ws": ixb})
    q = Query("mf_bad", "term", [["query"]], k=5, fields={"standard": 1.0, "ws": 2.0})
    with pytest.raises(ValueError, match="same corpus"):
        eng.search(q)


def test_fields_validation():
    with pytest.raises(ValueError, match="boost"):
        Query("bad", "term", [["x"]], fields={"standard": 0.0})
    with pytest.raises(ValueError, match="single-field"):
        Query("bad2", "wildcard", [["x*"]], fields={"standard": 1.0, "ws": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        Query("bad3", "term", [["x"]], fields={})
