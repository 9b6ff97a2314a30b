"""Fragment highlighting (hl.fragsize mode, `SolrClientTool.java:280-294`):
the deterministic best-window rule, analyzer awareness, char budget, tie
handling, and multi-fragment non-overlap. The dual-engine identity of the
full operator (engine top-k + fq + snippet vs the SQL oracle) is pinned by
the `fts_engine_snippets` EXTRA entry in tests/test_gate_extra.py."""

from intuition_spark.query.highlight import best_fragments, snippet_results


def test_budget_and_marking():
    text = "alpha table beta gamma delta epsilon zeta eta theta value iota"
    frags = best_fragments(text, {"table", "value"}, analyzer="ws", fragsize=30)
    assert len(frags) == 1
    f = frags[0]
    assert f.startswith("<mark>table</mark>")
    # budget: the unmarked fragment text is ≤ fragsize chars
    plain = f.replace("<mark>", "").replace("</mark>", "")
    assert len(plain) <= 30
    assert plain in text  # a contiguous slice of the original


def test_most_hits_wins_then_leftmost():
    # window around the dense pair must beat the lone early hit
    text = "value x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 y0 y1 value table value end"
    [f] = best_fragments(text, {"table", "value"}, analyzer="ws", fragsize=24)
    assert f.count("<mark>") >= 2 and "table" in f
    # pure tie (identical windows left and right): leftmost anchor wins
    text2 = "value a b c d e f g h i j k l m n o p q value a"
    [f2] = best_fragments(text2, {"value"}, analyzer="ws", fragsize=10)
    assert f2.startswith("<mark>value</mark>")
    assert text2.index(f2.replace("<mark>", "").replace("</mark>", "")) == 0


def test_analyzer_aware_stem_match():
    # standard analyzer stems: query term 'inhibit' marks 'inhibitors'
    text = "the inhibitors of kinase signaling were tested in trials"
    [f] = best_fragments(text, {"inhibitor"}, analyzer="standard", fragsize=40)
    assert "<mark>inhibitors</mark>" in f


def test_no_match_returns_empty():
    assert best_fragments("nothing relevant here", {"zzz"}, "ws", 40) == []


def test_multi_fragments_do_not_overlap():
    text = ("value one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen value tail words here")
    frags = best_fragments(text, {"value"}, analyzer="ws", fragsize=15, n_frags=2)
    assert len(frags) == 2
    plains = [f.replace("<mark>", "").replace("</mark>", "") for f in frags]
    s0, s1 = (text.index(p) for p in plains)
    e0, e1 = (s + len(p) for s, p in zip((s0, s1), plains))
    assert e0 <= s1 or e1 <= s0  # disjoint char ranges


def test_anchor_longer_than_budget_still_returned():
    text = "xx supercalifragilisticexpialidocious yy"
    [f] = best_fragments(
        text, {"supercalifragilisticexpialidocious"}, "ws", fragsize=5
    )
    assert f == "<mark>supercalifragilisticexpialidocious</mark>"


def test_snippet_results_dataframe(spark):
    df = spark.createDataFrame(
        [("d1", "alpha table beta value gamma"), ("d2", "no hits at all")],
        "doc string, text string",
    )
    out = snippet_results(df, ["table", "value"], analyzer="ws", fragsize=20)
    rows = {r["doc"]: r["snippets"] for r in out.collect()}
    assert rows["d1"] and "<mark>table</mark>" in rows["d1"][0]
    assert rows["d2"] == []
