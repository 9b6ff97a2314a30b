"""Multi-word spell collation rule (`util/SpellChecking.java:80-92` +
Solr spellcheck.collate analogue): per-token suggest from the dictionary,
dominance gate, deterministic tie-break, whole-query collation. The
dual-engine identity on the real corpus dictionary is pinned by the
`fts_engine_spell_collate` EXTRA entry (tests/test_gate_extra.py)."""

import pytest

from intuition_spark.query.spell import collate_suggestions


@pytest.fixture(scope="module")
def dic(spark):
    return spark.createDataFrame(
        [
            ("table", 100), ("cable", 40), ("fable", 2),
            ("value", 80), ("merge", 60),
            ("rare", 1), ("rate", 1),
        ],
        "term string, df long",
    )


def _by_pos(df):
    return {r["pos"]: r for r in df.collect()}


def test_absent_token_corrects_to_highest_df(spark, dic):
    out = _by_pos(collate_suggestions(dic, ["tble", "merge"]))
    assert out[0]["df"] == 0
    assert out[0]["suggestion"] == "table"  # df 100 beats cable 40, fable 2
    assert out[0]["suggestion_df"] == 100
    assert out[0]["effective"] == "table"
    assert out[1]["suggestion"] is None  # present + high df: untouched
    assert out[0]["collated"] == "table merge"
    assert out[1]["collated"] == "table merge"


def test_low_df_token_needs_dominance(spark, dic):
    # 'rare' (df 1) has the lev-1 neighbour 'rate' (df 1): 1 < 2·max(1,1)
    # → NOT corrected; with dominance lifted it would be
    out = _by_pos(collate_suggestions(dic, ["rare"], low_df=3, dominance=2))
    assert out[0]["suggestion"] is None and out[0]["effective"] == "rare"
    out2 = _by_pos(collate_suggestions(dic, ["rare"], low_df=3, dominance=1))
    assert out2[0]["suggestion"] == "rate"


def test_tie_breaks_lexicographically(spark):
    spark_dic = spark.createDataFrame(
        [("bat", 10), ("cat", 10), ("hat", 10)], "term string, df long"
    )
    out = _by_pos(collate_suggestions(spark_dic, ["aat"]))
    assert out[0]["suggestion"] == "bat"  # equal df → term ASC


def test_no_candidate_left_alone(spark, dic):
    out = _by_pos(collate_suggestions(dic, ["zzzzqq"]))
    assert out[0]["suggestion"] is None
    assert out[0]["effective"] == "zzzzqq"
    assert out[0]["collated"] == "zzzzqq"


def test_full_collation_order(spark, dic):
    out = collate_suggestions(dic, ["tble", "vlue", "merge"]).collect()
    assert [r["effective"] for r in sorted(out, key=lambda r: r["pos"])] == [
        "table", "value", "merge"
    ]
    assert all(r["collated"] == "table value merge" for r in out)
