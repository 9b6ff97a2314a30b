"""Trained-BPE token counting (functions/bpe.py). The merge-decision
trajectory is dual-engine-pinned by the `text_bpe_train` EXTRA entry
(tests/test_gate_extra.py); here: the vectorized counting UDF reproduces the
training totals exactly, application semantics (left-to-right non-overlap),
determinism, and the histogram cap knob."""

import pytest

from intuition_spark.functions.bpe import (
    _apply_merge,
    bpe_token_count,
    make_bpe_count_udf,
    train_bpe,
    word_histogram,
)

TEXTS = [
    "low low low lower lowest",
    "new newer newest newest",
    "low new lowest newest",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_merge_pass_is_left_to_right_nonoverlapping():
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _apply_merge(["ab", "c", "d"], "b", "c") == ["ab", "c", "d"]  # no substring match


def test_udf_counts_match_training_totals(spark, corpus):
    res = train_bpe(corpus, "text", n_merges=5)
    assert len(res["merges"]) == 5
    # corpus-wide UDF count == the training trajectory's final total
    total = (
        bpe_token_count(corpus, res["merges"])
        .groupBy()
        .sum("bpe_tokens")
        .collect()[0][0]
    )
    assert total == res["tokens_after"][-1]
    # fewer merges → more tokens (strictly monotone while merges apply)
    res2 = train_bpe(corpus, "text", n_merges=2)
    assert res2["merges"] == res["merges"][:2]  # prefix-stable trajectory
    total2 = (
        bpe_token_count(corpus, res2["merges"])
        .groupBy().sum("bpe_tokens").collect()[0][0]
    )
    assert total2 == res2["tokens_after"][-1] >= res["tokens_after"][-1]


def test_unseen_word_and_bounds(spark, corpus):
    res = train_bpe(corpus, "text", n_merges=4)
    udf = make_bpe_count_udf(res["merges"])
    df = spark.createDataFrame(
        [("zzz unseen low",), ("",)], "text string"
    ).withColumn("c", udf("text"))
    rows = {r["text"]: r["c"] for r in df.collect()}
    # count ≤ char count and ≥ word count; empty text → 0
    assert 3 <= rows["zzz unseen low"] <= len("zzzunseenlow")
    assert rows[""] == 0


def test_histogram_cap_is_topv_deterministic(spark, corpus):
    full = word_histogram(corpus, "text")
    cap = word_histogram(corpus, "text", max_words=3)
    assert len(cap) == 3
    want = sorted(
        zip(full["word"], full["n"].astype(int)), key=lambda t: (-t[1], t[0])
    )[:3]
    assert sorted(zip(cap["word"], cap["n"].astype(int)),
                  key=lambda t: (-t[1], t[0])) == want
