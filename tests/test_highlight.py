from intuition_spark.query.highlight import highlight_results, keyword_sentence_islands


def test_highlight_stem_aware(spark):
    df = spark.createDataFrame(
        [("d0", "The Inhibitors strongly inhibit BRAF signaling; inhibition confirmed.")],
        "doc string, text string",
    )
    # query terms arrive already analyzed (stems), as the engine produces them
    out = highlight_results(df, ["inhibit", "inhibitor", "braf"], analyzer="standard").collect()[0]
    h = out["highlighted"]
    assert "<mark>Inhibitors</mark>" in h  # stem match preserves original case
    assert "<mark>inhibit</mark>" in h
    assert "<mark>BRAF</mark>" in h
    assert "<mark>inhibition</mark>" in h  # porter: inhibition → inhibit
    assert "<mark>signaling</mark>" not in h


def test_highlight_ws_exact_only(spark):
    df = spark.createDataFrame([("d0", "inhibit inhibitors")], "doc string, text string")
    h = highlight_results(df, ["inhibit"], analyzer="ws").collect()[0]["highlighted"]
    assert h == "<mark>inhibit</mark> inhibitors"  # ws field: no stemming


def test_sentence_islands(spark):
    text = (
        "Braf is discussed here. Unrelated one. Unrelated two. Unrelated three. "
        "Braf again appears. And braf once more. Final filler sentence."
    )
    df = spark.createDataFrame([("d0", text)], "doc string, text string")
    islands = keyword_sentence_islands(df, ["braf"], gap=2).orderBy("island").collect()
    # sentence 0 is its own island (gap of 3 to sentence 4); sentences 4,5 merge
    assert len(islands) == 2
    assert islands[0]["first_sent"] == 0 and islands[0]["n_hit_sentences"] == 1
    assert islands[1]["first_sent"] == 4 and islands[1]["last_sent"] == 5


def test_abbreviations_not_split(spark):
    df = spark.createDataFrame(
        [("d0", "As shown by Smith et al. the braf pathway matters. Another sentence.")],
        "doc string, text string",
    )
    islands = keyword_sentence_islands(df, ["braf"]).collect()
    assert len(islands) == 1
    assert "et al. the braf pathway" in islands[0]["island_text"]
