from intuition_spark.analysis import analyze_text, porter_stem
from intuition_spark.analysis.analyzers import doc_postings


def test_standard_tokens_and_positions():
    # stopwords removed but still consume a position (Lucene StopFilter)
    toks = analyze_text("the quick brown fox", "standard")
    assert toks == [("quick", 1), ("brown", 2), ("fox", 3)]


def test_standard_stems():
    toks = analyze_text("running runs runner", "standard")
    assert [t for t, _ in toks] == ["run", "run", "runner"]


def test_superscript_artifact_split():
    # textTransform analogue: BRAF^(V600E) → braf, v600e as separate tokens
    toks = analyze_text("BRAF^(V600E) detected", "standard")
    assert [t for t, _ in toks][:2] == ["braf", "v600e"]


def test_ws_analyzer_keeps_stopwords_no_stem():
    toks = analyze_text("The running DOG", "ws")
    assert toks == [("the", 0), ("running", 1), ("dog", 2)]


def test_empty_and_none():
    assert analyze_text("", "standard") == []
    assert analyze_text(None, "standard") == []


def test_positions_count_equals_tf():
    toks = analyze_text("a b c b c c", "ws")
    posts = {t: (tf, ps) for t, tf, ps in doc_postings(toks)}
    assert posts["c"][0] == 3 and len(posts["c"][1]) == 3
    assert posts["b"][0] == 2


def test_porter_known_pairs():
    # classic examples from the Porter paper
    for src, want in [
        ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
        ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
        ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
        ("troubling", "troubl"), ("sized", "size"), ("hopping", "hop"),
        ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
        ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
        ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
        ("rational", "ration"), ("valenci", "valenc"), ("digitizer", "digit"),
        ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
        ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
        ("goodness", "good"), ("revival", "reviv"), ("allowance", "allow"),
        ("inference", "infer"), ("airliner", "airlin"), ("adjustable", "adjust"),
        ("defensible", "defens"), ("irritant", "irrit"), ("replacement", "replac"),
        ("adjustment", "adjust"), ("dependent", "depend"), ("adoption", "adopt"),
        ("homologou", "homolog"), ("communism", "commun"), ("activate", "activ"),
        ("angulariti", "angular"), ("homologous", "homolog"), ("effective", "effect"),
        ("bowdlerize", "bowdler"), ("probate", "probat"), ("rate", "rate"),
        ("cease", "ceas"), ("controll", "control"), ("roll", "roll"),
    ]:
        assert porter_stem(src) == want, f"{src}: got {porter_stem(src)}, want {want}"
