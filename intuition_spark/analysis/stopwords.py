"""English stopword set.

This is the classic 33-word English stop set that Lucene/Solr apply by default
in the ``text_general`` analysis chain (public: Lucene's
``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``). The reference relies on Solr
defaults — it ships no schema — so its ``text`` field is analyzed with exactly
this set (see SURVEY.md §2.4 B2, reference `SolrServiceImpl.java:434`).
"""

ENGLISH_STOPWORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)
