"""intuition_spark — a PySpark-native full-text (inverted index + BM25) engine.

A from-scratch re-expression of the search/index capabilities of the reference
`lukeczapla/intuition` (Solr/Lucene-backed literature curation platform) as an
idiomatic Spark engine over Parquet/Iceberg tables of multi-turn conversation
transcripts.

Layout:
    analysis/   tokenizer + analyzer chains (vectorized pandas UDFs)
    index/      inverted-index build: postings, segments, codec, checkpoints
    query/      query AST + BM25 executor + WAND segment scorer
    functions/  text analytics, dedup, similarity search, multimodal plumbing
    oracle/     pure-Python exhaustive BM25 oracle (the correctness anchor)
    corpus.py   deterministic synthetic transcript corpus + reference query set
"""

__version__ = "0.1.0"
