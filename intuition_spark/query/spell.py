"""Multi-word spell suggestion + query collation.

The reference suggests per word from a Lucene ``SpellChecker`` over a plain
dictionary (`util/SpellChecking.java:19-48`, per-word ``checkSpelling``
`:80-92`) and composes corrected queries app-side. Re-expressed over the
engine's OWN dictionary table (term → df), which is what Solr's
spellcheck.collate does: suggest per query token, then emit one collated
corrected query.

Collation rule (deterministic, reproduced verbatim by the SQL oracle of the
``fts_engine_spell_collate`` EXTRA gate entry):

* a token is CORRECTABLE iff its document frequency is below ``low_df``
  (absent tokens have df 0 — the misspelling case);
* its candidates are dictionary terms at Levenshtein distance ≤ ``max_edit``
  (≠ itself), and a candidate is ACCEPTED only when its df dominates:
  ``candidate_df ≥ dominance · max(token_df, 1)`` — a rare token never
  "corrects" to a barely-more-common near-neighbour;
* the winning suggestion is the candidate with the highest df, ties broken
  by term ascending;
* the collated query substitutes each winning suggestion for its token.

Plan shape: ONE pushdown dictionary scan joined (broadcast-nested-loop —
the query side is a handful of tokens) against the broadcast token frame,
JVM-side ``levenshtein``; no per-row Python, no collect of the dictionary.
At 10^12 turns the dictionary is the only big side and it streams once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collate_suggestions(
    dictionary: DataFrame,
    tokens: list[str],
    low_df: int = 3,
    max_edit: int = 1,
    dominance: int = 2,
) -> DataFrame:
    """Per-token suggestions + the collated corrected query.

    ``dictionary``: (term, df) — e.g. ``spark.read.parquet(paths.dictionary)``.
    Returns one row per query token:
    (pos, token, df, suggestion, suggestion_df, effective, collated)
    where ``suggestion`` is NULL for tokens left alone and ``collated`` is
    the corrected query string (identical on every row).
    """
    spark = dictionary.sparkSession
    dic = dictionary.select("term", F.col("df").cast("long").alias("df"))
    qdf = spark.createDataFrame(
        list(enumerate(tokens)), "pos int, token string"
    )
    # the token frame is the broadcast side everywhere (the dictionary is
    # the only big side and streams once)
    orig = (
        dic.join(F.broadcast(qdf), F.col("term") == F.col("token"), "right")
        .select("pos", "token", F.coalesce("df", F.lit(0)).alias("df"))
    )
    low = orig.filter(F.col("df") < low_df).select(
        "pos", F.col("token").alias("ltoken"), F.col("df").alias("ldf")
    )
    cand = dic.join(
        F.broadcast(low),
        (F.abs(F.length("term") - F.length("ltoken")) <= max_edit)
        & (F.col("term") != F.col("ltoken"))
        & (F.levenshtein(F.col("term"), F.col("ltoken")) <= max_edit),
    ).filter(F.col("df") >= dominance * F.greatest(F.col("ldf"), F.lit(1)))
    w = Window.partitionBy("pos").orderBy(F.col("df").desc(), F.col("term").asc())
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pos", F.col("term").alias("suggestion"),
                F.col("df").alias("suggestion_df"))
    )
    rows = (
        orig.join(best, "pos", "left")
        .withColumn("effective", F.coalesce("suggestion", "token"))
        .withColumn("suggestion_df", F.coalesce("suggestion_df", F.lit(0)))
    )
    wall = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return rows.select(
        "pos", "token", "df", "suggestion",
        F.col("suggestion_df").cast("long").alias("suggestion_df"),
        "effective",
        F.concat_ws(" ", F.collect_list("effective").over(wall)).alias("collated"),
    )
