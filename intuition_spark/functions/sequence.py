"""Sequence-search position arithmetic: frame-shifted query generation and
hit-position → genomic-coordinate recovery (the residual Q18 parity gap,
`MIND/GeneMINDImpl.java:74-95, 189-241`).

The reference indexes the genome as NON-OVERLAPPING 5-char tokens, so a
query substring aligned at an arbitrary offset must be searched under all
five frame shifts: ``wildcard(seq, n)`` prepends n ``?`` wildcards and
re-tokenizes every 5 chars (`GeneMINDImpl.java:74-83`), and ``findSequence``
ORs frames 0–4 over both strands (`:189-241`). Our engine's k-mer index
stores every OVERLAPPING 5-mer with its base position, so frame alignment
is structurally unnecessary — :func:`frame_shift_queries` reproduces the
reference's query strings exactly (unit-pinned) to document the parity, and
:func:`first_match_coords` reproduces the part that still matters: turning
a per-document hit position into an absolute coordinate with the
reference's forward/reverse start/end rules (`findSequence:222-233`):

* forward strand:  start = offset + indexOf(seq); end = start + len(seq)
* reverse strand (doc contains rc(seq)): the reported START is
  offset + indexOf(rc) + len(rc) and the END is offset + indexOf(rc) —
  coordinates run against the reading direction on the other strand.

``offset`` is the document's absolute base offset — for the reference's
t2t chunks it is the stored per-chunk ``position``; for a chunked corpus it
is the running sum of despaced document lengths in doc_id order, which both
engines (and the SQL oracle) derive identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frame_shift_queries(seq: str, fuzzy: bool = False) -> list[str]:
    """The reference's five frame-shifted token queries for ``seq`` —
    byte-identical to ``GeneMINDImpl.wildcard(seq, n, fuzzy)`` for n=0..4
    (leading ``?`` pads, a token break every 5 chars, a trailing ``*`` when
    the padded length is off-grid, ``~1`` per token in fuzzy mode)."""
    out = []
    for n in range(5):
        parts: list[str] = []
        for i in range(len(seq) + n):
            if i != 0 and i % 5 == 0:
                parts.append("~1 " if fuzzy else " ")
            parts.append("?" if i < n else seq[i - n])
        if (len(seq) + n) % 5 != 0:
            parts.append("*~1" if fuzzy else "*")
        out.append("".join(parts))
    return out


def doc_offsets(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "s") -> DataFrame:
    """(doc_id, base_off): absolute base offset of each document = running sum
    of despaced lengths in doc_id order — the coordinate system the t2t
    chunks' stored ``position`` provides in the reference. A window cumsum;
    at genome scale this is one sort by the (already sorted) doc id."""
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    return docs.select(
        id_col,
        F.coalesce(F.sum(F.length(text_col)).over(w), F.lit(0)).alias("base_off"),
    )


def first_match_coords(
    fwd_first: DataFrame,
    rc_first: DataFrame,
    offsets: DataFrame,
    seq_len: int,
) -> DataFrame:
    """Per-doc absolute coordinates of the FIRST occurrence on each strand.

    ``fwd_first``/``rc_first``: (doc_id, first_base) of the query / of
    rc(query) on the forward text (the engine's k-mer vote minimum, or the
    oracle's strpos-1). Emits one row per (doc, strand) with the reference's
    start/end rules; ``strand`` is 'fwd'/'rc' (`findSequence` sets
    ``forward`` accordingly)."""
    fwd = (
        fwd_first.join(offsets, "doc_id")
        .select(
            "doc_id",
            F.lit("fwd").alias("strand"),
            F.col("first_base").cast("long").alias("first_base"),
            (F.col("base_off") + F.col("first_base")).cast("long").alias("coord_start"),
            (F.col("base_off") + F.col("first_base") + seq_len)
            .cast("long").alias("coord_end"),
        )
    )
    rc = (
        rc_first.join(offsets, "doc_id")
        .select(
            "doc_id",
            F.lit("rc").alias("strand"),
            F.col("first_base").cast("long").alias("first_base"),
            (F.col("base_off") + F.col("first_base") + seq_len)
            .cast("long").alias("coord_start"),
            (F.col("base_off") + F.col("first_base")).cast("long").alias("coord_end"),
        )
    )
    return fwd.unionByName(rc)
