"""Sequence-search position arithmetic (`MIND/GeneMINDImpl.java:74-95,
189-241`): the frame-shift query generator is byte-pinned against the
reference algorithm's output, and coordinate recovery follows findSequence's
forward/reverse start/end rules. The dual-engine identity on the real corpus
(k-mer-index first hits vs strpos oracle) is the `fts_q18_coords` EXTRA
entry (tests/test_gate_extra.py)."""

from intuition_spark.functions.sequence import (
    doc_offsets,
    first_match_coords,
    frame_shift_queries,
)
from intuition_spark.functions.text import rc_str


def _reference_wildcard(seq: str, n: int, fuzzy: bool) -> str:
    """Literal transcription of GeneMINDImpl.wildcard (Java:74-83), kept as
    the test-side twin so frame_shift_queries is pinned to the reference
    algorithm, not to itself."""
    out = []
    for i in range(len(seq) + n):
        if i != 0 and i % 5 == 0:
            out.append("~1 " if fuzzy else " ")
        out.append("?" if i < n else seq[i - n])
    if (len(seq) + n) % 5 != 0:
        out.append("*~1" if fuzzy else "*")
    return "".join(out)


def test_frame_shift_queries_match_reference_algorithm():
    for seq in ("tablepart", "acgta", "acgtacgtacg"):
        for fuzzy in (False, True):
            assert frame_shift_queries(seq, fuzzy) == [
                _reference_wildcard(seq, n, fuzzy) for n in range(5)
            ]


def test_frame_shift_known_values():
    assert frame_shift_queries("tablepart") == [
        "table part*",
        "?tabl epart",
        "??tab lepar t*",
        "???ta blepa rt*",
        "????t ablep art*",
    ]
    # fuzzy mode: '~1' rides each interior token break (Java appends
    # '~1 ' as the separator) and the trailing partial token gets '*~1';
    # an exactly-on-grid single token carries no marker at all
    assert frame_shift_queries("table", fuzzy=True)[0] == "table"
    assert frame_shift_queries("table", fuzzy=True)[1] == "?tabl~1 e*~1"


def test_coords_reference_rules(spark):
    # doc 0: 'xxtablepartyy' (fwd hit at base 2); doc 1 holds the rc of the
    # query (rc hit at base 3); doc 2: both absent
    q = "tablepart"
    rc = rc_str(q)
    texts = [(0, "xx" + q + "yy"), (1, "zzz" + rc + "w"), (2, "nothinghere")]
    docs = spark.createDataFrame(texts, "doc_id long, s string")
    offs = doc_offsets(docs)
    off = {r["doc_id"]: r["base_off"] for r in offs.collect()}
    assert off == {0: 0, 1: 13, 2: 13 + 4 + len(rc)}
    fwd = spark.createDataFrame([(0, 2)], "doc_id long, first_base long")
    rcf = spark.createDataFrame([(1, 3)], "doc_id long, first_base long")
    out = {(r["doc_id"], r["strand"]): r
           for r in first_match_coords(fwd, rcf, offs, len(q)).collect()}
    f = out[(0, "fwd")]
    assert (f["coord_start"], f["coord_end"]) == (2, 2 + len(q))
    r = out[(1, "rc")]
    # reverse strand: start runs from the FAR end (findSequence:228-231)
    assert (r["coord_start"], r["coord_end"]) == (13 + 3 + len(q), 13 + 3)
