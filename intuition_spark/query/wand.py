"""Block-max WAND top-k scorer over compressed posting blocks.

The pruning the reference gets for free from Lucene 8's internal WAND
(SURVEY.md §4: "not in Catalyst — implement as a mapPartitions scorer over
block-compressed postings with per-block max-score metadata").

Distribution model: the index is segmented by document (builder.py), so every
segment holds the *complete* posting lists of its docs. Each segment is scored
independently (one Arrow group per segment, no query-time shuffle of
postings), producing a local top-k; the global top-k is the merge of segment
top-ks — identical to exhaustive scoring because block skipping only uses
valid upper bounds (Σ per-group idf·max_impact of overlapping blocks).

Query semantics are the shared AST ones: AND of OR-groups, every group must
match, score = Σ BM25 over all matched terms. The driver group (smallest
segment-local df) enumerates candidate ranges; blocks are decoded lazily and
memoized. Everything inside is numpy — no per-row Python at the Spark
boundary (pandas in, pandas out).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import pandas as pd

from intuition_spark.index import codec

K1 = 1.2
B = 0.75


def _weight(tf, dl, avgdl: float):
    """BM25 term weight sans idf; numpy-broadcastable."""
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@dataclass
class TermBlocks:
    """All posting blocks of one term within one segment (sorted by first_doc).

    Block-max metadata is (max_tf, min_dl): the BM25 weight is increasing in
    tf and decreasing in dl, so idf·w(max_tf, min_dl) upper-bounds every
    posting in the block for any avgdl."""

    term: str
    gid: int
    idf: float
    first: np.ndarray  # int64 per block
    last: np.ndarray
    max_tf: np.ndarray  # int64 per block
    min_dl: np.ndarray  # int64 per block
    avgdl: float
    docs_bin: list[bytes]
    tfs_bin: list[bytes]
    dls_bin: list[bytes]
    ns: np.ndarray
    _decoded: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] | None = None

    @property
    def n_decoded(self) -> int:
        return 0 if self._decoded is None else len(self._decoded)

    def decode(self, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._decoded is None:
            self._decoded = {}
        got = self._decoded.get(bi)
        if got is None:
            n = int(self.ns[bi])
            docs = codec.delta_decode(self.docs_bin[bi], n)
            tfs = codec.varint_decode(self.tfs_bin[bi], n).astype(np.float64)
            dls = codec.varint_decode(self.dls_bin[bi], n).astype(np.float64)
            got = (docs, tfs, dls)
            self._decoded[bi] = got
        return got

    def docs_scores_in_range(self, lo: int, hi: int, avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """(docs, idf·bm25 weights) for this term's postings with lo ≤ doc ≤ hi."""
        b0 = int(np.searchsorted(self.last, lo, side="left"))
        b1 = int(np.searchsorted(self.first, hi, side="right"))
        if b0 >= b1:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ds, ws = [], []
        for bi in range(b0, b1):
            docs, tfs, dls = self.decode(bi)
            i0, i1 = np.searchsorted(docs, [lo, hi + 1])
            if i0 == i1:
                continue
            d = docs[i0:i1]
            tf = tfs[i0:i1]
            dl = dls[i0:i1]
            w = self.idf * _weight(tf, dl, avgdl)
            ds.append(d)
            ws.append(w)
        if not ds:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(ds).astype(np.int64), np.concatenate(ws)

    def max_impact_in_range(self, lo: int, hi: int) -> float:
        b0 = int(np.searchsorted(self.last, lo, side="left"))
        b1 = int(np.searchsorted(self.first, hi, side="right"))
        if b0 >= b1:
            return 0.0
        ub = _weight(
            self.max_tf[b0:b1].astype(np.float64), self.min_dl[b0:b1].astype(np.float64), self.avgdl
        )
        return float(ub.max()) * self.idf


def _group_ub(terms: list[TermBlocks], lo: int, hi: int) -> float:
    """Upper bound of a group's contribution in a doc range: OR sums matched
    clauses, so the bound is the SUM of each member term's block-max."""
    return sum(t.max_impact_in_range(lo, hi) for t in terms)


def in_sorted(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Membership mask of ``values`` in a SORTED-unique ``table`` via one
    binary search per value. np.isin re-sorts the table on EVERY call —
    with a filterCache id set of ~1e5 and one membership test per posting
    block, that re-sort dominated filtered-query latency (measured 2.3 s of
    a 2.7 s fieldq query in np.isin); this is O(|values| log |table|)."""
    if table.size == 0:
        return np.zeros(values.shape, dtype=bool)
    idx = np.searchsorted(table, values)
    idx[idx == table.size] = table.size - 1
    return table[idx] == values


def score_segment_topk(
    term_blocks: list[TermBlocks],
    n_groups: int,
    k: int,
    avgdl: float,
    prune: bool = True,
    excluded: np.ndarray | None = None,
    included: np.ndarray | None = None,
    stats: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (doc_ids, scores) for one segment. With prune=False this is the
    exhaustive scorer (used for the WAND≡exhaustive identity test).

    When ``stats`` is a dict, pruning effectiveness counters are accumulated
    into it: ranges_total / ranges_scored / blocks_total / blocks_decoded."""
    groups: dict[int, list[TermBlocks]] = {}
    for tb in term_blocks:
        groups.setdefault(tb.gid, []).append(tb)
    if len(groups) < n_groups:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    # driver group = fewest segment-local postings (df-ascending ordering,
    # SURVEY.md §4 "order joins smallest-df-first")
    def group_df(ts: list[TermBlocks]) -> int:
        return int(sum(t.ns.sum() for t in ts))

    driver_gid = min(groups, key=lambda g: group_df(groups[g]))
    driver = groups[driver_gid]

    # candidate ranges = driver group's blocks, merged across its terms
    ranges = sorted(
        (int(t.first[i]), int(t.last[i])) for t in driver for i in range(len(t.first))
    )
    merged: list[list[int]] = []
    for lo, hi in ranges:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])

    # impact-ordered range processing with threshold pruning
    scored_ranges = []
    for lo, hi in merged:
        ubs = [_group_ub(ts, lo, hi) for ts in groups.values()]
        if any(u <= 0.0 for u in ubs):  # a required group can't match here
            continue
        scored_ranges.append((sum(ubs), lo, hi))
    # ub DESC, lo ASC: equal-impact ranges must be visited smallest-doc
    # first — the final rank tie-break is doc_id ASC, so among exact score
    # ties the SMALLEST doc ids win and they must enter the heap before the
    # threshold skip fires (a corpus of duplicated docs makes every score
    # identical; descending-lo order returned the LARGEST ids pre-fix).
    scored_ranges.sort(key=lambda r: (-r[0], r[1]))

    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of top-k
    n_scored = 0
    for ub, lo, hi in scored_ranges:
        if prune and len(heap) >= k:
            th = heap[0][0]
            # Strict skip on ub < threshold. At ub == threshold a range can
            # still hold a doc scoring exactly threshold that WINS the
            # doc_id tie-break, so it is skippable only when every doc in it
            # (all ≥ lo) already loses to the heap's worst-at-threshold doc
            # (-heap[0][1]). Ranges are (ub desc, lo asc)-ordered, so the
            # first skippable range implies all later ones are too.
            if ub < th or (ub == th and lo > -heap[0][1]):
                break
        n_scored += 1
        # exact evaluation of the range
        cand: np.ndarray | None = None
        per_group: list[tuple[np.ndarray, np.ndarray]] = []
        for gid, ts in groups.items():
            gd: dict = {}
            docs_list, w_list = [], []
            for t in ts:
                # t.avgdl, not the global param: multi-field queries mix
                # TermBlocks from different analyzed fields, each scored
                # with its own field's average doc length (single-field
                # scorers set t.avgdl = the global value, so this is
                # behavior-identical there)
                d, w = t.docs_scores_in_range(lo, hi, t.avgdl)
                docs_list.append(d)
                w_list.append(w)
            d = np.concatenate(docs_list)
            w = np.concatenate(w_list)
            if d.size == 0:
                cand = np.empty(0, np.int64)
                break
            # sum weights per doc (OR = sum of matched clauses)
            order = np.argsort(d, kind="stable")
            d, w = d[order], w[order]
            uniq, starts = np.unique(d, return_index=True)
            sums = np.add.reduceat(w, starts)
            per_group.append((uniq, sums))
            cand = uniq if cand is None else cand[in_sorted(cand, uniq)]
        if cand is None or cand.size == 0:
            continue
        if excluded is not None and excluded.size:
            # tombstoned docs (incremental deletes) never enter the heap
            cand = cand[~in_sorted(cand, excluded)]
            if cand.size == 0:
                continue
        if included is not None:
            # fq intersection (filterCache ids) BEFORE the heap: Solr fq
            # semantics rank only filtered docs. Pruning stays valid —
            # removing candidates only lowers the threshold's growth, every
            # skipped range's upper bound still upper-bounds its docs.
            cand = cand[in_sorted(cand, included)]
            if cand.size == 0:
                continue
        total = np.zeros(cand.size, np.float64)
        for uniq, sums in per_group:
            idx = np.searchsorted(uniq, cand)
            total += sums[idx]
        for doc, sc in zip(cand.tolist(), total.tolist()):
            if len(heap) < k:
                heapq.heappush(heap, (sc, -doc))
            elif (sc, -doc) > heap[0]:
                heapq.heapreplace(heap, (sc, -doc))
    if stats is not None:
        stats["ranges_total"] = stats.get("ranges_total", 0) + len(scored_ranges)
        stats["ranges_scored"] = stats.get("ranges_scored", 0) + n_scored
        stats["blocks_total"] = stats.get("blocks_total", 0) + sum(
            len(t.first) for ts in groups.values() for t in ts
        )
        stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + sum(
            t.n_decoded for ts in groups.values() for t in ts
        )
    if not heap:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    heap.sort(reverse=True)
    docs = np.array([-d for _, d in heap], dtype=np.int64)
    scores = np.array([s for s, _ in heap], dtype=np.float64)
    return docs, scores


def build_term_blocks(
    pdf: pd.DataFrame,
    term_meta: dict,
    avgdl: float,
) -> list[TermBlocks]:
    """Block rows of ONE segment → TermBlocks list (shared by the plain and
    cogrouped scorer factories). Multi-field queries ship a ``fld`` column
    alongside ``term`` (a field name can't be smuggled INTO the term string —
    analyzed terms may contain any separator byte); meta is then keyed by
    (fld, term)."""
    tbs: list[TermBlocks] = []
    multifield = "fld" in pdf.columns
    gcols = ["fld", "term"] if multifield else "term"
    for tkey, tdf in pdf.groupby(gcols, sort=False):
        gid, idf, *rest = term_meta[tuple(tkey) if multifield else tkey]
        t_avgdl = rest[0] if rest else avgdl
        term = tkey[1] if multifield else tkey
        # block ids are only unique per build task; first_doc is the true
        # global order (ranges are disjoint by construction)
        tdf = tdf.sort_values("first_doc")
        tbs.append(
            TermBlocks(
                term=term,
                gid=gid,
                idf=idf,
                first=tdf["first_doc"].to_numpy(np.int64),
                last=tdf["last_doc"].to_numpy(np.int64),
                max_tf=tdf["max_tf"].to_numpy(np.int64),
                min_dl=tdf["min_dl"].to_numpy(np.int64),
                avgdl=t_avgdl,
                docs_bin=list(tdf["docs_bin"]),
                tfs_bin=list(tdf["tfs_bin"]),
                dls_bin=list(tdf["dls_bin"]),
                ns=tdf["n"].to_numpy(np.int64),
            )
        )
    return tbs


def make_segment_scorer(
    term_meta: dict[str, tuple[int, float]],
    n_groups: int,
    k: int,
    avgdl: float,
    prune: bool,
    excluded: np.ndarray | None = None,
    included: np.ndarray | None = None,
):
    """applyInPandas fn over seg: block rows → local top-k (doc_id, score).

    term_meta: term -> (gid, idf) or (gid, idf, avgdl) — broadcast-small,
    closed over. The 3-tuple form carries a per-term avgdl for multi-field
    queries (terms of different analyzed fields share one scorer; each
    scores against its own field's average doc length — the 2-tuple form
    uses the global ``avgdl``).
    excluded: sorted int64 doc_ids (tombstones) to skip, broadcast-small.
    included: sorted int64 fq doc_ids (filterCache) — when set, ONLY these
    docs may enter the heap (the per-segment top-k is the top-k of the
    FILTERED doc set, Solr fq semantics). Bounded by FQ_MAX_IDS engine-side.
    """

    def scorer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tbs = build_term_blocks(pdf, term_meta, avgdl)
        docs, scores = score_segment_topk(
            tbs, n_groups, k, avgdl, prune=prune, excluded=excluded, included=included
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    return scorer


def make_cogroup_segment_scorer(
    term_meta: dict,
    n_groups: int,
    k: int,
    avgdl: float,
    prune: bool,
    excluded: np.ndarray | None = None,
    included: np.ndarray | None = None,
    dist_included: bool = False,
    dist_excluded: bool = False,
):
    """Cogrouped variant of :func:`make_segment_scorer` for fq predicates /
    tombstone sets too large to collect to the driver (Solr keeps fq bitsets
    per shard; this keeps them per SEGMENT, co-partitioned with the postings).

    The second cogroup side is an id frame ``(doc_id:int64, kind:int8)`` with
    kind=1 for fq-included ids and kind=0 for excluded (tombstone) ids, routed
    to the same segment as its doc (doc_id embeds the segment). Per segment:

    * ``dist_included=True``: the segment's kind-1 ids become the scorer's
      ``included`` set (intersected with a driver-side ``included`` if both
      exist) — a segment with posting blocks but NO fq rows admits nothing,
      exactly the semantics of an empty per-shard fq bitset.
    * ``dist_excluded=True``: the segment's kind-0 ids are unioned into the
      driver-side ``excluded`` array (small MUST_NOT term ids still ride
      driver-side; the unbounded tombstone side stays distributed).

    Pruning stays valid: filtering candidates only slows the threshold's
    growth — every skipped range's upper bound still bounds its docs.
    """

    def scorer(key, blocks_pdf: pd.DataFrame, ids_pdf: pd.DataFrame) -> pd.DataFrame:
        if blocks_pdf.empty:
            return pd.DataFrame(
                {"doc_id": np.empty(0, np.int64), "score": np.empty(0, np.float64)}
            )
        inc = included
        exc = excluded
        if dist_included:
            seg_inc = np.sort(
                ids_pdf.loc[ids_pdf["kind"] == 1, "doc_id"].to_numpy(np.int64)
            )
            inc = seg_inc if inc is None else seg_inc[in_sorted(seg_inc, inc)]
            if inc.size == 0:
                return pd.DataFrame(
                    {"doc_id": np.empty(0, np.int64), "score": np.empty(0, np.float64)}
                )
        if dist_excluded:
            seg_exc = ids_pdf.loc[ids_pdf["kind"] == 0, "doc_id"].to_numpy(np.int64)
            if seg_exc.size:
                exc = (
                    np.sort(seg_exc)
                    if exc is None or not exc.size
                    else np.unique(np.concatenate([exc, seg_exc]))
                )
        tbs = build_term_blocks(blocks_pdf, term_meta, avgdl)
        docs, scores = score_segment_topk(
            tbs, n_groups, k, avgdl, prune=prune, excluded=exc, included=inc
        )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    return scorer
