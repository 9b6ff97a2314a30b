"""Query debug / score explanation — the Solr ``debugQuery=true`` analogue.

The reference turns on Solr's debug surface for its paged searches
(``query.setParam("debugQuery", "true")``, `util/SolrClientTool.java:274`),
which returns the parsed query, the chosen execution strategy, and per-doc
Lucene ``Explanation`` trees (idf/tf/norm factors summing to the hit score).
This module provides the same two surfaces over the engine:

* :func:`explain` — runs the query and reports the parse (atoms → analyzed
  terms with df/cf/idf), the EXECUTED path (driver fast path vs distributed
  WAND vs exhaustive — observed from the engine's instrumentation, not
  re-derived, so it can't drift from the real router), the driver-admission
  arithmetic (Σdf / Σcf vs budgets), and the filterCache resolution.
* :func:`explain_doc` — a per-document score breakdown: one record per
  matching (field, atom) with boost, idf, tf, dl, avgdl and the BM25
  contribution, whose sum reproduces the engine's hit score exactly
  (tests assert equality against ``search()``), plus the mm=100% group
  accounting and every non-scoring gate (fq predicates, MUST_NOT
  exclusions, tombstones) with its verdict for this doc.

Both execute like Solr's debug mode does — explain() observes a real run;
explain_doc() reuses the engine's own block cache, decode, and sloppy-phrase
matcher (`_phrase_seg_match`), so the numbers ARE the scorer's numbers.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from intuition_spark.analysis.analyzers import analyze_text
from intuition_spark.index import codec
from intuition_spark.index.builder import decode_blocks_df
from intuition_spark.query import wand
from intuition_spark.query.ast import Query

_SCORING_KINDS = ("term", "and", "or_groups", "phrase", "proximity")
_MULTITERM_KINDS = ("wildcard", "regex", "fuzzy")


def _raw_atoms(q: Query, analyzer: str):
    """(gid, raw_atom, analyzed_terms) triples — same enumeration order and
    gid assignment as SearchEngine._parse_atoms."""
    out = []
    for gid, group in enumerate(q.groups):
        for raw in group:
            toks = [t for t, _ in analyze_text(raw, analyzer)]
            if toks:
                out.append((gid, raw, toks))
    return out


def explain(engine, q: Query, mode: str = "auto") -> dict:
    """Run ``q`` and report parse + routing + admission + fq debug info."""
    from intuition_spark.query.engine import bm25_idf

    a = engine._route(q)
    engine._ensure_warm(a)
    t0 = time.time()
    engine.search(q, mode)
    cached = engine.last_path == "result_cache"
    if cached:
        # report the EXECUTOR a cold run takes, and note the cache hit
        engine._search_uncached(q, a, mode)
    wall_s = round(time.time() - t0, 4)

    fields = dict(q.fields) if q.fields else {a: 1.0}
    out: dict = {
        "query_id": q.query_id,
        "kind": q.kind,
        "k": q.k,
        "offset": q.offset,
        "mode_requested": mode,
        "path": engine.last_path,
        "result_cache_hit": cached,
        "routed_index": a,
        "snapshot_id": (engine._snap.get(a) or {}).get("snapshot_id"),
        "wall_s": wall_s,
    }

    per_field = []
    for f, w in fields.items():
        engine._ensure_warm(f)
        stats = engine.stats[f]
        finfo: dict = {
            "field": f,
            "boost": float(w),
            "analyzer": engine._analyzer_of(f),
            "N": int(stats["N"]),
            "avgdl": stats["avgdl"],
        }
        if q.kind in _MULTITERM_KINDS:
            pattern = q.groups[0][0]
            terms = engine._expand_cached(f, pattern, q.kind)
            if terms is None:
                terms = engine.expand_dictionary(f, pattern, q.kind)
            finfo["multiterm"] = {
                "pattern": pattern,
                "rewrite": "constant_score",  # Lucene CONSTANT_SCORE rewrite
                "n_expanded": len(terms),
                "expanded_sample": sorted(terms)[:20],
            }
            terms_for_admission = sorted(terms)
            positional = False
            atoms_info = []
        elif q.kind == "tf_sort":
            term = analyze_text(q.groups[0][0], engine._analyzer_of(f))[0][0]
            terms_for_admission = [term]
            positional = False
            dfs = engine._dfs_for_terms(f, [term])
            atoms_info = [{
                "gid": 0, "atom": q.groups[0][0], "terms": [term],
                "per_term": [{"term": term, "df": dfs[term]}],
                "note": "ranked by raw termfreq desc, ts desc — no BM25",
            }]
        else:
            raws = _raw_atoms(q, engine._analyzer_of(f))
            all_terms = sorted({t for _, _, toks in raws for t in toks})
            dfs = engine._dfs_for_terms(f, all_terms)
            cache = engine._dict_cache.get(f) or {}
            atoms_info = []
            for gid, raw, toks in raws:
                atoms_info.append({
                    "gid": gid,
                    "atom": raw,
                    "terms": toks,
                    **({"slop": q.slop} if len(toks) > 1 else {}),
                    "per_term": [
                        {
                            "term": t,
                            "df": int(dfs.get(t, 0)),
                            "cf": int(cache.get(t, (0, 0))[1]),
                            "idf": round(bm25_idf(stats["N"], dfs.get(t, 0)), 6),
                        }
                        for t in toks
                    ],
                })
            terms_for_admission = all_terms
            positional = any(len(toks) > 1 for _, _, toks in raws)
        ex_terms = engine._exclude_terms(q, f)
        dcache = engine._dict_cache.get(f)
        adm_terms = terms_for_admission + ex_terms
        sum_df = (
            sum(dcache.get(t, (0, 0))[0] for t in adm_terms) if dcache else None
        )
        sum_cf = (
            sum(dcache.get(t, (0, 0))[1] for t in adm_terms)
            if (dcache and positional)
            else None
        )
        finfo["atoms"] = atoms_info
        finfo["excluded_terms"] = ex_terms
        finfo["admission"] = {
            "sum_df": sum_df,
            "postings_budget": engine.SMALL_QUERY_POSTINGS,
            "positional": positional,
            "sum_cf": sum_cf,
            "positions_budget": engine.SMALL_QUERY_POSITIONS if positional else None,
            "driver_eligible": engine._small_enough(f, adm_terms, positional),
        }
        per_field.append(finfo)
    out["fields"] = per_field

    preds = []
    for fcol, fval in sorted((q.field_eq or {}).items()):
        preds.append({"predicate": f"{fcol}:{fval!r}"})
    if q.require_no_tool:
        preds.append({"predicate": "tool IS NULL"})
    if q.ts_after is not None:
        preds.append({"predicate": f"ts >= {q.ts_after}"})
    if preds:
        ids = engine._fq_ids(a, q)
        out["fq"] = {
            "predicates": [p["predicate"] for p in preds],
            "resolved_n_ids": None if ids is None else int(ids.size),
            "oversize_distributed": ids is None,
            "max_ids": engine.FQ_MAX_IDS,
        }
    if q.filter_docs is not None:
        out["filter_docs"] = {
            "n": len(q.filter_docs),
            "note": "arbitrary doc-list fq — always the distributed path",
        }
    return out


def _find_posting(pdf: pd.DataFrame, doc_id: int):
    """(tf, dl, seg) of ``doc_id`` in decoded block rows, or None — the same
    delta/varint decode the driver scorer uses, narrowed by block ranges."""
    for row in pdf.itertuples(index=False):
        if int(row.first_doc) <= doc_id <= int(row.last_doc):
            docs = codec.delta_decode(row.docs_bin, int(row.n))
            i = int(np.searchsorted(docs, doc_id))
            if i < docs.size and int(docs[i]) == doc_id:
                tf = int(codec.varint_decode(row.tfs_bin, int(row.n))[i])
                dl = int(codec.varint_decode(row.dls_bin, int(row.n))[i])
                return tf, dl, int(row.seg)
    return None


def explain_doc(engine, q: Query, doc: str) -> dict:
    """Per-document score breakdown (the Lucene ``Explanation`` analogue)."""
    from intuition_spark.query.engine import B, K1, bm25_idf, _phrase_seg_match

    a = engine._route(q)
    engine._ensure_warm(a)
    if q.fields:
        engine._validate_fields(q)
    meta = (
        engine._docs(a).filter(F.col("doc") == doc).limit(1).toPandas()
    )
    if meta.empty:
        return {"doc": doc, "found": False, "matched": False}
    row = meta.iloc[0]
    doc_id = int(row["doc_id"])
    out: dict = {"doc": doc, "found": True, "doc_id": doc_id}

    contributions: list[dict] = []
    groups_matched: set[int] = set()
    all_gids: set[int] = set()
    fields = dict(q.fields) if q.fields else {a: 1.0}

    if q.kind in _SCORING_KINDS:
        for f, w in fields.items():
            engine._ensure_warm(f)
            stats = engine.stats[f]
            N, avgdl = int(stats["N"]), stats["avgdl"]
            raws = _raw_atoms(q, engine._analyzer_of(f))
            all_gids |= {gid for gid, _, _ in raws}
            for gid, raw, toks in raws:
                if len(toks) == 1:
                    t = toks[0]
                    hit = _find_posting(engine._collect_blocks(f, [t]), doc_id)
                    if hit is None:
                        continue
                    tf, dl, _ = hit
                    df = engine._dfs_for_terms(f, [t])[t]
                    idf = bm25_idf(N, df)
                    contributions.append({
                        "field": f, "boost": float(w), "gid": gid, "atom": raw,
                        "term": t, "df": int(df), "idf": idf, "tf": tf, "dl": dl,
                        "avgdl": avgdl,
                        "contribution": float(
                            w * idf * wand._weight(float(tf), float(dl), avgdl)
                        ),
                    })
                    groups_matched.add(gid)
                else:
                    uniq = sorted(set(toks))
                    pdf = engine._collect_blocks(f, uniq, with_positions=True)
                    probe = _find_posting(pdf[pdf["term"] == toks[0]], doc_id)
                    if probe is None:
                        continue  # first token absent → phrase can't match
                    seg = probe[2]
                    mf = _phrase_seg_match(pdf[pdf["seg"] == seg], toks, q.slop)
                    mrow = mf[mf["doc_id"] == doc_id]
                    if mrow.empty:
                        continue
                    tf = float(mrow["tf"].iloc[0])  # sloppy freq (Σ 1/(1+dist))
                    dl = float(mrow["dl"].iloc[0])
                    dfs = engine._dfs_for_terms(f, uniq)
                    # per TOKEN POSITION, like Lucene PhraseWeight
                    idf_sum = sum(bm25_idf(N, dfs.get(t, 0)) for t in toks)
                    contributions.append({
                        "field": f, "boost": float(w), "gid": gid, "atom": raw,
                        "terms": toks, "slop": q.slop, "idf_sum": idf_sum,
                        "sloppy_tf": tf, "dl": dl, "avgdl": avgdl,
                        "contribution": float(
                            w * idf_sum * tf * (K1 + 1.0)
                            / (tf + K1 * (1.0 - B + B * dl / avgdl))
                        ),
                    })
                    groups_matched.add(gid)
    elif q.kind in _MULTITERM_KINDS:
        pattern = q.groups[0][0]
        terms = engine._expand_cached(a, pattern, q.kind)
        if terms is None:
            terms = engine.expand_dictionary(a, pattern, q.kind)
        all_gids = {0}
        hit_terms = []
        if terms:
            hit_terms = sorted(
                r["term"]
                for r in decode_blocks_df(engine._blocks(a, terms))
                .filter(F.col("doc_id") == doc_id)
                .select("term").distinct().collect()
            )
        if hit_terms:
            groups_matched.add(0)
            contributions.append({
                "field": a, "gid": 0, "atom": pattern,
                "rewrite": "constant_score", "matched_terms": hit_terms,
                "contribution": 1.0,
            })
        out["n_expanded"] = len(terms)
    elif q.kind == "tf_sort":
        term = analyze_text(q.groups[0][0], engine._analyzer_of(a))[0][0]
        all_gids = {0}
        hit = _find_posting(engine._collect_blocks(a, [term]), doc_id)
        if hit is not None:
            groups_matched.add(0)
            contributions.append({
                "field": a, "gid": 0, "term": term, "tf": hit[0],
                "note": "score IS the raw termfreq (ts desc tiebreak)",
                "contribution": float(hit[0]),
            })

    # ---- non-scoring gates, each with its verdict for THIS doc ----------
    gates: list[dict] = []
    ex_terms = engine._exclude_terms(q, a)
    if ex_terms:
        hit_ex = [
            t for t in ex_terms
            if _find_posting(engine._collect_blocks(a, [t]), doc_id) is not None
        ]
        gates.append({"gate": "exclude (MUST_NOT)", "terms": ex_terms,
                      "pass": not hit_ex, "matched_excluded_terms": hit_ex})
    tomb = engine._tombstones(a)
    if tomb.size:
        dead = bool(wand.in_sorted(np.asarray([doc_id], dtype=np.int64), tomb)[0])
        gates.append({"gate": "tombstones", "pass": not dead})
    for fcol, fval in sorted((q.field_eq or {}).items()):
        v = row.get(fcol)
        ok = (
            bool(fval in v)
            if isinstance(v, (list, np.ndarray))
            else bool(pd.notna(v) and v == fval)
        )
        gates.append({"gate": f"fq {fcol}:{fval!r}", "pass": ok,
                      "doc_value": v.tolist() if isinstance(v, np.ndarray) else v})
    if q.require_no_tool:
        gates.append({"gate": "fq tool IS NULL", "pass": bool(pd.isna(row.get("tool")))})
    if q.ts_after is not None:
        ts = pd.Timestamp(row["ts"])
        bound = pd.Timestamp(q.ts_after)
        if ts.tzinfo is None and bound.tzinfo is not None:
            sess_tz = engine.spark.conf.get("spark.sql.session.timeZone", "UTC")
            bound = bound.tz_convert(sess_tz).tz_localize(None)
        elif ts.tzinfo is not None and bound.tzinfo is None:
            bound = bound.tz_localize(ts.tzinfo)
        gates.append({"gate": f"fq ts >= {q.ts_after}", "pass": bool(ts >= bound)})
    if q.filter_docs is not None:
        gates.append({"gate": "filter_docs", "pass": doc in q.filter_docs})

    n_groups = len(all_gids)
    mm_ok = groups_matched == all_gids and n_groups > 0
    gates_ok = all(g["pass"] for g in gates)
    out.update({
        "n_groups": n_groups,
        "groups_matched": sorted(groups_matched),
        "mm": "100%",
        "mm_pass": mm_ok,
        "gates": gates,
        "matched": mm_ok and gates_ok,
        "contributions": contributions,
        "score": float(sum(c["contribution"] for c in contributions))
        if (mm_ok and gates_ok)
        else None,
    })
    return out
