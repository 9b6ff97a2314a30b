"""Query debug / score explanation — the Solr ``debugQuery=true`` analogue.

The reference turns on Solr's debug surface for its paged searches
(``query.setParam("debugQuery", "true")``, `util/SolrClientTool.java:274`),
which returns the parsed query, the chosen execution strategy, and per-doc
Lucene ``Explanation`` trees (idf/tf/norm factors summing to the hit score).
This module provides the same two surfaces over the engine:

* :func:`explain` — runs the query and reports the parse (the ENGINE'S own
  `_parse_atoms` output — atoms carry their raw text, nothing re-derived),
  the EXECUTED path (observed from the engine's `last_path` instrumentation),
  the driver-admission arithmetic (Σdf / Σcf vs budgets, folded with the
  fq fast-path resolution exactly as the router folds it), and the
  filterCache resolution.
* :func:`explain_doc` — a per-document score breakdown: one record per
  matching (field, distinct-term | phrase-atom) with boost, idf, tf, dl,
  avgdl and the BM25 contribution, whose sum reproduces the engine's hit
  score exactly (tests assert equality against ``search()``), plus the
  mm=100% group accounting and every non-scoring gate — fq predicates,
  MUST_NOT exclusions, tombstones — each evaluated across EVERY scored
  field (multi-field semantics: a doc excluded/deleted in any field is out,
  `SearchEngine._excluded_union`).

Both execute like Solr's debug mode does — explain() observes a real run
(driver paths eagerly, distributed paths at plan time — see ``wall_s``);
explain_doc() reuses the engine's own block cache, decode, and sloppy-phrase
matcher (`_phrase_seg_match`), so the numbers ARE the scorer's numbers.

Duplicate-term caveat (mirrors the engine's documented limitation at
`_term_meta`): a term reused across several single-term atoms is scored once
— explain_doc keeps one contribution per distinct (field, term), so the sum
matches the exhaustive scorer; queries reusing a term across GROUPS return
no hits in the engine (group-coverage shortfall) and explain_doc's mm
accounting reproduces that.
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


def _fast_path_state(engine, a: str, q: Query):
    """(fast_ok, fq_ids, dist_filter, fq_preds) — delegates to the engine's
    own ``_fq_fold``, the SAME code path _search_uncached runs before
    admission, so the report can never claim a routing state the router
    doesn't use (ADVICE r4: the previous private re-implementation could
    drift)."""
    return engine._fq_fold(a, q)


def explain(engine, q: Query, mode: str = "auto") -> dict:
    """Run ``q`` and report parse + routing + admission + fq debug info.

    ``wall_s`` times the ``search()`` call itself: driver fast paths execute
    eagerly inside it, distributed paths return lazy DataFrames so it
    measures planning only (the ``path`` field tells you which you got).

    COST NOTE (ADVICE r4): when the query is a result-cache hit, the report
    still shows the executor a COLD run takes — by re-running
    ``_search_uncached`` (driver paths execute eagerly) and timing it as
    ``cold_rederive_s``. Explaining a hot query therefore costs one full
    cold execution; that is intentional (the debug surface answers "which
    path WOULD this take", like Solr's debug on a queryResultCache hit),
    but don't put explain() on a per-request hot path.
    """
    from intuition_spark.query.engine import bm25_idf

    a = engine._route(q)
    engine._ensure_warm(a)
    t0 = time.time()
    engine.search(q, mode)
    wall_s = round(time.time() - t0, 4)
    cached = engine.last_path == "result_cache"
    rederive_s = None
    if cached:
        # report the EXECUTOR a cold run takes, timed separately so wall_s
        # stays the latency of the call actually made
        t1 = time.time()
        engine._search_uncached(q, a, mode)
        rederive_s = round(time.time() - t1, 4)

    fields = dict(q.fields) if q.fields else {a: 1.0}
    fast_ok, fq_ids, dist_filter, fq_preds = _fast_path_state(engine, a, q)
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
        **({"cold_rederive_s": rederive_s} if rederive_s is not None else {}),
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
                "per_term": [{"term": term, "df": int(dfs[term])}],
                "note": "ranked by raw termfreq desc, ts desc — no BM25",
            }]
        else:
            atoms = engine._parse_atoms(q, f)  # the engine's own parse
            all_terms = sorted({t for at in atoms for t in at.terms})
            dfs = engine._dfs_for_terms(f, all_terms)
            cache = engine._dict_cache.get(f)
            atoms_info = []
            for at in atoms:
                atoms_info.append({
                    "gid": at.gid,
                    "atom": at.raw,
                    "terms": at.terms,
                    **({"slop": at.slop} if len(at.terms) > 1 else {}),
                    "per_term": [
                        {
                            "term": t,
                            "df": int(dfs.get(t, 0)),
                            # cf None (not 0) when the dictionary cache is
                            # absent — indistinguishable fallbacks lie; this
                            # mirrors sum_df/sum_cf's degradation (ADVICE r4)
                            "cf": (
                                int(cache.get(t, (0, 0))[1])
                                if cache is not None
                                else None
                            ),
                            "idf": round(bm25_idf(stats["N"], dfs.get(t, 0)), 6),
                        }
                        for t in at.terms
                    ],
                })
            terms_for_admission = all_terms
            positional = any(len(at.terms) > 1 for at in atoms)
        ex_terms = engine._exclude_terms(q, f)
        dcache = engine._dict_cache.get(f)
        adm_terms = terms_for_admission + ex_terms
        sum_df = (
            int(sum(dcache.get(t, (0, 0))[0] for t in adm_terms)) if dcache else None
        )
        sum_cf = (
            int(sum(dcache.get(t, (0, 0))[1] for t in adm_terms))
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
            # what `auto` mode actually checks: postings volume AND the fq
            # fast-path state (an oversize/distributed fq bars the driver)
            # AND a driver-side-bounded tombstone set (an oversize one keeps
            # exclusion distributed, so driver scorers are barred too)
            "postings_small_enough": engine._small_enough(f, adm_terms, positional),
            "fq_fast_path_ok": fast_ok,
            "tombstones_small": engine._tombstones(f) is not None,
            "driver_eligible": fast_ok
            and engine._tombstones(f) is not None
            and engine._small_enough(f, adm_terms, positional),
        }
        per_field.append(finfo)
    out["fields"] = per_field

    if fq_preds:
        preds = [f"{fcol}:{fval!r}" for fcol, fval in sorted((q.field_eq or {}).items())]
        if q.require_no_tool:
            preds.append("tool IS NULL")
        if q.ts_after is not None:
            preds.append(f"ts >= {q.ts_after}")
        if dist_filter:
            out["fq"] = {
                "predicates": preds,
                "note": "filter_docs present — fq predicates apply inside the "
                        "distributed path; the filterCache is not consulted",
            }
        else:
            out["fq"] = {
                "predicates": preds,
                "resolved_n_ids": None if fq_ids is None else int(fq_ids.size),
                "oversize_distributed": fq_ids is None,
                "max_ids": engine.FQ_MAX_IDS,
            }
    if dist_filter:
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


def _doc_meta(engine, a: str, q: Query, doc: str):
    """One metadata row for ``doc`` — from the driver doc cache when it
    covers every column the fq gates need (zero Spark jobs), else one
    pushdown point-scan."""
    extra = [c for c in (q.field_eq or {}) if c not in ("role", "tool", "conv_id")]
    cached = engine._doc_cache.get(a)
    if cached is not None and not extra:
        m = cached[cached["doc"] == doc]
        return m.iloc[0] if len(m) else None
    m = engine._docs(a).filter(F.col("doc") == doc).limit(1).toPandas()
    return m.iloc[0] if not m.empty else None


def explain_doc(engine, q: Query, doc: str) -> dict:
    """Per-document score breakdown (the Lucene ``Explanation`` analogue)."""
    from intuition_spark.query.engine import B, K1, bm25_idf, _phrase_seg_match

    a = engine._route(q)
    engine._ensure_warm(a)
    if q.fields:
        engine._validate_fields(q)
    row = _doc_meta(engine, a, q, doc)
    if row is None:
        return {"doc": doc, "found": False, "matched": False}
    doc_id = int(row["doc_id"])
    out: dict = {"doc": doc, "found": True, "doc_id": doc_id}

    contributions: list[dict] = []
    groups_matched: set[int] = set()
    all_gids: set[int] = set()
    fields = dict(q.fields) if q.fields else {a: 1.0}
    ex_by_f = {f: engine._exclude_terms(q, f) for f in fields}

    if q.kind in _SCORING_KINDS:
        for f, w in fields.items():
            engine._ensure_warm(f)
            stats = engine.stats[f]
            N, avgdl = int(stats["N"]), stats["avgdl"]
            atoms = engine._parse_atoms(q, f)  # the engine's own parse
            all_gids |= {at.gid for at in atoms}
            singles = [at for at in atoms if len(at.terms) == 1]
            phrases = [at for at in atoms if len(at.terms) > 1]
            # one batched fetch per field: all single + exclude terms (no
            # positions) — the same granularity the driver scorer uses
            flat_terms = sorted(
                {at.terms[0] for at in singles} | set(ex_by_f[f])
            )
            flat_pdf = (
                engine._collect_blocks(f, flat_terms)
                if flat_terms
                else pd.DataFrame(columns=["term"])
            )
            # distinct-term dedup, last atom's gid — exactly the engine's
            # `single_terms` dict in _driver_field_contrib
            single_terms: dict[str, object] = {}
            for at in singles:
                single_terms[at.terms[0]] = at
            for t, at in single_terms.items():
                hit = _find_posting(flat_pdf[flat_pdf["term"] == t], doc_id)
                if hit is None:
                    continue
                tf, dl, _ = hit
                df = int(engine._dfs_for_terms(f, [t])[t])
                idf = bm25_idf(N, df)
                contributions.append({
                    "field": f, "boost": float(w), "gid": at.gid, "atom": at.raw,
                    "term": t, "df": df, "idf": idf, "tf": tf, "dl": dl,
                    "avgdl": avgdl,
                    "contribution": float(
                        w * idf * wand._weight(float(tf), float(dl), avgdl)
                    ),
                })
                groups_matched.add(at.gid)
            if phrases:
                ph_terms = sorted({t for at in phrases for t in at.terms})
                ph_pdf = engine._collect_blocks(f, ph_terms, with_positions=True)
                for at in phrases:
                    probe = _find_posting(
                        ph_pdf[ph_pdf["term"] == at.terms[0]], doc_id
                    )
                    if probe is None:
                        continue  # first token absent → phrase can't match
                    seg = probe[2]
                    mf = _phrase_seg_match(
                        ph_pdf[ph_pdf["seg"] == seg], at.terms, at.slop
                    )
                    mrow = mf[mf["doc_id"] == doc_id]
                    if mrow.empty:
                        continue
                    tf = float(mrow["tf"].iloc[0])  # sloppy freq (Σ 1/(1+dist))
                    dl = float(mrow["dl"].iloc[0])
                    dfs = engine._dfs_for_terms(f, sorted(set(at.terms)))
                    # per TOKEN POSITION, like Lucene PhraseWeight
                    idf_sum = sum(bm25_idf(N, dfs.get(t, 0)) for t in at.terms)
                    contributions.append({
                        "field": f, "boost": float(w), "gid": at.gid,
                        "atom": at.raw, "terms": at.terms, "slop": at.slop,
                        "idf_sum": idf_sum, "sloppy_tf": tf, "dl": dl,
                        "avgdl": avgdl,
                        "contribution": float(
                            w * idf_sum * tf * (K1 + 1.0)
                            / (tf + K1 * (1.0 - B + B * dl / avgdl))
                        ),
                    })
                    groups_matched.add(at.gid)
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

    # ---- non-scoring gates, each evaluated across EVERY scored field -----
    # (multi-field semantics: a doc containing an excluded term in ANY
    # field, or tombstoned in ANY field's index, is out — _excluded_union)
    gates: list[dict] = []
    any_ex = {f: ex for f, ex in ex_by_f.items() if ex}
    if any_ex:
        hit_ex = []
        for f, ex_terms in any_ex.items():
            pdf = engine._collect_blocks(f, sorted(set(ex_terms)))
            for t in ex_terms:
                if _find_posting(pdf[pdf["term"] == t], doc_id) is not None:
                    hit_ex.append({"field": f, "term": t})
        gates.append({
            "gate": "exclude (MUST_NOT)", "terms": any_ex,
            "pass": not hit_ex, "matched_excluded_terms": hit_ex,
        })
    dead_in = [
        f for f in fields
        if engine._has_tombstones(f) and engine._is_tombstoned(f, doc_id)
    ]
    if any(engine._has_tombstones(f) for f in fields):
        gates.append({"gate": "tombstones", "pass": not dead_in,
                      **({"deleted_in": dead_in} if dead_in else {})})
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
