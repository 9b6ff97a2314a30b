"""Query executor: AST → DataFrame plan → top-k hits.

Replaces the reference's query path (buildSearchExpression →
`SolrClientTool.find` → HTTP → Solr edismax → Lucene BM25,
`service/SolrServiceImpl.java:416-480` / `util/SolrClientTool.java:162-214`).

Two physical strategies, both reading the same block-compressed segmented
postings (index/builder.py):

* ``wand``        — per-segment block-max top-k (query/wand.py). Postings are
  doc-partitioned by segment, so the only query-time shuffle is the tiny
  (scanned blocks of the query's terms) → groupBy(seg); the global top-k is a
  merge of per-segment top-ks. This is the 100 TB hot path.
* ``exhaustive``  — decode blocks to posting rows, score with pure DataFrame
  expressions (join broadcast idf table → groupBy(doc) → HAVING all groups →
  TakeOrderedAndProject). Correctness anchor + the path that supports
  non-scoring ``fq`` candidate filters, phrase/proximity positions, tf-sort.

Both must return identical top-k (tested). Tiebreak: score desc, conv_id asc,
turn_idx asc.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intuition_spark.analysis.analyzers import analyze_text
from intuition_spark.index.builder import IndexPaths, decode_blocks_df
from intuition_spark.query import wand
from intuition_spark.query.ast import Query

K1 = 1.2
B = 0.75


def bm25_idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


@dataclass
class _Atom:
    gid: int
    terms: list[str]  # 1 term, or n terms for a phrase
    slop: int


class SearchEngine:
    """Query executor over one or more analyzer-variant indexes.

    ``index_dirs`` maps analyzer name → index root, mirroring the reference's
    dual ``text`` / ``text_ws`` fields (`model/SolrItem.java:32-33`).
    """

    # dictionaries up to this many terms are cached driver-side: one parquet
    # read at init instead of one lookup job per query (serving-path latency)
    DICT_CACHE_MAX_TERMS = 2_000_000

    def __init__(
        self, spark: SparkSession, index_dirs: dict[str, str] | str, cache_dictionary: bool = True
    ):
        if isinstance(index_dirs, str):
            index_dirs = {"standard": index_dirs}
        self.spark = spark
        self.paths: dict[str, IndexPaths] = {a: IndexPaths(d) for a, d in index_dirs.items()}
        self.stats: dict[str, dict] = {}
        self._dict_cache: dict[str, dict[str, int]] = {}
        for a, p in self.paths.items():
            with open(p.stats) as f:
                self.stats[a] = json.load(f)
            if cache_dictionary:
                dic = self.spark.read.parquet(p.dictionary).select("term", "df")
                if dic.count() <= self.DICT_CACHE_MAX_TERMS:
                    pdf = dic.toPandas()
                    self._dict_cache[a] = dict(
                        zip(pdf["term"], pdf["df"].astype(int), strict=True)
                    )

    def refresh(self) -> None:
        """Reload stats + dictionary cache after incremental merges."""
        self.__init__(self.spark, {a: p.root for a, p in self.paths.items()})

    # ---- helpers -------------------------------------------------------
    def _route(self, q: Query) -> str:
        eff = q.effective_analyzer
        if eff in self.paths:
            return eff
        return next(iter(self.paths))

    def _blocks(self, a: str, terms: list[str]) -> DataFrame:
        # term IN (...) is pushed down to the parquet scan; postings files are
        # sorted by term within each seg partition → row-group pruning
        return self.spark.read.parquet(self.paths[a].postings).filter(F.col("term").isin(terms))

    def _docs(self, a: str) -> DataFrame:
        return self.spark.read.parquet(self.paths[a].docs)

    def _tombstones(self, a: str) -> np.ndarray:
        """Sorted doc_ids deleted by incremental upserts (empty if none).
        Cached per (analyzer, dir mtime) — the set is broadcast-small by
        design (compaction bounds it)."""
        import os as _os

        p = _os.path.join(self.paths[a].root, "tombstones")
        if not _os.path.exists(p):
            return np.empty(0, dtype=np.int64)
        mtime = _os.path.getmtime(p)
        key = (a, mtime)
        cached = getattr(self, "_tomb_cache", {}).get(key)
        if cached is None:
            ids = self.spark.read.parquet(p).select("doc_id").toPandas()["doc_id"].to_numpy()
            cached = np.sort(ids.astype(np.int64))
            self._tomb_cache = {key: cached}
        return cached

    def _dfs_for_terms(self, a: str, terms: list[str]) -> dict[str, int]:
        cached = self._dict_cache.get(a)
        if cached is not None:
            return {t: cached.get(t, 0) for t in terms}
        rows = (
            self.spark.read.parquet(self.paths[a].dictionary)
            .filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    def expand_dictionary(self, a: str, pattern: str, kind: str, fuzzy_max: int = 1) -> list[str]:
        """Wildcard/regex/fuzzy expansion by dictionary scan (Q5-Q7)."""
        dic = self.spark.read.parquet(self.paths[a].dictionary)
        p = pattern.lower()
        if kind == "wildcard":
            # anchor a literal prefix for pushdown, then exact fnmatch via RLIKE
            rx = "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else rx_escape(c) for c in p
            ) + "$"
            prefix = p.split("*")[0].split("?")[0]
            if prefix:
                dic = dic.filter(F.col("term").startswith(prefix))
            dic = dic.filter(F.col("term").rlike(rx))
        elif kind == "regex":
            dic = dic.filter(F.col("term").rlike("^(?:" + p + ")$"))
        elif kind == "fuzzy":
            dic = dic.filter(
                (F.length("term") >= len(p) - fuzzy_max) & (F.length("term") <= len(p) + fuzzy_max)
            ).filter(F.levenshtein(F.col("term"), F.lit(p)) <= fuzzy_max)
        else:
            raise ValueError(kind)
        return [r["term"] for r in dic.select("term").collect()]

    def _parse_atoms(self, q: Query, a: str) -> list[_Atom]:
        atoms: list[_Atom] = []
        for gid, group in enumerate(q.groups):
            for atom in group:
                toks = [t for t, _ in analyze_text(atom, a)]
                if toks:
                    atoms.append(_Atom(gid, toks, q.slop))
        return atoms

    def _finalize(self, scored: DataFrame, q: Query, a: str, order=("score",)) -> DataFrame:
        """fq-style predicates + hydration join + canonical top-k order.

        Mirrors lifecycle step 4 of `/query2` (hydrate by id then order,
        `controller/ArticleController.java:465-473`).
        """
        docs = self._docs(a).select("doc_id", "doc", "conv_id", "turn_idx", "ts", "role", "tool")
        tomb = self._tombstones(a)
        if tomb.size:
            tdf = self.spark.createDataFrame([(int(t),) for t in tomb], ["doc_id"])
            scored = scored.join(F.broadcast(tdf), "doc_id", "left_anti")
        if q.filter_docs is not None:
            flt = self.spark.createDataFrame([(d,) for d in q.filter_docs], ["doc"])
            docs = docs.join(F.broadcast(flt), "doc", "left_semi")
        if q.ts_after is not None:
            docs = docs.filter(F.col("ts") >= F.lit(q.ts_after))
        if q.require_no_tool:
            docs = docs.filter(F.col("tool").isNull())
        out = scored.join(docs, "doc_id", "inner")
        keys = [F.col(c).desc() if c in ("score", "tf") else F.col(c) for c in order]
        return (
            out.orderBy(*keys, F.col("conv_id").asc(), F.col("turn_idx").asc())
            .select("doc", "score", "conv_id", "turn_idx")
            .limit(q.k)
        )

    # ---- search --------------------------------------------------------
    def search(self, q: Query, mode: str = "auto") -> DataFrame:
        a = self._route(q)
        if q.kind in ("wildcard", "regex", "fuzzy"):
            return self._search_multiterm(q, a)
        if q.kind == "tf_sort":
            return self._search_tf_sort(q, a)
        atoms = self._parse_atoms(q, a)
        if not atoms:
            return self.spark.createDataFrame(
                [], "doc string, score double, conv_id string, turn_idx int"
            )
        has_phrase = any(len(at.terms) > 1 for at in atoms)
        has_filter = q.filter_docs is not None or q.ts_after is not None or q.require_no_tool
        if mode == "wand" or (mode == "auto" and not has_phrase and not has_filter):
            return self._search_wand(q, a, atoms, prune=True)
        return self._search_exhaustive(q, a, atoms)

    def _term_meta(self, a: str, atoms: list[_Atom]) -> tuple[dict[str, tuple[int, float]], int]:
        """term → (gid, idf). Phrase terms carry the phrase gid; a term used in
        several groups keeps the first (query sets don't reuse terms across
        groups; documented limitation)."""
        all_terms = sorted({t for at in atoms for t in at.terms})
        dfs = self._dfs_for_terms(a, all_terms)
        N = self.stats[a]["N"]
        meta: dict[str, tuple[int, float]] = {}
        for at in atoms:
            for t in at.terms:
                if t not in meta:
                    meta[t] = (at.gid, bm25_idf(N, dfs.get(t, 0)))
        return meta, len({at.gid for at in atoms})

    def _search_wand(self, q: Query, a: str, atoms: list[_Atom], prune: bool) -> DataFrame:
        meta, n_groups = self._term_meta(a, atoms)
        avgdl = self.stats[a]["avgdl"]
        blocks = self._blocks(a, list(meta)).select(
            "seg", "term", "blk", "n", "first_doc", "last_doc", "max_tf", "min_dl",
            "docs_bin", "tfs_bin", "dls_bin",
        )
        scorer = wand.make_segment_scorer(
            meta, n_groups, q.k, avgdl, prune=prune, excluded=self._tombstones(a)
        )
        out_schema = T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("score", T.DoubleType())]
        )
        local_topk = blocks.groupBy("seg").applyInPandas(scorer, out_schema)
        return self._finalize(local_topk, q, a)

    def _search_exhaustive(self, q: Query, a: str, atoms: list[_Atom]) -> DataFrame:
        meta, n_groups = self._term_meta(a, atoms)
        avgdl = self.stats[a]["avgdl"]
        N = self.stats[a]["N"]
        single = [at for at in atoms if len(at.terms) == 1]
        phrases = [at for at in atoms if len(at.terms) > 1]
        parts: list[DataFrame] = []

        if single:
            terms = sorted({at.terms[0] for at in single})
            rows = decode_blocks_df(self._blocks(a, terms), with_positions=False)
            idf_df = self.spark.createDataFrame(
                [(t, meta[t][0], meta[t][1]) for t in terms], "term string, gid int, idf double"
            )
            # broadcast the tiny per-query term table; score is a pure column expr
            scored = rows.join(F.broadcast(idf_df), "term").select(
                "doc_id",
                "gid",
                (
                    F.col("idf")
                    * F.col("tf")
                    * F.lit(K1 + 1.0)
                    / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl)))
                ).alias("contrib"),
            )
            parts.append(scored)

        for at in phrases:
            dfs = self._dfs_for_terms(a, sorted(set(at.terms)))
            idf_sum = sum(bm25_idf(N, dfs.get(t, 0)) for t in set(at.terms))
            parts.append(self._phrase_contrib(a, at, idf_sum, avgdl))

        contrib = parts[0]
        for p in parts[1:]:
            contrib = contrib.unionByName(p)
        scored = (
            contrib.groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"), F.countDistinct("gid").alias("ng"))
            .filter(F.col("ng") == n_groups)  # mm=100%: every group matched
            .select("doc_id", "score")
        )
        return self._finalize(scored, q, a)

    def _phrase_contrib(self, a: str, at: _Atom, idf_sum: float, avgdl: float) -> DataFrame:
        """Positional intersection (Q3/Q4): per-segment pandas evaluation —
        each segment holds all its docs' postings, so phrase matching needs no
        cross-partition traffic."""
        terms = at.terms
        slop = at.slop
        gid = at.gid
        rows = decode_blocks_df(self._blocks(a, sorted(set(terms))), with_positions=True)

        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("gid", T.IntegerType()),
                T.StructField("contrib", T.DoubleType()),
            ]
        )

        def match_seg(key, pdf: pd.DataFrame) -> pd.DataFrame:
            by_term = {t: g for t, g in pdf.groupby("term", sort=False)}
            if any(t not in by_term for t in set(terms)):
                return pd.DataFrame({"doc_id": [], "gid": [], "contrib": []})
            base = by_term[terms[0]]
            cand = set(base["doc_id"].values)
            for t in set(terms[1:]):
                cand &= set(by_term[t]["doc_id"].values)
            if not cand:
                return pd.DataFrame({"doc_id": [], "gid": [], "contrib": []})
            posmap = {
                t: dict(zip(g["doc_id"].values, g["positions"].values)) for t, g in by_term.items()
            }
            dlmap = dict(zip(base["doc_id"].values, base["dl"].values))
            out_docs, out_contrib = [], []
            for d in cand:
                plists = [np.asarray(posmap[t][d]) for t in terms]
                tf = _phrase_tf(plists, slop)
                if tf > 0:
                    w = idf_sum * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * float(dlmap[d]) / avgdl))
                    out_docs.append(d)
                    out_contrib.append(w)
            return pd.DataFrame(
                {"doc_id": pd.array(out_docs, dtype="int64"),
                 "gid": pd.array([gid] * len(out_docs), dtype="int32"),
                 "contrib": pd.array(out_contrib, dtype="float64")}
            )

        return rows.groupBy("seg").applyInPandas(match_seg, out_schema)

    def _search_tf_sort(self, q: Query, a: str) -> DataFrame:
        """Q8: sort=termfreq(text,t) desc, date desc (`SolrClientTool.java:147-151`)."""
        term = analyze_text(q.groups[0][0], a)[0][0]
        rows = decode_blocks_df(self._blocks(a, [term])).select(
            "doc_id", F.col("tf").cast("double").alias("score")
        )
        tomb = self._tombstones(a)
        if tomb.size:
            tdf = self.spark.createDataFrame([(int(t),) for t in tomb], ["doc_id"])
            rows = rows.join(F.broadcast(tdf), "doc_id", "left_anti")
        docs = self._docs(a).select("doc_id", "doc", "conv_id", "turn_idx", "ts", "tool")
        if q.ts_after is not None:
            docs = docs.filter(F.col("ts") >= F.lit(q.ts_after))
        if q.require_no_tool:
            docs = docs.filter(F.col("tool").isNull())
        out = rows.join(docs, "doc_id")
        if q.filter_docs is not None:
            flt = self.spark.createDataFrame([(d,) for d in q.filter_docs], ["doc"])
            out = out.join(F.broadcast(flt), "doc", "left_semi")
        return (
            out.orderBy(F.col("score").desc(), F.col("ts").desc(), "conv_id", "turn_idx")
            .select("doc", "score", "conv_id", "turn_idx")
            .limit(q.k)
        )

    def _search_multiterm(self, q: Query, a: str) -> DataFrame:
        """Q5/Q6/Q7: dictionary expansion → constant-score union (Lucene
        CONSTANT_SCORE multi-term rewrite, the Solr 8 default)."""
        pattern = q.groups[0][0]
        terms = self.expand_dictionary(a, pattern, q.kind)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc string, score double, conv_id string, turn_idx int"
            )
        rows = decode_blocks_df(self._blocks(a, terms))
        scored = rows.select("doc_id").distinct().withColumn("score", F.lit(1.0))
        return self._finalize(scored, q, a)

    def get_by_id(self, docs: list[str], a: str | None = None) -> DataFrame:
        """Q12 `client.getById` (`SolrClientTool.java:328-337`)."""
        a = a or next(iter(self.paths))
        return self._docs(a).filter(F.col("doc").isin(docs))


def _phrase_tf(plists: list[np.ndarray], slop: int) -> int:
    """Shared sloppy-phrase semantics — see oracle/bm25_oracle.py."""
    first = plists[0]
    n = 0
    for p0 in first.tolist():
        ok = True
        prev = p0
        for i, plist in enumerate(plists[1:], start=1):
            if slop == 0:
                if p0 + i not in plist:
                    ok = False
                    break
                prev = p0 + i
            else:
                nxt = plist[(plist > prev) & (plist <= p0 + slop + i)]
                if nxt.size == 0:
                    ok = False
                    break
                prev = int(nxt.min())
        if ok:
            n += 1
    return n


def rx_escape(c: str) -> str:
    return "\\" + c if c in ".^$+{}[]|()\\" else c
