"""spark-submit entry point: run top-k queries against a built index.

    spark-submit --py-files /tmp/intuition_spark.zip scripts/query_job.py \
        --index /indexes/main --kind and --terms braf v600e --k 10 [--mode wand]

Prints one JSON line per query with hits + latency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--kind", default="and",
                    choices=["term", "and", "or_groups", "phrase", "proximity",
                             "wildcard", "regex", "fuzzy", "tf_sort"])
    ap.add_argument("--terms", nargs="+", required=True,
                    help="atoms; for or_groups separate groups with literal '/'")
    ap.add_argument("--slop", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="auto", choices=["auto", "wand", "exhaustive"])
    ap.add_argument("--explain", action="store_true",
                    help="also emit the debug report (Solr debugQuery=true "
                         "analogue): parse, executed path, admission, fq")
    ap.add_argument("--explain-doc", metavar="DOC",
                    help="emit the per-doc score breakdown (Lucene "
                         "Explanation analogue) for docID 'conv:turn'")
    args = ap.parse_args()

    from intuition_spark.query.ast import Query
    from intuition_spark.query.engine import SearchEngine
    from intuition_spark.session import get_spark

    if args.kind in ("phrase", "proximity"):
        groups = [[" ".join(args.terms)]]
    elif args.kind == "or_groups":
        groups, cur = [], []
        for t in args.terms:
            if t == "/":
                groups.append(cur)
                cur = []
            else:
                cur.append(t)
        groups.append(cur)
    else:
        groups = [[t] for t in args.terms]

    spark = get_spark("query")
    eng = SearchEngine(spark, {args.analyzer: args.index})
    q = Query("cli", args.kind, groups, slop=args.slop, k=args.k, analyzer=args.analyzer)
    t0 = time.time()
    rows = eng.search(q, mode=args.mode).collect()
    out = {
        "kind": args.kind,
        "groups": groups,
        "latency_s": round(time.time() - t0, 3),
        "hits": [{"doc": r["doc"], "score": round(r["score"], 6)} for r in rows],
    }
    if args.explain:
        out["explain"] = eng.explain(q, mode=args.mode)
    if args.explain_doc:
        out["explain_doc"] = eng.explain_doc(q, args.explain_doc)
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
