"""Multi-process query serving demonstration (the real QPS scale path).

In-driver THREADED serving anti-scales: every Spark action funnels through
one py4j gateway + the GIL, so threads add contention, not throughput
(measured in bench.py, documented in BASELINE.md). The deployment answer is
the same as Solr's: N serving processes, each with its own SparkSession (its
own JVM) over the SAME on-disk index — queries are read-only, segments are
immutable, so shards need no coordination. This script measures it:

    python scripts/serve_shards.py --shards 4 --rounds 3 \
        [--index /tmp/intuition_spark_bench/ix_std --ws /tmp/intuition_spark_bench/ix_ws]

Each shard process warms its engine, then all shards run `rounds` passes of
the reference query set concurrently (start barrier). Output: one JSON line
with per-shard QPS and the aggregate, plus the 1-shard baseline for the
scaling ratio.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shard_worker(shard_id: int, ix_std: str, ix_ws: str, rounds: int,
                  barrier, out_q, as_of: int | None = None) -> None:
    from intuition_spark.corpus import reference_queries
    from intuition_spark.query.engine import SearchEngine
    from intuition_spark.session import get_spark

    spark = get_spark(f"serve-shard-{shard_id}", master="local[4]",
                      shuffle_partitions=8)
    # --as-of pins every shard to ONE snapshot: reads stay consistent
    # across the fleet while a writer merges deltas into the same index
    # (snapshot isolation — Solr replicas on a named commit point)
    eng = SearchEngine(spark, {"standard": ix_std, "ws": ix_ws}, as_of=as_of)
    queries = list(reference_queries(k=10))
    # warm-up pass: parquet footers, codegen, doc cache
    for q in queries[:5]:
        eng.search(q).collect()
    barrier.wait()
    t0 = time.time()
    n = 0
    for _ in range(rounds):
        for q in queries:
            eng.search(q).collect()
            n += 1
    wall = time.time() - t0
    out_q.put({"shard": shard_id, "n_queries": n, "wall_s": round(wall, 2),
               "qps": round(n / wall, 2)})
    spark.stop()


def run(n_shards: int, ix_std: str, ix_ws: str, rounds: int,
        as_of: int | None = None) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_shards)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_shard_worker,
                    args=(i, ix_std, ix_ws, rounds, barrier, out_q, as_of))
        for i in range(n_shards)
    ]
    for p in procs:
        p.start()
    # bounded waits + liveness checks: a shard that dies before reporting
    # (e.g. Spark session failure) fails the harness instead of hanging it
    import queue as _queue

    shards: list[dict] = []
    deadline = time.time() + 600
    while len(shards) < len(procs):
        try:
            shards.append(out_q.get(timeout=10))
        except _queue.Empty:
            # exited-without-reporting counts as dead regardless of exit
            # code — a worker that returns/os._exit(0)s before putting its
            # result must fail fast, not burn the whole deadline. Workers
            # report exactly once, so (exited) > (reported) means loss.
            n_exited = sum(1 for p in procs if not p.is_alive())
            if n_exited > len(shards) or time.time() > deadline:
                for p in procs:
                    p.terminate()
                for p in procs:
                    p.join(timeout=10)
                missing = len(procs) - len(shards)
                raise RuntimeError(
                    f"{missing} shard(s) never reported (exit codes: "
                    f"{[p.exitcode for p in procs if not p.is_alive()]})"
                )
    for p in procs:
        p.join()
    wall = max(s["wall_s"] for s in shards)
    total = sum(s["n_queries"] for s in shards)
    return {
        "n_shards": n_shards,
        "rounds": rounds,
        "shards": sorted(shards, key=lambda s: s["shard"]),
        "aggregate_qps": round(total / wall, 2),
        "wall_s": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--index", default="/tmp/intuition_spark_bench/ix_std")
    ap.add_argument("--ws", default=None)
    ap.add_argument("--baseline", action="store_true",
                    help="also run 1 shard for the scaling ratio")
    ap.add_argument("--as-of", type=int, default=None,
                    help="pin all shards to one snapshot id (consistent reads "
                         "while a writer commits deltas; requires the index to "
                         "have a snapshots.json log)")
    args = ap.parse_args()
    ws = args.ws or args.index
    out = {"sharded": run(args.shards, args.index, ws, args.rounds, as_of=args.as_of)}
    if args.baseline:
        out["single"] = run(1, args.index, ws, args.rounds, as_of=args.as_of)
        out["speedup"] = round(
            out["sharded"]["aggregate_qps"] / out["single"]["aggregate_qps"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
