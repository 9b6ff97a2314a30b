"""Standalone scaling probe for the python-side indexer compute.

Isolates the mapInArrow segment-indexer hot loop (analyze + factorize +
lexsort + varint encode) from Spark entirely: runs IDENTICAL per-process
work in W pinned OS processes and reports per-process wall time at each
width. Flat times across widths = the python compute scales on this box
(any scaling loss in the full job is orchestration/IO); growing times =
a host-level shared-resource ceiling (memory bandwidth / SMT / steal)
that no Spark tuning can remove and that a real multi-node cluster does
not share. Used to attribute the `bench.py --scaling-submit` efficiency
number in BASELINE.md.

Usage: python scripts/indexer_scaling_probe.py [n_docs_per_proc]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(n_docs: int) -> float:
    import numpy as np
    import pyarrow.parquet as pq

    from intuition_spark.index.builder import _make_segment_indexer

    src = "/tmp/intuition_spark_corpus/transcripts_n3200000_s42.parquet"
    tbl = pq.read_table(src, columns=["text"]).slice(0, n_docs)
    texts = tbl.column("text").to_pylist()
    doc_ids = np.arange(n_docs, dtype=np.int64)
    fn = _make_segment_indexer("standard", True)
    # warm (numpy/pandas import cost paid above; one small run to JIT caches)
    import pyarrow as pa

    seg_arr = pa.array(np.zeros(n_docs, dtype=np.int32), type=pa.int32())
    batch = pa.record_batch(
        {
            "seg": seg_arr,
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "text": tbl.column("text").combine_chunks(),
        }
    )
    list(fn(iter([batch.slice(0, 500)])))
    t0 = time.time()
    out = list(fn(iter([batch])))
    dt = time.time() - t0
    assert out, "indexer produced no blocks"
    return dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    if os.environ.get("_PROBE_CHILD"):
        print(json.dumps({"wall_s": round(_worker(n_docs), 3)}))
        return
    results = {}
    ncpu = os.cpu_count() or 8
    for width in (1, 2, 4, 8):
        if width > ncpu:
            break
        procs = []
        env = dict(os.environ, _PROBE_CHILD="1")
        t0 = time.time()
        for i in range(width):
            cmd = [
                "taskset", "-c", str(i % ncpu),
                sys.executable, os.path.abspath(__file__), str(n_docs),
            ]
            procs.append(
                subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, env=env)
            )
        walls = []
        for p in procs:
            out, _ = p.communicate()
            walls.append(json.loads(out.strip().splitlines()[-1])["wall_s"])
        results[str(width)] = {
            "per_proc_wall_s": walls,
            "mean_s": round(sum(walls) / len(walls), 3),
            "launch_to_done_s": round(time.time() - t0, 2),
        }
        print(width, results[str(width)], flush=True)
    base = results["1"]["mean_s"]
    for w, r in results.items():
        r["vs_width1"] = round(r["mean_s"] / base, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
