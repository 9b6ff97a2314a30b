"""Phase-attribution probe for the postings stage at a given core count.

Runs, on an already-prepared docs table:
  (a) scan-only        docs parquet scan -> noop sink
  (b) scan+index       mapInArrow indexer -> noop sink (no parquet write)
  (c) full             mapInArrow indexer -> partitionBy(seg) parquet write

The (b)-(a) delta is python-side indexing+streaming; (c)-(b) is the write.
Usage: python scripts/postings_phase_probe.py <cores> [docs_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    docs_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/phase_probe_ix/docs"
    os.environ["SPARK_GRAFT_MASTER"] = f"local[{cores}]"
    os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(cores * 2)
    from pyspark.sql import functions as F

    from intuition_spark.corpus import transcripts_path
    from intuition_spark.index.builder import (
        BLOCK_SCHEMA,
        IndexPaths,
        _make_segment_indexer,
        prepare_docs,
    )
    from intuition_spark.session import get_spark

    spark = get_spark("phase-probe")
    paths = IndexPaths(os.path.dirname(docs_path))
    out: dict = {"cores": cores}

    if not os.path.exists(docs_path):
        src = transcripts_path(3_200_000)
        t0 = time.time()
        prepare_docs(spark, spark.read.parquet(src), paths, n_segments=128)
        out["prepare_docs_s"] = round(time.time() - t0, 2)

    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "8m")
    docs = spark.read.parquet(docs_path).select("seg", "doc_id", "text")

    t0 = time.time()
    docs.write.format("noop").mode("overwrite").save()
    out["scan_only_s"] = round(time.time() - t0, 2)

    blocks = docs.mapInArrow(_make_segment_indexer("standard", True), BLOCK_SCHEMA)
    t0 = time.time()
    blocks.write.format("noop").mode("overwrite").save()
    out["scan_index_noop_s"] = round(time.time() - t0, 2)

    # second run: python workers warm now — isolates worker-boot cost
    t0 = time.time()
    blocks.write.format("noop").mode("overwrite").save()
    out["scan_index_noop_warm_s"] = round(time.time() - t0, 2)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    (
        blocks.write.mode("overwrite")
        .option("parquet.block.size", str(16 * 1024 * 1024))
        .partitionBy("seg")
        .parquet(os.path.join(paths.root, f"postings_{cores}"))
    )
    out["full_write_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
