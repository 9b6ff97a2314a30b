"""Streaming incremental maintenance: files land → micro-batch → delta
segments; new docs are searchable after the batch."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import build_index
from intuition_spark.query.ast import Query
from intuition_spark.query.engine import SearchEngine
from intuition_spark.streaming.maintain import start_index_maintenance


@pytest.mark.timeout(300)
def test_stream_merges_new_files(spark, tmp_root):
    tbl = generate_transcripts(600, max_tokens=30).to_pandas()
    base, d1, d2 = tbl.iloc[:400], tbl.iloc[400:500].copy(), tbl.iloc[500:].copy()
    d1["text"] = d1["text"] + " streamedmarker alpha"
    d2["text"] = d2["text"] + " streamedmarker beta"

    ix_dir = os.path.join(tmp_root, "ix_stream")
    src_dir = os.path.join(tmp_root, "stream_src")
    ckpt = os.path.join(tmp_root, "stream_ckpt")
    os.makedirs(src_dir)

    base_pq = os.path.join(tmp_root, "stream_base.parquet")
    pq.write_table(pa.Table.from_pandas(base, preserve_index=False), base_pq)
    build_index(spark, spark.read.parquet(base_pq), ix_dir, n_segments=2)

    pq.write_table(pa.Table.from_pandas(d1, preserve_index=False), os.path.join(src_dir, "d1.parquet"))
    pq.write_table(pa.Table.from_pandas(d2, preserve_index=False), os.path.join(src_dir, "d2.parquet"))

    q = start_index_maintenance(spark, src_dir, ix_dir, ckpt, trigger_once=True)
    q.awaitTermination(240)

    eng = SearchEngine(spark, {"standard": ix_dir})
    hits = eng.search(Query("s1", "term", [["streamedmarker"]], k=500)).collect()
    assert len(hits) == len(d1) + len(d2)

    # restart with no new files: checkpoint prevents re-merging
    import json

    n_segs_before = json.load(open(os.path.join(ix_dir, "stats.json")))["n_segments"]
    q2 = start_index_maintenance(spark, src_dir, ix_dir, ckpt, trigger_once=True)
    q2.awaitTermination(240)
    n_segs_after = json.load(open(os.path.join(ix_dir, "stats.json")))["n_segments"]
    assert n_segs_before == n_segs_after
