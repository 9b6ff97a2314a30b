"""Resumable index build (B9): kill after N segments, restart, identical index
(SURVEY.md §5.2 layer 6)."""

import os

import pytest
from pyspark.sql import functions as F

from intuition_spark.corpus import generate_transcripts
from intuition_spark.index.builder import (
    IndexPaths,
    build_dictionary,
    build_index,
    build_postings,
    prepare_docs,
)


@pytest.fixture(scope="module")
def corpus_df(spark, tmp_root):
    import pyarrow.parquet as pq

    tbl = generate_transcripts(800, max_tokens=40)
    src = os.path.join(tmp_root, "resume_corpus.parquet")
    pq.write_table(tbl, src)
    return spark.read.parquet(src)


def _index_fingerprint(spark, root: str):
    p = IndexPaths(root)
    blocks = (
        spark.read.parquet(p.postings)
        .select("seg", "term", "blk", "n", "first_doc", "last_doc", "tf_sum",
                F.md5(F.hex("docs_bin")).alias("dh"), F.md5(F.hex("tfs_bin")).alias("th"))
        .orderBy("seg", "term", "blk")
        .collect()
    )
    return [tuple(r) for r in blocks]


def test_resume_after_injected_failure(spark, tmp_root, corpus_df):
    full_dir = os.path.join(tmp_root, "ix_full")
    build_index(spark, corpus_df, full_dir, analyzer="standard", n_segments=6, segs_per_job=2)
    expected = _index_fingerprint(spark, full_dir)

    part_dir = os.path.join(tmp_root, "ix_partial")
    paths = IndexPaths(part_dir)
    os.makedirs(part_dir, exist_ok=True)
    prepare_docs(spark, corpus_df, paths, analyzer="standard", n_segments=6)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_postings(spark, paths, segs_per_job=2, fail_after_segs=2)
    done_before = spark.read.parquet(paths.manifest).filter(F.col("status") == "done").count()
    assert 0 < done_before < 6

    # resume: skips completed segments, finishes the rest
    build_postings(spark, paths, segs_per_job=2, resume=True)
    build_dictionary(spark, paths)
    assert _index_fingerprint(spark, part_dir) == expected

    # resume again: everything done → no-op, index unchanged
    build_postings(spark, paths, segs_per_job=2, resume=True)
    assert _index_fingerprint(spark, part_dir) == expected


def test_manifest_records_all_segments(spark, tmp_root):
    p = IndexPaths(os.path.join(tmp_root, "ix_full"))
    m = spark.read.parquet(p.manifest)
    assert m.filter(F.col("status") == "done").select("seg").distinct().count() == 6
