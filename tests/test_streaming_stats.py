"""Watermarked streaming ingest stats (streaming/stats.py) + Q19 clustering."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from intuition_spark.streaming.maintain import TRANSCRIPT_SCHEMA
from intuition_spark.streaming.stats import start_ingest_stats, windowed_ingest_stats


def _turns(spark, n=60):
    base = datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (
            f"c{i % 7}",
            i // 7,
            "user" if i % 2 == 0 else "assistant",
            f"turn {i} text body with tokens",
            "search" if i % 5 == 0 else None,
            base + timedelta(seconds=i * 10),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_windowed_stats_batch(spark):
    df = _turns(spark, 60)  # 10 min of turns → 10 one-minute windows
    out = windowed_ingest_stats(df).orderBy("window_start").toPandas()
    assert len(out) == 10
    assert out["n_turns"].sum() == 60
    assert (out["n_turns"] == 6).all()
    assert out["n_tool_turns"].sum() == 12  # every 5th turn
    assert (out["n_tokens"] == 6 * 6).all()  # 6 tokens per text, 6 turns/window


def test_streaming_stats_end_to_end(spark, tmp_root):
    src = os.path.join(tmp_root, "stats_src")
    out = os.path.join(tmp_root, "stats_out")
    ckpt = os.path.join(tmp_root, "stats_ckpt")
    _turns(spark, 60).write.mode("overwrite").parquet(src)
    q = start_ingest_stats(spark, src, out, ckpt, trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows: max ts is 12:09:50, so
    # the watermark is 12:07:50 and windows ending after it (the last three)
    # stay open → exactly 7 of 10 emitted
    n = got.count()
    assert n == 7
    assert got.agg(F.sum("n_turns")).collect()[0][0] == 42


def test_q19_clustering_deterministic(spark):
    from intuition_spark.driver_gate_ext import fts_q19_clustering

    a = fts_q19_clustering(spark, "/root/testdata/sf0.001").toPandas()
    b = fts_q19_clustering(spark, "/root/testdata/sf0.001").toPandas()
    assert len(a) > 0
    assert (a["cluster"] >= 0).all() and a["cluster"].nunique() <= 4
    assert a.equals(b)
    assert (a["label"].str.len() > 0).all()


def test_kmeans_props():
    from intuition_spark.functions.clustering import kmeans_deterministic

    rng = np.random.default_rng(3)
    X = rng.standard_normal((50, 8))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    a1 = kmeans_deterministic(X, k=4)
    a2 = kmeans_deterministic(X, k=4)
    assert (a1 == a2).all()
    assert set(np.unique(a1)) <= {0, 1, 2, 3}
