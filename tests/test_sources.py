"""Transcript source adapter: schema validation + parquet fallback behavior
(the sandbox has no Iceberg jar, so the fallback path is the live one)."""

from __future__ import annotations

import os

import pytest

from intuition_spark.corpus import generate_transcripts
from intuition_spark.sources.transcripts import (
    iceberg_available,
    incremental_scan,
    read_transcripts,
    validate_transcript_schema,
)


@pytest.fixture(scope="module")
def src(spark, tmp_root):
    import pyarrow.parquet as pq

    p = os.path.join(tmp_root, "sources_corpus.parquet")
    pq.write_table(generate_transcripts(500, max_tokens=20), p)
    return p


def test_read_parquet_fallback(spark, src):
    df = read_transcripts(spark, src)
    assert df.count() >= 500  # generator rounds up to whole conversations
    assert {f.name for f in df.schema.fields} >= {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_snapshot_requires_iceberg(spark, src):
    if iceberg_available(spark):
        pytest.skip("iceberg present; fallback contract not applicable")
    with pytest.raises(ValueError, match="snapshot"):
        read_transcripts(spark, src, snapshot_id=123)


def test_incremental_fallback_needs_delta_path(spark, src):
    if iceberg_available(spark):
        pytest.skip("iceberg present")
    with pytest.raises(ValueError, match="delta_path"):
        incremental_scan(spark, src)
    assert incremental_scan(spark, src, delta_path=src).count() >= 500


def test_schema_validation_rejects_wrong_shape(spark):
    bad = spark.createDataFrame([("a", 1)], "conv_id string, turn_idx long")
    with pytest.raises(ValueError, match="missing columns"):
        validate_transcript_schema(bad)
    from pyspark.sql import functions as F

    bad2 = spark.range(1).select(
        F.lit("c").alias("conv_id"),
        F.lit(0).cast("long").alias("turn_idx"),  # wrong type: long not int
        F.lit("user").alias("role"),
        F.lit("t").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(ValueError, match="wrong types"):
        validate_transcript_schema(bad2)
