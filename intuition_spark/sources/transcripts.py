"""Transcript table source: Iceberg first, parquet fallback.

The deployment target is an Iceberg transcript table (BASELINE.json
input_hint); the sandbox has no Iceberg runtime jar, so every reader here
probes for the Iceberg source and falls back to plain parquet with identical
semantics. The abstraction kept deliberately thin — a path or a catalog table
name, plus optional snapshot pinning:

* `read_transcripts(spark, ref)`             — current snapshot
* `read_transcripts(spark, ref, snapshot_id=…)` — time travel (Iceberg
  `snapshot-id`; parquet fallback raises — there is no snapshot log)
* `incremental_scan(spark, ref, from_snapshot, to_snapshot)` — changed rows
  between snapshots (Iceberg incremental read; feeds index/incremental
  merge_delta). Parquet fallback: caller supplies a delta directory instead.

Schema is validated against the mandated transcript shape on every read —
a wrong-shaped table fails fast at the source, not deep in the analyzer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_FIELDS: dict[str, T.DataType] = {
    "conv_id": T.StringType(),
    "turn_idx": T.IntegerType(),
    "role": T.StringType(),
    "text": T.StringType(),
    "tool": T.StringType(),
    "ts": T.TimestampType(),
}


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound via py4j
        return False


def validate_transcript_schema(df: DataFrame) -> DataFrame:
    names = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in TRANSCRIPT_FIELDS if c not in names]
    if missing:
        raise ValueError(f"transcript table missing columns: {missing}")
    wrong = [
        c for c, t in TRANSCRIPT_FIELDS.items() if names[c].simpleString() != t.simpleString()
    ]
    if wrong:
        got = {c: names[c].simpleString() for c in wrong}
        raise ValueError(f"transcript columns with wrong types: {got}")
    return df


def read_transcripts(
    spark: SparkSession, ref: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read a transcript table by catalog name (Iceberg) or path (either)."""
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = None
        try:
            df = reader.load(ref)
        except Exception:  # noqa: BLE001 — not an iceberg table/path; fall through
            if snapshot_id is not None:
                raise
        if df is not None:
            # validate OUTSIDE the try: a genuine Iceberg table with a wrong
            # schema must fail fast here, not silently fall through to a raw
            # parquet read of the table directory (which would resurrect rows
            # from old snapshots).
            return validate_transcript_schema(df)
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires an Iceberg table (no parquet snapshot log)")
    return validate_transcript_schema(spark.read.parquet(ref))


def incremental_scan(
    spark: SparkSession,
    ref: str,
    from_snapshot: int | None = None,
    to_snapshot: int | None = None,
    delta_path: str | None = None,
) -> DataFrame:
    """Rows appended between two snapshots (the merge_delta feed).

    Iceberg: `start-snapshot-id`/`end-snapshot-id` incremental read.
    Parquet fallback: the caller lands deltas in a directory (`delta_path`) —
    the shape streaming/maintain.py consumes.
    """
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if from_snapshot is not None:
            reader = reader.option("start-snapshot-id", str(from_snapshot))
        if to_snapshot is not None:
            reader = reader.option("end-snapshot-id", str(to_snapshot))
        return validate_transcript_schema(reader.load(ref))
    if delta_path is None:
        raise ValueError("parquet fallback needs delta_path (no snapshot log to diff)")
    return validate_transcript_schema(spark.read.parquet(delta_path))
