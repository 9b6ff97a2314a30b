"""Streaming index maintenance: Structured Streaming → merge_delta.

The reference has NO streaming layer — freshness is a 2-day scheduled batch
(`config/ScheduledTasks.java:58-85`). This module is the optional stretch
noted in SURVEY.md §2.11/§7: a `readStream` source of transcript files feeding
the same incremental merge used by batch (index/incremental.py), via
foreachBatch. Each micro-batch therefore gets delta segments + tombstones with
exactly-once-per-batch semantics from the streaming checkpoint.

Scale notes: foreachBatch(merge_delta) is the right shape for index
maintenance on a cluster — the micro-batch is a normal DataFrame, the merge is
O(delta), and the streaming checkpoint (offsets) composes with the index's own
per-segment manifest (idempotent dynamic-partition writes make replays safe).

Every micro-batch is also a snapshot commit (index/snapshots.py): the stream
leaves a queryable history, so `SearchEngine(ix, as_of_ts=t)` reproduces the
index any consumer saw at time t — one JSON record per batch, negligible next
to the delta itself; a periodic compact() expires the tail.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from intuition_spark.index.builder import IndexPaths
from intuition_spark.index.incremental import merge_delta

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def start_index_maintenance(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
    max_files_per_trigger: int = 16,
):
    """Start (or run-once) the streaming maintenance job.

    Returns the StreamingQuery; caller owns awaitTermination/stop.
    """
    paths = IndexPaths(index_dir)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_delta(spark, paths, batch_df)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
