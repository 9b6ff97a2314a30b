"""Streaming corpus statistics with event-time watermarking.

Complements streaming/maintain.py (index upkeep): a Structured Streaming job
that tracks per-window ingest stats over the transcript stream — turns,
conversations, tokens, tool-call share — tolerating late events via
`withWatermark`. The reference has no streaming layer at all (SURVEY.md
§2.11); this is the freshness-metrics half of the optional stretch: the same
numbers `GlobalTimestamp`-style batch bookkeeping produced every 2 days
(config/ScheduledTasks.java:58-85), continuously.

Scale notes: the aggregation state is bounded by the watermark horizon
(late-arriving turns beyond `late_threshold` are dropped from open windows),
so state size is O(windows in horizon), independent of corpus size. Output
mode `append` emits each window once, on watermark close — the right shape for
a downstream metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_stats(
    stream: DataFrame,
    window_duration: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """turns/convs/tokens/tool-share per event-time window, watermarked.

    Works identically on a batch DataFrame (for tests/backfills: same code,
    `groupBy(window(...))` without the watermark taking effect).
    """
    return (
        stream.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window_duration).alias("w"))
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.sum(F.size(F.split("text", r"\s+"))).alias("n_tokens"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_turns"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_turns",
            "n_convs",
            "n_tokens",
            "n_tool_turns",
        )
    )


def start_ingest_stats(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    late_threshold: str = "2 minutes",
    trigger_once: bool = False,
):
    """Stream files → watermarked windowed stats → append-mode parquet sink."""
    from intuition_spark.streaming.maintain import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(source_dir)
    stats = windowed_ingest_stats(stream, window_duration, late_threshold)
    writer = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
