"""Stateful streaming deduplication — `applyInPandasWithState`.

A custom stateful operator over the transcript stream: only the FIRST turn
with a given text content passes; later exact duplicates (re-sent tool
outputs, retried turns, crawler re-fetches) are dropped across micro-batch
boundaries. This is the streaming half of the exact-dedup pipeline operator
(`dedup_exact` gate entry) — the reference's duplicate reconciliation
(`SolrServiceImpl.findArticle`, service/SolrServiceImpl.java:483-523) done
before the index ever sees the row, instead of at query time.

Design for scale:
* keyed by md5(text): Spark hash-partitions the stream on the key, so state
  for one hash lives on exactly one executor — no coordination, no broadcast.
* state per key is a single count (16 bytes), not the text; memory is
  O(distinct texts in the TTL horizon).
* an EVENT-TIME TTL bounds state: a hash whose last occurrence is more
  than `ttl` behind the watermark is forgotten (duplicates arriving later
  than the TTL pass again — the same trade Bloom-filter dedup layers make).
  Event-time (not processing-time) timeouts keep `availableNow` backfill
  runs terminating promptly: expiry is driven by the watermark, which only
  moves with data, so a drained source ends the run instead of spinning
  timeout-cleanup batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("n_dups_dropped", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])


def _make_dedup_fn(ttl_ms: int):
    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (n_seen,) = state.get if state.exists else (0,)
        first: pd.DataFrame | None = None
        n_new = 0
        last_ms = 0

        def _key(row_df: pd.DataFrame) -> tuple:
            r = row_df.iloc[0]
            return (r["ts"], r["conv_id"], int(r["turn_idx"]))

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if n_seen == 0:
                # deterministic pick: earliest (ts, conv_id, turn_idx) across
                # ALL Arrow chunks of the group (a group larger than one Arrow
                # batch arrives as several pdfs; comparing each chunk's best
                # keeps the survivor chunking-independent)
                pick = pdf.sort_values(["ts", "conv_id", "turn_idx"]).iloc[[0]]
                if first is None or _key(pick) < _key(first):
                    first = pick
            n_new += len(pdf)
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        state.update((n_seen + n_new,))
        # forget this hash once the watermark is ttl past its LAST occurrence
        # (event time, not the lagging global watermark — anchoring to the
        # watermark would expire fresh state while the watermark still trails)
        state.setTimeoutTimestamp(max(last_ms, state.getCurrentWatermarkMs()) + ttl_ms)
        if first is not None:
            out = first[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()
            # duplicates dropped alongside the survivor in its own batch
            out["n_dups_dropped"] = pd.array([n_new - 1], dtype="int64")
            yield out

    return dedup


def dedup_stream(stream: DataFrame, ttl: str = "1 hour") -> DataFrame:
    """First-occurrence filter: one output row per distinct text within the
    TTL horizon, with the count of duplicates dropped in the same batch."""
    ttl_ms = int(pd.Timedelta(ttl).total_seconds() * 1000)
    keyed = stream.withWatermark("ts", ttl).withColumn("text_hash", F.md5("text"))
    return (
        keyed.groupBy("text_hash")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
