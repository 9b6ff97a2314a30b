"""Stateful streaming dedup (applyInPandasWithState): first occurrence of a
text passes, duplicates are dropped — including duplicates arriving in a
LATER micro-batch (state crosses batch boundaries via the checkpoint)."""

import datetime
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from intuition_spark.streaming.dedup_stream import dedup_stream

TS = datetime.datetime(2025, 1, 1, 12, 0, 0)

PA_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _rows(spec, offset_minutes=0):
    """spec: list of (conv_id, turn_idx, text)."""
    base = TS + datetime.timedelta(minutes=offset_minutes)
    return pd.DataFrame(
        {
            "conv_id": [c for c, _, _ in spec],
            "turn_idx": pd.array([i for _, i, _ in spec], dtype="int32"),
            "role": "user",
            "text": [t for _, _, t in spec],
            "tool": pd.array([None] * len(spec), dtype="string"),
            "ts": [base + datetime.timedelta(minutes=k) for k in range(len(spec))],
        }
    )


@pytest.mark.timeout(300)
def test_stream_dedup_across_batches(spark, tmp_root):
    src_dir = os.path.join(tmp_root, "dedup_src")
    ckpt = os.path.join(tmp_root, "dedup_ckpt")
    os.makedirs(src_dir)

    b1 = _rows([("c1", 0, "alpha beta"), ("c1", 1, "alpha beta"), ("c2", 0, "gamma")])
    pq.write_table(pa.Table.from_pandas(b1, schema=PA_SCHEMA, preserve_index=False),
                   os.path.join(src_dir, "b1.parquet"))

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    out_dir = os.path.join(tmp_root, "dedup_out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            dedup_stream(stream, ttl="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        return {
            (r["conv_id"], r["turn_idx"]): r["n_dups_dropped"]
            for r in spark.read.parquet(out_dir).collect()
        }

    out1 = run_once()
    # batch 1: 'alpha beta' survives once (its in-batch dup counted), gamma passes
    assert out1 == {("c1", 0): 1, ("c2", 0): 0}

    # batch 2: a cross-batch duplicate of 'alpha beta' must NOT re-emit; a new
    # text must pass
    b2 = _rows([("c3", 0, "alpha beta"), ("c3", 1, "delta")])
    pq.write_table(pa.Table.from_pandas(b2, schema=PA_SCHEMA, preserve_index=False),
                   os.path.join(src_dir, "b2.parquet"))
    out2 = run_once()
    assert ("c3", 0) not in out2  # cross-batch dup dropped by state
    assert out2[("c3", 1)] == 0

    # TTL expiry: a batch 3h ahead advances the watermark 2h past the last
    # 'alpha beta' occurrence (> 1h TTL), expiring its state; the NEXT batch
    # may then re-admit the same text — the Bloom-layer trade, by design
    b3 = _rows([("c4", 0, "horizon mover")], offset_minutes=180)
    pq.write_table(pa.Table.from_pandas(b3, schema=PA_SCHEMA, preserve_index=False),
                   os.path.join(src_dir, "b3.parquet"))
    run_once()
    b4 = _rows([("c5", 0, "alpha beta")], offset_minutes=185)
    pq.write_table(pa.Table.from_pandas(b4, schema=PA_SCHEMA, preserve_index=False),
                   os.path.join(src_dir, "b4.parquet"))
    out4 = run_once()
    assert out4[("c5", 0)] == 0  # re-admitted after state expiry
