"""Inverted-index build: docs table → segmented, block-compressed postings.

Replaces the reference's index path (compose → Solr add → Lucene segment
build/merge, `SolrServiceImpl.updateSolrArticles` `service/SolrServiceImpl.java:69-159`
+ `SolrClientTool.addUpdateDeleteMany` `util/SolrClientTool.java:503-523`)
with a Spark-native layout:

    <index>/docs/seg=K/        one row per turn: doc_id, doc, conv_id,
                               turn_idx, role, tool, ts, dl, text
    <index>/postings/seg=K/    one row per (term, block of ≤128 docs):
                               delta+varint docs / varint tfs / varint dls /
                               delta varint positions, block-max metadata
    <index>/dictionary/        (term, df, cf) global term stats
    <index>/manifest/          per-segment checkpoint rows (B9)
    <index>/stats.json         N, avgdl, analyzer, n_segments, …

Scale design (the part that must survive 1000 executors × 100 TB):

* **Segments are the unit of everything** — doc-id namespace (doc_id =
  seg << 40 | row), skew control (a head term's postings are split across all
  segments, so no single task ever holds a global posting list — this is the
  explicit salting demanded for head-term skew, with salt = doc-hash segment),
  query parallelism (each segment scores independently, no query-time shuffle
  of postings), and checkpoint/resume granularity (Lucene-segment analogue).
* Doc ids are dense per segment and assigned by a window over
  (conv_id, turn_idx) *after* hashing conversations to segments — whole
  conversations stay in one segment, so doc-id order within a segment equals
  the canonical tiebreak order.
* Postings rows within each seg partition are written sorted by term, so a
  query's ``term IN (…)`` filter prunes parquet row groups via min/max stats —
  the scan cost of a query is O(query-term postings), not O(index).
* Per-segment manifest rows + per-segment dynamic-partition overwrite make the
  build idempotent and resumable (replaces the page-number-in-notes
  checkpoint, `config/ScheduledTasks.java:58-85`).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intuition_spark.analysis.analyzers import analyze_text, make_terms_udf
from intuition_spark.index import codec

SEG_SHIFT = 40  # doc_id = (seg << 40) | row_in_segment
K1 = 1.2
B = 0.75

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("blk", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("tf_sum", T.LongType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("max_impact", T.DoubleType()),
        T.StructField("docs_bin", T.BinaryType()),
        T.StructField("tfs_bin", T.BinaryType()),
        T.StructField("dls_bin", T.BinaryType()),
        T.StructField("pos_bin", T.BinaryType()),
        T.StructField("seg", T.IntegerType()),
    ]
)

POSTING_ROW_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def _make_tokenize_partition(analyzer: str, with_positions: bool):
    """mapInPandas fn: docs rows → posting rows (seg, term, doc_id, tf, dl, positions)."""

    def tokenize_partition(batches):
        for pdf in batches:
            segs, terms, docs, tfs, dls, poss = [], [], [], [], [], []
            for seg, doc_id, text in zip(pdf["seg"].values, pdf["doc_id"].values, pdf["text"].values):
                toks = analyze_text(text, analyzer)
                dl = len(toks)
                agg: dict[str, list[int]] = {}
                for term, pos in toks:
                    agg.setdefault(term, []).append(pos)
                for term, ps in agg.items():
                    segs.append(seg)
                    terms.append(term)
                    docs.append(doc_id)
                    tfs.append(len(ps))
                    dls.append(dl)
                    poss.append(ps if with_positions else None)
            yield pd.DataFrame(
                {"seg": pd.array(segs, dtype="int32"), "term": terms,
                 "doc_id": pd.array(docs, dtype="int64"), "tf": pd.array(tfs, dtype="int32"),
                 "dl": pd.array(dls, dtype="int32"), "positions": poss}
            )

    return tokenize_partition


def _make_encode_blocks(avgdl: float, with_positions: bool):
    """applyInPandas fn over (seg, term): posting rows → block rows."""

    def encode_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg, term = int(key[0]), key[1]
        pdf = pdf.sort_values("doc_id")
        doc = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        pos = pdf["positions"].to_numpy() if with_positions else None
        impact = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        rows = []
        for blk, s in enumerate(range(0, len(doc), codec.BLOCK_SIZE)):
            e = min(s + codec.BLOCK_SIZE, len(doc))
            rows.append(
                {
                    "term": term, "blk": blk, "n": e - s,
                    "first_doc": int(doc[s]), "last_doc": int(doc[e - 1]),
                    "tf_sum": int(tf[s:e].sum()), "max_tf": int(tf[s:e].max()),
                    "max_impact": float(impact[s:e].max()),
                    "docs_bin": codec.delta_encode(doc[s:e]),
                    "tfs_bin": codec.varint_encode(tf[s:e]),
                    "dls_bin": codec.varint_encode(dl[s:e]),
                    "pos_bin": codec.encode_positions(list(pos[s:e])) if with_positions else None,
                    "seg": seg,
                }
            )
        return pd.DataFrame(rows)

    return encode_blocks


def prepare_docs(
    spark: SparkSession,
    transcripts: DataFrame,
    paths: IndexPaths,
    analyzer: str = "standard",
    n_segments: int = 8,
) -> dict:
    """Stage 1: assign segments + dense doc ids, compute doc lengths, write docs table."""
    t0 = time.time()
    terms_udf = make_terms_udf(analyzer)
    df = (
        transcripts.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
        .withColumn("seg", F.pmod(F.xxhash64("conv_id"), F.lit(n_segments)).cast("int"))
        .withColumn("dl", F.size(terms_udf(F.col("text"))))
    )
    w = Window.partitionBy("seg").orderBy("conv_id", "turn_idx")
    df = df.withColumn(
        "doc_id",
        (F.col("seg").cast("long") * F.lit(1 << SEG_SHIFT) + F.row_number().over(w) - 1),
    ).withColumn("doc", F.concat_ws(":", "conv_id", "turn_idx"))
    df.write.mode("overwrite").partitionBy("seg").parquet(paths.docs)

    agg = spark.read.parquet(paths.docs).agg(
        F.count("*").alias("N"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    stats = {
        "N": int(agg["N"]),
        "avgdl": float(agg["total_dl"]) / max(1, int(agg["N"])),
        "analyzer": analyzer,
        "n_segments": n_segments,
        "k1": K1,
        "b": B,
        "docs_wall_s": round(time.time() - t0, 3),
    }
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=1)
    return stats


def _manifest_done_segs(spark: SparkSession, paths: IndexPaths) -> set[int]:
    if not os.path.exists(paths.manifest):
        return set()
    pdf = spark.read.parquet(paths.manifest).filter(F.col("status") == "done").toPandas()
    return set(pdf["seg"].astype(int))


def build_postings(
    spark: SparkSession,
    paths: IndexPaths,
    with_positions: bool = True,
    segs_per_job: int = 8,
    resume: bool = False,
    fail_after_segs: int | None = None,
) -> None:
    """Stage 2: per-segment posting blocks, checkpointed via the manifest.

    ``fail_after_segs`` deliberately aborts mid-build (for the resume test,
    SURVEY.md §5.2 layer 6).
    """
    with open(paths.stats) as f:
        stats = json.load(f)
    analyzer, avgdl, n_segments = stats["analyzer"], stats["avgdl"], stats["n_segments"]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = _manifest_done_segs(spark, paths) if resume else set()
    todo = [s for s in range(n_segments) if s not in done]

    manifest_schema = T.StructType(
        [
            T.StructField("seg", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField("rows", T.LongType()),
            T.StructField("wall_ms", T.LongType()),
        ]
    )
    docs = spark.read.parquet(paths.docs)
    processed = 0
    for i in range(0, len(todo), segs_per_job):
        batch = todo[i : i + segs_per_job]
        if fail_after_segs is not None and processed >= fail_after_segs:
            raise RuntimeError(f"injected failure after {processed} segments")
        t0 = time.time()
        batch_docs = docs.filter(F.col("seg").isin(batch)).select("seg", "doc_id", "text")
        posting_rows = batch_docs.mapInPandas(
            _make_tokenize_partition(analyzer, with_positions), POSTING_ROW_SCHEMA
        )
        blocks = posting_rows.groupBy("seg", "term").applyInPandas(
            _make_encode_blocks(avgdl, with_positions), BLOCK_SCHEMA
        )
        (
            blocks.repartition("seg")
            .sortWithinPartitions("term", "blk")
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(paths.postings)
        )
        wall = int((time.time() - t0) * 1000)
        rows = [(int(s), "done", 0, wall) for s in batch]
        spark.createDataFrame(rows, manifest_schema).write.mode("append").parquet(paths.manifest)
        processed += len(batch)


def build_dictionary(spark: SparkSession, paths: IndexPaths) -> None:
    """Stage 3: global (term, df, cf) from block metadata — no decode needed."""
    blocks = spark.read.parquet(paths.postings)
    dic = blocks.groupBy("term").agg(
        F.sum("n").alias("df"),
        F.sum("tf_sum").alias("cf"),
        F.max("max_impact").alias("max_impact"),
    )
    dic.repartitionByRange(max(1, dic.rdd.getNumPartitions() // 8), "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(paths.dictionary)


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    analyzer: str = "standard",
    n_segments: int = 8,
    with_positions: bool = True,
    segs_per_job: int = 8,
) -> IndexPaths:
    """Full build: docs → postings → dictionary."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    prepare_docs(spark, transcripts, paths, analyzer=analyzer, n_segments=n_segments)
    build_postings(spark, paths, with_positions=with_positions, segs_per_job=segs_per_job)
    build_dictionary(spark, paths)
    return paths


def decode_blocks_df(blocks: DataFrame, with_positions: bool = False) -> DataFrame:
    """Blocks → row-per-posting DataFrame (seg, term, doc_id, tf, dl, positions).

    Vectorized decode inside mapInPandas; used by the exhaustive scorer and by
    phrase/proximity evaluation.
    """

    def decode(batches):
        for pdf in batches:
            out_seg, out_term, out_doc, out_tf, out_dl, out_pos = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                docs = codec.delta_decode(row.docs_bin, row.n)
                tfs = codec.varint_decode(row.tfs_bin, row.n).astype(np.int64)
                dls = codec.varint_decode(row.dls_bin, row.n).astype(np.int64)
                out_seg.append(np.full(row.n, row.seg, dtype=np.int32))
                out_term.extend([row.term] * row.n)
                out_doc.append(docs)
                out_tf.append(tfs)
                out_dl.append(dls)
                if with_positions:
                    out_pos.extend(
                        [p.astype("int32") for p in codec.decode_positions(row.pos_bin, tfs)]
                        if row.pos_bin is not None
                        else [None] * row.n
                    )
            if not out_term:
                yield pd.DataFrame(
                    {"seg": pd.array([], dtype="int32"), "term": [],
                     "doc_id": pd.array([], dtype="int64"), "tf": pd.array([], dtype="int32"),
                     "dl": pd.array([], dtype="int32"), "positions": []}
                )
                continue
            yield pd.DataFrame(
                {
                    "seg": np.concatenate(out_seg),
                    "term": out_term,
                    "doc_id": np.concatenate(out_doc).astype(np.int64),
                    "tf": np.concatenate(out_tf).astype(np.int32),
                    "dl": np.concatenate(out_dl).astype(np.int32),
                    "positions": out_pos if with_positions else [None] * len(out_term),
                }
            )

    return blocks.mapInPandas(decode, POSTING_ROW_SCHEMA)
