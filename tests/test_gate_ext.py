"""Dual-engine identity tests for the driver_gate_ext entries: each Spark
program must equal its DuckDB oracle (row multiset) at sf0.001 — the same
comparison the driver's correctness gate runs at sf0.01.

Also unit-level checks of the portable hash primitives (the bit-identical
arithmetic both engines share).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from intuition_spark.functions import portable as PT

SF_DIR = "/root/testdata/sf0.001"

EXT_ORACLE_ENTRIES = [
    "dedup_minhash_lsh",
    "dedup_lsh_jaccard",
    "dedup_simhash",
    "dedup_embed_cosine",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "text_langid",
    "text_token_counts",
    "text_fingerprint",
    "fts_w3_islands",
    "fts_q16_cutoff",
    "fts_q17_prox_validate",
    "fts_engine_wildcard",
    "fts_engine_regex",
    "fts_engine_fuzzy",
    "fts_engine_or_groups",
    "fts_engine_highlight",
    "fts_engine_get_by_id",
    "fts_engine_filtered",
    "fts_q18_kmer",
    "fts_q18_kmer_rc",
    "rel_j2_rank_fold",
    "mm_media_features",
    "mm_frame_sample",
]

EXT_ROWS_ONLY = ["fts_q19_clustering"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = [
        tuple(round(v, 6) if isinstance(v, float) else v for v in t)
        for t in df.itertuples(index=False)
    ]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", EXT_ORACLE_ENTRIES)
def test_ext_entry_matches_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    exp = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    assert _normalize(got) == _normalize(exp)


@pytest.mark.parametrize("name", EXT_ROWS_ONLY)
def test_ext_rows_only_stable(spark, name):
    a = entrymod.queries()[name](spark, SF_DIR).toPandas()
    b = entrymod.queries()[name](spark, SF_DIR).toPandas()
    assert len(a) > 0
    assert _normalize(a) == _normalize(b)  # deterministic stub output


def test_charfold_matches_duckdb(spark, duck):
    words = ["table", "scan merge", "", "a", "Zebra-42!"]
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame([(w,) for w in words], ["s"])
        .select(PT.s_charfold(F.col("s")).alias("h"))
        .toPandas()["h"]
        .tolist()
    )
    exp = [
        duck.execute(f"SELECT {PT.d_charfold('s')} FROM (SELECT ? AS s)", [w]).fetchone()[0]
        for w in words
    ]
    assert got == exp


def test_minhash_band_recall_property():
    """Docs with Jaccard ~1 must share every band (minhash of equal sets is
    equal), so LSH recall on true duplicates is structural, not probabilistic."""
    params = PT.hash_params(8, seed=7)
    hs = [123456789, 987654321, 555555]
    mins = [min((a * h + b) % PT.P for h in hs) for a, b in params]
    mins2 = [min((a * h + b) % PT.P for h in reversed(hs)) for a, b in params]
    assert mins == mins2  # order-independent → identical sets give identical sigs
