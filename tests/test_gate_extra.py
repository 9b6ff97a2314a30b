"""The driver's correctness gate reads only the first GATE_WINDOW (50)
registrations, so redundant non-engine twins of engine-backed entries live in
the EXTRA registry. They stay oracle-checked here (same dual-engine identity
as the gated entries, at sf0.001), and the window invariant itself is pinned
so a future registration can't silently push an entry past the gate."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from intuition_spark.driver_gate import (
    EXTRA_ORACLE_SQL,
    EXTRA_QUERIES,
    GATE_WINDOW,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "part", "orders", "customer"):
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


def test_gate_window_not_exceeded():
    """Every registered entry must land inside the driver's oracle window —
    r1 lost oracle rows for registrations 51-57."""
    assert len(entrymod.queries()) <= GATE_WINDOW


def test_all_gated_entries_have_oracle():
    """Every gated entry has a DuckDB oracle — since r3 even the k-means
    clustering entry (deterministic Lloyd's unrolled into CTE iterations)."""
    rows_only = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert rows_only == set()


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLE_SQL))
def test_extra_entry_matches_oracle(spark, duck, name):
    got = EXTRA_QUERIES[name](spark, SF_DIR).toPandas()
    exp = duck.execute(EXTRA_ORACLE_SQL[name]).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    assert _normalize(got) == _normalize(exp)
