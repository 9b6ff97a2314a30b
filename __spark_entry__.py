"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in intuition_spark/driver_gate.py (DataFrame programs
mirroring SURVEY.md §2 operators) and intuition_spark/driver_engine.py (the
real segmented/compressed/WAND engine, still SQL-gated).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import intuition_spark.driver_engine  # noqa: E402,F401  (registers engine-backed entries)
import intuition_spark.driver_gate_ext  # noqa: E402,F401  (dedup/similarity/text/mm entries)
from intuition_spark import driver_gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-stack BM25 top-k over sf0.001 documents — ws analyzer →
    segmented block-compressed index → block-max WAND → top-k merge."""
    from intuition_spark.driver_engine import get_documents_engine
    from intuition_spark.query.ast import Query

    eng = get_documents_engine(spark, "/root/testdata/sf0.001")
    q = Query("flagship", "and", [["table"], ["value"]], k=10, analyzer="ws")
    return eng.search(q, mode="wand")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_gate.ORACLE_SQL)
