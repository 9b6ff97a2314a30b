"""Mimic the driver's correctness gate: run every queries() entry on Spark and
its oracle_sql() on DuckDB at the given sf dir; compare row count, column
names, and order-insensitive value multiset.

Usage: python scripts/gate_check.py [--extra] [sf_dir] [query_name ...]

--extra additionally runs the EXTRA registry (the oracle-checked entries past
the driver's 50-entry window, normally pytest-gated at sf0.001) against the
same DuckDB views — useful for checking them at a larger sf.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(round(v, 6) if isinstance(v, float) else v for v in tup))
    return sorted(rows, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--extra"]
    with_extra = "--extra" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from intuition_spark.session import get_spark

    spark = get_spark("gate-check")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    if with_extra:
        from intuition_spark.driver_gate import EXTRA_ORACLE_SQL, EXTRA_QUERIES

        qs = {**qs, **EXTRA_QUERIES}
        oq = {**oq, **EXTRA_ORACLE_SQL}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oq:
            print(f"OK?   {name}: rows={len(got)} (no oracle, rows-only) [{spark_s:.2f}s]")
            continue
        try:
            exp = con.execute(oq[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_vals = ok_rows and ok_cols and normalize(got) == normalize(exp)
        if ok_vals:
            print(f"PASS  {name}: rows={len(got)} cols={sorted(got.columns)} [{spark_s:.2f}s]")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(got)}/{len(exp)} cols {sorted(got.columns)}/{sorted(exp.columns)}"
            )
            if ok_rows and ok_cols:
                g, e = normalize(got), normalize(exp)
                diffs = [(a, b) for a, b in zip(g, e) if a != b][:5]
                for a, b in diffs:
                    print(f"      spark={a}\n      duck ={b}")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
