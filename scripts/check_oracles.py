"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same sf dir; compare
row count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from cassovary_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark(app_name="check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(norm_cell(v) for v in r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        t_spark = time.time() - t0

        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle) [{t_spark:.1f}s]")
            continue

        t0 = time.time()
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = [tuple(norm_cell(v) for v in r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        t_duck = time.time() - t0

        ok = True
        if sorted(c.lower() for c in cols) != sorted(ocols):
            print(f"FAIL  {name}: columns {cols} vs {res.columns}")
            ok = False
        else:
            # align column order by name before comparing values
            order = [cols.index(next(c2 for c2 in cols if c2.lower() == oc)) for oc in ocols]
            rows_aligned = sorted(tuple(r[i] for i in order) for r in rows)
            orows_sorted = sorted(orows)
            if len(rows_aligned) != len(orows_sorted):
                print(f"FAIL  {name}: rowcount {len(rows_aligned)} vs {len(orows_sorted)}")
                ok = False
            elif rows_aligned != orows_sorted:
                diffs = [
                    (a, b)
                    for a, b in zip(rows_aligned, orows_sorted)
                    if a != b
                ][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(
                f"OK    {name}: {len(rows)} rows match [spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
        else:
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    sys.exit(1 if run(sf, only) else 0)
