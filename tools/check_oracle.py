"""Local replica of the driver's correctness gate: run each declared query
on Spark and its oracle on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --window   # first 50 only,
       exactly the slice the round driver verifies
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.queries import all_oracles, all_queries

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision — we claim bit-stability
        return repr(v)
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hash(tuple(lines)), lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    window_only = "--window" in args
    only = {a for a in args if a != "--window"}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries, oracles = all_queries(), all_oracles()
    if window_only:
        queries = dict(list(queries.items())[:50])
    failed = []
    attempted = 0
    rows_only = 0
    t_total = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only += 1
            print(
                f"OK?   {name}: rows={len(s_rows)} (no oracle — rows-only check)"
                f" [{time.time() - t0:.2f}s]"
            )
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        # The driver fetches oracle results through arrow/pandas, where
        # DuckDB HUGEINT/DECIMAL (e.g. any un-CAST SUM over integers)
        # becomes decimal128 -> float64 and "3" hashes as "3.0". fetchall()
        # hides that, so flag the types here — a HUGEINT/DECIMAL oracle
        # column is a driver hash-fail even when values match locally.
        # NB: the DBAPI cursor's description reports coarse type codes
        # ('NUMBER'), which let HUGEINT through — DESCRIBE reports the
        # real logical types
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            bad_types = [
                f"{r[0]}:{r[1]}"
                for r in desc
                if "HUGEINT" in str(r[1]).upper() or "DECIMAL" in str(r[1]).upper()
            ]
        except Exception:  # noqa: BLE001 — DESCRIBE quirks never fail the row
            bad_types = []
        if bad_types:
            problems.append(
                f"oracle emits driver-unsafe column types {bad_types} — "
                "CAST to BIGINT/DOUBLE in the oracle SQL"
            )
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if not problems:
            s_sig, s_lines = frame_signature(s_cols, s_rows)
            d_sig, d_lines = frame_signature(d_cols, d_rows)
            if s_sig != d_sig or s_lines != d_lines:
                diff = [
                    (a, b) for a, b in zip(s_lines, d_lines) if a != b
                ][:3]
                problems.append(f"value mismatch, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"PASS  {name}: rows={len(s_rows)} [{time.time() - t0:.2f}s]")
    skipped = len(queries) - attempted
    print(
        f"\n{attempted - len(failed)}/{attempted} attempted pass"
        f" ({rows_only} rows-only, {skipped} skipped,"
        f" {len(queries)} registered) [{time.time() - t_total:.1f}s total]"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
