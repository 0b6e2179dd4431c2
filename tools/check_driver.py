"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side, compare row count, column names,
and order-insensitive value content. Usage:

    python tools/check_driver.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray


def to_pdf(obj) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if df[c].dtype == object and not df[c].map(lambda v: isinstance(v, (int, float)) or v is None).all():
            df[c] = df[c].astype(str)
        elif dt.startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or dt.startswith(("float", "double", "int", "uint")):
            df[c] = df[c].astype(np.float64).round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = norm(to_pdf(fn(sf_dir)))
        if name not in oracles:
            print(f"{name:28s} rows={len(got)}  (rows-only, no oracle)")
            continue
        exp = norm(con.sql(oracles[name]).df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = ok_rows and ok_cols and got.equals(exp)
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"{name:28s} {status} rows={len(got)}/{len(exp)} cols={ok_cols} vals={ok_vals}")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print("  ray cols:", list(got.columns))
                print("  sql cols:", list(exp.columns))
            elif ok_rows:
                neq = ~(got.eq(exp) | (got.isna() & exp.isna()))
                bad = neq.any(axis=1)
                print(got[bad].head(3))
                print(exp[bad].head(3))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
