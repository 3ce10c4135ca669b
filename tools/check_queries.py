"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at a given sf, compare row count,
column names and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]
    record: dict[str, dict] = {}

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray error: {type(ex).__name__}: {ex}")
            record[name] = {"status": "FAIL",
                            "err": f"{type(ex).__name__}: {ex}"}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows={len(got)} ({dt:.1f}s) [rows-only, no oracle]")
            record[name] = {"status": "rows_only", "rows": len(got),
                            "sec": round(dt, 2)}
            continue
        want = normalize(con.sql(sqls[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"rowcount {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as ex:
                status.append("values differ: " + str(ex).split("\n")[-2][:200])
        if status:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(status))
            record[name] = {"status": "FAIL", "err": "; ".join(status)}
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
            record[name] = {"status": "PASS", "rows": len(got),
                            "oracle_rows": len(want), "sec": round(dt, 2)}
    if json_path:
        import json
        import subprocess

        head = subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__)))).stdout.strip()
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "commit": head,
                       "checked": len(record), "entries": record}, f,
                      indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    code = main()
    ray.shutdown()
    sys.exit(code)
