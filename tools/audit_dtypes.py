"""Strict dtype audit: the driver's value-hash is dtype-sensitive, but
tools/check_queries.py normalizes dtypes (int* -> int64, float* -> float64)
and so cannot catch e.g. a DuckDB HUGEINT (sum of INTEGER) vs an emitted
int64 — the exact mismatch behind the round-2 `rel_event_weekday_pivot`
hash FAIL.  This tool compares the Arrow schema of each oracle's DuckDB
result to the Arrow schema of the pipeline result, column by column, with
NO normalization, and flags every divergence.

Usage: python tools/audit_dtypes.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_arrow(res) -> pa.Table:
    import pandas as pd

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    raise TypeError(type(res))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    flagged = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        if name not in sqls:
            continue
        try:
            got = to_arrow(fn(sf_dir))
            want = con.sql(sqls[name]).arrow()
        except Exception as ex:
            print(f"ERR  {name}: {type(ex).__name__}: {ex}")
            flagged += 1
            continue
        diffs = []
        gmap = {f.name: f.type for f in got.schema}
        wmap = {f.name: f.type for f in want.schema}
        for col in sorted(set(gmap) | set(wmap)):
            gt, wt = gmap.get(col), wmap.get(col)
            if gt is None or wt is None:
                diffs.append(f"{col}: pipeline={gt} oracle={wt} (missing)")
            elif gt != wt:
                diffs.append(f"{col}: pipeline={gt} oracle={wt}")
        if diffs:
            print(f"DTYPE {name}: " + "; ".join(diffs))
            flagged += 1
        else:
            print(f"ok    {name}")
    print(f"\n{flagged} queries flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    code = main()
    ray.shutdown()
    sys.exit(code)
