"""Driver-mimic: run every __ray_entry__ query against its DuckDB oracle and
report row-count / schema / value equality. Usage:

    python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(x):
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, sqls = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        want = normalize(con.execute(sqls[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"schema {list(got.columns)} != {list(want.columns)}")
        if not status:
            if got.equals(want):
                print(f"OK   {name}: {len(got)} rows")
            else:
                neq = (got != want).any(axis=1)
                print(f"FAIL {name}: {int(neq.sum())} differing rows of {len(got)}")
                print("  got :", got[neq].head(3).to_dict("records"))
                print("  want:", want[neq].head(3).to_dict("records"))
                failures += 1
        else:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
