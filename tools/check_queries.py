"""Local emulation of the driver's correctness gate: run each queries()
entry and its oracle_sql() through DuckDB at a given sf, compare row count,
schema width, and order-insensitive values (columns sorted by name).

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj):
    import pyarrow as pa
    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # normalize integer width so int32 vs int64 doesn't flag
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # transcript_cdc_replay's oracle SQL is bound to an sf at oracle_sql()
    # time (the driver checks at sf0.01); align it with our sf_dir
    import os
    os.environ["CWDS_ORACLE_SF_DIR"] = sf_dir
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sys.argv[2:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name in names:
        try:
            got = normalize(to_pandas(qs[name](sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        exp = normalize(con.execute(oracles[name]).df())
        status = []
        if len(got) != len(exp):
            status.append(f"rows {len(got)}!={len(exp)}")
        if list(got.columns) != list(exp.columns):
            status.append(f"cols {list(got.columns)}!={list(exp.columns)}")
        if not status:
            if got.equals(exp):
                print(f"ok   {name}: {len(got)} rows exact")
            else:
                neq = [c for c in got.columns if not got[c].equals(exp[c])]
                status.append(f"values differ in {neq}")
                for c in neq[:2]:
                    m = got[c] != exp[c]
                    print(f"  {name}.{c}: {m.sum()} diffs; got "
                          f"{got.loc[m, c].head(3).tolist()} exp "
                          f"{exp.loc[m, c].head(3).tolist()}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
