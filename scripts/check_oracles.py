"""Driver-style correctness harness: run every queries() entry and compare
with its oracle_sql() twin via DuckDB (row count, column names, exact values
after order-insensitive sort). Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64 with NA can't become int64 — fall to float64
            df[c] = df[c].astype("float64" if df[c].isna().any() else "int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns: ray={sorted(got.columns)} sql={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"rows: ray={len(got)} sql={len(want)}")
    # Driver parity: its value hash is dtype-sensitive (int64 437500 vs
    # float64 437500.0 hash differently), so flag kind mismatches BEFORE the
    # int-coercing normalize below would mask them.
    for c in sorted(got.columns):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= {"i", "u", "f"} and ((gk == "f") != (wk == "f")):
            problems.append(f"dtype col {c}: ray={got[c].dtype} sql={want[c].dtype} "
                            f"(driver hash is dtype-sensitive)")
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                eq = np.array_equal(gv.astype(float), wv.astype(float), equal_nan=True)
            else:
                eq = (pd.Series(gv) == pd.Series(wv)).all() or \
                     (pd.Series(gv).isna() == pd.Series(wv).isna()).all() and \
                     (pd.Series(gv).fillna("<N>") == pd.Series(wv).fillna("<N>")).all()
            if not eq:
                bad = np.where(pd.Series(gv).fillna("<N>").to_numpy()
                               != pd.Series(wv).fillna("<N>").to_numpy())[0][:3]
                problems.append(f"col {c}: first diffs at {bad.tolist()}: "
                                f"ray={[gv[i] for i in bad]} sql={[wv[i] for i in bad]}")
    return problems


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            got = to_pandas(qs[name](sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name} [{dt:.1f}s]:")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
