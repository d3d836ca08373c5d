"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf_dir, compare against oracle_sql() via
DuckDB (row count + schema + order-insensitive value hash).

Usage: python scripts/selfcheck.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from rdf_n3_ray.datatune import tune_data_context
from rdf_n3_ray.malloctune import tune_malloc

tune_malloc()  # before ray.init: workers inherit the MALLOC_* env
tune_data_context()


def to_pandas(result) -> pd.DataFrame:
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> int:
    df = canon(df.copy())
    for c in df.columns:
        df[c] = df[c].astype(str)
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("usage: selfcheck.py [sf_dir] [--only name1,name2]")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"unknown --only queries: {sorted(unknown)}; "
                     f"known: {sorted(qs)}")
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: raised {type(e).__name__}: {e}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={sorted(got.columns)} ({elapsed:.1f}s) [rows-only]")
            if len(got) == 0 and name != "minhash_pairs":
                print(f"WARN {name}: zero rows")
            continue
        want = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            a, b = canon(got.copy()), canon(want.copy())
            if len(a) == len(b):  # elementwise diff needs equal shapes
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                print(a[diff].head(3))
                print(b[diff].head(3))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({elapsed:.1f}s)")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(got)} hash match ({elapsed:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
