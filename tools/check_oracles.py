"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on one sf dir, compare row count, schema
(column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name, mine, oracle) -> str:
    import pandas as pd

    mine, oracle = normalize(mine), normalize(oracle)
    if list(mine.columns) != list(oracle.columns):
        return f"SCHEMA MISMATCH: {list(mine.columns)} vs {list(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"ROWCOUNT MISMATCH: {len(mine)} vs {len(oracle)}"
    for col in mine.columns:
        a, b = mine[col], oracle[col]
        try:
            # the driver value-hash flips on dtype class (int64 vs float64)
            # even when values agree — mirror that strictness here
            if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                return f"DTYPE MISMATCH col {col}: {a.dtype} vs {b.dtype}"
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                import numpy as np

                if not np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
                ):
                    bad = (a.astype(float) - b.astype(float)).abs().idxmax()
                    return f"VALUE MISMATCH col {col} (e.g. row {bad}: {a[bad]} vs {b[bad]})"
            else:
                if not (a.astype(str).fillna("") == b.astype(str).fillna("")).all():
                    bad = (a.astype(str) != b.astype(str)).idxmax()
                    return f"VALUE MISMATCH col {col} (e.g. row {bad}: {a[bad]!r} vs {b[bad]!r})"
        except Exception as ex:
            return f"COMPARE ERROR col {col}: {ex}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            results[name] = f"QUERY ERROR: {type(ex).__name__}: {ex}"
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = f"rows-only ({len(mine)} rows)"
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as ex:
            results[name] = f"ORACLE ERROR: {type(ex).__name__}: {ex}"
            continue
        results[name] = compare(name, mine, oracle)
    width = max(len(k) for k in results)
    n_bad = 0
    for name, status in results.items():
        marker = "ok" if status == "OK" or status.startswith("rows-only") else "FAIL"
        if marker == "FAIL":
            n_bad += 1
        print(f"{name:<{width}}  [{marker}] {status}")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
