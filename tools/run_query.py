"""Run any registered pipeline by name and write its result to parquet —
the generic production exit for the 98 queries() entries.

Usage:
    python tools/run_query.py <query> [--sf-dir DIR] [--out PATH.parquet]
                              [--num-cpus N] [--list]

Owns its Ray session (the driver contract forbids ray.init inside
__ray_entry__ / library code; CLI entry points own one).  The result —
a pandas frame, Arrow table, or Ray Dataset — lands as ONE parquet file
(query results are driver-sized by the repo's design: every pipeline
reduces before collecting; corpus-sized outputs go through the dedicated
production exits like run_extraction.py / write_training_shards).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() entry name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="output parquet path")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    if args.list or not args.query:
        print("\n".join(names))
        return 0
    if args.query not in names:
        print(f"unknown query {args.query!r}; --list shows the registry",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        result = entrymod.queries()[args.query](args.sf_dir)
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        if hasattr(result, "to_pandas") and not isinstance(
            result, (pd.DataFrame, pa.Table)
        ):
            result = result.to_pandas()  # Ray Dataset -> driver-sized frame
        table = (
            result
            if isinstance(result, pa.Table)
            else pa.Table.from_pandas(result, preserve_index=False)
        )
        out = args.out or f"/tmp/pdfray_query_{args.query}.parquet"
        pq.write_table(table, out)
        print(f"{args.query}: {table.num_rows} rows x "
              f"{table.num_columns} cols -> {out}")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
