"""CLI entry point for the checkpoint-resumable extraction run.

The `ray job submit` target for a production corpus:

    ray job submit -- python tools/run_extraction.py \\
        --input /data/corpus_parquet --out /data/extracted \\
        --partitions 4096 --chunks 64

Owns its Ray session (library code never calls ray.init); resumes off the
scheme-stamped manifest, writes chunked parquet + the per-partition metrics
rollup, and prints one JSON summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus parquet file/dir")
    ap.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "warc", "files"],
        help="input layout: parquet (default), warc (.warc/.warc.gz "
        "Common-Crawl segments), files (loose-PDF directory crawl)",
    )
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--huge-threshold", default="auto",
                    help="'auto', 'none', or a byte count for the skew pool")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="0 = let ray.init autodetect / use the cluster")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from pdfray.pipelines.extraction import run_extraction

    huge = args.huge_threshold
    if huge == "none":
        huge = None
    elif huge != "auto":
        huge = int(huge)

    t0 = time.perf_counter()
    stats = run_extraction(
        args.input,
        args.out,
        num_partitions=args.partitions,
        chunks=args.chunks,
        resume=not args.no_resume,
        huge_threshold=huge,
        batch_size=args.batch_size,
        input_format=args.format,
    )
    stats["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
