"""Per-partition checkpoint manifest for resumable output.

The output layout is one parquet directory per partition
(``out/partition_id=NNN/``) plus a ``_manifest/`` directory with one marker
file per completed partition, written after that partition's files are
durable.  A restarted run lists the manifest (tiny), broadcasts the completed
set, and drops finished partitions at the read — an anti-join against a
small side implemented as a vectorized filter, no shuffle (SURVEY.md §4.2
checkpoint/resume row).
"""
from __future__ import annotations

import os
from typing import Set


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> Set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("partition_id="):
            try:
                done.add(int(name.split("=", 1)[1].split(".")[0]))
            except ValueError:
                continue
    return done


def mark_completed(out_dir: str, partition_id: int) -> None:
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"partition_id={partition_id}.done")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("done\n")
    os.replace(tmp, path)
