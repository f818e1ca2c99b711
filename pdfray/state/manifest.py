"""Per-partition checkpoint manifest for resumable output.

The output layout is one parquet directory per partition
(``out/partition_id=NNN/``) plus a ``_manifest/`` directory with one marker
file per completed partition, written after that partition's files are
durable.  A restarted run lists the manifest (tiny), broadcasts the completed
set, and drops finished partitions at the read — an anti-join against a
small side implemented as a vectorized filter, no shuffle (SURVEY.md §4.2
checkpoint/resume row).

The manifest also records the PARTITION SCHEME (hash function identity and
num_partitions) in a ``_scheme`` file.  Resuming against markers written
under a different scheme would silently skip re-assigned rows or duplicate
them; ``check_scheme`` refuses such a resume so the caller restarts clean.
"""
from __future__ import annotations

import json
import os
from typing import Set

# bump when url_partition_ids' hash function changes (pandas siphash with the
# library's fixed default key since round 2; was crc32 in round 1)
PARTITION_SCHEME = "pandas-siphash-v2"


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _scheme_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "_scheme")


class SchemeMismatch(RuntimeError):
    """The output directory was written under a different partition scheme."""


def check_scheme(out_dir: str, num_partitions: int) -> None:
    """Record the scheme on first use; refuse to resume on any mismatch."""
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    want = {"scheme": PARTITION_SCHEME, "num_partitions": int(num_partitions)}
    path = _scheme_path(out_dir)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            have = json.load(f)
        if have != want:
            raise SchemeMismatch(
                f"resume refused: {out_dir} was written with partition scheme "
                f"{have}, this run uses {want}; delete the output directory "
                f"(or its _manifest) to restart clean"
            )
        return
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(want, f)
    os.replace(tmp, path)


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
