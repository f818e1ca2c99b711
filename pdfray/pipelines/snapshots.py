"""Versioned snapshot store: the lakehouse commit / time-travel protocol.

A table is a MANIFEST plus immutable snapshot directories.  Writers make a
snapshot durable first (`staging.stage_checkpoint`'s _DONE discipline, so a
crashed write is replaced wholesale on retry), then COMMIT it by atomically
replacing the one small manifest file (tmp + os.replace).  Readers resolve
the file list from the manifest alone, so:

- a torn or in-flight snapshot write is invisible until its commit;
- orphan files/dirs in the store (crashed writers, concurrent compactions)
  are invisible forever;
- `read_as_of(store, k)` sees EXACTLY the snapshots committed with id <= k —
  snapshot isolation and time travel from one mechanism.

This is the Iceberg/Delta commit shape reduced to its load-bearing core; at
multi-writer scale the single-file replace becomes a CAS on the metastore,
everything else unchanged.  Single-filesystem assumption as elsewhere in
the repo (workers and driver share the store path).
"""
from __future__ import annotations

import json
import os

MANIFEST = "manifest.json"


def _load_manifest(store_dir: str) -> dict:
    p = os.path.join(store_dir, MANIFEST)
    if os.path.exists(p):
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)
    return {"snapshots": {}}


def commit_snapshot(store_dir: str, snapshot_id: int, ds_factory) -> None:
    """Write snapshot ``snapshot_id``'s files under ``snap{id}/`` durably,
    then commit it to the manifest atomically.  Idempotent: an
    already-committed id is a no-op (resume), and a crashed write before
    the commit leaves the manifest — and therefore every reader —
    untouched."""
    from .staging import stage_checkpoint

    os.makedirs(store_dir, exist_ok=True)
    man = _load_manifest(store_dir)
    key = str(int(snapshot_id))
    if key in man["snapshots"]:
        return
    sub = f"snap{key}"
    stage_checkpoint(ds_factory, os.path.join(store_dir, sub), allow_empty=True)
    man["snapshots"][key] = sub
    tmp = os.path.join(store_dir, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(store_dir, MANIFEST))


def read_as_of(store_dir: str, snapshot_id: int):
    """Dataset over every file committed at snapshot ids <= snapshot_id,
    or None when those snapshots hold no files.  Only manifest-listed
    directories are read — anything else in the store does not exist as
    far as readers are concerned."""
    import ray.data as rd

    man = _load_manifest(store_dir)
    files = []
    for sid, sub in sorted(man["snapshots"].items(), key=lambda kv: int(kv[0])):
        if int(sid) > int(snapshot_id):
            continue
        d = os.path.join(store_dir, sub)
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return rd.read_parquet(files) if files else None
