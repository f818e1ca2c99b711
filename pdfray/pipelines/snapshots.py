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


# ---------------------------------------------------------------------------
# Merge-on-read positional deletes (the Iceberg v2 delete-file shape):
# a delete snapshot holds, PER DATA FILE, the row positions erased from it.
# Readers apply deletes positionally — they never re-evaluate the predicate
# that produced them, which is the point: the predicate may be expensive,
# reference since-dropped columns, or be a one-off erasure list (GDPR).

DELETE_PREFIX = "del_"


def data_files_as_of(store_dir: str, snapshot_id: int) -> list:
    """(rel_key, abs_path) for every DATA file committed at ids <=
    snapshot_id, in commit order.  rel_key = 'snapN/<file>' — the stable
    identity delete files are scoped by."""
    man = _load_manifest(store_dir)
    out = []
    for _sid, ent in _effective_entries(man, snapshot_id):
        sub = ent if isinstance(ent, str) else ent["sub"]
        kind = "data" if isinstance(ent, str) else ent.get("kind", "data")
        if kind == "delete":
            continue  # compact entries ARE data; deletes are not
        d = os.path.join(store_dir, sub)
        if os.path.isdir(d):
            out.extend(
                (f"{sub}/{f}", os.path.join(d, f))
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return out


def commit_position_deletes(
    store_dir: str, snapshot_id: int, as_of: int, mask_fn
) -> None:
    """Resolve ``mask_fn`` (pa.Table -> bool ndarray, True = DELETE) to
    positional delete files against every data file visible at ``as_of``,
    then commit atomically.  One delete parquet PER data file (named
    ``del_<flattened rel_key>``), so a merge-on-read task touches exactly
    its own companion — no broadcast, no join, scales with the deleted
    fraction.  Durable-then-commit like commit_snapshot (files + _DONE
    before the manifest replace); idempotent on resume."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    os.makedirs(store_dir, exist_ok=True)
    man = _load_manifest(store_dir)
    key = str(int(snapshot_id))
    if key in man["snapshots"]:
        return
    sub = f"snap{key}"
    sdir = os.path.join(store_dir, sub)
    done = os.path.join(sdir, "_DONE")
    if not os.path.exists(done):
        import shutil

        if os.path.isdir(sdir):
            shutil.rmtree(sdir)
        os.makedirs(sdir)
        files = data_files_as_of(store_dir, as_of)

        def resolve(batch: pa.Table) -> pa.Table:
            outs = {"rel_key": [], "n_deleted": []}
            for rel_key, path, out_name in zip(
                batch.column("rel_key").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("out_name").to_pylist(),
            ):
                t = pq_.read_table(path)
                pos = np.flatnonzero(np.asarray(mask_fn(t), dtype=bool))
                if len(pos):
                    pq_.write_table(
                        pa.table({"pos": pa.array(pos.astype(np.int64))}),
                        os.path.join(sdir, out_name),
                    )
                outs["rel_key"].append(rel_key)
                outs["n_deleted"].append(len(pos))
            return pa.table(
                {
                    "rel_key": pa.array(outs["rel_key"], pa.string()),
                    "n_deleted": pa.array(outs["n_deleted"], pa.int64()),
                }
            )

        if files:
            items = [
                {
                    "rel_key": rk,
                    "path": p,
                    "out_name": DELETE_PREFIX
                    + rk.replace("/", "__") ,
                }
                for rk, p in files
            ]
            rd.from_items(items).map_batches(
                resolve, batch_size=1, batch_format="pyarrow"
            ).materialize()  # tiny count rows; forces the writes
        with open(done, "w", encoding="utf-8"):
            pass
    man["snapshots"][key] = {"sub": sub, "kind": "delete"}
    tmp = os.path.join(store_dir, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(store_dir, MANIFEST))


def read_merged(store_dir: str, snapshot_id: int):
    """Merge-on-read Dataset as of ``snapshot_id``: every data file with
    every committed positional delete <= snapshot_id applied.  One read
    task per data file; each task reads ONLY its companion delete files
    (exact file scoping — the Iceberg delete-file idea without the
    min/max indirection).  Returns None for an empty table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    man = _load_manifest(store_dir)
    files = data_files_as_of(store_dir, snapshot_id)
    if not files:
        return None
    del_dirs = []
    for _sid, ent in _effective_entries(man, snapshot_id):
        if not isinstance(ent, str) and ent.get("kind") == "delete":
            del_dirs.append(os.path.join(store_dir, ent["sub"]))

    def read_one(batch: pa.Table) -> pa.Table:
        outs = []
        for rel_key, path in zip(
            batch.column("rel_key").to_pylist(),
            batch.column("path").to_pylist(),
        ):
            t = pq_.read_table(path)
            dels = []
            cname = DELETE_PREFIX + rel_key.replace("/", "__")
            for dd in del_dirs:
                p = os.path.join(dd, cname)
                if os.path.exists(p):
                    dels.append(
                        pq_.read_table(p).column("pos").to_numpy(
                            zero_copy_only=False
                        )
                    )
            if dels:
                keep = np.ones(len(t), dtype=bool)
                keep[np.concatenate(dels)] = False
                t = t.filter(pa.array(keep))
            outs.append(t)
        return pa.concat_tables(outs)

    items = [{"rel_key": rk, "path": p} for rk, p in files]
    return rd.from_items(items).map_batches(
        read_one, batch_size=1, batch_format="pyarrow"
    )


def _effective_entries(man: dict, snapshot_id: int) -> list:
    """(sid, ent) visible at ``snapshot_id`` after compaction shadowing:
    the newest compact entry with id <= snapshot_id hides every entry
    with id <= its replaces_up_to (their data AND deletes are baked into
    the compacted files).  Plain-string entries are data (back-compat)."""
    ents = sorted(man["snapshots"].items(), key=lambda kv: int(kv[0]))
    shadow = -1
    for sid, ent in ents:
        if int(sid) > int(snapshot_id) or isinstance(ent, str):
            continue
        if ent.get("kind") == "compact":
            shadow = max(shadow, int(ent["replaces_up_to"]))
    out = []
    for sid, ent in ents:
        if int(sid) > int(snapshot_id):
            continue
        kind = "data" if isinstance(ent, str) else ent.get("kind", "data")
        if int(sid) <= shadow and kind != "compact":
            continue
        out.append((int(sid), ent))
    return out


def compact(store_dir: str, snapshot_id: int, as_of: int) -> None:
    """Rewrite the MERGED view as of ``as_of`` (deletes applied) into one
    new snapshot and commit it as a ``compact`` entry shadowing every
    snapshot <= as_of.  Readers at ids >= ``snapshot_id`` see only the
    compacted files; time travel BELOW it still resolves the originals
    until `vacuum` reclaims them.  Durable-then-commit, idempotent."""
    man = _load_manifest(store_dir)
    key = str(int(snapshot_id))
    if key in man["snapshots"]:
        return
    from .staging import stage_checkpoint

    sub = f"snap{key}"
    merged = read_merged(store_dir, as_of)
    if merged is not None:
        stage_checkpoint(
            lambda: merged, os.path.join(store_dir, sub), allow_empty=True
        )
    else:
        os.makedirs(os.path.join(store_dir, sub), exist_ok=True)
    man["snapshots"][key] = {
        "sub": sub,
        "kind": "compact",
        "replaces_up_to": int(as_of),
    }
    tmp = os.path.join(store_dir, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(store_dir, MANIFEST))


def vacuum(store_dir: str) -> list:
    """Reclaim every snapshot shadowed by the NEWEST compaction: remove
    its manifest entry, then its directory (manifest first — a crash
    between the two leaves only orphan dirs, which readers never see).
    Trades time travel below the compaction point for space; returns the
    removed snapshot ids."""
    import shutil

    man = _load_manifest(store_dir)
    shadow = -1
    for sid, ent in man["snapshots"].items():
        if not isinstance(ent, str) and ent.get("kind") == "compact":
            shadow = max(shadow, int(ent["replaces_up_to"]))
    victims = [
        sid
        for sid, ent in man["snapshots"].items()
        if int(sid) <= shadow
        and (isinstance(ent, str) or ent.get("kind") != "compact")
    ]
    if not victims:
        return []
    subs = [
        man["snapshots"][sid] if isinstance(man["snapshots"][sid], str)
        else man["snapshots"][sid]["sub"]
        for sid in victims
    ]
    for sid in victims:
        del man["snapshots"][sid]
    tmp = os.path.join(store_dir, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(store_dir, MANIFEST))
    for sub in subs:
        shutil.rmtree(os.path.join(store_dir, sub), ignore_errors=True)
    return sorted(int(v) for v in victims)
