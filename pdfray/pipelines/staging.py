"""Durable inter-stage handoff: parquet stage checkpoints.

`stage_checkpoint` is the production replacement for `.materialize()`
between pipeline stages whose intermediate is of CORPUS order (exploded
pair tables, sessionized event tables, gated text): the object store never
pins the whole stage, every consumer streams a fresh read of the files,
and a crashed run resumes at the boundary.  Moved here from
training_data.py (round 5) so textops/relational can share it without an
import cycle.

Two properties of Ray's `write_parquet` are load-bearing downstream:

- empty BLOCKS are skipped, so read-back blocks are always nonempty —
  a checkpointed join side can never hit the empty-first-block schema
  loss (CLAUDE.md quirk list);
- an all-empty DATASET writes no files at all, so "stage produced zero
  rows" is detectable from the directory listing (``allow_empty``).
"""
from __future__ import annotations

import os
import shutil


def stage_checkpoint(
    ds_factory,
    stage_dir: str,
    resume: bool = True,
    allow_empty: bool = False,
):
    """Write a pipeline stage to parquet ONCE, then hand every consumer a
    fresh streaming read of the files.

    The ``_DONE`` marker is written only after the files are durable, so a
    partial write is replaced wholesale on retry while a finished stage is
    never re-executed (same marker discipline as `state.manifest`, at
    whole-stage granularity; `run_extraction` remains the per-chunk variant
    for the extraction stage itself).

    Returns a Dataset reading the checkpoint files.  A zero-row stage
    raises ValueError by default (a silently-empty upstream is usually a
    bug); with ``allow_empty=True`` it returns None and the caller
    short-circuits with its statically-known empty result instead.
    """
    import ray.data as rd

    done = os.path.join(stage_dir, "_DONE")
    if not (resume and os.path.exists(done)):
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)  # stale partial output
        os.makedirs(stage_dir)
        ds_factory().write_parquet(stage_dir)
        with open(done, "w", encoding="utf-8"):
            pass
    files = [
        os.path.join(stage_dir, f)
        for f in sorted(os.listdir(stage_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        if allow_empty:
            return None
        raise ValueError(f"stage checkpoint {stage_dir!r} produced no rows")
    return rd.read_parquet(files)
