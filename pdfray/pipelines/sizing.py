"""Data- and cluster-derived shuffle/join partition sizing.

A hard-coded partition count is a scale bug in disguise: a constant tuned
on one node either starves a big cluster (too few partitions, each of
corpus/K bytes) or drowns a small job in fixed per-partition sort-shuffle
machinery (too many — the dominant cost at benchmark scale, see the
shuffle-count notes in CLAUDE.md).  This module is the ONE place the trade
is made; every `num_partitions=` / compacting `repartition()` in the
pipelines derives its count here.

    parts = max(slot_floor, data_parts)

    data_parts = ceil(max(rows / target_rows, bytes / target_bytes))
        data-proportional: at 1000x the input there are 1000x the
        partitions, each staying at the size the exchange was tuned for —
        this is the term that matters at 100 TB, and it is uncapped.

    slot_floor = min(cpus, ceil(rows / min_rows))
        use every cluster slot once each slot has at least ``min_rows``
        to chew on; never slice a tiny table across an idle cluster
        (per-partition fixed costs would dominate the work).

``cpus`` defaults to the live cluster's CPU total, so the same call site
yields 8-ish partitions on the test node and cluster-wide counts on a
256-node job without retuning.
"""
from __future__ import annotations

import math


def cluster_cpus(default: int = 8) -> int:
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default)) or default


def shuffle_partitions(
    n_rows: int,
    n_bytes: int = None,
    *,
    cpus: int = None,
    target_rows: int = 2_000_000,
    target_bytes: int = 256 << 20,
    min_rows: int = 100_000,
) -> int:
    """Partition count for a shuffle/join over ``n_rows`` input rows
    (optionally also sized by ``n_bytes`` for wide rows).  See the module
    docstring for the formula.  Row counts should come from parquet
    footers or already-reduced driver frames — never from a scan."""
    n_rows = max(0, int(n_rows))
    if n_rows == 0:
        return 1
    cpus = cpus if cpus is not None else cluster_cpus()
    data_parts = math.ceil(n_rows / target_rows)
    if n_bytes:
        data_parts = max(data_parts, math.ceil(n_bytes / target_bytes))
    slot_floor = min(max(1, cpus), math.ceil(n_rows / min_rows))
    return max(slot_floor, data_parts)
