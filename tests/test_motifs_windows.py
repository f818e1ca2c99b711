"""Round-5 additions: time-decayed engagement features, hopping (sliding)
windows, the KMV bottom-k distinct sketch, and bipartite butterfly counting
— randomized brute-force cross-checks plus hand-solved structures.

All four queries also ride the registered-oracle harnesses automatically
(tools/check_oracles.py, tests/test_empty_input.py, and the hostile-events
harness for the three event queries)."""
from __future__ import annotations

import hashlib
import itertools
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pdfray.pipelines.relational as R
from pdfray.pipelines.textops import _TWO53


def _write_events(tmp_path, users, ts_us, kinds, values=None):
    n = len(users)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(np.asarray(users, np.int64), pa.int64()),
            "event_type": pa.array(list(kinds), pa.string()),
            "value": pa.array(
                np.ones(n) if values is None else np.asarray(values, np.float64)
            ),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return t


def test_decay_user_engagement_matches_bruteforce(ray_session, tmp_path):
    """Exact equality (check_exact — the whole point of the dyadic-grid
    design) vs an order-shuffled pandas reference, with pre-epoch and
    post-REF (future) events planted to exercise both clamp edges."""
    rng = np.random.default_rng(23)
    n = 5000
    users = rng.integers(0, 120, n)
    day = 86_400_000_000
    # spread across ~90 days around REF_DAY, incl. before/after the clamp
    ts = (R.DECAY_REF_DAY - 60) * day + rng.integers(0, 90 * day, n)
    ts[0] = -day + 123  # pre-epoch: age clamps at 30
    ts[1] = (R.DECAY_REF_DAY + 400) * day  # far future: age clamps at 0
    users[:2] = 7001
    _write_events(tmp_path, users, ts, ["view"] * n)

    out = R.q_decay_user_engagement(str(tmp_path))

    age = R.DECAY_REF_DAY - np.floor_divide(ts, day)
    w = np.ldexp(
        np.ones(n), -np.clip(age, 0, R.DECAY_MAX_AGE_DAYS).astype(np.int32)
    )
    # sum in a DIFFERENT order than the engine's block order — exactness
    # means the result must still be bit-identical
    perm = rng.permutation(n)
    ref = (
        pd.DataFrame({"user_id": users[perm], "w": w[perm]})
        .groupby("user_id", as_index=False)
        .agg(n_events=("w", "size"), score=("w", "sum"))
        .astype({"user_id": "int64", "n_events": "int64", "score": "float64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # the clamped extremes: weight 2^-30 (pre-epoch) + 1.0 (future)
    got = float(out.loc[out["user_id"] == 7001, "score"].iloc[0])
    assert got == 1.0 + 2.0**-30


def test_sliding_window_counts_matches_bruteforce(ray_session, tmp_path):
    """Every event lands in exactly WIN_HOPS windows (total count
    conservation), window starts on the exact hop grid, and the whole
    frame matches a replicate-then-group pandas reference — with an event
    planted exactly ON a hop boundary and a pre-epoch event (negative
    window starts via floor, not truncation)."""
    rng = np.random.default_rng(31)
    n = 4000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 40 * R.SLIDE_HOP_US, n)
    ts[0] = base - base % R.SLIDE_HOP_US  # exactly on a hop boundary
    ts[1] = -5 * R.SLIDE_HOP_US + 17  # pre-epoch
    vals = rng.integers(-64, 64, n) / 64.0  # binary grid: exact sums
    _write_events(tmp_path, np.zeros(n, np.int64), ts, ["view"] * n, vals)

    out = R.q_sliding_window_counts(str(tmp_path))
    assert int(out["n_events"].sum()) == n * R.SLIDE_WIN_HOPS
    assert (out["win_start_us"] % R.SLIDE_HOP_US == 0).all()

    b = np.floor_divide(ts, R.SLIDE_HOP_US)
    wb = np.repeat(b, R.SLIDE_WIN_HOPS) - np.tile(
        np.arange(R.SLIDE_WIN_HOPS, dtype=np.int64), n
    )
    ref = (
        pd.DataFrame(
            {
                "win_start_us": wb * R.SLIDE_HOP_US,
                "v": np.repeat(vals, R.SLIDE_WIN_HOPS),
            }
        )
        .groupby("win_start_us", as_index=False)
        .agg(n_events=("v", "size"), sum_value=("v", "sum"))
    )
    ref["sum_value"] = R.round_half_away(ref["sum_value"].to_numpy(), 2)
    ref = ref.astype(
        {"win_start_us": "int64", "n_events": "int64", "sum_value": "float64"}
    ).sort_values("win_start_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # the pre-epoch event produced negative window starts
    assert int(out["win_start_us"].min()) < 0


def _kmv_hash(u: int) -> int:
    return (
        int.from_bytes(
            hashlib.md5((str(u) + R.KMV_SALT).encode()).digest()[8:], "little"
        )
        % _TWO53
    )


def test_kmv_both_branches_and_error_bound(ray_session, tmp_path):
    """One group with >> k distinct users (estimator branch: kth order
    statistic + (k-1)/u_k, checked bit-for-bit against a direct
    computation and within 25% of truth) and one with < k (exact branch:
    est == the true distinct count).  Duplicated events per user must not
    change anything (the sketch sees distinct hashes)."""
    users_big = np.arange(1000, dtype=np.int64)
    users_small = np.arange(5000, 5010, dtype=np.int64)
    users = np.concatenate([users_big, users_big, users_small])  # dups too
    kinds = ["big"] * 2000 + ["small"] * 10
    ts = np.full(len(users), 1_700_000_000_000_000, np.int64)
    _write_events(tmp_path, users, ts, kinds)

    out = R.q_kmv_distinct_users(str(tmp_path)).set_index("event_type")

    hs = np.sort(np.unique([_kmv_hash(u) for u in users_big]))
    kth = int(hs[R.KMV_K - 1])
    est = R.round_half_away((R.KMV_K - 1.0) * float(_TWO53) / (kth + 1.0), 4)
    big = out.loc["big"]
    assert int(big["n_kept"]) == R.KMV_K
    assert int(big["kth_hash"]) == kth
    assert float(big["est"]) == est
    assert abs(est - 1000) / 1000 < 0.25  # sketch accuracy sanity

    small = out.loc["small"]
    assert int(small["n_kept"]) == 10
    assert float(small["est"]) == 10.0  # below k the sketch is exact


def _write_graph(tmp_path, edges, dangling=()):
    """Materialize a bipartite (u, p) edge list as orders+lineitem parquet:
    one order per edge (plus a duplicate order for the first edge and a
    duplicate lineitem row — the dedup under test), `dangling` lineitems
    reference orderkeys absent from orders."""
    rows = []
    orders = []
    k = 0
    for i, (u, p) in enumerate(edges):
        orders.append((k, u))
        rows.append((k, p))
        if i == 0:  # same edge via a second order AND a repeated line
            rows.append((k, p))
            orders.append((k + 1, u))
            rows.append((k + 1, p))
            k += 1
        k += 1
    for p in dangling:
        rows.append((10_000_000, p))
    li = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    od = pa.table(
        {
            "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
            "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))


def _brute_butterflies(edges):
    es = set(edges)
    users = sorted({u for u, _ in es})
    parts = {u: {p for uu, p in es if uu == u} for u in users}
    bf = 0
    for u1, u2 in itertools.combinations(users, 2):
        c = len(parts[u1] & parts[u2])
        bf += c * (c - 1) // 2
    return bf


def test_butterfly_hand_solved_and_random(ray_session, tmp_path):
    """K_{2,2} plus a pendant edge, duplicate multi-edges, and a dangling
    FK — hand-solved: 1 butterfly; then a random bipartite graph vs the
    brute-force pair-intersection count."""
    edges = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)]
    _write_graph(tmp_path, edges, dangling=(99,))
    out = R.q_butterfly_count(str(tmp_path))
    assert out.shape == (1, 4)
    assert int(out["n_edges"].iloc[0]) == 5
    # user degrees 2,2,1 -> 1+1+0 = 2; part degrees 3,2 -> 3+1 = 4
    assert int(out["n_wedges_user"].iloc[0]) == 2
    assert int(out["n_wedges_part"].iloc[0]) == 4
    assert int(out["n_butterflies"].iloc[0]) == 1

    d2 = tmp_path / "rand"
    d2.mkdir()
    rng = np.random.default_rng(41)
    redges = sorted(
        {(int(rng.integers(0, 12)), int(rng.integers(100, 109))) for _ in range(60)}
    )
    _write_graph(d2, redges)
    out2 = R.q_butterfly_count(str(d2))
    assert int(out2["n_edges"].iloc[0]) == len(redges)
    assert int(out2["n_butterflies"].iloc[0]) == _brute_butterflies(redges)
