"""Unit tests for the sixth round-5 session's rank/statistics family:
q_ddsketch_quantiles (mergeable relative-error quantile sketch), and the
ops added after it in this session.

Each op also rides the hostile harnesses (test_corpus_shaping) and the
empty-input contract (test_empty_input); here we pin the algorithm-level
properties those can't: the DDSketch bucket containment/monotonicity/
ratio-bound lemmas under integer fuzz, and the quantile CERTIFICATE
(the true order statistic provably inside the reported [lo, hi]).
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_orders(d, prices):
    n = len(prices)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.arange(n, dtype=np.int64) % 7),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(
                    [float(p) for p in prices], pa.float64()
                ),
                "o_orderdate": pa.array(
                    np.full(n, 1_500_000_000_000_000, dtype=np.int64)
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )


def test_ddsketch_bucket_lemmas():
    """For fuzzed int64 cents (zeros, +-1, powers of two +-1, .xx5-tie
    magnitudes, huge values near the guard): (a) every value lies inside
    its bucket's [lo, hi]; (b) the bucket key is monotone in the value
    (the cumulative-histogram read-off depends on it); (c) the bucket's
    value ratio hi/lo <= 1.25 => relative error of the midpoint <= 1/9."""
    from pdfray.pipelines.relational import (
        _dd_bucket_bounds,
        _dd_bucket_keys,
    )

    rng = np.random.RandomState(7)
    vals = [0, 1, -1, 2, 3, 4, 5, 7, 8, 9, 100, -100]
    vals += [2**k for k in range(1, 56, 3)]
    vals += [2**k - 1 for k in range(2, 56, 5)]
    vals += [2**k + 1 for k in range(2, 56, 5)]
    vals += list(rng.randint(-(10**9), 10**9, size=4000))
    vals += [-v for v in vals]
    c = np.array(sorted(set(int(v) for v in vals)), dtype=np.int64)
    keys = _dd_bucket_keys(c)
    assert (np.diff(keys) >= 0).all()  # monotone in the value
    for v, k in zip(c.tolist(), keys.tolist()):
        lo, hi = _dd_bucket_bounds(k)
        assert lo <= v <= hi, (v, k, lo, hi)
        if lo != hi:
            assert (hi - lo) / abs(hi + lo) <= 1 / 9 + 1e-12
    # guard: one value past the bound raises loudly
    with pytest.raises(RuntimeError):
        _dd_bucket_keys(np.array([(1 << 56) + 1], dtype=np.int64))


def test_ddsketch_certificate_and_hostile_oracle(ray_session, tmp_path):
    """Randomized + adversarial prices (negatives, zeros, exact powers of
    2 and 10, .xx5 cents ties, a >n/10 identical-price tie run straddling
    the q90 rank): the reported [lo_cents, hi_cents] CONTAINS the true
    order statistic at the reported rank, and the engine matches the
    registered DuckDB oracle dtype-strict."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_ddsketch_quantiles

    for seed in (1, 2):
        rng = np.random.RandomState(seed)
        prices = list(rng.randint(-(10**6), 10**7, size=1500) / 100.0)
        prices += [0.0] * 17
        prices += [2**k / 100.0 for k in range(1, 40)]
        prices += [10**k / 100.0 for k in range(1, 12)]
        prices += [123.455, -123.455, 0.005, -0.005]
        prices += [777.77] * 300  # tie run near the upper ranks
        d = tmp_path / f"dd{seed}"
        d.mkdir()
        _write_orders(d, prices)
        eng = q_ddsketch_quantiles(str(d))
        assert list(eng["q_permille"]) == [500, 900, 950, 990]
        cents = np.sort(
            np.array([round(abs(p) * 100) * (1 if p >= 0 else -1)
                      for p in prices], dtype=np.int64)
        )
        for r in eng.itertuples():
            true_stat = int(cents[r.rank - 1])  # 1-based rank
            assert r.lo_cents <= true_stat <= r.hi_cents, r
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'"
        )
        ora = con.execute(entrymod.oracle_sql()["q_ddsketch_quantiles"]).df()
        pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def _write_events(d, rows):
    """rows: (event_id, ts_us, user, type, value)"""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(['{"k":1}'] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _ks_brute(av, bv):
    """Reference sup |n_b*cumA - n_a*cumB| over distinct pooled values,
    smallest value on ties (plain python, no partitioning)."""
    na, nb = len(av), len(bv)
    best = (-1, None)
    for v in sorted(set(av) | set(bv)):
        dn = abs(nb * sum(1 for x in av if x <= v) - na * sum(1 for x in bv if x <= v))
        if dn > best[0]:
            best = (dn, v)
    return best


def test_ks_hand_solved_and_edge_values(ray_session, tmp_path):
    """Hand-solved small KS (identical samples -> D=0 at the smallest
    value; disjoint samples -> D = n_a*n_b at A's max), plus -0.0/0.0
    fold, NaN exclusion and +-inf values — engine == brute force ==
    registered oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_ks_test

    base = 1_700_000_000_000_000
    # identical: D = 0, at the smallest pooled value
    rows = [(i, base + i, 1, t, v) for i, (t, v) in enumerate(
        [("purchase", 1.0), ("purchase", 2.0), ("click", 1.0), ("click", 2.0)]
    )]
    d = tmp_path / "ks0"
    d.mkdir()
    _write_events(d, rows)
    eng = q_ks_test(str(d))
    assert (int(eng.d_num[0]), float(eng.at_value[0])) == (0, 1.0)
    # disjoint + hostile values: -0.0 (folds to 0.0), NaN (dropped), inf
    rows = []
    vals_a = [-0.0, 1.0, 5.0, float("inf")]
    vals_b = [0.0, 7.0, 9.0, float("nan"), 9.0]
    for i, v in enumerate(vals_a):
        rows.append((i, base + i, 1, "purchase", v))
    for i, v in enumerate(vals_b):
        rows.append((100 + i, base + i, 2, "click", v))
    d = tmp_path / "ks1"
    d.mkdir()
    _write_events(d, rows)
    eng = q_ks_test(str(d))
    av = [0.0, 1.0, 5.0, float("inf")]
    bv = [0.0, 7.0, 9.0, 9.0]
    dn, v = _ks_brute(av, bv)
    assert (int(eng.d_num[0]), float(eng.at_value[0])) == (dn, v)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_ks_test"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_ks_randomized_bruteforce_parity(ray_session, tmp_path):
    """Randomized samples on a coarse grid (many exact ties, tie runs
    spanning range partitions) — engine == brute force == oracle, three
    seeds; also the one-empty-sample and no-matching-type degenerate
    cases return typed empty frames."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_ks_test

    base = 1_700_000_000_000_000
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        n = 900
        rows, av, bv = [], [], []
        for i in range(n):
            t = "purchase" if rng.rand() < 0.4 else "click"
            v = float(rng.randint(-6, 7))  # coarse grid -> heavy ties
            (av if t == "purchase" else bv).append(v)
            rows.append((i, base + i, i % 5, t, v))
        d = tmp_path / f"ksr{seed}"
        d.mkdir()
        _write_events(d, rows)
        eng = q_ks_test(str(d))
        dn, v = _ks_brute(av, bv)
        assert (int(eng.d_num[0]), float(eng.at_value[0])) == (dn, v)
        assert int(eng.n_a[0]) == len(av) and int(eng.n_b[0]) == len(bv)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        ora = con.execute(entrymod.oracle_sql()["q_ks_test"]).df()
        pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    d = tmp_path / "ks_one_side"
    d.mkdir()
    _write_events(d, [(0, base, 1, "purchase", 1.0), (1, base, 1, "view", 2.0)])
    assert len(q_ks_test(str(d))) == 0


def test_welch_hand_reference_and_degenerates(ray_session, tmp_path):
    """Independent plain-python Welch computation (same formulas from the
    raw sample lists, float64) matches the engine bit-for-bit; zero
    pooled variance => NaN t/df; a group with n<2 => typed empty frame;
    .xx5 binary-grid ties and NaN rows exercised; engine == oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_welch_ab

    base = 1_700_000_000_000_000
    for seed in (3, 4):
        rng = np.random.RandomState(seed)
        rows, av, bv = [], [], []
        for i in range(700):
            t = "purchase" if rng.rand() < 0.45 else "click"
            v = rng.randint(-2000, 2000) / 64.0  # binary grid, .xx5 ties
            (av if t == "purchase" else bv).append(v)
            rows.append((i, base + i, i % 9, t, v))
        rows.append((9000, base, 1, "view", 1e9))  # excluded type
        rows.append((9001, base, 1, "purchase", float("nan")))  # dropped
        d = tmp_path / f"w{seed}"
        d.mkdir()
        _write_events(d, rows)
        eng = q_welch_ab(str(d))
        # independent reference from the raw samples
        def digs(vals):
            from pdfray.pipelines.relational import round_half_away

            cs = [int(round_half_away(np.array([v * 100.0]), 0)[0]) for v in vals]
            return len(cs), sum(cs), sum(c * c for c in cs)
        na, sa, ssa = digs(av)
        nb, sb, ssb = digs(bv)
        va = (float(ssa) - float(sa) * float(sa) / na) / float(na - 1)
        vb = (float(ssb) - float(sb) * float(sb) / nb) / float(nb - 1)
        ua, ub = va / na, vb / nb
        t_ref = (float(sa) / na - float(sb) / nb) / np.sqrt(ua + ub)
        assert eng.t_stat[0] == t_ref  # bit-identical
        assert (int(eng.n_a[0]), int(eng.n_b[0])) == (na, nb)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        ora = con.execute(entrymod.oracle_sql()["q_welch_ab"]).df()
        pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    # zero variance both groups -> NaN t/df (oracle NULL -> NaN)
    d = tmp_path / "wz"
    d.mkdir()
    _write_events(
        d,
        [(i, base + i, 1, "purchase", 3.0) for i in range(3)]
        + [(10 + i, base + i, 2, "click", 3.0) for i in range(3)],
    )
    eng = q_welch_ab(str(d))
    assert np.isnan(eng.t_stat[0]) and np.isnan(eng.df_welch[0])
    # n_b == 1 -> empty
    d = tmp_path / "w1"
    d.mkdir()
    _write_events(
        d,
        [(i, base + i, 1, "purchase", float(i)) for i in range(3)]
        + [(10, base, 2, "click", 5.0)],
    )
    assert len(q_welch_ab(str(d))) == 0


def _write_lineitem_baskets(d, baskets):
    """baskets: list of (orderkey, [partkeys]) -> minimal lineitem table."""
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    n = len(ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array(list(range(n)), pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array(
                    [1_500_000_000_000_000] * n, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def _tri_brute(baskets):
    """Exact triangle/wedge counts from the basket list, plain python."""
    import itertools

    edges = set()
    for _, parts in baskets:
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = sum(
        1
        for a, b in edges
        for c in deg
        if c > b and (b, c) in edges and (a, c) in edges
    )
    return len(deg), len(edges), wedges, tri


@pytest.mark.parametrize("force_exchange", [False, True])
def test_triangle_count_bruteforce_and_regimes(
    ray_session, tmp_path, monkeypatch, force_exchange
):
    """Randomized basket corpora (plus a star order — hot vertex with
    zero triangles through it unless closed, a clique order, duplicate
    lineitems of the same part, and two disjoint triangles): engine ==
    plain-python brute force == registered oracle, in BOTH regimes
    (monkeypatching TRI_BROADCAST_MAX_EDGES=0 forces the pair-hash
    exchange path; outputs must be identical)."""
    import __ray_entry__ as entrymod
    import pdfray.pipelines.relational as R

    if force_exchange:
        monkeypatch.setattr(R, "TRI_BROADCAST_MAX_EDGES", 0)
    rng = np.random.RandomState(11)
    baskets = [
        (1, [100, 101, 102]),          # triangle
        (2, [200, 201, 202, 203]),     # K4: 4 triangles
        (3, [300] + list(range(400, 420))),  # star center 300
        (4, [100, 101, 102, 100]),     # duplicate lineitem rows
        (5, [500]),                    # singleton basket: no edges
    ]
    for o in range(6, 120):
        k = rng.randint(1, 6)
        baskets.append((o, list(rng.randint(0, 60, size=k))))
    d = tmp_path / f"tri{int(force_exchange)}"
    d.mkdir()
    _write_lineitem_baskets(d, baskets)
    eng = R.q_triangle_count(str(d))
    nv, ne, nw, nt = _tri_brute(baskets)
    assert (
        int(eng.n_vertices[0]),
        int(eng.n_edges[0]),
        int(eng.n_wedges[0]),
        int(eng.n_triangles[0]),
    ) == (nv, ne, nw, nt)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["q_triangle_count"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_triangle_stage_checkpoint_resume(ray_session, tmp_path):
    """A pre-existing _DONE edge checkpoint is reused (mutating the
    lineitem source afterwards must NOT change the result — proves the
    read comes from the checkpoint files, the crash-resume contract)."""
    import pdfray.pipelines.relational as R

    d = tmp_path / "trir"
    d.mkdir()
    _write_lineitem_baskets(d, [(1, [1, 2, 3])])
    sd = tmp_path / "stage"
    first = R.q_triangle_count(str(d), stage_dir=str(sd))
    assert int(first.n_triangles[0]) == 1
    # mutate the source: would add a second triangle if re-read
    _write_lineitem_baskets(d, [(1, [1, 2, 3]), (2, [7, 8, 9])])
    again = R.q_triangle_count(str(d), stage_dir=str(sd))
    pd.testing.assert_frame_equal(first, again)


def _write_embeddings(d, vecs, labels=None):
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "label": pa.array(
                    labels if labels is not None else [0] * n, pa.int64()
                ),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def test_rrf_fusion_properties_and_oracle(ray_session, tmp_path):
    """Hand-built corpus on the 1/64 grid (plus a zero vector and exact
    duplicates): (a) a doc present in BOTH channel lists outranks a doc
    holding the same single-channel rank in only one; (b) rrf decomposes
    exactly into 1/(60+rc) + 1/(60+rh) for the reported ranks;
    (c) absent-channel ranks report 0; engine == registered oracle
    dtype-strict.  Queries are the first 5 vec_ids (the shared
    workload), so fused rank 1 for each query is the query itself
    (top of both channels)."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.simsearch import _QUERY_CACHE, s_rrf_fusion

    rng = np.random.RandomState(5)
    vecs = (rng.randint(-32, 33, size=(80, 8)) / 64.0).tolist()
    vecs[7] = [0.0] * 8          # zero vector: cosine pins to -1
    vecs[9] = list(vecs[0])      # exact duplicate of query 0
    d = tmp_path / "rrf"
    d.mkdir()
    _write_embeddings(d, vecs)
    _QUERY_CACHE.clear()
    eng = s_rrf_fusion(str(d))
    assert set(eng["query_id"]) == {0, 1, 2, 3, 4}
    for qid, g in eng.groupby("query_id"):
        g = g.reset_index(drop=True)
        # (b) exact decomposition of every reported fused score
        for r in g.itertuples():
            want = (1.0 / (60.0 + r.rank_cos) if r.rank_cos else 0.0) + (
                1.0 / (60.0 + r.rank_ham) if r.rank_ham else 0.0
            )
            assert r.rrf == want
        # the query itself (or its exact duplicate) leads both channels
        top = g.iloc[0]
        assert top.rank_cos >= 1 and top.rank_ham >= 1
        # (a) both-channel rows with ranks <= r beat any single-channel
        # row whose one rank is r (1/(60+a)+1/(60+b) > 1/(60+r) when
        # a, b <= r): spot-check against the frame's own order
        both = g[(g.rank_cos > 0) & (g.rank_ham > 0)]
        single = g[(g.rank_cos == 0) | (g.rank_ham == 0)]
        if len(both) and len(single):
            rmax = int(max(both.rank_cos.max(), both.rank_ham.max()))
            for s in single.itertuples():
                lone = max(int(s.rank_cos), int(s.rank_ham))
                if lone >= rmax:
                    assert (
                        g[g.vec_id == s.vec_id].index[0]
                        > both.index.max()
                    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["s_rrf_fusion"]).df()
    _QUERY_CACHE.clear()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_chi2_hand_solved_and_missing_cells(ray_session, tmp_path):
    """Hand-solved 2x2 independence (perfectly dependent -> chi2 = n;
    perfectly independent -> chi2 = 0), an absent (type, bucket) cell
    reported with observed 0, NaN rows dropped, -0.0 in the zero bucket;
    engine == oracle dtype-strict."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_chi2_independence

    base = 1_700_000_000_000_000
    # perfectly dependent: A -> neg only, B -> pos only, 10 each
    rows = [(i, base + i, 1, "A", -1.0) for i in range(10)]
    rows += [(10 + i, base + i, 1, "B", 2.0) for i in range(10)]
    rows.append((99, base, 1, "A", float("nan")))  # dropped
    d = tmp_path / "c2a"
    d.mkdir()
    _write_events(d, rows)
    eng = q_chi2_independence(str(d))
    # 2x2 grid with zero-observed off-diagonal cells present
    assert len(eng) == 4
    assert int(eng.chi2_total_x1e6.iloc[0]) == 20_000_000  # chi2 == n == 20
    zero_cells = eng[eng.observed == 0]
    assert len(zero_cells) == 2
    # perfectly independent: counts proportional across buckets
    rows = []
    i = 0
    for t, reps in (("A", 2), ("B", 4)):
        for b, v in (("neg", -1.0), ("zero", -0.0), ("pos", 3.5)):
            for _ in range(reps):
                rows.append((i, base + i, 1, t, v))
                i += 1
    d = tmp_path / "c2b"
    d.mkdir()
    _write_events(d, rows)
    eng = q_chi2_independence(str(d))
    assert (eng.term_x1e6 == 0).all() and int(eng.chi2_total_x1e6.iloc[0]) == 0
    assert set(eng.bucket) == {"neg", "zero", "pos"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_chi2_independence"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_mor_deletes_positional_semantics(ray_session, tmp_path):
    """Merge-on-read contract: (a) deletes are POSITIONS, not a predicate
    — after the store is committed, rewriting the source (which would
    flip the predicate's row set) must not change the read; (b) a second
    delete snapshot stacks on the first and time-travel (as_of) sees
    exactly the deletes committed at or before it; (c) a fully-deleted
    data file disappears from the merged view."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import q_mor_deletes
    from pdfray.pipelines.snapshots import (
        commit_position_deletes,
        commit_snapshot,
        read_merged,
    )

    # (a) via the query: custkeys 97 and 194 are erased
    d = tmp_path / "mor"
    d.mkdir()
    _write_orders_ck(d, [(1, 97, 10.0), (2, 194, 20.0), (3, 5, 30.0)])
    store = tmp_path / "store"
    first = q_mor_deletes(str(d), store_dir=str(store))
    assert int(first.n_orders.sum()) == 1 and int(first.sum_cents.sum()) == 3000
    _write_orders_ck(d, [(1, 5, 10.0), (2, 5, 20.0), (3, 97, 30.0)])
    again = q_mor_deletes(str(d), store_dir=str(store))
    pd.testing.assert_frame_equal(first, again)

    # (b)+(c) at the snapshots API level
    store2 = tmp_path / "store2"
    import pyarrow as pa_
    import ray.data as rd

    commit_snapshot(
        str(store2),
        1,
        lambda: rd.from_arrow(
            pa_.table({"k": pa.array([10, 11, 12, 13], pa.int64())})
        ),
    )
    commit_position_deletes(
        str(store2), 2, 1,
        lambda t: t.column("k").to_numpy(zero_copy_only=False) == 11,
    )
    commit_position_deletes(
        str(store2), 3, 1,
        lambda t: t.column("k").to_numpy(zero_copy_only=False) >= 10,
    )
    as_of_1 = sorted(read_merged(str(store2), 1).to_pandas()["k"])
    as_of_2 = sorted(read_merged(str(store2), 2).to_pandas()["k"])
    m3 = read_merged(str(store2), 3).to_pandas()
    assert as_of_1 == [10, 11, 12, 13]
    assert as_of_2 == [10, 12, 13]
    assert len(m3) == 0  # (c) everything positionally erased


def _write_orders_ck(d, rows):
    """rows: (orderkey, custkey, totalprice)"""
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [1_500_000_000_000_000] * n, pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )


def test_bitmap_index_hand_pattern_and_negative_keys(ray_session, tmp_path):
    """Planted bit patterns: a chunk of exactly 65 rows (crosses the
    uint64 word boundary — padding arithmetic pinned), alternating
    R/N flags so AND/OR popcounts are hand-computable, a NEGATIVE
    orderkey chunk (floor vs truncate divergence class), and a chunk
    spanning duplicate (orderkey, linenumber) sort ties; engine ==
    oracle dtype-strict."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_bitmap_index

    baskets = []
    # chunk 0: orderkeys 0..64, one line each, alternating R flags
    rows = {"ok": [], "ln": [], "rf": [], "ls": []}
    for i in range(65):
        rows["ok"].append(i)
        rows["ln"].append(1)
        rows["rf"].append("R" if i % 2 == 0 else "N")
        rows["ls"].append("F" if i % 3 == 0 else "O")
    # negative chunk: orderkey -1 -> floor chunk -1 (truncate would say 0)
    rows["ok"] += [-1, -4096, -4097]
    rows["ln"] += [1, 1, 1]
    rows["rf"] += ["R", "R", "N"]
    rows["ls"] += ["F", "O", "F"]
    n = len(rows["ok"])
    d = tmp_path / "bm"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows["ok"], pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([int(x) for x in rows["ln"]], pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(rows["rf"], pa.string()),
                "l_linestatus": pa.array(rows["ls"], pa.string()),
                "l_shipdate": pa.array(
                    [1_500_000_000_000_000] * n, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    eng = q_bitmap_index(str(d))
    c0 = eng[eng.chunk == 0].iloc[0]
    assert (c0.n_rows, c0.bitmap_bytes) == (65, 16)  # 2 words
    assert c0.n_flag_r == 33 and c0.n_status_f == 22  # ceil(65/2), ceil(65/3)
    assert c0.n_and == 11  # i % 6 == 0 within 0..64
    assert c0.n_or == 33 + 22 - 11
    cm1 = eng[eng.chunk == -1].iloc[0]  # orderkeys -1 and -4096
    assert cm1.n_rows == 2 and cm1.n_flag_r == 2
    cm2 = eng[eng.chunk == -2].iloc[0]  # orderkey -4097
    assert cm2.n_rows == 1 and cm2.n_flag_r == 0 and cm2.n_status_f == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["q_bitmap_index"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_interval_overlap_hand_and_edges(ray_session, tmp_path):
    """Hand-solved overlap facts: windows planted EXACTLY at the span's
    closed endpoints (e2 == s1 and s2 == e1 both count), one microsecond
    outside (don't), a span crossing several 6h chunks with windows in
    each (owner-chunk rule must not double count), a pre-epoch user-day,
    and a single-event span (s1 == e1)."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_interval_overlap_join

    H = 3_600_000_000
    day0 = 1_700_000_000_000_000 - (1_700_000_000_000_000 % 86_400_000_000)
    rows = []
    # user 1: span [day0+2h, day0+20h] via two view events (crosses 4 chunks)
    rows.append((0, day0 + 2 * H, 1, "view", 1.0))
    rows.append((1, day0 + 20 * H, 1, "view", 1.0))
    # errors: e2 == s1 (counts), s2 == e1 (counts), 1us outside both (don't),
    # and one inside each of three middle chunks (count once each)
    rows.append((10, day0 + 1 * H, 99, "error", 1.0))       # e2 = 2h == s1
    rows.append((11, day0 + 21 * H, 99, "error", 1.0))      # s2 = 20h == e1
    rows.append((12, day0 + 1 * H - 1, 99, "error", 1.0))   # e2 = s1 - 1us
    rows.append((13, day0 + 21 * H + 1, 99, "error", 1.0))  # s2 = e1 + 1us
    rows.append((14, day0 + 7 * H, 99, "error", 1.0))
    rows.append((15, day0 + 13 * H, 99, "error", 1.0))
    rows.append((16, day0 + 19 * H, 99, "error", 1.0))
    # user 2: single-event span exactly AT an error ts (window contains it)
    rows.append((20, day0 + 7 * H, 2, "purchase", 1.0))
    # pre-epoch user-day with no overlapping windows
    rows.append((30, -5 * 86_400_000_000 + 3 * H, 3, "view", 1.0))
    d = tmp_path / "ovl"
    d.mkdir()
    _write_events(d, rows)
    eng = q_interval_overlap_join(str(d))
    u1 = eng[(eng.user_id == 1)].iloc[0]
    assert int(u1.n_incidents) == 5  # two edge hits + three middles
    u2 = eng[(eng.user_id == 2)].iloc[0]
    assert int(u2.n_incidents) == 1
    u3 = eng[(eng.user_id == 3)].iloc[0]
    assert int(u3.n_incidents) == 0 and int(u3.day) == -5
    # error events create their own user-day spans too (user 99)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_interval_overlap_join"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_interval_overlap_randomized_bruteforce(ray_session, tmp_path):
    """Randomized corpora (ts snapped to whole hours so exact edge
    collisions are frequent; a hot error burst in one chunk): engine ==
    plain-python O(n²) overlap count == oracle, three seeds."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_interval_overlap_join

    H = 3_600_000_000
    DAY = 86_400_000_000
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(500):
            u = int(rng.randint(1, 9))
            ts = int(rng.randint(-10, 40)) * DAY + int(rng.randint(0, 24)) * H
            typ = "error" if rng.rand() < 0.25 else "view"
            rows.append((i, ts, u, typ, 1.0))
        for i in range(60):  # hot burst, one chunk
            rows.append((1000 + i, 7 * DAY + 2 * H, 7, "error", 1.0))
        d = tmp_path / f"ovr{seed}"
        d.mkdir()
        _write_events(d, rows)
        eng = q_interval_overlap_join(str(d))
        # brute force
        spans = {}
        wins = []
        for _eid, ts, u, typ, _v in rows:
            k = (u, ts // DAY)
            s, e = spans.get(k, (ts, ts))
            spans[k] = (min(s, ts), max(e, ts))
            if typ == "error":
                wins.append((ts - H, ts + H))
        want = {
            k: sum(1 for s2, e2 in wins if s <= e2 and s2 <= e)
            for k, (s, e) in spans.items()
        }
        got = {
            (int(r.user_id), int(r.day)): int(r.n_incidents)
            for r in eng.itertuples()
        }
        assert got == want
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        ora = con.execute(
            entrymod.oracle_sql()["q_interval_overlap_join"]
        ).df()
        pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_compaction_equivalence_vacuum_and_time_travel(ray_session, tmp_path):
    """Compaction contract: (a) read after compact+vacuum == merge-on-read
    before it; (b) vacuum physically removes the shadowed snapshot dirs
    and their manifest entries; (c) BEFORE vacuum, time travel below the
    compaction point still resolves the original (undeleted) data;
    (d) after vacuum, reads at/after the compaction id keep working from
    the compacted files alone."""
    import os as _os

    import pyarrow as pa_
    import ray.data as rd

    from pdfray.pipelines.snapshots import (
        commit_position_deletes,
        commit_snapshot,
        compact,
        read_merged,
        vacuum,
    )

    store = str(tmp_path / "cstore")
    commit_snapshot(
        store,
        1,
        lambda: rd.from_arrow(
            pa_.table({"k": pa.array(list(range(10)), pa.int64())})
        ),
    )
    commit_position_deletes(
        store, 2, 1,
        lambda t: t.column("k").to_numpy(zero_copy_only=False) % 3 == 0,
    )
    before = sorted(read_merged(store, 2).to_pandas()["k"])
    compact(store, 3, 2)
    # (c) time travel below the compaction point, pre-vacuum
    assert sorted(read_merged(store, 1).to_pandas()["k"]) == list(range(10))
    after_compact = sorted(read_merged(store, 3).to_pandas()["k"])
    assert after_compact == before
    removed = vacuum(store)
    assert removed == [1, 2]
    assert not _os.path.isdir(_os.path.join(store, "snap1"))
    assert not _os.path.isdir(_os.path.join(store, "snap2"))
    # (d) post-vacuum read serves from compacted files only
    assert sorted(read_merged(store, 3).to_pandas()["k"]) == before
    # idempotent vacuum
    assert vacuum(store) == []


def test_avro_codec_roundtrip_hostile_values():
    """From-scratch Avro container codec: bit-exact round trip for
    NaN/±inf/-0.0 doubles, int64 extremes, empty + unicode-astral
    strings, binary with NUL/0x80, negative timestamps, nulls in every
    column; deterministic bytes (content-addressing depends on it);
    decode-time pruning; both codecs; torn sync marker detected."""
    import struct

    from pdfray.core.avro import decode_container, encode_container

    t = pa.table(
        {
            "a": pa.array([1, -2, None, 2**62, -(2**62)], pa.int64()),
            "b": pa.array(
                [1.5, float("nan"), float("inf"), -0.0, None], pa.float64()
            ),
            "s": pa.array(["x", "", None, "héllo🎉", "z"], pa.string()),
            "ts": pa.array(
                [0, -1, None, 1_700_000_000_000_000, 42], pa.int64()
            ).cast(pa.timestamp("us")),
            "f": pa.array([True, False, None, True, False], pa.bool_()),
            "bin": pa.array([b"\x00\xff", b"", None, b"abc", b"\x80"], pa.binary()),
        }
    )
    for codec in ("null", "deflate"):
        enc = encode_container(t, codec=codec, block_rows=2)
        assert enc == encode_container(t, codec=codec, block_rows=2)
        back = decode_container(enc)
        assert back.schema == t.schema
        for c in t.column_names:
            for x, y in zip(t.column(c).to_pylist(), back.column(c).to_pylist()):
                if isinstance(x, float) and x != x:
                    assert y != y
                else:
                    assert x == y, (c, x, y)
        pruned = decode_container(enc, columns=["s", "a"])
        assert pruned.column_names == ["a", "s"]
        assert pruned.column("s").to_pylist() == t.column("s").to_pylist()
    enc = encode_container(t, codec="null")
    back = decode_container(enc)
    assert struct.pack("<d", back.column("b").to_pylist()[3]) == struct.pack(
        "<d", -0.0
    )
    # torn block: flip a byte inside the trailing sync marker
    torn = bytearray(enc)
    torn[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_container(bytes(torn))
    # unsupported nested type refuses loudly
    with pytest.raises(ValueError, match="unsupported"):
        encode_container(pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))}))


def test_avro_sink_source_distributed(ray_session, tmp_path):
    """The distributed sink writes content-addressed .avro containers
    (idempotent rewrite — same names, same bytes), and the source's
    decode-time pruning returns exactly the projected columns."""
    import os as _os

    import ray.data as rd

    from pdfray.sources.readers import read_avro_table, write_avro_table

    t = pa.table(
        {
            "k": pa.array(list(range(100)), pa.int64()),
            "v": pa.array([float(i) / 7 for i in range(100)], pa.float64()),
            "s": pa.array([f"s{i}" for i in range(100)], pa.string()),
        }
    )
    out = str(tmp_path / "avro")
    write_avro_table(rd.from_arrow(t), out)
    names1 = sorted(_os.listdir(out))
    write_avro_table(rd.from_arrow(t), out)  # idempotent rewrite
    assert sorted(_os.listdir(out)) == names1
    back = read_avro_table(out, columns=["k", "s"]).to_pandas()
    assert sorted(back.columns) == ["k", "s"]
    assert sorted(back["k"]) == list(range(100))


def test_stream_tumbling_watermark_hand_and_fuzz(ray_session, tmp_path):
    """Hand-solved watermark facts: the first arrival is always accepted
    (no watermark yet); an event arriving EXACTLY when wm == window end
    is dropped (>=, finalized); one microsecond less is accepted; a
    late-but-within-delay straggler is accepted; arrival chunks are
    crossed (event_ids straddle the 8192 grid).  Then a randomized
    out-of-order stream vs a plain-python replay, three seeds."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import (
        STREAM_WM_DELAY_US,
        q_stream_tumbling_agg,
    )

    H = 3_600_000_000
    base = 1_700_000_000_000_000 - (1_700_000_000_000_000 % H)
    rows = [
        (0, base + 10 * H, 1, "view", 1.0),   # first arrival: accepted
        # wm = 10h − 2h = 8h: window [5h,6h) end 6h <= 8h -> dropped
        (1, base + 5 * H, 1, "view", 1.0),
        # window [6h,7h): end 7h, wm 8h >= 7h -> dropped
        (2, base + 6 * H, 1, "view", 1.0),
        # window [8h,9h): end 9h > wm 8h -> accepted (within delay)
        (3, base + 8 * H, 1, "view", 1.0),
        # push watermark: ts 13h -> wm becomes 11h after this
        (8192, base + 13 * H, 1, "view", 1.0),  # new arrival chunk
        # window [9h,10h): end 10h, wm 11h -> dropped
        (8193, base + 9 * H + 1, 1, "view", 1.0),
        # window [11h,12h): end 12h, wm 11h < 12h -> accepted
        (8194, base + 11 * H, 1, "view", 1.0),
    ]
    d = tmp_path / "wm"
    d.mkdir()
    _write_events(d, rows)
    eng = q_stream_tumbling_agg(str(d))
    got = {
        int(r.window_start_us): (int(r.n_accepted), int(r.n_dropped))
        for r in eng.itertuples()
    }
    assert got[base + 10 * H] == (1, 0)
    assert got[base + 5 * H] == (0, 1)
    assert got[base + 6 * H] == (0, 1)
    assert got[base + 8 * H] == (1, 0)
    assert got[base + 9 * H] == (0, 1)
    assert got[base + 11 * H] == (1, 0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_stream_tumbling_agg"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(800):
            ts = base + int(rng.randint(0, 50)) * H + int(rng.randint(0, 60)) * 60_000_000
            rows.append((i * 7, ts, 1, "view", 1.0))  # sparse ids
        d2 = tmp_path / f"wmf{seed}"
        d2.mkdir()
        _write_events(d2, rows)
        eng = q_stream_tumbling_agg(str(d2))
        # plain replay
        import collections

        acc = collections.Counter()
        drp = collections.Counter()
        run = None
        for _eid, ts, _u, _t, _v in sorted(rows):
            win = ts // H * H
            if run is not None and run - STREAM_WM_DELAY_US >= win + H:
                drp[win] += 1
            else:
                acc[win] += 1
            run = ts if run is None else max(run, ts)
        got = {
            int(r.window_start_us): (int(r.n_accepted), int(r.n_dropped))
            for r in eng.itertuples()
        }
        want = {
            w: (acc.get(w, 0), drp.get(w, 0)) for w in set(acc) | set(drp)
        }
        assert got == want


def test_t_closeness_hand_solved(ray_session, tmp_path):
    """Hand-solved EMD facts: a group whose distribution EQUALS the
    global one scores t = 0; a group concentrated on the extreme value
    of a two-point support scores the known closed form; the breach flag
    flips exactly at the 0.2 cross-multiplication; group-absent support
    values contribute; .xx5 balance ties ride the cents grid."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_t_closeness

    # two support values: 10.00 and 20.00; global = 6x10, 6x20
    # group A (nat 0): 3x10, 3x20  -> proportional -> t = 0
    # group B (nat 1): 3x10 only   -> cumdiff at v=10: 3*12 - 6*3 = 18
    #   emd = 18, denom = 3*12*(2-1) = 36 -> t = 0.5 -> breach
    rows = []
    for i in range(3):
        rows.append((0, "SEG", 10.0))
        rows.append((0, "SEG", 20.0))
        rows.append((1, "SEG", 10.0))
    rows.append((2, "SEG", 20.0))
    rows.append((2, "SEG", 20.0))
    rows.append((2, "SEG", 20.0))
    n = len(rows)
    d = tmp_path / "tc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(range(n)), pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(n)], pa.string()),
                "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
                "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(d / "customer.parquet"),
    )
    eng = q_t_closeness(str(d))
    a = eng[eng.c_nationkey == 0].iloc[0]
    assert (int(a.emd_scaled), float(a.t_value), int(a.breach)) == (0, 0.0, 0)
    b = eng[eng.c_nationkey == 1].iloc[0]
    assert int(b.emd_scaled) == 3 * 12 - 6 * 3
    assert float(b.t_value) == 0.5 and int(b.breach) == 1
    c = eng[eng.c_nationkey == 2].iloc[0]
    # group C: 3x20 -> cumdiff at 10: |0*12 - 6*3| = 18 -> t = 0.5
    assert float(c.t_value) == 0.5 and int(c.breach) == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["q_t_closeness"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_link_prediction_bruteforce_and_tie_cut(ray_session, tmp_path):
    """Randomized repeat-heavy baskets (so the support>=2 graph is
    non-trivial) + planted structures: a path u—v—w (the classic predict
    (u, w) case), an existing edge that must be EXCLUDED despite maximal
    jaccard, and an exact-jaccard tie straddling the top-k cut (pinned
    by the (a, b) tiebreak) — engine == plain-python brute force ==
    oracle."""
    import itertools

    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import LINKPRED_TOP_K, q_link_prediction

    rng = np.random.RandomState(13)
    baskets = []
    o = 0
    # planted path: edges (1,2) and (2,3) with support 2 -> predict (1,3)
    for _ in range(2):
        baskets.append((o, [1, 2])); o += 1
        baskets.append((o, [2, 3])); o += 1
    # jaccard ties: stars 10-(11,12) and 20-(21,22), each edge support 2
    for hub, leaves in ((10, [11, 12]), (20, [21, 22])):
        for leaf in leaves:
            for _ in range(2):
                baskets.append((o, [hub, leaf])); o += 1
    # random repeat-heavy noise
    pool = list(range(50, 62))
    for _ in range(120):
        k = rng.randint(2, 5)
        basket = list(rng.choice(pool, size=k, replace=False))
        reps = 2 if rng.rand() < 0.5 else 1
        for _ in range(reps):
            baskets.append((o, basket)); o += 1
    d = tmp_path / "lp"
    d.mkdir()
    _write_lineitem_baskets(d, baskets)
    eng = q_link_prediction(str(d))
    # brute force
    from collections import Counter

    support = Counter()
    for _oid, parts in baskets:
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            support[(a, b)] += 1
    edges = {p for p, c in support.items() if c >= 2}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cands = {}
    for v, nbrs in adj.items():
        for u, w in itertools.combinations(sorted(nbrs), 2):
            if (u, w) not in edges:
                cands[(u, w)] = cands.get((u, w), 0) + 1
    scored = sorted(
        (
            (-(c / (len(adj[u]) + len(adj[w]) - c)), u, w, c)
            for (u, w), c in cands.items()
        )
    )[:LINKPRED_TOP_K]
    want = [(u, w, c) for _jd, u, w, c in scored]
    got = [
        (int(r.part_a), int(r.part_b), int(r.common))
        for r in eng.itertuples()
    ]
    assert got == want
    assert (1, 3) in {(a, b) for a, b, _ in got}  # the planted path
    assert all((a, b) not in edges for a, b, _ in got)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["q_link_prediction"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_psi_drift_hand_solved(ray_session, tmp_path):
    """Hand-solved PSI facts: identical mixes -> every term and the
    total are exactly 0; a type present in only one period still gets a
    bucket (add-1 smoothing, no ln(0)); a one-period-empty corpus works;
    pre-epoch (negative week) events land in the right parity; engine ==
    oracle dtype-strict."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_psi_drift

    WK = 7 * 86_400_000_000
    # identical mixes in week 0 (even) and week 1 (odd)
    rows = []
    i = 0
    for w in (0, 1):
        for t, k in (("view", 4), ("click", 2)):
            for _ in range(k):
                rows.append((i, w * WK + i, 1, t, 1.0))
                i += 1
    d = tmp_path / "psi0"
    d.mkdir()
    _write_events(d, rows)
    eng = q_psi_drift(str(d))
    assert (eng.psi_x1e9 == 0).all() and (eng.psi_total_x1e9 == 0).all()
    # drifted: 'error' only in odd weeks; a pre-epoch even-week event
    rows.append((100, 1 * WK + 99, 1, "error", 1.0))
    rows.append((101, -2 * WK + 5, 1, "view", 1.0))  # week -2: even parity
    d = tmp_path / "psi1"
    d.mkdir()
    _write_events(d, rows)
    eng = q_psi_drift(str(d))
    assert set(eng.event_type) == {"view", "click", "error"}
    err = eng[eng.event_type == "error"].iloc[0]
    assert (int(err.n_even), int(err.n_odd)) == (0, 1)
    assert int(err.psi_x1e9) != 0
    assert int(eng.n_even.sum()) == 7  # the pre-epoch view counted even
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_psi_drift"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    # independent reference of the total
    import math

    a = {"view": 5, "click": 2, "error": 0}
    b = {"view": 4, "click": 2, "error": 1}
    na, nb, m = 7, 7, 3
    want = 0
    for t in sorted(a):
        p = (a[t] + 1) / (na + m)
        q = (b[t] + 1) / (nb + m)
        term = 0.0 if p == q else (p - q) * math.log(p / q)
        want += int(np.floor(abs(term) * 1e9 + 0.5)) * (1 if term >= 0 else -1)
    assert int(eng.psi_total_x1e9.iloc[0]) == want


def test_pareto_coverage_hand_and_ties(ray_session, tmp_path):
    """Hand-solved coverage: revenues 50,30,10,10 (total 100) -> 50%
    needs 1 customer, 80% needs 2, 90% needs 3; an exact-tie run at the
    crossing (answer is tie-order independent); a zero and a NEGATIVE
    revenue customer excluded from the head but counted in totals;
    all-non-positive total -> typed empty frame."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_pareto_coverage

    orders = []
    ok = 0
    for ck, total in ((1, 50.0), (2, 30.0), (3, 10.0), (4, 10.0)):
        orders.append((ok, ck, total)); ok += 1
    orders.append((ok, 5, 0.0)); ok += 1
    orders.append((ok, 6, -5.0)); ok += 1
    orders.append((ok, 1, 5.0)); ok += 1  # customer 1 -> 55 total (105 sum)
    d = tmp_path / "par"
    d.mkdir()
    _write_orders_ck(d, orders)
    eng = q_pareto_coverage(str(d))
    got = {int(r.pct): (int(r.n_customers), int(r.covered_cents))
           for r in eng.itertuples()}
    # totals: 55+30+10+10+0-5 = 100.00 -> cents 10000
    assert int(eng.total_cents.iloc[0]) == 10000
    assert int(eng.n_customers_total.iloc[0]) == 6
    assert got[50] == (1, 5500)
    assert got[80] == (2, 8500)
    assert got[90] == (3, 9500)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_pareto_coverage"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    # all-non-positive -> empty
    d2 = tmp_path / "parneg"
    d2.mkdir()
    _write_orders_ck(d2, [(0, 1, -1.0), (1, 2, 0.0)])
    assert len(q_pareto_coverage(str(d2))) == 0


def test_weighted_sssp_hand_solved(ray_session, tmp_path):
    """Hand-solved Bellman-Ford on a planted graph: the cheap 2-hop
    route beats the expensive direct edge (relaxation must propagate);
    the min-weight edge rule (parallel lineitems keep the cheapest);
    a node only reachable in 4 hops stays absent at 3 rounds; sources
    (suppkey % 10 == 0) start at 0 even when their edges are pricey."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_weighted_sssp

    # supplier 10 is the source. parts/suppliers: edges via baskets of
    # (orderkey, partkey) won't do — build lineitem directly.
    rows = []  # (partkey, suppkey, extprice)
    rows.append((1, 10, 100.0))   # s10 -p1 cost 10000
    rows.append((1, 10, 60.0))    # parallel cheaper: min -> 6000
    rows.append((1, 3, 1.0))      # p1 - s3 cost 100
    rows.append((2, 10, 50.0))    # s10 - p2 5000
    rows.append((2, 3, 2.0))      # p2 - s3 200 -> s3 via p2: 5200 < via p1 6100
    rows.append((5, 3, 1.0))      # p5 only via s3: hop 3 = 5200+100
    rows.append((6, 7, 1.0))      # disconnected island (s7 not a source)
    n = len(rows)
    d = tmp_path / "sssp"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(list(range(n)), pa.int64()),
                "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array(
                    [1_500_000_000_000_000] * n, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 3, 7], pa.int64()),
                "s_name": pa.array(["a", "b", "c"], pa.string()),
                "s_nationkey": pa.array([0, 0, 0], pa.int64()),
                "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    eng = q_weighted_sssp(str(d))
    got = {
        (r.node_type, int(r.key)): int(r.dist_cents)
        for r in eng.itertuples()
    }
    assert got[("supplier", 10)] == 0
    # p1: direct 6000 (min of 10000/6000 parallel edges) loses to the
    # 3-hop s10->p2->s3->p1 = 5000+200+100 = 5300
    assert got[("part", 1)] == 5300
    assert got[("part", 2)] == 5000
    assert got[("supplier", 3)] == 5200  # via p2, not p1
    assert got[("part", 5)] == 5300  # 3 hops
    assert ("supplier", 7) not in got and ("part", 6) not in got
    con = duckdb.connect()
    for tbl in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{d}/{tbl}.parquet'"
        )
    ora = con.execute(entrymod.oracle_sql()["q_weighted_sssp"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_ingest_quarantine_priority_sink_and_json_edges(
    ray_session, tmp_path
):
    """Every violation class planted (NULL user/ts, NaN and NULL value,
    invalid JSON incl. the bare-NaN constant Python's json ACCEPTS but
    yyjson rejects — the parity trap `_strict_json_ok` exists for), a
    row failing MULTIPLE rules lands in the highest-priority class only,
    the dead-letter sink holds exactly the bad rows with their class,
    and engine == oracle."""
    import glob

    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import (
        _strict_json_ok,
        t_ingest_quarantine,
    )

    # json parity edges
    assert _strict_json_ok('{"k": 1}')
    assert not _strict_json_ok("NaN")  # python-json accepts; yyjson doesn't
    assert not _strict_json_ok('{"k": Infinity}')
    assert not _strict_json_ok("01")
    assert not _strict_json_ok("")
    assert not _strict_json_ok(None)

    base = 1_700_000_000_000_000
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array(
                [base, None, base, base, base, base, base], pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([1, None, None, 2, 3, 4, 5], pa.int64()),
            "event_type": pa.array(["view"] * 7, pa.string()),
            "value": pa.array(
                [1.0, 1.0, float("nan"), float("nan"), None, 1.0, 2.0],
                pa.float64(),
            ),
            "props": pa.array(
                ['{"k":1}', "{}", "{}", "NaN", "{}", "not json", '{"a":[1]}'],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "quar"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    dlq = str(tmp_path / "dlq")
    eng = t_ingest_quarantine(str(d), out_dir=dlq)
    got = {r.violation: (int(r.n_rows), int(r.min_event_id), int(r.max_event_id))
           for r in eng.itertuples()}
    # id2 fails ts AND user -> null_user wins; id4 fails value AND props
    # -> bad_value wins
    assert got["null_user"] == (2, 2, 3)
    assert got["bad_value"] == (2, 4, 5)
    assert got["bad_props"] == (1, 6, 6)
    assert got["ok"] == (2, 1, 7)
    dead = pd.concat(
        [pq.read_table(p).to_pandas() for p in glob.glob(dlq + "/*.parquet")]
    )
    assert sorted(dead["event_id"]) == [2, 3, 4, 5, 6]
    assert set(dead["violation"]) == {"null_user", "bad_value", "bad_props"}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["t_ingest_quarantine"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_group_quantile_sketch_certificate(ray_session, tmp_path):
    """Per-group certificate: for each (type, q) row the true group
    order statistic at the reported rank lies inside [lo, hi]; negative
    and NaN values exercised; engine == oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_group_quantile_sketch

    base = 1_700_000_000_000_000
    rng = np.random.RandomState(3)
    rows, by_type = [], {}
    for i in range(900):
        t = rng.choice(["view", "purchase", "error"])
        v = float(rng.randint(-4000, 9000)) / 64.0
        rows.append((i, base + i, 1, t, v))
        by_type.setdefault(t, []).append(v)
    rows.append((9000, base, 1, "view", float("nan")))  # excluded
    d = tmp_path / "gdd"
    d.mkdir()
    _write_events(d, rows)
    eng = q_group_quantile_sketch(str(d))
    from pdfray.pipelines.relational import round_half_away

    for r in eng.itertuples():
        vals = np.sort(
            round_half_away(
                np.array(by_type[r.event_type]) * 100.0, 0
            ).astype(np.int64)
        )
        assert len(vals) == r.n
        true_stat = int(vals[r.rank - 1])
        assert r.lo_cents <= true_stat <= r.hi_cents, r
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(
        entrymod.oracle_sql()["q_group_quantile_sketch"]
    ).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_time_to_convert_hand_and_fuzz(ray_session, tmp_path):
    """Hand-solved funnel latencies: a purchase BEFORE the first view
    does not convert; a purchase exactly AT the first view converts with
    delta 0; the median rank pair on even/odd counts; non-viewing
    purchasers excluded from n_viewing; randomized parity vs a plain
    replay."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_time_to_convert

    base = 1_700_000_000_000_000
    rows = [
        (0, base + 100, 1, "view", 1.0),
        (1, base + 100, 1, "purchase", 1.0),   # delta 0 (ts == fv)
        (2, base + 50, 2, "purchase", 1.0),    # before first view
        (3, base + 60, 2, "view", 1.0),        # user 2: no conversion
        (4, base + 10, 3, "view", 1.0),
        (5, base + 110, 3, "purchase", 1.0),   # delta 100
        (6, base, 4, "purchase", 1.0),         # never views: not counted
        (7, base, 5, "view", 1.0),             # views, never buys
    ]
    d = tmp_path / "ttc"
    d.mkdir()
    _write_events(d, rows)
    eng = q_time_to_convert(str(d))
    r = eng.iloc[0]
    assert (int(r.n_viewing), int(r.n_converting)) == (4, 2)
    assert int(r.conv_ppm) == 500_000
    assert (int(r.delta_med_lo_us), int(r.delta_med_hi_us)) == (0, 100)
    assert int(r.delta_p90_us) == 100
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_time_to_convert"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)

    for seed in (1, 2):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(700):
            u = int(rng.randint(1, 40))
            t = "view" if rng.rand() < 0.6 else "purchase"
            ts = base + int(rng.randint(0, 10**7))
            rows.append((i, ts, u, t, 1.0))
        d2 = tmp_path / f"ttcf{seed}"
        d2.mkdir()
        _write_events(d2, rows)
        eng = q_time_to_convert(str(d2))
        # replay
        fv, fp = {}, {}
        for _eid, ts, u, t, _v in rows:
            if t == "view":
                fv[u] = min(fv.get(u, ts), ts)
        for _eid, ts, u, t, _v in rows:
            if t == "purchase" and u in fv and ts >= fv[u]:
                fp[u] = min(fp.get(u, ts), ts)
        deltas = sorted(fp[u] - fv[u] for u in fp)
        nc = len(deltas)
        assert int(eng.n_viewing[0]) == len(fv)
        assert int(eng.n_converting[0]) == nc
        assert int(eng.delta_med_lo_us[0]) == deltas[(nc + 1) // 2 - 1]
        assert int(eng.delta_med_hi_us[0]) == deltas[nc // 2]
        assert int(eng.delta_p90_us[0]) == deltas[(9 * nc + 9) // 10 - 1]


def test_vocab_coverage_hand_solved(ray_session, tmp_path):
    """Hand corpus: counts a:5 b:3 c:1 d:1 (total 10) -> 90% needs
    {a, b, c} (9 >= 9), 99% needs all 4; an exact tie at the cut is
    order-independent; engine == oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.textops import t_vocab_coverage

    texts = ["a a a b", "a a b b c", "d"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    eng = t_vocab_coverage(str(tmp_path))
    got = {int(r.pct): (int(r.vocab_size), int(r.covered_tokens))
           for r in eng.itertuples()}
    assert got[90] == (3, 9)
    assert got[99] == (4, 10)
    assert int(eng.total_tokens.iloc[0]) == 10
    assert int(eng.total_vocab.iloc[0]) == 4
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["t_vocab_coverage"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


def test_wallet_balance_hand_fuzz_and_chunks(ray_session, tmp_path):
    """Hand recurrence: [+5, -10, +3] -> balances 5, 0(clamp), 3 — final
    3, max 5, one clamp; events planted across several WALLET_CHUNK_DAYS
    chunks so the affine-max transfer fold F(x) = max(x+S, S−minpfx) is
    actually exercised; randomized signed streams vs a plain replay."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_wallet_balance

    DAY = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = []
    # user 1: the hand case, one event per 10 days (crosses 7d chunks)
    for i, v in enumerate([5.0, -10.0, 3.0]):
        rows.append((i, base + i * 10 * DAY, 1, "purchase", v))
    # user 2: clamp at the very first event, then recover
    rows.append((10, base, 2, "purchase", -7.0))
    rows.append((11, base + 1, 2, "purchase", 4.0))
    # non-purchase noise is invisible
    rows.append((20, base, 1, "view", 999.0))
    d = tmp_path / "wal"
    d.mkdir()
    _write_events(d, rows)
    eng = q_wallet_balance(str(d))
    g = {int(r.user_id): (int(r.final_cents), int(r.max_cents), int(r.n_clamps))
         for r in eng.itertuples()}
    assert g[1] == (300, 500, 1)
    assert g[2] == (400, 400, 1)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_wallet_balance"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(600):
            u = int(rng.randint(1, 7))
            ts = base + int(rng.randint(0, 90)) * DAY + int(rng.randint(0, 1000))
            v = float(rng.randint(-300, 300)) / 4.0
            rows.append((i, ts, u, "purchase", v))
        d2 = tmp_path / f"walf{seed}"
        d2.mkdir()
        _write_events(d2, rows)
        eng = q_wallet_balance(str(d2))
        # plain replay
        from collections import defaultdict

        per = defaultdict(list)
        for eid, ts, u, _t, v in rows:
            per[u].append((ts, eid, round(abs(v) * 100) * (1 if v >= 0 else -1)))
        want = {}
        for u, evs in per.items():
            b, mx, nc = 0, 0, 0
            for _ts, _eid, dcent in sorted(evs):
                if b + dcent < 0:
                    nc += 1
                    b = 0
                else:
                    b += dcent
                mx = max(mx, b)
            want[u] = (b, mx, nc)
        got = {
            int(r.user_id): (int(r.final_cents), int(r.max_cents), int(r.n_clamps))
            for r in eng.itertuples()
        }
        assert got == want


def test_rfm_segments_hand_and_tie_boundaries(ray_session, tmp_path):
    """Hand-solved quintiles on 10 users with distinct metrics (scores
    1..5 two users each per dimension), then a MASS-TIE corpus (every
    user identical -> all boundaries equal -> everyone scores 1, the
    pure-value rule's deterministic answer); engine == replay ==
    oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_rfm_segments

    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for u in range(10):
        # user u: u+1 purchases of 10*(u+1) cents, last at base+u days
        for j in range(u + 1):
            rows.append(
                (eid, base + u * 86_400_000_000 - j * 1000, u,
                 "purchase", (u + 1) * 0.10)
            )
            eid += 1
    d = tmp_path / "rfm"
    d.mkdir()
    _write_events(d, rows)
    eng = q_rfm_segments(str(d))
    assert int(eng.n_users.sum()) == 10
    # metrics are all comonotone (user u has rank u in r, f, m), so every
    # user's three scores agree and the census is 2 users per (k,k,k)
    assert len(eng) == 5
    for r in eng.itertuples():
        assert r.r_score == r.f_score == r.m_score
        assert int(r.n_users) == 2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_rfm_segments"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    # mass tie: identical users -> all scores 1
    rows = [(i, base, i % 6, "purchase", 1.0) for i in range(18)]
    d2 = tmp_path / "rfmtie"
    d2.mkdir()
    _write_events(d2, rows)
    eng = q_rfm_segments(str(d2))
    assert len(eng) == 1
    r = eng.iloc[0]
    assert (int(r.r_score), int(r.f_score), int(r.m_score)) == (1, 1, 1)
    assert int(r.n_users) == 6
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d2}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_rfm_segments"]).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
