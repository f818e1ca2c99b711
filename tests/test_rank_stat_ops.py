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
