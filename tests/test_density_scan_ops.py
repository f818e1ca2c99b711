"""Unit tests for the round-5 continuation trio: t_editdist_dupes
(distributed SymSpell), s_dbscan (density clustering composition), and
q_cusum_changepoint (distributed prefix-scan on a hot key).

Each op also rides the hostile harnesses (test_corpus_shaping) and the
empty-input contract (test_empty_input); here we pin the algorithm-level
properties those can't: the SymSpell recall lemma against brute force,
byte-level levenshtein parity with DuckDB, hand-constructed DBSCAN role
geometry (isolated core, two-cluster border, zero vector), and the CUSUM
candidate/merge arithmetic on a hand-solved series with ties.
"""
from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_editdist_dp_and_recall_match_duckdb_fuzz():
    """Byte-level banded DP == DuckDB levenshtein (which edits BYTES, not
    codepoints — 'é'→'a' costs 2 there), and the SymSpell symmetric-delete
    lemma holds: every true pair at ed<=2 shares a deletion variant."""
    from pdfray.pipelines.textops import _bounded_editdist, _deletion_variants

    con = duckdb.connect()
    rng = random.Random(7)
    alpha = "abé日ß "
    for _ in range(1500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        duck = con.execute("select levenshtein(?,?)", [a, b]).fetchone()[0]
        mine = _bounded_editdist(a.encode(), b.encode(), 3)
        if duck <= 3:
            assert mine == duck, (a, b, mine, duck)
        else:
            assert mine > 3, (a, b, mine, duck)
        if duck <= 2:
            assert _deletion_variants(a.encode(), 2) & _deletion_variants(
                b.encode(), 2
            ), (a, b)


def test_editdist_engine_matches_bruteforce_oracle(ray_session, tmp_path):
    """Engine pipeline over a planted part table (typos, unicode byte
    pairs, the empty string, multiplicities) == the registered oracle's
    brute-force distinct-name cross join."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.textops import t_editdist_dupes

    names = (
        ["widget"] * 3
        + ["widgit", "wídget", "gizmo", "gizmo", "gizmos", "gizmoz"]
        + ["totally different thing", "ab", "b", ""]
    )
    d = tmp_path / "ed"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    np.arange(len(names), dtype=np.int64)
                ),
                "p_name": pa.array(names, pa.string()),
            }
        ),
        str(d / "part.parquet"),
    )
    eng = t_editdist_dupes(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{d}/part.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["t_editdist_dupes"]).df()
    pd.testing.assert_frame_equal(eng, ora)
    # the unicode pair is present at BYTE distance 2, and multiplicities
    # rode through
    row = eng[(eng.name_a == "widget") & (eng.name_b == "wídget")]
    assert len(row) == 1 and row.iloc[0]["dist"] == 2
    assert row.iloc[0]["n_parts_a"] == 3
    assert len(eng[(eng.name_a == "") & (eng.name_b == "b")]) == 1


def _write_embeddings(d, vecs):
    rows = [np.asarray(v, dtype=np.float32) for v in vecs]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    np.arange(len(rows), dtype=np.int64)
                ),
                "embedding": pa.array(
                    [r.tolist() for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(len(rows), np.int32), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def test_dbscan_handcrafted_geometry(ray_session, tmp_path):
    """Hand-built corpus pinning every DBSCAN role: a 5-clique cluster
    (core), two isolated-core hubs whose spokes are border, a border
    point adjacent to BOTH hubs (deterministic MIN-cluster tie rule),
    a zero vector and an orthogonal singleton (noise) — engine == the
    registered recursive-CTE oracle AND the hand-derived labels."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.simsearch import s_dbscan

    dim = 8
    e = np.eye(dim)

    def unit(v):
        return v / np.linalg.norm(v)

    vecs = []
    # ids 0-4: 5 identical vectors -> pairwise sim 1, degree 4 -> core
    vecs += [e[0]] * 5
    # id 5: hub h1 along e1; ids 6,7: its spokes at cos=0.45 (spoke-spoke
    # sim 0.2025 < eps, bridge-spoke 0.45/sqrt(2)=0.318 < eps); the hub's
    # degree counts the bridge (id 10) too
    h1, h2 = e[1], e[2]
    c, s = 0.45, np.sqrt(1 - 0.45 ** 2)
    vecs += [h1]
    vecs += [unit(c * h1 + s * e[3])]
    vecs += [unit(c * h1 + s * e[4])]
    # id 8: hub h2; id 9: one spoke; id 10: the h1/h2 bridge (border,
    # degree 2, takes MIN cluster)
    vecs += [h2]
    vecs += [unit(c * h2 + s * e[5])]
    vecs += [unit(h1 + h2)]
    # h2 needs degree 3: one more spoke
    vecs += [unit(c * h2 + s * e[6])]
    # id 12: zero vector (noise); id 13: orthogonal singleton (noise)
    vecs += [np.zeros(dim)]
    vecs += [e[7]]
    d = tmp_path / "db"
    d.mkdir()
    _write_embeddings(d, vecs)
    eng = s_dbscan(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["s_dbscan"]).df()
    pd.testing.assert_frame_equal(eng, ora)
    got = dict(zip(eng.vec_id, zip(eng.cluster, eng.role)))
    for i in range(5):
        assert got[i] == (0, "core")
    assert got[5] == (5, "core")  # isolated core: no core neighbor
    assert got[6] == (5, "border") and got[7] == (5, "border")
    assert got[8] == (8, "core") and got[9] == (8, "border")
    assert got[10] == (5, "border")  # two-cluster tie -> MIN component
    assert got[12] == (-1, "noise") and got[13] == (-1, "noise")


def _write_events(d, rows):
    """rows: (event_id, ts_us, user, type, value)"""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array(
                    [float(r[4]) for r in rows], pa.float64()
                ),
                "props": pa.array(['{"k":1}'] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def test_cusum_hand_solved_and_ties(ray_session, tmp_path):
    """Hand-solved mean-shift series (S_k = n*prefix_k - k*T on the cents
    grid), a constant series (S == 0 everywhere -> the min-k tie rule
    gives cp_k = 1), and a same-timestamp tie ordered by event_id — the
    series spans several CUSUM_CHUNK_DAYS chunks so the offset fold and
    boundary arithmetic are actually exercised."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_cusum_changepoint

    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = []
    # type A: 1,1,1,5,5 across 10 days (5 chunks at 2-day width)
    for i, v in enumerate([1.0, 1.0, 1.0, 5.0, 5.0]):
        rows.append((i, base + i * 2 * day + i, 1, "A", v))
    # type B: constant 2.0 x3, with two events at the SAME ts
    rows.append((10, base, 2, "B", 2.0))
    rows.append((11, base, 2, "B", 2.0))
    rows.append((12, base + 3 * day, 2, "B", 2.0))
    d = tmp_path / "cu"
    d.mkdir()
    _write_events(d, rows)
    eng = q_cusum_changepoint(str(d))
    # hand arithmetic for A: cents prefix 100,200,300,800,1300; T=1300,
    # n=5; S = 5*prefix - k*1300 = -800,-1600,-2400,-1200,0 -> |S| max
    # 2400 at k=3 (event_id 2), the last pre-shift point
    a = eng[eng.event_type == "A"].iloc[0]
    assert (a.n_events, a.cp_k, a.cp_event_id, a.cusum_stat) == (5, 3, 2, 2400)
    b = eng[eng.event_type == "B"].iloc[0]
    assert (b.n_events, b.cp_k, b.cp_event_id, b.cusum_stat) == (3, 1, 10, 0)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["q_cusum_changepoint"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_cusum_randomized_oracle_parity(ray_session, tmp_path):
    """Randomized series with negative values, .xx5-grid cents, ts ties,
    a pre-epoch event and a hot type — engine == oracle (three seeds)."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_cusum_changepoint

    day = 86_400_000_000
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        n = 600
        rows = []
        for i in range(n):
            typ = "hot" if rng.rand() < 0.7 else rng.choice(["x", "y"])
            ts = -3 * day if i == 0 else int(rng.randint(0, 40)) * day // 2
            # 1/64 grid: lands exactly on .xx5 rounding ties
            val = (rng.randint(-2000, 2000)) / 64.0
            rows.append((i, 1_700_000_000_000_000 + ts, 0, typ, val))
        rows[5] = (5, rows[4][1], 0, rows[4][3], 7.5)  # exact ts tie
        d = tmp_path / f"cur{seed}"
        d.mkdir()
        _write_events(d, rows)
        eng = q_cusum_changepoint(str(d))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        ora = con.execute(entrymod.oracle_sql()["q_cusum_changepoint"]).df()
        pd.testing.assert_frame_equal(eng, ora)


def test_spine_fill_hand_and_pre_epoch(ray_session, tmp_path):
    """Gap days generated with zero counts; a single-event user yields one
    row; a pre-epoch (1969) event floors to the right calendar day."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_date_spine_fill

    day = 86_400_000_000
    base = 1_704_067_200_000_000  # 2024-01-01
    rows = [
        (0, base, 1, "A", 1.0),
        (1, base + 3 * day + 5, 1, "A", 1.0),  # days 1 and 2 are gaps
        (2, base, 2, "A", 1.0),  # single-event user
        (3, -day // 2, 3, "A", 1.0),  # 1969-12-31 12:00 -> floors to -1
    ]
    d = tmp_path / "sp"
    d.mkdir()
    _write_events(d, rows)
    eng = q_date_spine_fill(str(d))
    u1 = eng[eng.user_id == 1]
    assert list(u1.n_events) == [1, 0, 0, 1]
    assert list(u1.day) == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
        "2024-01-04",
    ]
    assert len(eng[eng.user_id == 2]) == 1
    assert list(eng[eng.user_id == 3].day) == ["1969-12-31"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_date_spine_fill"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_mad_outliers_hand_values(ray_session, tmp_path):
    """Hand case: values 1,2,4,10 -> med 3 (interpolated), deviations
    2,1,1,7 -> mad 1.5, fence 4.5 -> one outlier (10).  A constant series
    has mad 0 and no outliers (0 > 0 is false)."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_mad_outliers

    base = 1_700_000_000_000_000
    rows = [(i, base + i, 1, "A", v) for i, v in enumerate([1.0, 2.0, 4.0, 10.0])]
    rows += [(10 + i, base + i, 1, "B", 2.0) for i in range(3)]
    d = tmp_path / "mad"
    d.mkdir()
    _write_events(d, rows)
    eng = q_mad_outliers(str(d))
    a = eng[eng.event_type == "A"].iloc[0]
    assert (a.med_value, a.mad_value, a.n_outliers) == (3.0, 1.5, 1)
    b = eng[eng.event_type == "B"].iloc[0]
    assert (b.med_value, b.mad_value, b.n_outliers) == (2.0, 0.0, 0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_mad_outliers"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_max_drawdown_hand_and_monotone(ray_session, tmp_path):
    """Hand case 5,3,4,1,6: runmax 5,5,5,5,6 -> drawdowns 0,2,1,4,0 ->
    max 400 cents at k=4; a monotone series has dd 0 everywhere and the
    min-k tie rule gives k=1.  The series crosses chunk boundaries so the
    max-carry offset fold is exercised."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_max_drawdown

    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = [
        (i, base + i * 2 * day, 1, "A", v)
        for i, v in enumerate([5.0, 3.0, 4.0, 1.0, 6.0])
    ]
    rows += [
        (10 + i, base + i * 2 * day, 1, "B", float(i + 1)) for i in range(4)
    ]
    d = tmp_path / "dd"
    d.mkdir()
    _write_events(d, rows)
    eng = q_max_drawdown(str(d))
    a = eng[eng.event_type == "A"].iloc[0]
    assert (a.dd_cents, a.dd_k, a.dd_event_id) == (400, 4, 3)
    b = eng[eng.event_type == "B"].iloc[0]
    assert (b.dd_cents, b.dd_k, b.dd_event_id) == (0, 1, 10)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_max_drawdown"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_dbscan_forced_distributed_regime_equal(ray_session, tmp_path, monkeypatch):
    """The driver union-find and the distributed star-round CC regimes
    produce identical labels (min-label per component is implementation-
    independent): run the handcrafted corpus with DBSCAN_DRIVER_EDGES
    forced to 0 and compare against the default driver path."""
    import pdfray.pipelines.simsearch as SS

    dim = 6
    e = np.eye(dim)
    vecs = [e[0]] * 5 + [e[1]] * 4 + [np.zeros(dim), e[2]]
    d = tmp_path / "dbr"
    d.mkdir()
    _write_embeddings(d, vecs)
    fast = SS.s_dbscan(str(d))
    monkeypatch.setattr(SS, "DBSCAN_DRIVER_EDGES", 0)
    slow = SS.s_dbscan(str(d))
    pd.testing.assert_frame_equal(fast, slow)
    assert (fast.role == "core").sum() == 9
