"""Unit tests for the round-5 sixth-session operators (feature repair /
evaluation family).  Each op also rides the hostile harnesses
(test_corpus_shaping) and the empty-input contract (test_empty_input);
here we pin the algorithm-level properties those can't: hand-solved
imputation arithmetic including the global-fallback path, the forced
distributed (map_groups) regime bit-equal to the driver fold, and the
all-error degenerate corpus.
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


def _write_events(d, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    base = 1_700_000_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + r[1] for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
                "props": pa.array(['{"k":1}'] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def test_median_impute_hand_and_fallback(ray_session, tmp_path):
    """Hand-solved: user 1 imputes from their own odd/even-count median,
    user 2 (only errors) takes the GLOBAL fallback median — interpolated
    between grid values (1.5 -> 300 half-cents), user 3 is a single-value
    degenerate.  Engine == hand arithmetic == registered oracle."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_median_impute

    rows = [
        (0, 0, 1, "view", 1.00),
        (1, 1, 1, "click", 2.00),
        (2, 2, 1, "purchase", 4.00),
        (3, 3, 1, "error", 99.0),
        (4, 4, 1, "error", -5.0),
        (5, 5, 2, "error", 7.0),
        (6, 6, 2, "error", 7.0),
        (7, 7, 2, "error", 7.0),
        (8, 8, 3, "view", 0.50),
    ]
    d = tmp_path / "imp"
    d.mkdir()
    _write_events(d, rows)
    eng = q_median_impute(str(d))
    # user 1: ok halfcents {200,400,800}, median 2.00 -> 400;
    # total = 1400 + 2*400
    r1 = eng[eng.user_id == 1].iloc[0]
    assert (r1.n_ok, r1.n_err, r1.med_halfcents, r1.total_halfcents) == (
        3,
        2,
        400.0,
        2200.0,
    )
    # global ok values sorted [0.5, 1, 2, 4]: h = 1.5 -> 1 + 0.5*(2-1)
    # = 1.5 -> 300 half-cents; user 2 = fallback, total 3*300
    r2 = eng[eng.user_id == 2].iloc[0]
    assert (r2.n_ok, r2.n_err, r2.med_halfcents, r2.total_halfcents) == (
        0,
        3,
        300.0,
        900.0,
    )
    r3 = eng[eng.user_id == 3].iloc[0]
    assert (r3.n_ok, r3.n_err, r3.med_halfcents, r3.total_halfcents) == (
        1,
        0,
        100.0,
        100.0,
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_median_impute"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_median_impute_forced_distributed_regime(
    ray_session, tmp_path, monkeypatch
):
    """PIVOT_DRIVER_MAX_ROWS = 0 forces the Ray-aggregate + map_groups
    regime; output must be bit-equal to the driver fold on the same
    input (randomized binary-grid values with .5 half-cent ties)."""
    from pdfray.pipelines import relational as R

    rng = np.random.RandomState(7)
    rows = []
    for i in range(400):
        typ = ["view", "click", "purchase", "error"][int(rng.randint(4))]
        val = int(rng.randint(-320, 320)) / 64.0
        rows.append((i, i * 1000, int(rng.randint(0, 25)), typ, val))
    d = tmp_path / "imp2"
    d.mkdir()
    _write_events(d, rows)
    driver = R.q_median_impute(str(d))
    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    dist = R.q_median_impute(str(d))
    pd.testing.assert_frame_equal(driver, dist)


def test_median_impute_all_errors_degenerate(ray_session, tmp_path):
    """No non-error rows anywhere: the global fallback is NULL — med and
    total degenerate to NaN without flipping the dtype class, matching
    the oracle exactly."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.relational import q_median_impute

    rows = [(i, i, i % 3, "error", 1.0) for i in range(9)]
    d = tmp_path / "imp3"
    d.mkdir()
    _write_events(d, rows)
    eng = q_median_impute(str(d))
    assert list(eng.user_id) == [0, 1, 2]
    assert (eng.n_ok == 0).all() and (eng.n_err == 3).all()
    assert eng.med_halfcents.isna().all() and eng.total_halfcents.isna().all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    ora = con.execute(entrymod.oracle_sql()["q_median_impute"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def _write_embeddings(d, vecs, labels):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": pa.array(
                    [np.asarray(v, np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(np.asarray(labels, np.int32)),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def test_silhouette_hand_geometry(ray_session, tmp_path):
    """Hand-solved 1-D geometry: label 0 at {0, 2} (centroid 1), label 1
    at {10, 12} (centroid 11), a single-member label 2 at {5}.  a/b are
    exact small integers, so the scores are exact rationals: the
    single-member vector sits ON its own centroid (a=0 -> sil=1), the
    label-0 pair has a=1, b=min(10, 5)=5 -> sil=0.8.  Engine == hand
    values == registered oracle (dtype-strict)."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.simsearch import s_label_silhouette

    d = tmp_path / "sil"
    d.mkdir()
    vecs = [[0.0, 0.0], [2.0, 0.0], [10.0, 0.0], [12.0, 0.0], [5.0, 0.0]]
    labels = [0, 0, 1, 1, 2]
    _write_embeddings(d, vecs, labels)
    eng = s_label_silhouette(str(d))
    # vec 0 at x=0: a=1, b=min(11, 5)=5 -> 0.8; vec 1 at x=2: a=1,
    # b=min(9, 3)=3 -> (3-1)/3 = 0.6667; vec 3 at x=12: a=1,
    # b=min(11, 7)=7 -> 6/7 = 0.8571; vec 4 (single-member): a=0,
    # b=min(4, 6)=4 -> 1.0
    assert list(eng.vec_id) == [0, 1, 2, 3, 4]
    assert list(eng.sil) == [0.8, 0.6667, 0.8, 0.8571, 1.0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["s_label_silhouette"]).df()
    pd.testing.assert_frame_equal(eng, ora)


def test_silhouette_degenerate_single_label_and_dup(ray_session, tmp_path):
    """One label in the whole corpus -> sil = 0 everywhere (no 'other'
    centroid exists); a vector exactly ON the shared centroid of a
    two-label corpus where both centroids coincide -> a = b = 0 -> the
    0/0 convention pins sil to 0 on both sides."""
    import __ray_entry__ as entrymod
    from pdfray.pipelines.simsearch import s_label_silhouette

    d = tmp_path / "sil1"
    d.mkdir()
    _write_embeddings(d, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], [7, 7, 7])
    eng = s_label_silhouette(str(d))
    assert (eng.sil == 0.0).all() and list(eng.label) == [7, 7, 7]

    d2 = tmp_path / "sil2"
    d2.mkdir()
    # labels 0 and 1 both have centroid (1, 1); every vector has a == b
    _write_embeddings(
        d2,
        [[0.0, 0.0], [2.0, 2.0], [0.0, 2.0], [2.0, 0.0], [1.0, 1.0]],
        [0, 0, 1, 1, 1],
    )
    eng2 = s_label_silhouette(str(d2))
    # vec 4 sits exactly on BOTH centroids: a = b = 0 -> sil = 0
    assert eng2[eng2.vec_id == 4].sil.iloc[0] == 0.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d2}/embeddings.parquet'"
    )
    ora = con.execute(entrymod.oracle_sql()["s_label_silhouette"]).df()
    pd.testing.assert_frame_equal(eng2, ora)
