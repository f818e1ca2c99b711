"""Round-5 scale plumbing: derived partition counts (pdfray.pipelines.sizing)
and parquet stage checkpoints replacing the last corpus-order object-store
materializes (t_dup_spans, pipeline_line_dedup, q_sessionize)."""
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfray.pipelines.sizing import shuffle_partitions
from pdfray.pipelines.staging import stage_checkpoint

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- sizing


def test_shuffle_partitions_scaling_behavior():
    # tiny tables never slice across an idle cluster: fixed per-partition
    # shuffle machinery would dominate
    assert shuffle_partitions(0, cpus=32) == 1
    assert shuffle_partitions(50_000, cpus=32) == 1
    # mid-size fills the cluster's slots once each has min_rows of work
    assert shuffle_partitions(400_000, cpus=32) == 4
    assert shuffle_partitions(10_000_000, cpus=32) == 32
    # ... but a smaller cluster caps the slot floor
    assert shuffle_partitions(10_000_000, cpus=8) == 8
    # beyond slot saturation the count is DATA-proportional and uncapped:
    # 1000x the rows = 1000x the partitions at the same target size
    assert shuffle_partitions(2_000_000_000, cpus=32) == 1000
    assert shuffle_partitions(2_000_000_000_000, cpus=32) == 1_000_000
    # wide rows: the bytes term dominates when rows alone undersize
    assert shuffle_partitions(1000, n_bytes=10 << 30, cpus=8) == 40


def test_shuffle_partitions_monotone():
    prev = 0
    for n in [0, 1, 10**5, 10**6, 10**7, 10**8, 10**9, 10**10]:
        cur = shuffle_partitions(n, cpus=32)
        assert cur >= prev
        prev = cur


# ------------------------------------------------------- stage_checkpoint


def test_stage_checkpoint_empty_stage(ray_session, tmp_path):
    import ray.data as rd

    empty = pa.table({"a": pa.array([], pa.int64())})
    with pytest.raises(ValueError):
        stage_checkpoint(lambda: rd.from_arrow(empty), str(tmp_path / "s1"))
    assert (
        stage_checkpoint(
            lambda: rd.from_arrow(empty), str(tmp_path / "s2"), allow_empty=True
        )
        is None
    )


def test_stage_checkpoint_resume_skips_recompute(ray_session, tmp_path):
    import ray.data as rd

    calls = []

    def factory():
        calls.append(1)
        return rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))

    d = str(tmp_path / "stage")
    first = stage_checkpoint(factory, d).to_pandas()
    again = stage_checkpoint(factory, d).to_pandas()
    assert len(calls) == 1  # _DONE marker short-circuits the rerun
    pd.testing.assert_frame_equal(first, again)
    # resume=False forces a clean rebuild
    stage_checkpoint(factory, d, resume=False)
    assert len(calls) == 2


# ------------------- no corpus-order object-store materialize remains


def test_checkpointed_queries_never_materialize_corpus(
    ray_session, tmp_path, monkeypatch
):
    """The three round-4 weak spots (VERDICT r04 'What's wrong' #1-3) must
    run without object-store materializing any corpus-order table: the
    exploded gram/line pair tables, the sessionized event table, and the
    text-bearing corpus itself all hand off through parquet checkpoints."""
    import ray.data as rd

    from pdfray.pipelines import relational, textops, training_data
    from pdfray.sources import fixtures

    path = str(tmp_path / "documents_pdf.parquet")
    pq.write_table(fixtures.corpus_table(30, n_huge=1, n_broken=2), path)
    monkeypatch.setattr(
        "pdfray.sources.fixtures.ensure_corpus_parquet", lambda sf_dir: path
    )

    seen_schemas = []
    real_materialize = rd.Dataset.materialize

    def spy(self, *a, **k):
        out = real_materialize(self, *a, **k)
        try:
            seen_schemas.append(set(out.schema().names))
        except Exception:
            pass
        return out

    monkeypatch.setattr(rd.Dataset, "materialize", spy)

    textops.t_dup_spans(SF)
    training_data.pipeline_line_dedup("ignored")
    relational.q_sessionize(SF)

    corpus_order = {"text", "html", "gh", "lh", "local_sid"}
    offenders = [s for s in seen_schemas if corpus_order & s]
    assert offenders == [], offenders


def test_dup_spans_stage_dir_resumes(ray_session, tmp_path):
    """With an explicit stage_dir a second run resumes off the checkpoint
    files (byte-identical, untouched mtimes) and returns the same result."""
    from pdfray.pipelines import textops

    d = str(tmp_path / "spans_stage")
    first = textops.t_dup_spans(SF, stage_dir=d)
    pairs_dir = os.path.join(d, "pairs")
    assert os.path.exists(os.path.join(pairs_dir, "_DONE"))
    before = {
        f: os.path.getmtime(os.path.join(pairs_dir, f))
        for f in os.listdir(pairs_dir)
    }
    again = textops.t_dup_spans(SF, stage_dir=d)
    after = {
        f: os.path.getmtime(os.path.join(pairs_dir, f))
        for f in os.listdir(pairs_dir)
    }
    assert before == after  # explode pass never re-ran
    pd.testing.assert_frame_equal(first, again)


def test_fk_audit_stage_dir_resumes(ray_session, tmp_path):
    """q_fk_audit's per-block partial stream is a parquet checkpoint: with
    an explicit stage_dir the second run resumes off the files (untouched
    mtimes — the lineitem scan never re-executes) and returns identical
    totals."""
    from pdfray.pipelines import relational

    d = str(tmp_path / "fk_stage")
    first = relational.q_fk_audit(SF, stage_dir=d)
    parts_dir = os.path.join(d, "partials")
    assert os.path.exists(os.path.join(parts_dir, "_DONE"))
    before = {
        f: os.path.getmtime(os.path.join(parts_dir, f))
        for f in os.listdir(parts_dir)
    }
    again = relational.q_fk_audit(SF, stage_dir=d)
    after = {
        f: os.path.getmtime(os.path.join(parts_dir, f))
        for f in os.listdir(parts_dir)
    }
    assert before == after  # audit scan never re-ran
    pd.testing.assert_frame_equal(first, again)
    # the clean synthetic corpus has zero violations of every rule
    assert (first["n_violations"] == 0).all()


def test_global_rank_matches_single_node_sort(ray_session):
    """Range-partitioned rank == the plain argsort ground truth, including
    the orderkey tiebreak inside equal-price runs."""
    import numpy as np

    from pdfray.pipelines import relational

    got = relational.q_global_rank_orders(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    want = orders.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    want["global_rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    got = got.sort_values("global_rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want[["o_orderkey", "global_rank"]], check_dtype=True
    )


def test_gini_revenue_hand_equal_and_bruteforce(ray_session, tmp_path, monkeypatch):
    """Hand-solved two-customer case (gini exactly 1/4), the all-equal
    degenerate (gini 0), and a randomized brute force — engine vs a
    pure-Python exact-integer Gini over sorted cents — with
    shuffle_partitions forced to 5 so the multi-partition offset fold
    (offset_p·T_p + S_local_p) actually exercises."""
    import numpy as np

    from pdfray.pipelines import relational, sizing

    def write(d, custkeys, prices):
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(
                        np.arange(len(custkeys), dtype=np.int64)
                    ),
                    "o_custkey": pa.array(
                        np.asarray(custkeys, dtype=np.int64)
                    ),
                    "o_totalprice": pa.array(
                        np.asarray(prices, dtype=np.float64)
                    ),
                }
            ),
            str(d / "orders.parquet"),
        )
        return str(d)

    # hand case: revenues 1 and 3 cents -> S = 1·1 + 2·3 = 7,
    # gini = (2·7 − 3·4)/(2·4) = 1/4
    out = relational.q_gini_revenue(write(tmp_path / "hand", [1, 2], [0.01, 0.03]))
    assert list(out.itertuples(index=False)) == [(2, 4, 250_000_000)]

    # all-equal revenues -> exact zero
    out = relational.q_gini_revenue(
        write(tmp_path / "eq", [1, 2, 3, 4], [5.00] * 4)
    )
    assert list(out["gini_x1e9"]) == [0]
    assert list(out["total_cents"]) == [2000]

    # randomized brute force, multi-partition path forced
    monkeypatch.setattr(sizing, "shuffle_partitions", lambda *a, **k: 5)
    rng = np.random.RandomState(41)
    custkeys = rng.randint(0, 60, 400)
    prices = (rng.randint(1, 10_000_000, 400) / 100.0).round(2)
    out = relational.q_gini_revenue(write(tmp_path / "bf", custkeys, prices))

    cents = np.round(prices * 100).astype(np.int64)
    rev = {}
    for c, v in zip(custkeys, cents):
        rev[int(c)] = rev.get(int(c), 0) + int(v)
    v = sorted(rev.values())
    n, t = len(v), sum(v)
    s = sum((i + 1) * x for i, x in enumerate(v))
    want_gini = (10**9 * (2 * s - (n + 1) * t)) // (n * t)
    assert list(out.itertuples(index=False)) == [(n, t, want_gini)]
    for c in out.columns:
        assert out[c].dtype == np.int64
