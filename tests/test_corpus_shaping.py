"""Corpus-shaping operators: stratified sampling, sequence packing, exact
distributed quantiles.  Property tests beyond the DuckDB oracles: sampling
determinism/rates, packing stream invariants, histogram-quantiles vs a
direct numpy recomputation.
"""
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfray.pipelines.textops import (
    PACK_BUCKET,
    PACK_CAPACITY,
    SAMPLE_THRESHOLDS,
    t_length_quantiles,
    t_pack_sequences,
    t_stratified_sample,
)


@pytest.fixture(scope="module")
def shaped_dir(ray_session, tmp_path_factory):
    rng = np.random.RandomState(11)
    n = 1200
    langs = np.array(["en", "de", "fr", "es"])[rng.randint(0, 4, n)]
    texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 40))) for _ in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(["crawl"] * n),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("shaped")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_stratified_sample_deterministic_and_rate(shaped_dir):
    a = t_stratified_sample(shaped_dir)
    b = t_stratified_sample(shaped_dir)
    pd.testing.assert_frame_equal(a, b)  # retry-stable: no RNG state
    # per-language keep rate tracks the hex threshold (binomial tolerance)
    docs = pq.read_table(f"{shaped_dir}/documents.parquet").to_pandas()
    for lang, thresh in SAMPLE_THRESHOLDS.items():
        n_lang = (docs.lang == lang).sum()
        rate = int(thresh, 16) / 65536
        got = (a.lang == lang).sum()
        assert abs(got - rate * n_lang) < 4 * np.sqrt(n_lang * rate * (1 - rate)) + 2
    # membership is exactly the md5-prefix rule
    for _, r in a.head(20).iterrows():
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4]
        assert h < SAMPLE_THRESHOLDS[r.lang]


def test_pack_sequences_stream_invariants(shaped_dir):
    out = t_pack_sequences(shaped_dir)
    docs = pq.read_table(f"{shaped_dir}/documents.parquet").to_pandas()
    assert len(out) == len(docs)
    for bucket, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        off = g["n_tokens"].to_numpy(np.int64).cumsum() - g["n_tokens"].to_numpy(
            np.int64
        )
        assert (g["pack_id"].to_numpy() == off // PACK_CAPACITY).all()
        assert (g["pack_off"].to_numpy() == off % PACK_CAPACITY).all()
        assert (g["doc_id"].to_numpy() // PACK_BUCKET == bucket).all()
    # token counts agree with the \S+ rule
    sample = out.sample(30, random_state=0).merge(docs, on="doc_id")
    for _, r in sample.iterrows():
        assert r.n_tokens == len(r.text.split())


def test_length_quantiles_match_numpy_exact(shaped_dir):
    out = t_length_quantiles(shaped_dir).set_index("lang")
    docs = pq.read_table(f"{shaped_dir}/documents.parquet").to_pandas()
    for lang, g in docs.groupby("lang"):
        vals = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(vals)
        row = out.loc[lang]
        assert row.n_docs == n
        for p in (0.25, 0.5, 0.75, 0.9):
            # DuckDB quantile_disc: element at index ceil(p*n)-1
            assert row[f"p{int(p*100)}"] == vals[int(np.ceil(p * n)) - 1]


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    from pdfray.pipelines.textops import DECONTAM_N, t_decontaminate

    bench_text = " ".join(f"b{j}" for j in range(20))  # doc 0: benchmark
    contaminated = "x y z " + " ".join(f"b{j}" for j in range(DECONTAM_N)) + " tail"
    clean = " ".join(f"c{j}" for j in range(30))
    short = "only seven tokens here not even eight"[:38]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([bench_text, contaminated, clean, short]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([0] * 4, pa.int64()),
        }
    )
    d = tmp_path / "dc"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = t_decontaminate(str(d)).set_index("doc_id")
    assert bool(out.loc[0, "is_benchmark"]) and bool(out.loc[0, "contaminated"])
    assert bool(out.loc[1, "contaminated"])  # shares b0..b7 8-gram
    assert out.loc[1, "n_contaminated_grams"] == 1
    assert not bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])  # < 8 tokens: no grams
