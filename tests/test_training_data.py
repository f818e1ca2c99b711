"""End-to-end training-data cleaning pipeline."""
import pyarrow.parquet as pq


def test_clean_corpus_stages(ray_session, tmp_path, monkeypatch):
    from pdfray.pipelines import training_data
    from pdfray.sources import fixtures

    # point the pipeline at a small deterministic corpus
    path = str(tmp_path / "documents_pdf.parquet")
    pq.write_table(fixtures.corpus_table(30, n_huge=1, n_broken=2), path)
    monkeypatch.setattr(
        "pdfray.sources.fixtures.ensure_corpus_parquet", lambda sf_dir: path
    )

    clean = training_data.clean_corpus("ignored", near_dedup=False)
    golden = pq.read_table(path).to_pandas()
    n_broken = golden["text"].eq("").sum()
    assert 0 < len(clean) <= len(golden) - n_broken
    # cleaned rows keep golden text and carry a language prediction
    merged = clean.merge(golden[["url", "text"]], on="url", suffixes=("", "_want"))
    assert (merged["text"] == merged["text_want"]).all()
    assert set(clean["lang_pred"]) <= {"en", "de", "fr", "es"}
    # exact dedup: no repeated text survives
    assert clean["text"].is_unique

    near = training_data.clean_corpus("ignored", near_dedup=True)
    assert len(near) <= len(clean)


def test_clean_corpus_production_write_and_resume(ray_session, tmp_path, monkeypatch):
    """out_dir= is the production exit: rows go worker->parquet, the driver
    gets counts; a rerun resumes off the _SUCCESS marker without recompute."""
    from pdfray.pipelines import training_data
    from pdfray.sources import fixtures

    path = str(tmp_path / "documents_pdf.parquet")
    pq.write_table(fixtures.corpus_table(30, n_huge=1, n_broken=2), path)
    monkeypatch.setattr(
        "pdfray.sources.fixtures.ensure_corpus_parquet", lambda sf_dir: path
    )

    reference = training_data.clean_corpus("ignored", near_dedup=True)
    out = str(tmp_path / "clean_out")
    counts = training_data.clean_corpus("ignored", near_dedup=True, out_dir=out)
    assert counts["resumed"] is False
    assert counts["n_clean"] == len(reference)
    assert counts["n_after_exact_dedup"] - counts["n_near_dup_dropped"] == counts["n_clean"]
    written = pq.read_table(f"{out}/data").to_pandas()
    assert sorted(written["url"]) == sorted(reference["url"])

    # resume: marker short-circuits the whole pipeline
    again = training_data.clean_corpus("ignored", near_dedup=True, out_dir=out)
    assert again["resumed"] is True
    assert again["n_clean"] == counts["n_clean"]
    # resume=False forces a rewrite with identical results
    forced = training_data.clean_corpus(
        "ignored", near_dedup=True, out_dir=out, resume=False
    )
    assert forced["resumed"] is False and forced["n_clean"] == counts["n_clean"]


def test_clean_corpus_survives_fully_filtered_leading_block(
    ray_session, tmp_path, monkeypatch
):
    """A corpus whose FIRST shard is entirely broken documents: the quality
    gate empties that block, and Ray's hash join would lose the side's
    schema without the compaction workaround (CLAUDE.md quirks)."""
    import pyarrow as pa

    from pdfray.sources import fixtures

    full = fixtures.corpus_table(12, n_huge=0, n_broken=6)
    is_broken = pa.compute.match_substring(full["url"], "/broken/")
    broken = full.filter(is_broken)
    good = full.filter(pa.compute.invert(is_broken))
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(broken, str(d / "part-00000.parquet"))  # leading shard
    pq.write_table(good, str(d / "part-00001.parquet"))
    monkeypatch.setattr(
        "pdfray.sources.fixtures.ensure_corpus_parquet", lambda sf_dir: str(d)
    )
    from pdfray.pipelines import training_data

    clean = training_data.clean_corpus("ignored", near_dedup=True)
    assert 0 < len(clean) <= good.num_rows
    assert clean["text"].is_unique


def test_training_mix_stage_invariants(ray_session):
    """Every stage's contract holds on the real sf0.001 table: survivors
    respect the temperature keep-rule, the per-source cap, the benchmark
    exclusion, fingerprint uniqueness, and dense per-shard positions."""
    import hashlib

    import numpy as np
    import pandas as pd

    from pdfray.pipelines.textops import (
        DECONTAM_BENCH_MOD,
        DOMAIN_CAP,
        N_TRAIN_SHARDS,
        _shard_key,
        _wordset_fingerprint,
    )
    from pdfray.pipelines.training_data import pipeline_training_mix

    sf = "/root/testdata/sf0.001"
    out = pipeline_training_mix(sf)
    assert len(out) > 0
    docs = pd.read_parquet(f"{sf}/documents.parquet").set_index("doc_id")

    # benchmark docs never survive
    assert (out["doc_id"] % DECONTAM_BENCH_MOD != 0).all()
    # per-source cap
    assert out.groupby("source")["doc_id"].count().max() <= DOMAIN_CAP
    # word-set fingerprints unique among survivors (dedup held)
    fps = [_wordset_fingerprint(docs.loc[i, "text"]) for i in out["doc_id"]]
    assert len(set(fps)) == len(fps)
    # shard assignment and dense positions
    for shard, g in out.groupby("shard"):
        assert 0 <= shard < N_TRAIN_SHARDS
        assert sorted(g["pos"]) == list(range(len(g)))
        keys = [_shard_key(i) for i in g.sort_values("pos")["doc_id"]]
        assert keys == sorted(keys)
    # determinism
    pd.testing.assert_frame_equal(out, pipeline_training_mix(sf))


def test_line_dedup_ownership_recompute(ray_session):
    """Independent recompute from the GOLDEN text (the engine path goes
    through real extraction): per-url counts and the one-owner-per-line
    invariant."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from pdfray.pipelines.training_data import LINE_STRIP, pipeline_line_dedup
    from pdfray.sources.fixtures import ensure_corpus_parquet

    sf = "/root/testdata/sf0.001"
    out = pipeline_line_dedup(sf).set_index("url")

    path = ensure_corpus_parquet(sf)
    gold = pd.concat(
        [pq.read_table(f, columns=["url", "text"]).to_pandas()
         for f in sorted(glob.glob(f"{path}/*.parquet"))]
    )
    per_doc = {}
    owner = {}
    for url, text in sorted(zip(gold["url"], gold["text"])):
        counts = {}
        for raw in (text or "").split("\n"):
            line = raw.strip(LINE_STRIP)
            if line:
                counts[line] = counts.get(line, 0) + 1
        if counts:
            per_doc[url] = counts
            for line in counts:
                owner.setdefault(line, url)  # urls visited in sorted order

    assert set(out.index) == set(per_doc)
    total_kept = 0
    for url, counts in per_doc.items():
        assert out.loc[url, "n_lines"] == sum(counts.values())
        assert out.loc[url, "n_distinct"] == len(counts)
        kept = sum(1 for line in counts if owner[line] == url)
        assert out.loc[url, "n_kept"] == kept
        total_kept += kept
    # every distinct line corpus-wide is owned exactly once
    assert total_kept == len(owner)
    assert (out["n_kept"] <= out["n_distinct"]).all()
    assert (out["n_distinct"] <= out["n_lines"]).all()


def test_training_mix_out_dir_write_and_resume(ray_session, tmp_path):
    import glob
    import json

    import pandas as pd
    import pyarrow.dataset as pads

    from pdfray.pipelines.training_data import pipeline_training_mix

    sf = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "mix")
    counts = pipeline_training_mix(sf, out_dir=out_dir)
    assert counts["n_survivors"] > 0 and "resumed" not in counts
    # written layout matches the driver-contract result
    want = pipeline_training_mix(sf)
    got = (
        pads.dataset(f"{out_dir}/data", partitioning="hive")
        .to_table()
        .to_pandas()
    )
    got["shard"] = got["shard"].astype("int64")  # hive col comes back string
    got = got[want.columns].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(glob.glob(f"{out_dir}/data/shard=*")) == want["shard"].nunique()
    # resume: marker short-circuits the rerun
    again = pipeline_training_mix(sf, out_dir=out_dir)
    assert again["resumed"] is True and again["n_survivors"] == counts["n_survivors"]


def test_out_dir_paths_never_materialize_text(ray_session, tmp_path, monkeypatch):
    """The production exits hand stages off through PARQUET checkpoints:
    no dataset whose schema carries the text/html payload may be
    object-store materialized anywhere in either flagship composition."""
    import ray.data as rd

    from pdfray.pipelines import training_data
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

    training_data.clean_corpus(
        "ignored", near_dedup=True, out_dir=str(tmp_path / "clean_out")
    )
    training_data.pipeline_training_mix(
        "/root/testdata/sf0.001", out_dir=str(tmp_path / "mix_out")
    )
    offenders = [s for s in seen_schemas if {"text", "html"} & s]
    assert offenders == [], offenders


def test_clean_corpus_crash_resumes_at_stage_boundary(
    ray_session, tmp_path, monkeypatch
):
    """A crash AFTER the gated-corpus checkpoint but before dedup finishes
    must resume without re-running extraction: the gated stage files stay
    byte-for-byte untouched on the retry and the final output is correct."""
    import os

    from pdfray.pipelines import training_data
    from pdfray.sources import fixtures

    path = str(tmp_path / "documents_pdf.parquet")
    pq.write_table(fixtures.corpus_table(30, n_huge=1, n_broken=2), path)
    monkeypatch.setattr(
        "pdfray.sources.fixtures.ensure_corpus_parquet", lambda sf_dir: path
    )
    reference = training_data.clean_corpus("ignored", near_dedup=False)

    out = str(tmp_path / "clean_out")
    real = training_data._hash_url_only

    def boom(t):
        raise RuntimeError("injected crash between stage checkpoints")

    monkeypatch.setattr(training_data, "_hash_url_only", boom)
    import pytest as _pytest

    with _pytest.raises(Exception, match="injected crash"):
        training_data.clean_corpus("ignored", near_dedup=False, out_dir=out)
    gated_dir = os.path.join(out, "_stage", "gated")
    assert os.path.exists(os.path.join(gated_dir, "_DONE"))

    # retry: the finished gated stage must resume off its _DONE marker —
    # extraction is never re-entered (it would blow up if it were)
    monkeypatch.setattr(training_data, "_hash_url_only", real)

    def no_reextract(sf_dir):
        raise AssertionError("extraction re-ran despite a finished checkpoint")

    monkeypatch.setattr(training_data, "_extracted", no_reextract)
    counts = training_data.clean_corpus("ignored", near_dedup=False, out_dir=out)
    assert counts["n_clean"] == len(reference)
    written = pq.read_table(f"{out}/data").to_pandas()
    assert sorted(written["url"]) == sorted(reference["url"])
    # success removed the now-redundant stage checkpoints
    assert not os.path.isdir(os.path.join(out, "_stage"))
