"""End-to-end training-data pipeline: raw corpus -> clean deduplicated text.

The composition a web-scale pretraining-data job runs, expressed as one lazy
Dataset chain (every stage from this repo's operator inventory):

    read corpus parquet (pruned columns)
      -> PdfExtractor actor pool           (extraction, skew-routed)
      -> quality gate                      (vectorized: error-free, min tokens)
      -> LangId actor pool                 (language tag)
      -> exact dedup                       (hash shuffle, keep min url)
      [-> MinHash near-dup sweep]          (optional second pass)
      -> clean corpus out / summary

The deterministic prefix (extract -> quality -> exact dedup) is oracle-checked
against DuckDB over the golden fixture table (`pipeline_clean_corpus` in
__ray_entry__), because extracted text == golden text per url.
"""
from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MIN_TOKENS = 5


def _extracted(sf_dir: str):
    import ray

    from ..sources.fixtures import ensure_corpus_parquet
    from .extraction import extract_dataset, read_corpus

    path = ensure_corpus_parquet(sf_dir)
    # this pipeline chains several actor pools in ONE execution; every pool
    # must use autoscaling with min=1 or their eager minimum allocations can
    # add up to the whole node and starve the read/shuffle stages
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return extract_dataset(
        read_corpus(path),
        concurrency=(1, max(1, cpus // 2)),
        huge_threshold=None,
    )


def _quality_gate(t: pa.Table) -> pa.Table:
    """Keep documents with extractable text of at least MIN_TOKENS tokens.

    Deliberately text-based (not error-based): documents with recorded
    warnings but good text (e.g. repaired /Length) stay in, failed documents
    have empty text and drop out — and the criterion stays SQL-expressible
    for the oracle."""
    import re

    texts = t.column("text").to_pylist()
    word = re.compile(r"\S+")
    keep = [s != "" and len(word.findall(s)) >= MIN_TOKENS for s in texts]
    return t.filter(pa.array(keep)).select(["url", "text"])


def _hash_text(t: pa.Table) -> pa.Table:
    hashes = [
        hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.column("text").to_pylist()
    ]
    return pa.table(
        {
            "text_hash": pa.array(hashes),
            "url": t.column("url"),
            "text": t.column("text"),
        }
    )


def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values("url").head(1)


def clean_corpus(sf_dir: str, near_dedup: bool = False):
    """Run the full cleaning chain; returns the clean (url, text) frame."""
    ds = _extracted(sf_dir)
    ds = ds.map_batches(_quality_gate, batch_format="pyarrow")

    from ..stages.extract_stage import EXTRACT_SCHEMA  # noqa: F401  (doc link)
    from .textops import LangId

    class LangIdOnDoc(LangId):
        def __call__(self, t: pa.Table) -> pa.Table:  # (url, text) schema
            preds = [self.classify(s) for s in t.column("text").to_pylist()]
            return t.append_column("lang_pred", pa.array(preds))

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = ds.map_batches(
        LangIdOnDoc, batch_format="pyarrow", concurrency=(1, max(1, cpus // 4))
    )

    deduped = (
        ds.map_batches(
            lambda t: _hash_text(t).append_column("lang_pred", t.column("lang_pred")),
            batch_format="pyarrow",
        )
        .groupby("text_hash")
        .map_groups(_keep_first, batch_format="pandas")
    )
    df = deduped.to_pandas()

    if near_dedup:
        df = _near_dedup(df)
    return df.sort_values("url").reset_index(drop=True)


def _near_dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Second-pass MinHash near-dup sweep over the exact-deduped survivors."""
    from .textops import MinHasher, _shingles

    hasher = MinHasher()
    t = pa.table({"doc_id": list(range(len(df))), "text": df["text"].tolist()})
    buckets = hasher(t).to_pandas()
    drop = set()
    for _, g in buckets.groupby(["band", "band_key"]):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            if ids[i] in drop:
                continue
            for j in range(i + 1, len(ids)):
                if ids[j] in drop:
                    continue
                sa = _shingles(df["text"].iloc[ids[i]])
                sb = _shingles(df["text"].iloc[ids[j]])
                union = len(sa | sb)
                if union and len(sa & sb) / union >= 0.8:
                    drop.add(ids[j])  # keep the lexicographically-first url
    return df[~df.index.isin(drop)]


def pipeline_summary(sf_dir: str):
    """Stage-by-stage counts — the oracle-checked deterministic prefix."""
    clean = clean_corpus(sf_dir, near_dedup=False)
    from ..sources.fixtures import ensure_corpus_parquet
    import pyarrow.parquet as pq

    path = ensure_corpus_parquet(sf_dir)
    n_input = pq.read_metadata(path).num_rows
    return pd.DataFrame(
        {
            "n_input": [n_input],
            "n_clean": [len(clean)],
        }
    )
