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


# shared across the pipeline modules since round 5 (moved, not changed):
from .staging import stage_checkpoint as _stage_checkpoint  # noqa: F401


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


def _hash_url_only(t: pa.Table) -> pa.Table:
    """Dedup shuffle rows: (text_hash, url) ONLY — text never enters the
    exchange."""
    hashes = [
        hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.column("text").to_pylist()
    ]
    return pa.table({"text_hash": pa.array(hashes), "url": t.column("url")})


def clean_corpus(
    sf_dir: str,
    near_dedup: bool = False,
    out_dir: str = None,
    resume: bool = True,
):
    """Run the full cleaning chain.

    Without ``out_dir`` (driver-contract form): returns the clean
    (url, text) frame — appropriate only because the post-dedup slice is
    small at test scale.  With ``out_dir`` (the PRODUCTION exit): the clean
    corpus is written straight to parquet from the workers — no rows ever
    reach the driver — and a stage-count summary dict comes back; a
    ``_SUCCESS`` marker makes a rerun a no-op (resume-after-write).

    Exact dedup is hash-shuffle on (text_hash, url) rows + a semi-join of
    the winning urls back onto the corpus (url is the pipeline-wide
    partition key, reused from ingest).  The near-dup second pass is the
    distributed MinHash machinery from `textops` keyed by url; only the
    verified dup pairs (tiny) reach the driver, which resolves the greedy
    keep-first-url drop set (broadcast back for the final filter).

    Inter-stage handoffs are PARQUET STAGE CHECKPOINTS (never an
    object-store materialize of the text-bearing corpus): the
    extracted+gated corpus lands in ``<stage>/gated/`` once and every
    consumer — dedup winner pass, survivor join, near-dup sweep, final
    write — streams from the files; the deduped survivors land in
    ``<stage>/dedup/`` the same way.  With ``out_dir`` the checkpoints
    live in ``out_dir/_stage`` and a crashed run resumes at the last
    finished boundary; without it they live in a throwaway /tmp dir."""
    import json
    import os
    import shutil
    import tempfile

    if out_dir is not None:
        marker = os.path.join(out_dir, "_SUCCESS")
        if resume and os.path.exists(marker):
            with open(marker) as fh:
                counts = json.load(fh)
            counts["resumed"] = True
            return counts
        os.makedirs(out_dir, exist_ok=True)
        stage_root = os.path.join(out_dir, "_stage")
        stage_resume = resume
    else:
        stage_root = tempfile.mkdtemp(prefix="pdfray_clean_stage_")
        stage_resume = False

    try:
        return _clean_corpus_inner(
            sf_dir, near_dedup, out_dir, stage_root, stage_resume, json, os
        )
    finally:
        if out_dir is None:
            shutil.rmtree(stage_root, ignore_errors=True)


def _clean_corpus_inner(sf_dir, near_dedup, out_dir, stage_root, stage_resume, json, os):
    import ray
    from ray.data.aggregate import Min

    from ..stages.extract_stage import EXTRACT_SCHEMA  # noqa: F401  (doc link)
    from .textops import LangId

    class LangIdOnDoc(LangId):
        def __call__(self, t: pa.Table) -> pa.Table:  # (url, text) schema
            preds = [self.classify(s) for s in t.column("text").to_pylist()]
            return t.append_column("lang_pred", pa.array(preds))

    def gated_factory():
        cpus = int(ray.cluster_resources().get("CPU", 8))
        return (
            _extracted(sf_dir)
            .map_batches(_quality_gate, batch_format="pyarrow")
            .map_batches(
                LangIdOnDoc,
                batch_format="pyarrow",
                concurrency=(1, max(1, cpus // 4)),
            )
        )

    # ---- stage checkpoint 1: extracted + quality-gated + lang-tagged corpus
    gated = _stage_checkpoint(
        gated_factory, os.path.join(stage_root, "gated"), resume=stage_resume
    )
    from .sizing import shuffle_partitions

    n_rows = gated.count()  # parquet-footer metadata, no scan
    n_parts = shuffle_partitions(n_rows, min_rows=50_000)

    def dedup_factory():
        # parquet-read blocks are nonempty, satisfying the hash-join
        # first-block-schema quirk on both sides (see CLAUDE.md)
        winners = (
            gated.map_batches(_hash_url_only, batch_format="pyarrow")
            .groupby("text_hash")
            .aggregate(Min("url", alias_name="url"))
            .select_columns(["url"])
            .repartition(n_parts)
        )
        return gated.join(
            winners, join_type="inner", num_partitions=n_parts, on=("url",)
        )

    # ---- stage checkpoint 2: exact-deduped survivors
    survivors = _stage_checkpoint(
        dedup_factory, os.path.join(stage_root, "dedup"), resume=stage_resume
    )
    n_dedup = survivors.count()
    drop = _near_dup_drop_set(survivors) if near_dedup else set()

    if out_dir is not None:
        final = survivors
        if drop:
            drop_ref = ray.put(pa.array(sorted(drop)))

            class DropNearDups:
                def __init__(self):
                    self.drop = ray.get(drop_ref)

                def __call__(self, t: pa.Table) -> pa.Table:
                    return t.filter(
                        pc.invert(pc.is_in(t.column("url"), value_set=self.drop))
                    )

            final = survivors.map_batches(
                DropNearDups, batch_format="pyarrow", concurrency=(1, 2)
            )
        data_dir = os.path.join(out_dir, "data")
        if os.path.isdir(data_dir):  # stale partial output from a failed run
            import shutil

            shutil.rmtree(data_dir)
        final.write_parquet(data_dir)
        counts = {
            "n_gated": int(n_rows),  # rows surviving the quality gate
            "n_after_exact_dedup": int(n_dedup),
            "n_near_dup_dropped": len(drop),
            "n_clean": int(n_dedup) - len(drop),
            "out_dir": out_dir,
            "resumed": False,
        }
        with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
            json.dump(counts, fh)
        # stage checkpoints are crash-resume artifacts only — _SUCCESS now
        # short-circuits reruns, so drop the duplicate bytes
        import shutil

        shutil.rmtree(stage_root, ignore_errors=True)
        return counts

    df = survivors.to_pandas()
    if drop:
        df = df[~df["url"].isin(drop)]
    return df.sort_values("url").reset_index(drop=True)


def _near_dup_drop_set(survivors) -> set:
    """Distributed MinHash sweep over the survivors; returns urls to drop.

    Verified pairs come back from the `textops` machinery (bucketed LSH +
    exact-Jaccard verify in map_batches); the greedy keep-first resolution
    runs on the driver over just those pairs: scanning pairs in url order,
    drop the second url unless either side is already dropped — the same
    keep-lexicographically-first outcome as a per-bucket greedy sweep."""
    from .textops import MinHasher, ShingleSetHasher, _candidate_pairs, _verify_pairs

    buckets = survivors.map_batches(
        MinHasher,
        fn_constructor_kwargs={"id_col": "url"},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    pairs = _candidate_pairs(buckets, "url")
    verified = _verify_pairs(
        survivors, pairs, lambda: ShingleSetHasher("url"), 0.8, "url"
    )
    drop: set = set()
    for a, b in sorted(zip(verified["doc_a"], verified["doc_b"])):
        if a not in drop and b not in drop:
            drop.add(b)
    return drop


def pipeline_summary(sf_dir: str):
    """Stage-by-stage counts — the oracle-checked deterministic prefix."""
    clean = clean_corpus(sf_dir, near_dedup=False)
    from ..sources.fixtures import corpus_files, ensure_corpus_parquet
    import pyarrow.parquet as pq

    path = ensure_corpus_parquet(sf_dir)
    n_input = sum(pq.read_metadata(f).num_rows for f in corpus_files(path))
    return pd.DataFrame(
        {
            "n_input": [n_input],
            "n_clean": [len(clean)],
        }
    )


def pipeline_training_mix(sf_dir: str, out_dir: str = None, resume: bool = True):
    """Flagship corpus-shaping composition over the documents table: the
    stage order a web-scale pretraining mix actually runs.

        per-lang counts  -> temperature keep-thresholds   (combiner + tiny driver table)
        stream           -> temperature filter            (pure map, no shuffle)
                         -> per-domain cap                (bounded top-N per source)
                         -> decontamination drop          (benchmark grams broadcast)
                         -> word-set fingerprint dedup    (keep min doc per fp)
                         -> seeded shard assignment       (per-shard rank groupby)

    Every inter-stage handoff is either a broadcast of a BOUNDED side
    (thresholds: |langs|; cap winners: cap x |sources|; bench grams: eval-
    set-sized; dedup winners: subset of cap winners) or a shuffle of
    narrow columns — text never crosses an exchange.  The temperature-
    filtered stream lands in ONE parquet stage checkpoint and the three
    downstream consumers (cap ids, dedup winners, shard assignment) each
    stream from the files — one corpus scan total instead of three, and
    with ``out_dir`` a crashed run resumes past the filter.  The whole
    chain has a single chained-CTE DuckDB oracle."""
    import json
    import os
    import shutil
    import tempfile

    import numpy as np
    import ray
    from ray.data.aggregate import Count, Min

    if out_dir is not None:
        marker = os.path.join(out_dir, "_SUCCESS")
        if resume and os.path.exists(marker):
            with open(marker) as fh:
                counts = json.load(fh)
            counts["resumed"] = True
            return counts
        os.makedirs(out_dir, exist_ok=True)
        stage_root = os.path.join(out_dir, "_stage")
        stage_resume = resume
    else:
        stage_root = tempfile.mkdtemp(prefix="pdfray_mix_stage_")
        stage_resume = False

    from .textops import (
        DECONTAM_BENCH_MOD,
        DOMAIN_CAP,
        _gram_hashes,
        _read_documents,
        _wordset_fingerprint,
        N_TRAIN_SHARDS,
        collect_bench_gram_hashes,
        domain_cap_prune,
        domain_cap_rank,
        shard_assignments,
        temperature_filter,
        temperature_thresholds,
        warm_factory,
    )

    # ---- stage 1: temperature thresholds (the SAME helper as
    # t_temperature_sample — the chained-CTE oracle asserts stage-for-stage
    # identity, so the stages are shared, not copied)
    thresholds = temperature_thresholds(sf_dir)

    # one corpus scan: the filtered stream checkpoints to parquet and every
    # downstream consumer streams from the files (see _stage_checkpoint)
    tempered = _stage_checkpoint(
        lambda: _read_documents(
            sf_dir, ("doc_id", "text", "lang", "source", "n_chars")
        ).map_batches(
            lambda t: temperature_filter(t, thresholds), batch_format="pyarrow"
        ),
        os.path.join(stage_root, "tempered"),
        resume=stage_resume,
        allow_empty=True,
    )
    if tempered is None:  # empty corpus: typed empty mix
        import pandas as pd

        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype=object),
                "source": pd.Series([], dtype=object),
                "shard": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
            }
        )
        if out_dir is not None:
            counts = {"n_survivors": 0, "out_dir": out_dir}
            with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
                json.dump(counts, fh)
            shutil.rmtree(stage_root, ignore_errors=True)
            return counts
        shutil.rmtree(stage_root, ignore_errors=True)
        return empty

    def stream():
        return tempered

    # ---- stage 2: per-domain cap winners (bounded: cap x |sources| ids;
    # same prune/rank helpers as t_domain_cap)
    cap_ids = (
        stream()
        .map_batches(
            lambda t: t.select(["doc_id", "source", "n_chars"]),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda df: domain_cap_prune(df, DOMAIN_CAP), batch_format="pandas"
        )
        .groupby("source")
        .map_groups(
            lambda g: domain_cap_rank(g, DOMAIN_CAP), batch_format="pandas"
        )
        .to_pandas()["doc_id"]
        .to_numpy()
    )
    cap_set = np.sort(cap_ids.astype(np.int64))

    # ---- stage 3: benchmark gram hashes (same helper as t_decontaminate)
    bench = collect_bench_gram_hashes(sf_dir)
    bench_ref = ray.put((cap_set, bench))

    def survivors_factory():
        cap_arr, bench_arr = ray.get(bench_ref)

        def keep(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = np.isin(ids, cap_arr, assume_unique=False)
            mask &= ids % DECONTAM_BENCH_MOD != 0  # never train on the eval set
            t = t.filter(pa.array(mask))
            texts = t.column("text").to_pylist()
            clean = [
                not np.isin(_gram_hashes(s), bench_arr, assume_unique=True).any()
                for s in texts
            ]
            return t.filter(pa.array(clean, pa.bool_()))

        return keep

    surv = lambda: stream().map_batches(
        warm_factory(("training_mix", bench_ref.hex()), survivors_factory),
        batch_format="pyarrow",
    )

    # ---- stage 4: word-set fingerprint dedup (winners bounded by stage 2)
    def fp_rows(t: pa.Table) -> pa.Table:
        fps = [_wordset_fingerprint(s) for s in t.column("text").to_pylist()]
        return pa.table(
            {"f": pa.array(fps, pa.string()), "doc_id": t.column("doc_id")}
        )

    winners = np.sort(
        surv()
        .map_batches(fp_rows, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )

    # ---- stage 5: seeded shard assignment + per-shard rank
    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(ids, winners)))
        keys, shards = shard_assignments(t.column("doc_id").to_pylist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "shard": pa.array(shards, pa.int64()),
                "k": pa.array(keys, pa.string()),
            }
        )

    def pos_rank(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(["k", "doc_id"]).reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g[["doc_id", "lang", "source", "shard", "pos"]]

    ranked = (
        surv()
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pos_rank, batch_format="pandas")
    )
    if out_dir is not None:
        # PRODUCTION exit (same contract as clean_corpus): survivors land
        # hive-partitioned by shard via the workers, only counts cross the
        # driver, and the _SUCCESS marker makes a rerun a no-op.
        data_dir = os.path.join(out_dir, "data")
        if os.path.isdir(data_dir):  # stale partial output from a failed
            # run: write_parquet appends uniquely-named files, so without
            # this a rerun would double every surviving doc (clean_corpus
            # has the same guard)
            import shutil

            shutil.rmtree(data_dir)
        ranked.write_parquet(data_dir, partition_cols=["shard"])
        import pyarrow.dataset as pads

        n_rows = pads.dataset(data_dir, partitioning="hive").count_rows()
        counts = {"n_survivors": int(n_rows), "out_dir": out_dir}
        with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
            json.dump(counts, fh)
        # the stage checkpoint is a crash-resume artifact only — once
        # _SUCCESS short-circuits reruns it is dead weight
        shutil.rmtree(stage_root, ignore_errors=True)
        return counts
    out = ranked.to_pandas()
    shutil.rmtree(stage_root, ignore_errors=True)  # throwaway /tmp stage
    return out.sort_values("doc_id").reset_index(drop=True)


LINE_STRIP = " \t\r"  # normalization pinned on BOTH engine and oracle sides


def pipeline_line_dedup(sf_dir: str, stage_dir: str = None, extracted=None):
    """Line-level global dedup over REAL extraction output (the
    CCNet/RefinedWeb boilerplate-removal shape: repeated header/footer
    lines across a template-heavy crawl are owned by exactly one document).

    Per document: total non-empty lines, distinct lines, and how many of
    its distinct lines it OWNS (owner = minimum url among all documents
    containing that exact normalized line — first-seen-wins).  Dataflow:
    extraction -> one explode pass to (line-hash, url, multiplicity) rows
    (text dropped in the worker; hashes keep the exchange narrow — the
    oracle joins line STRINGS, so a collision fails the compare instead of
    hiding) -> groupby(line) Min(url) winners -> hash join back ->
    combiner-reduced per-url counts.  The 3-exchange plan is deliberate:
    per-line map_groups was measured 2-4x worse on the same shape
    (t_dup_spans docstring).

    The exploded line table — O(corpus line count) rows, reused by BOTH
    the winner pass and the join probe — is a PARQUET STAGE CHECKPOINT,
    never an object-store materialize: each consumer streams a fresh read
    of the files, and with an explicit ``stage_dir`` a crashed run resumes
    at the boundary (default: throwaway /tmp dir, removed on exit).  Its
    parquet-footer row count then sizes the shuffle/join partitions
    data-proportionally (`sizing.shuffle_partitions`).

    ``extracted`` overrides the input with a caller-built (url, text)
    Dataset — used by ``bench.py --scaling-shuffle`` to feed a
    corpus-repeated input so the exchanges carry measurement-scale bytes
    instead of the sf-dir's fixed-cost floor."""
    import os
    import shutil
    import tempfile

    import ray.data  # noqa: F401  (ensures Dataset API importable)
    from ray.data.aggregate import Min, Sum

    from .sizing import shuffle_partitions

    if extracted is None:
        extracted = _extracted(sf_dir)
    extracted = extracted.select_columns(["url", "text"])

    def explode(t: pa.Table) -> pa.Table:
        urls, lhs, mults = [], [], []
        for url, text in zip(
            t.column("url").to_pylist(), t.column("text").to_pylist()
        ):
            counts: dict = {}
            for raw in (text or "").split("\n"):
                line = raw.strip(LINE_STRIP)
                if line:
                    counts[line] = counts.get(line, 0) + 1
            for line, mult in counts.items():
                urls.append(url)
                lhs.append(
                    int.from_bytes(
                        hashlib.md5(line.encode("utf-8")).digest()[:8], "big"
                    )
                    >> 2  # non-negative int64 join key
                )
                mults.append(mult)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lh": pa.array(lhs, pa.int64()),
                "mult": pa.array(mults, pa.int64()),
            }
        )

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_linededup_") if own_stage else stage_dir
    try:
        return _line_dedup_inner(
            extracted, explode, root, not own_stage, shuffle_partitions, Min, Sum
        )
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def _line_dedup_inner(extracted, explode, root, resume, shuffle_partitions, Min, Sum):
    import os

    rows = _stage_checkpoint(
        lambda: extracted.map_batches(explode, batch_format="pyarrow"),
        os.path.join(root, "lines"),
        resume=resume,
        allow_empty=True,
    )
    if rows is None:  # no document produced a single non-empty line
        return pd.DataFrame(
            {
                "url": pd.Series(dtype="object"),
                "n_lines": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
                "n_kept": pd.Series(dtype="int64"),
            }
        )
    # footer-count partition sizing; checkpoint read-back blocks are
    # nonempty (write_parquet skips empty blocks), so the hash-join
    # first-block-schema quirk cannot trigger on either side
    n_parts = shuffle_partitions(rows.count())
    winners = (
        rows.groupby("lh")
        .aggregate(Min("url", alias_name="owner"))
        .repartition(n_parts)
    )

    def combine(t: pa.Table) -> pa.Table:
        import numpy as np

        df = t.to_pandas()
        df["kept"] = (df["url"] == df["owner"]).astype("int64")
        df["one"] = np.int64(1)
        g = df.groupby("url", as_index=False)[["mult", "one", "kept"]].sum()
        return pa.table(
            {
                "url": pa.array(g["url"], pa.string()),
                "n_lines": pa.array(g["mult"].astype("int64"), pa.int64()),
                "n_distinct": pa.array(g["one"].astype("int64"), pa.int64()),
                "n_kept": pa.array(g["kept"].astype("int64"), pa.int64()),
            }
        )

    out = (
        rows.join(winners, join_type="inner", num_partitions=n_parts, on=("lh",))
        .map_batches(combine, batch_format="pyarrow")
        .groupby("url")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("n_kept", alias_name="n_kept"),
        )
        .to_pandas()
    )
    return out.sort_values("url").reset_index(drop=True)
