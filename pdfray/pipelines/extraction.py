"""The flagship pipeline: Parquet corpus -> extracted text, at corpus scale.

Ray-Data-native expression of the reference's document-at-a-time extraction
(SURVEY.md §2.2, §4.2):

    read_parquet (prune columns)
      -> map_batches(add_ingest_meta)          stateless: n_bytes, partition_id
      -> map_batches(PdfExtractor A, ...)      actor pool: extract small docs,
                                               forward huge payloads
      -> map_batches(PdfExtractor B, ...)      dedicated pool: extract the
                                               forwarded huge docs
      -> write_parquet(partition_cols=[...])   resumable layout
    metrics: groupby(partition_id).aggregate   (the only shuffle, on small rows)

Scale notes (100 TB design):
* the input scan prunes to (url, html) only; n_bytes comes from
  `binary_length` on the already-loaded column, not a second read;
* partitioning key is hash(url) % P, chosen once and reused by the writer,
  the manifest, and the metrics rollup;
* skew routing is single-pass chained-passthrough: stage A costs only a byte
  length check for a huge document and forwards its payload through the
  object store (zero-copy block reference) to stage B's dedicated pool — no
  second input scan, no union, and a pathological document can only ever
  occupy a stage-B actor (north-rule skew mitigation);
* resume is per-partition-chunk: each chunk writes its own parquet directory
  and a manifest marker, a restarted run drops completed chunks at the read.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract_stage import PdfExtractor
from ..state import manifest as manifest_mod

DEFAULT_NUM_PARTITIONS = 64
# Documents above this size go to the dedicated skew pool.  4 MiB, not 1:
# multi-MB PDFs are usually image-heavy and parse FAST per byte (streams are
# skipped), so deferring them re-ships their payload through the object store
# for no protection; the pool is for the genuinely pathological tail whose
# parse time would stall a stage-A batch.
DEFAULT_HUGE_THRESHOLD = 4 << 20


def url_partition_ids(urls, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per url — vectorized (pandas siphash in C,
    fixed hash key), not a per-row Python loop; shared by the ingest stage,
    the fixture generator's golden column, and the resume manifest."""
    import pandas as pd

    if isinstance(urls, (pa.ChunkedArray, pa.Array)):
        urls = urls.to_numpy(zero_copy_only=False)
    else:
        urls = np.asarray(urls, dtype=object)
    h = pd.util.hash_array(urls.astype(object), categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def _url_partition_ids(urls: pa.ChunkedArray, num_partitions: int) -> pa.Array:
    return pa.array(url_partition_ids(urls, num_partitions), pa.int32())


def add_ingest_meta(num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Stateless ingest projection: n_bytes + partition_id columns."""

    def fn(batch: pa.Table) -> pa.Table:
        n_bytes = pc.cast(pc.binary_length(batch.column("html")), pa.int64())
        pids = _url_partition_ids(batch.column("url"), num_partitions)
        batch = batch.append_column("n_bytes", n_bytes)
        batch = batch.append_column("partition_id", pids)
        return batch

    return fn



def _task_cpus() -> float:
    """Per-task CPU share for the scan stages (read/ingest/extract).

    Target ~16-32 concurrent scan tasks on this node class: at small CPU
    allocations, half-cpu tasks backfill read/object-store gaps (measured
    ~35% faster at 8 slots); at >=32 slots halving again would run 64
    byte-scanning workers on ~16 physical cores and thrash shared caches
    (measured 2-3x SLOWER).  Full-cpu tasks are the norm on big nodes."""
    import ray

    override = os.environ.get("PDFRAY_TASK_CPUS")
    if override:
        return float(override)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return 0.5 if cpus < 32 else 1.0


def read_corpus(path, columns=("url", "html"), override_num_blocks=None):
    """Column-pruned corpus read; only what extraction needs leaves storage.

    Read tasks share the scan-stage CPU sizing (`_task_cpus`): on small
    allocations fractional slots let readers interleave with extraction
    instead of competing for whole cores (~2x end-to-end).  Task
    granularity comes from the sharded corpus layout (one task per file /
    row-group span); pass ``override_num_blocks`` only when reading a single
    monolithic file that would otherwise become one block."""
    import ray
    import ray.data as rd

    if override_num_blocks is None:
        # one block per input file when files outnumber CPUs: skips Ray's
        # SplitBlocks pass, whose finer-grained blocks cost ~30-50% of
        # end-to-end wall on the bench corpus; with few big files the
        # default splitting is still needed for parallelism
        if isinstance(path, (list, tuple)):
            n_files = len(path)
        elif isinstance(path, str) and os.path.isdir(path):
            n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        else:
            n_files = 1
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        if n_files >= cpus:
            override_num_blocks = n_files
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(
        path,
        columns=list(columns),
        ray_remote_args={"num_cpus": _task_cpus()},
        **kwargs,
    )


def open_corpus(path, input_format: str = "parquet"):
    """Format dispatch for the production entry points: 'parquet' (the
    default columnar layout), 'warc' (Common-Crawl segment files, incl.
    .warc.gz), or 'files' (loose-PDF directory crawl).  Every source
    yields the same (url, html) schema, so everything downstream —
    ingest meta, skew routing, manifest resume — is format-agnostic."""
    if input_format == "parquet":
        return read_corpus(path)
    if input_format == "warc":
        from ..sources.warc import read_warc

        return read_warc(path)
    if input_format == "files":
        from ..sources.readers import read_pdf_files

        return read_pdf_files(path)
    raise ValueError(f"unknown input_format {input_format!r}")


def extract_dataset(
    ds,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    huge_threshold="auto",
    batch_size: int = 64,
    concurrency=None,
    huge_concurrency=None,
    extractor_kwargs: Optional[dict] = None,
):
    """Wire the extraction stage(s) over a corpus Dataset.

    ``huge_threshold``: "auto" (default) uses DEFAULT_HUGE_THRESHOLD with a
    single-pool fallback on small nodes; ``None`` disables the dual-pool
    split; an explicit byte count always builds the dual pools.
    """
    # num_cpus matches the extract stage so Ray fuses ingest+extract into one
    # task (mismatched resource specs block fusion = an extra data-plane hop)
    ds = ds.map_batches(
        add_ingest_meta(num_partitions), batch_format="pyarrow", num_cpus=_task_cpus()
    )
    return _extract_prepared(
        ds,
        huge_threshold=huge_threshold,
        batch_size=batch_size,
        concurrency=concurrency,
        huge_concurrency=huge_concurrency,
        extractor_kwargs=extractor_kwargs,
    )


def partition_metrics(extracted):
    """Per-partition lineage/metrics rollup — the pipeline's only shuffle.

    Combiner pattern: each batch is pre-aggregated to one row per
    partition_id (arrow group_by inside map_batches), so the groupby
    shuffles at most |partitions| rows per block instead of one per
    document — the difference between a metadata exchange and an
    all-to-all of 10^12 rows.
    """
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        has_error = pc.cast(pc.is_valid(t.column("error")), pa.int64())
        tt = pa.table(
            {
                "partition_id": t.column("partition_id"),
                "n_docs": pa.array([1] * len(t), pa.int64()),
                "sum_bytes": t.column("n_bytes"),
                "sum_parse_ms": t.column("parse_ms"),
                "max_parse_ms": t.column("parse_ms"),
                "n_errors": has_error,
                "n_pages": pc.cast(t.column("n_pages"), pa.int64()),
            }
        )
        g = tt.group_by("partition_id").aggregate(
            [
                ("n_docs", "sum"),
                ("sum_bytes", "sum"),
                ("sum_parse_ms", "sum"),
                ("max_parse_ms", "max"),
                ("n_errors", "sum"),
                ("n_pages", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "partition_id",
                "n_docs",
                "sum_bytes",
                "sum_parse_ms",
                "max_parse_ms",
                "n_errors",
                "n_pages",
            ]
        )

    combined = (
        extracted.map_batches(partial, batch_format="pyarrow")
        .groupby("partition_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_bytes", alias_name="sum_bytes"),
            Sum("sum_parse_ms", alias_name="sum_parse_ms"),
            Max("max_parse_ms", alias_name="max_parse_ms"),
            Sum("n_errors", alias_name="n_errors"),
            Sum("n_pages", alias_name="n_pages"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = pc.divide(
            t.column("sum_parse_ms"), pc.cast(t.column("n_docs"), pa.float64())
        )
        return pa.table(
            {
                "partition_id": t.column("partition_id"),
                "n_docs": t.column("n_docs"),
                "sum_bytes": t.column("sum_bytes"),
                "mean_parse_ms": mean,
                "max_parse_ms": t.column("max_parse_ms"),
                "n_errors": t.column("n_errors"),
                "n_pages": t.column("n_pages"),
            }
        )

    return combined.map_batches(finish, batch_format="pyarrow")


def meta_projection(t: pa.Table) -> pa.Table:
    """Narrow per-document metadata projection of the extraction output.

    ``n_empty`` is computed vectorized HERE so the ``text`` column never
    leaves the workers — rollups downstream shuffle only metadata rows
    (url, lang?, n_bytes, pdf_version, n_pages, partition_id, n_empty).
    """
    cols = {
        "url": t.column("url"),
        "n_bytes": t.column("n_bytes"),
        "pdf_version": t.column("pdf_version"),
        "n_pages": pc.cast(t.column("n_pages"), pa.int64()),
        "partition_id": pc.cast(t.column("partition_id"), pa.int64()),
        "n_empty": pc.cast(pc.equal(t.column("text"), ""), pa.int64()),
    }
    if "lang" in t.column_names:
        cols["lang"] = t.column("lang")
    return pa.table(cols)


def rollup_meta(meta_ds, key: str):
    """Grouped document-metadata rollup with the combiner pattern: each block
    pre-aggregates to one row per key (arrow group_by inside map_batches), so
    the groupby shuffle carries |keys| rows per block, never per-document
    rows.  Returns (key, n_docs, sum_bytes, n_pages, n_empty) sorted by key.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                key: t.column(key),
                "n_docs": pa.array(np.ones(len(t), np.int64)),
                "sum_bytes": t.column("n_bytes"),
                "n_pages": t.column("n_pages"),
                "n_empty": t.column("n_empty"),
            }
        )
        g = tt.group_by(key).aggregate(
            [("n_docs", "sum"), ("sum_bytes", "sum"), ("n_pages", "sum"), ("n_empty", "sum")]
        )
        return g.rename_columns([key, "n_docs", "sum_bytes", "n_pages", "n_empty"])

    out = (
        meta_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_bytes", alias_name="sum_bytes"),
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_empty", alias_name="n_empty"),
        )
    )
    # grouped rows only — |keys| rows reach the driver
    return out.to_pandas().sort_values(key).reset_index(drop=True)


def run_extraction(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    chunks: int = 4,
    resume: bool = True,
    huge_threshold="auto",
    batch_size: int = 64,
    concurrency=None,
    write_metrics: bool = True,
    extractor_kwargs: Optional[dict] = None,
    input_format: str = "parquet",
) -> dict:
    """Checkpoint-resumable extraction run.

    Partitions are processed in ``chunks`` groups; each group writes
    ``out/chunk=K/`` atomically and records a manifest marker, so a failed
    run re-does only unfinished groups.  At production scale each chunk maps
    to a set of input shards (same hash key at ingest) so the per-chunk read
    touches only its own input files.
    """
    os.makedirs(out_dir, exist_ok=True)
    # refuse to resume markers written under a different partition scheme
    manifest_mod.check_scheme(out_dir, num_partitions)
    done = manifest_mod.completed_partitions(out_dir) if resume else set()
    if extractor_kwargs is None:
        # production default: the text column already carries the document
        # concatenation — skipping the per-page duplicate halves the bytes
        # written per document at corpus scale
        extractor_kwargs = {"include_page_texts": False}
    ran = []
    for chunk in range(chunks):
        if chunk in done:
            continue
        lo = chunk * num_partitions // chunks
        hi = (chunk + 1) * num_partitions // chunks

        def keep_chunk(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            pid = t.column("partition_id")
            mask = pc.and_(pc.greater_equal(pid, lo), pc.less(pid, hi))
            return t.filter(mask)

        ds = open_corpus(input_path, input_format)
        ds = ds.map_batches(
            add_ingest_meta(num_partitions), batch_format="pyarrow", num_cpus=_task_cpus()
        )
        ds = ds.map_batches(keep_chunk, batch_format="pyarrow", num_cpus=_task_cpus())
        extracted = _extract_prepared(
            ds,
            huge_threshold=huge_threshold,
            batch_size=batch_size,
            concurrency=concurrency,
            extractor_kwargs=extractor_kwargs,
        )
        chunk_dir = os.path.join(out_dir, f"chunk={chunk}")
        if os.path.isdir(chunk_dir):
            # stale partial output from an interrupted run — replace it
            import shutil

            shutil.rmtree(chunk_dir)
        extracted.write_parquet(chunk_dir)
        manifest_mod.mark_completed(out_dir, chunk)
        ran.append(chunk)

    stats = {"chunks_run": ran, "chunks_skipped": sorted(done)}
    if write_metrics and ran:
        import ray.data as rd

        out_ds = rd.read_parquet(
            output_files(out_dir, chunks),
            columns=["partition_id", "n_bytes", "parse_ms", "n_pages", "error"],
        )
        metrics = partition_metrics(out_ds)
        metrics_dir = os.path.join(out_dir, "_metrics")
        if os.path.isdir(metrics_dir):
            import shutil

            shutil.rmtree(metrics_dir)
        metrics.write_parquet(metrics_dir)
        stats["metrics_dir"] = metrics_dir
    return stats


def write_partitioned(extracted, out_dir: str) -> str:
    """Hive-partitioned sink: one directory per partition_id
    (``write_parquet(partition_cols=...)``) — the resumable layout when the
    writer itself is the checkpoint boundary."""
    extracted.write_parquet(out_dir, partition_cols=["partition_id"])
    return out_dir


def output_files(out_dir: str, chunks: int) -> list:
    """Parquet files across the chunk directories of a finished run."""
    files = []
    for c in range(chunks):
        d = os.path.join(out_dir, f"chunk={c}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return files


def _warm_extract_fn(kwargs: dict):
    """Task-pool extraction callable with WARM per-worker-process state.

    Ray reuses worker processes across map tasks, so a process-global
    extractor gives the same warm-buffer reuse an actor would
    (Tokeniser.cs:141-170 shared working buffer) while keeping the elastic
    task scheduler: measured ~40% faster than a fixed actor pool on the
    bench corpus because tasks backfill every idle slot and fractional
    num_cpus hides read/store latency.  (An actor-pool stage remains the
    right tool when per-actor setup is genuinely expensive — a model, a big
    index; the extractor's state is just reusable scratch buffers.)"""
    key = tuple(sorted(kwargs.items()))

    def fn(batch):
        ex = _EXTRACTOR_CACHE.get(key)
        if ex is None:
            ex = PdfExtractor(**dict(key))
            _EXTRACTOR_CACHE[key] = ex
        return ex(batch)

    return fn


_EXTRACTOR_CACHE: dict = {}


def _extract_prepared(
    ds,
    *,
    huge_threshold,
    batch_size,
    concurrency,
    extractor_kwargs,
    huge_concurrency=None,
):
    """Extraction over a dataset that already carries ingest meta columns.

    Stage A (the wide per-document transform) runs as a TASK pool with
    num_cpus from _task_cpus() — fractional slots keep cores busy through
    object-store and read gaps, and warm state lives in the worker process
    (see `_warm_extract_fn`).  An explicit ``concurrency`` keeps the legacy
    actor-pool form (callers that want a bounded stateful pool).  Stage B,
    the huge-document pool, stays a small ACTOR pool: its whole point is a
    hard bound on how many pathological payloads are in flight at once."""
    kwargs = extractor_kwargs or {}
    common = dict(batch_format="pyarrow")
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if huge_threshold == "auto":
        # a small node cannot afford a dedicated skew pool AND keep the read
        # stage fed (measured: the chained pools at 8 CPUs run 2-3x slower
        # than one pool because the reserved stage-B actor plus stage-A pool
        # occupy every slot and starve the read) — auto falls back to the
        # single pool there; an EXPLICIT threshold always builds both pools
        huge_threshold = None if cpus <= 8 else DEFAULT_HUGE_THRESHOLD
    if concurrency is not None:
        # explicit pool size -> actor pools (legacy/stateful form)
        if huge_concurrency is None and huge_threshold is not None:
            top = concurrency[1] if isinstance(concurrency, tuple) else concurrency
            huge_concurrency = max(1, min(cpus // 16, max(1, cpus - top - 1)))
            if not isinstance(concurrency, tuple):
                if concurrency + huge_concurrency >= cpus and cpus > 2:
                    concurrency = max(1, cpus - huge_concurrency - 1)
        if huge_threshold is None:
            return ds.map_batches(
                PdfExtractor,
                fn_constructor_kwargs=kwargs,
                batch_size=batch_size,
                concurrency=concurrency,
                **common,
            )
        stage_a = ds.map_batches(
            PdfExtractor,
            fn_constructor_kwargs={**kwargs, "defer_over_bytes": huge_threshold},
            batch_size=batch_size,
            concurrency=concurrency,
            **common,
        )
        return stage_a.map_batches(
            PdfExtractor,
            fn_constructor_kwargs={**kwargs, "finish_deferred": True},
            batch_size=None,  # whole blocks; only deferred rows cost anything
            concurrency=huge_concurrency,
            **common,
        )

    if huge_concurrency is None and huge_threshold is not None:
        huge_concurrency = max(1, cpus // 16)
    if huge_threshold is None:
        return ds.map_batches(
            _warm_extract_fn(kwargs),
            batch_size=batch_size,
            num_cpus=_task_cpus(),
            **common,
        )

    # chained-passthrough skew routing: ONE input scan.  Stage A extracts
    # every document at or below the threshold and forwards huge payloads in
    # a deferred_html column; stage B (a small dedicated actor pool) extracts
    # the forwarded documents block-at-a-time, so a pathological document
    # only ever occupies a stage-B actor and never delays stage-A neighbours.
    stage_a = ds.map_batches(
        _warm_extract_fn({**kwargs, "defer_over_bytes": huge_threshold}),
        batch_size=batch_size,
        num_cpus=_task_cpus(),
        **common,
    )
    return stage_a.map_batches(
        PdfExtractor,
        fn_constructor_kwargs={**kwargs, "finish_deferred": True},
        batch_size=None,  # whole blocks; only deferred rows cost anything
        concurrency=huge_concurrency,
        # distinct resource spec: with identical num_cpus Ray FUSES the
        # task-pool stage A into this tiny actor pool and the whole
        # extraction runs on huge_concurrency actors (measured 3-4x slower);
        # the extra headroom also fits a pathological payload's heap
        num_cpus=1.25,
        **common,
    )
