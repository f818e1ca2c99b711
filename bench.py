"""Benchmark harness: headline extraction pipeline + representative queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline twice in fresh processes (8 vs 32 CPUs by
default) and reports throughput at both plus scaling efficiency
(BASELINE.md protocol: efficiency = (t_lo / t_hi) / (hi/lo)).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


TARGET_MB = float(os.environ.get("GRAFT_BENCH_MB", "400"))


def run_headline() -> dict:
    """Extraction over the synthesized PDF corpus for this sf dir.

    The corpus file is repeated (a list of identical input paths) until the
    input reaches ~GRAFT_BENCH_MB of document bytes, so the measurement is
    dominated by extraction work rather than fixed Ray startup overhead —
    the per-document work is identical to a corpus of that size on disk.
    """
    import ray.data as rd
    import pyarrow.parquet as pq

    from pdfray.sources.fixtures import ensure_corpus_parquet
    from pdfray.pipelines.extraction import extract_dataset

    path = ensure_corpus_parquet(SF_DIR)
    meta = pq.read_metadata(path)
    n_docs = meta.num_rows
    total_bytes = 0
    for i in range(meta.num_row_groups):
        rg = meta.row_group(i)
        for c in range(rg.num_columns):
            col = rg.column(c)
            if col.path_in_schema == "html":
                total_bytes += col.total_uncompressed_size
    repeats = max(1, int(TARGET_MB * 1e6 / max(1, total_bytes)))
    # warm the page cache so we measure compute, not first-touch disk reads
    pq.read_table(path, columns=["url"])

    t0 = time.perf_counter()
    ds = rd.read_parquet([path] * repeats, columns=["url", "html"])
    extracted = extract_dataset(ds)
    n_out = extracted.count()
    wall = time.perf_counter() - t0
    assert n_out == n_docs * repeats, (n_out, n_docs, repeats)
    mb = total_bytes * repeats / 1e6
    return {
        "sec": round(wall, 3),
        "n_docs": n_docs * repeats,
        "repeats": repeats,
        "mb": round(mb, 1),
        "docs_per_sec": round(n_docs * repeats / wall, 1),
        "mb_per_sec": round(mb / wall, 2),
    }


QUERY_NAMES = [
    "q1_pricing_summary",
    "q_hash_join_brand",
    "q_broadcast_join_segment",
    "q_semi_join_big_customers",
    "q_events_rollup",
    "q_events_window",
    "q_orders_by_month",
    "t_token_stats",
    "t_exact_dedup",
    "t_minhash_pairs",
    "t_simhash",
    "s_knn_bruteforce",
    "s_embedding_dupes",
]


def run_queries() -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    for name in QUERY_NAMES:
        t0 = time.perf_counter()
        result = qs[name](SF_DIR)
        # force execution for lazy results
        if hasattr(result, "count") and not hasattr(result, "columns"):
            result.count()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def pure_control(sample_mb: float = 30.0) -> dict:
    """Like-for-like single-thread control on the SAME corpus: a bare Python
    loop over extract_document, no Ray.  pipeline_docs_per_sec_per_cpu /
    control_docs_per_sec is THE pipeline-overhead factor (BASELINE.md §3)."""
    import pyarrow.parquet as pq

    from pdfray.core.extract import extract_document
    from pdfray.sources.fixtures import ensure_corpus_parquet

    path = ensure_corpus_parquet(SF_DIR)
    pf = pq.ParquetFile(path)
    rows = []
    total = 0
    for batch in pf.iter_batches(columns=["html"], batch_size=256):
        for v in batch.column("html"):
            b = v.as_py()
            rows.append(b)
            total += len(b)
        if total >= sample_mb * 1e6:
            break
    for b in rows[:50]:  # warm caches like the pipeline's steady state
        extract_document(b)
    t0 = time.perf_counter()
    for b in rows:
        extract_document(b)
    wall = time.perf_counter() - t0
    return {
        "control_n_docs": len(rows),
        "control_mb": round(total / 1e6, 1),
        "control_sec": round(wall, 3),
        "control_docs_per_sec": round(len(rows) / wall, 1),
        "control_mb_per_sec": round(total / 1e6 / wall, 2),
    }


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    headline = run_headline()
    queries = {} if os.environ.get("GRAFT_SKIP_QUERIES") else run_queries()
    sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", ""))
    print(
        json.dumps(
            {
                "metric": "pdf extraction wall-clock (synthesized corpus)",
                "value": headline["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "n_docs": headline["n_docs"],
                "corpus_mb": headline["mb"],
                "docs_per_sec": headline["docs_per_sec"],
                "mb_per_sec": headline["mb_per_sec"],
            }
        )
    )
    ray.shutdown()


def _machine_control(lo: int, hi: int) -> dict:
    """Pure-python CPU-burn control: this machine's own parallel ceiling.

    32 logical CPUs here are SMT siblings of ~16 physical cores, so even a
    perfect pipeline cannot show 4x from 8 -> 32 workers.  The control
    measures effective core-equivalents at both levels; pipeline efficiency
    is reported raw AND normalized by this hardware ceiling."""
    import multiprocessing as mp

    def effective(workers: int, t1: float) -> float:
        with mp.Pool(workers) as pool:
            pool.map(_burn, [N_BURN // 10] * workers)  # warm
            t0 = time.perf_counter()
            pool.map(_burn, [N_BURN] * workers * 3)
            tw = time.perf_counter() - t0
        return workers * 3 * t1 / tw

    _burn(N_BURN)
    t0 = time.perf_counter()
    _burn(N_BURN)
    t1 = time.perf_counter() - t0
    eff_lo = effective(lo, t1)
    eff_hi = effective(hi, t1)
    return {
        "effective_cores_lo": round(eff_lo, 1),
        "effective_cores_hi": round(eff_hi, 1),
        "machine_ceiling": round((eff_hi / eff_lo) / (hi / lo), 3),
    }


N_BURN = 5_000_000


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def scaling(lo: int = 8, hi: int = 32) -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    control = _machine_control(lo, hi)
    print(
        json.dumps(
            {
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "docs_per_sec_lo": r_lo["docs_per_sec"],
                "docs_per_sec_hi": r_hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                **control,
                "normalized_efficiency": round(eff / control["machine_ceiling"], 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--control" in sys.argv:
        print(json.dumps(pure_control()))
    else:
        main()
