"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the exact baseline: per batch, a numpy matmul of
the batch's vectors against a broadcast query matrix (`ray.put` once, read in
each actor's __init__), emitting per-batch local top-k rows; a tiny driver-side
merge keeps the global top-k.  The LSH-bucketed variant is the scale path:
random-hyperplane signatures route vectors into buckets so each query only
scans its own bucket (and its Hamming-1 neighbours).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOP_K = 10
N_QUERIES = 5


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str):
    """First N_QUERIES vectors by vec_id — deterministic query workload."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id").head(N_QUERIES)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    return df["vec_id"].to_numpy(), qn


def s_knn_bruteforce(sf_dir: str):
    """Exact cosine top-k per query via batch matmuls against a broadcast matrix."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    qref = ray.put((qids, qmat))

    class Score:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vecs = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs @ self.qmat.T  # (batch, n_queries), float64 like the oracle
            vec_ids = t.column("vec_id").to_numpy()
            out = {"query_id": [], "vec_id": [], "sim": []}
            k = min(TOP_K, len(vec_ids))
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                # local top-k under the SAME order as the global merge and the
                # oracle — rounded sim desc, vec_id asc — so a rounding-equal
                # tie at the k-th cutoff can't drop the row the oracle keeps
                # regardless of batch/block layout
                order = np.lexsort((vec_ids, -np.round(col, 4)))
                idx = order[:k]
                for j in idx:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["sim"].append(float(col[j]))
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    local = (
        _read_embeddings(sf_dir)
        .map_batches(Score, batch_format="pyarrow", concurrency=(1, 4), batch_size=2048)
        .to_pandas()
    )
    out = []
    local["sim"] = local["sim"].round(4)  # rank on rounded sims, ties by vec_id
    for qid, g in local.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.assign(rank=range(1, len(g) + 1))
        out.append(g)
    df = pd.concat(out).reset_index(drop=True)
    return df[["query_id", "rank", "vec_id", "sim"]]


def s_embedding_dupes(sf_dir: str, threshold: float = 0.42):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= threshold).

    Blocked exact computation: the full normalized matrix is broadcast once
    (`ray.put`) and each batch runs one numpy matmul against it — no shuffle.
    At corpus scale the broadcast side becomes the LSH-bucketed index from
    `s_ann_lsh` and only same-bucket pairs are scored."""
    import ray

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id")
    all_ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, mat))

    class PairFinder:
        def __init__(self):
            self.all_ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            vecs = np.stack(batch.column("embedding").to_pandas().to_numpy()).astype(
                np.float64
            )
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs @ self.mat.T
            out = {"vec_a": [], "vec_b": [], "sim": []}
            rows, cols = np.nonzero(sims >= threshold)
            for r, c in zip(rows, cols):
                a, b = int(ids[r]), int(self.all_ids[c])
                if a < b:  # emit each unordered pair once
                    out["vec_a"].append(a)
                    out["vec_b"].append(b)
                    out["sim"].append(round(float(sims[r, c]), 4))
            return pa.table(
                {
                    "vec_a": pa.array(out["vec_a"], pa.int64()),
                    "vec_b": pa.array(out["vec_b"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    res = (
        _read_embeddings(sf_dir)
        .map_batches(PairFinder, batch_format="pyarrow", concurrency=(1, 4), batch_size=1024)
        .to_pandas()
    )
    return res.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def s_ann_lsh(sf_dir: str, n_planes: int = 0):
    """LSH-bucketed approximate variant + recall report vs brute force.

    Vectors are signed against ``n_planes`` random hyperplanes; each query
    scans only its bucket and Hamming-1 neighbours.  Returns per-query recall
    against the exact result — the quality metric a scale deployment tracks.
    ``n_planes=0`` auto-sizes for ~64 vectors per bucket (recall/pruning
    tradeoff scales with the corpus instead of collapsing at small n).
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas()
    if n_planes <= 0:
        n_planes = max(2, int(np.log2(max(2, len(df) / 64))))
    vecs = np.stack(df["embedding"].to_numpy())
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    rng = np.random.RandomState(17)
    planes = rng.randn(vecs.shape[1], n_planes).astype(np.float32)
    bits = (vecs @ planes) > 0
    sigs = (bits * (1 << np.arange(n_planes))).sum(axis=1)

    qids, qmat = _query_matrix(sf_dir)
    qbits = (qmat @ planes) > 0
    qsigs = (qbits * (1 << np.arange(n_planes))).sum(axis=1)

    exact = s_knn_bruteforce(sf_dir)
    out = {"query_id": [], "n_candidates": [], "recall_at_k": []}
    vec_ids = df["vec_id"].to_numpy()
    for qi, qid in enumerate(qids):
        probe = {qsigs[qi]} | {qsigs[qi] ^ (1 << b) for b in range(n_planes)}
        mask = np.isin(sigs, list(probe))
        cand_ids = vec_ids[mask]
        cand_vecs = vecs[mask]
        sims = cand_vecs @ qmat[qi]
        order = np.argsort(-sims)[:TOP_K]
        approx = set(int(cand_ids[j]) for j in order)
        truth = set(exact[exact["query_id"] == qid]["vec_id"])
        out["query_id"].append(int(qid))
        out["n_candidates"].append(int(mask.sum()))
        out["recall_at_k"].append(round(len(approx & truth) / max(1, len(truth)), 4))
    return pd.DataFrame(out)
