"""Similarity search over the ``embeddings`` table (list<float> column).

Three operators, all streaming Ray pipelines (no driver-side table reads):

* ``s_knn_bruteforce`` — exact cosine top-k: per batch, one numpy matmul
  against a broadcast query matrix (`ray.put` once, read in each actor's
  __init__); a tiny driver merge keeps the global top-k.
* ``s_ann_lsh`` — approximate top-k: random-hyperplane signatures computed
  per batch; each query only scores rows whose signature falls in its
  multi-probe bucket set (Hamming-1), so the per-batch matmul shrinks to the
  probed candidates.  At deployment scale the same signature becomes the
  hive-partition key of the vector store (write once partitioned by
  signature prefix, read only the probed partitions); here the pruning runs
  in-stream which keeps the pipeline one pass.
* ``s_embedding_dupes`` — EXACT threshold pairs via block-pair scoring:
  normalized blocks stay in the object store, a task per (block_i, block_j)
  fetches just those two blocks and emits qualifying pairs.  Memory per task
  is two blocks, not the O(N) full-matrix broadcast.  Exactness forces
  all-pairs compute: the sf0.01 pair-sim distribution is continuous through
  the 0.42 threshold (pairs at .418/.422/.430...), so any LSH banding has
  recall < 1 there by construction — LSH bucketing is only correct for the
  high-threshold near-dup regime and is exposed separately via
  ``lsh_candidate_pairs``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import _topk
from .frames import typed_collect
from .relational import round_half_away
from .textops import warm_factory

TOP_K = 10
N_QUERIES = 5
PAIR_BLOCK_ROWS = 2048  # rows per scoring block (memory bound per task)


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


_QUERY_CACHE: dict = {}


def _query_matrix(sf_dir: str):
    """First N_QUERIES vectors by vec_id — deterministic query workload.

    The queries are pipeline INPUT (a user supplies them at deployment);
    this synthesizes that input via ZONE-MAP pruning instead of a
    distributed sort: parquet row-group statistics (min vec_id) identify
    the groups that can contain the k smallest keys, only those groups are
    read, and the tiny result is sorted locally.  At corpus scale this
    touches one row group instead of shuffling the table.  Memoized —
    every similarity operator in a session shares the same workload."""
    if sf_dir not in _QUERY_CACHE:
        import heapq

        import pyarrow.parquet as pq

        pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
        col_idx = pf.schema_arrow.get_field_index("vec_id")
        mins = []
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(col_idx).statistics
            if st is None or not st.has_min_max:
                mins = None  # no stats: fall back to reading everything
                break
            mins.append((st.min, g))
        if mins is None:
            groups = list(range(pf.metadata.num_row_groups))
        else:
            # k smallest keys live in the groups with the k smallest mins
            # (worst case: one qualifying key per group)
            groups = [g for _, g in heapq.nsmallest(N_QUERIES, mins)]
        t = pf.read_row_groups(groups, columns=["vec_id", "embedding"])
        df = (
            t.to_pandas().sort_values("vec_id").head(N_QUERIES).reset_index(drop=True)
        )
        if len(df) == 0:  # empty corpus: the query workload is empty too
            z = np.zeros((0, 0), np.float64)
            _QUERY_CACHE[sf_dir] = (np.array([], np.int64), z, z)
            ids, qn, _q = _QUERY_CACHE[sf_dir]
            return ids, qn
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        # zero-safe: an all-zero query row stays zero (its sims are pinned
        # to -1 by _mask_zero_cosine) instead of going NaN
        qn = _normalize(q)
        _QUERY_CACHE[sf_dir] = (df["vec_id"].to_numpy(), qn, q)
    ids, qn, _q = _QUERY_CACHE[sf_dir]
    return ids, qn


def _query_matrix_raw(sf_dir: str):
    """The same deterministic query workload, UNNORMALIZED — the metric
    for maximum-inner-product search is magnitude-sensitive, so the raw
    float64 vectors are the queries (shares `_query_matrix`'s zone-map
    read and cache)."""
    _query_matrix(sf_dir)
    ids, _qn, q = _QUERY_CACHE[sf_dir]
    return ids, q


def _batch_matrix(t: pa.Table) -> np.ndarray:
    """Zero-ish-copy (batch, dim) float64 matrix from the list column."""
    if len(t) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    col = t.column("embedding")
    flat = col.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.chunk(0)
    dim = len(flat[0])
    vals = flat.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return vals.reshape(len(t), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _mask_zero_cosine(sims: np.ndarray, raw: np.ndarray, qmat: np.ndarray):
    """Pin the zero-vector cosine convention to DuckDB's
    list_cosine_similarity: ANY zero operand -> similarity -1.0 (found by
    the hostile-embeddings harness: naive normalization gives a zero
    vector sim 0.0 against everything — MID-pack in a corpus with
    negative background sims — while the oracle ranks it last).  A zero
    embedding means 'missing'; ranking it last is also the right
    engineering call.  ``raw`` is the UNnormalized batch, ``qmat`` the
    (normalized or raw) query matrix whose all-zero rows mark zero
    queries.  Mutates and returns ``sims`` (batch x queries)."""
    zr = ~raw.any(axis=1)
    if zr.any():
        sims[zr, :] = -1.0
    qz = ~qmat.any(axis=1)
    if qz.any():
        sims[:, qz] = -1.0
    return sims


def _empty_result(**cols) -> pd.DataFrame:
    """Typed 0-row frame — the empty-corpus contract result for the
    sample-trained family ('i' = int64, 'f' = float64).  With zero vectors
    there is nothing to train on and the query workload itself is empty,
    so every one of these operators degenerates to its typed empty output
    (an empty delta in an incremental run is a legitimate input)."""
    dt = {"i": "int64", "f": "float64"}
    return pd.DataFrame({c: pd.Series([], dtype=dt[k]) for c, k in cols.items()})


def _merge_topk(local: pd.DataFrame, col: str = "sim") -> pd.DataFrame:
    """Driver-side merge of per-batch top-k candidates (tiny frame)."""
    out = []
    local = local.copy()
    if len(local) == 0:  # empty corpus: zero queries, typed empty result
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                col: pd.Series([], dtype="float64"),
            }
        )
    local[col] = round_half_away(local[col].to_numpy(), 4)  # rank on rounded scores, ties by vec_id
    for qid, g in local.groupby("query_id"):
        g = g.sort_values([col, "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.assign(rank=range(1, len(g) + 1))
        out.append(g)
    df = pd.concat(out).reset_index(drop=True)
    return df[["query_id", "rank", "vec_id", col]]


def s_knn_bruteforce(sf_dir: str):
    """Exact cosine top-k per query via batch matmuls against a broadcast matrix."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    qref = ray.put((qids, qmat))

    class Score:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            raw = _batch_matrix(t)
            vecs = _normalize(raw)
            sims = vecs @ self.qmat.T  # (batch, n_queries), float64 like the oracle
            sims = _mask_zero_cosine(sims, raw, self.qmat)
            vec_ids = t.column("vec_id").to_numpy()
            out = {"query_id": [], "vec_id": [], "sim": []}
            k = min(TOP_K, len(vec_ids))
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                # local top-k under the SAME order as the global merge and the
                # oracle — rounded sim desc, vec_id asc — so a rounding-equal
                # tie at the k-th cutoff can't drop the row the oracle keeps
                # regardless of batch/block layout
                order = np.lexsort((vec_ids, -round_half_away(col, 4)))
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
        .map_batches(
            warm_factory(("s_knn", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    return _merge_topk(local)


def _auto_planes(n_rows: int, per_bucket: int = 64) -> int:
    """Plane count tracks corpus size (buckets ~ n/per_bucket).

    With Hamming-2 multi-probing (1 + d + d(d-1)/2 visited buckets) the
    probed FRACTION shrinks as the corpus grows: ~everything at n<=5k
    (where brute force is the honest answer anyway), ~34% at 5k, <1% at 1M
    — the pruning asymptote a bucketed vector store needs.  Note the
    recall/pruning tradeoff is data-dependent: the synthetic embeddings
    here are weakly clustered (top-10 sims ~0.45 vs ~0 background), so
    recall roughly tracks candidate fraction; real embedding manifolds
    separate far better per plane."""
    return max(2, int(np.log2(max(2, n_rows / per_bucket))))


def _probe_set(s: int, n_planes: int) -> np.ndarray:
    """Multi-probe bucket set out to Hamming-2 around signature ``s``."""
    out = {s} | {s ^ (1 << b) for b in range(n_planes)}
    for b1 in range(n_planes):
        for b2 in range(b1 + 1, n_planes):
            out.add(s ^ (1 << b1) ^ (1 << b2))
    return np.array(sorted(out))


def s_ann_lsh(sf_dir: str, n_planes: int = 0):
    """LSH-pruned approximate top-k + per-query recall vs the exact result.

    One streaming pass: each batch signs its vectors against the broadcast
    hyperplanes (one matmul), keeps for each query only the rows whose
    signature is in the query's multi-probe set (exact bucket + Hamming-1),
    scores those, and emits per-batch local top-k plus a candidate count.
    The driver merges k·n_batches candidate rows — never the vectors.
    ``n_planes=0`` auto-sizes for ~64 vectors per bucket so pruning scales
    with the corpus instead of collapsing at small n.
    """
    import ray

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()  # parquet metadata, no scan
    if n_rows == 0:
        return _empty_result(query_id="i", n_candidates="i", recall_at_k="f")
    if n_planes <= 0:
        n_planes = _auto_planes(n_rows)

    rng = np.random.RandomState(17)
    # plane count is small (log n); the plane matrix is dim x n_planes
    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    planes = rng.randn(dim, n_planes).astype(np.float64)
    qbits = (qmat @ planes) > 0
    shifts = 1 << np.arange(n_planes)
    qsigs = (qbits * shifts).sum(axis=1)

    # multi-probe out to Hamming-2: near neighbors land one or two sign
    # flips away far more often than 1/2^d — the standard recall/cost
    # dial (each extra radius multiplies candidates, not corpus reads:
    # the scan is one pass either way, only the per-batch matmul grows)
    probes = [_probe_set(int(s), n_planes) for s in qsigs]
    bref = ray.put((qids, qmat, planes, probes))

    class ProbeScore:
        def __init__(self):
            self.qids, self.qmat, self.planes, self.probes = ray.get(bref)
            self.shifts = 1 << np.arange(self.planes.shape[1])

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                        "n_candidates": pa.array([], pa.int64()),
                    }
                )
            raw = _batch_matrix(t)
            vecs = _normalize(raw)
            zero_rows = ~raw.any(axis=1)
            vec_ids = t.column("vec_id").to_numpy()
            sigs = ((vecs @ self.planes) > 0) * self.shifts
            sigs = sigs.sum(axis=1)
            out = {"query_id": [], "vec_id": [], "sim": [], "n_candidates": []}
            for qi, qid in enumerate(self.qids):
                mask = np.isin(sigs, self.probes[qi])
                n_cand = int(mask.sum())
                if n_cand:
                    cand_vecs = vecs[mask]
                    cand_ids = vec_ids[mask]
                    sims = cand_vecs @ self.qmat[qi]
                    # zero-operand cosine -> -1 (see _mask_zero_cosine)
                    sims[zero_rows[mask]] = -1.0
                    if not self.qmat[qi].any():
                        sims[:] = -1.0
                    order = np.lexsort((cand_ids, -round_half_away(sims, 4)))
                    idx = order[: min(TOP_K, n_cand)]
                else:
                    idx, cand_ids, sims = [], np.array([]), np.array([])
                first = True
                for j in idx:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(cand_ids[j]))
                    out["sim"].append(float(sims[j]))
                    out["n_candidates"].append(n_cand if first else 0)
                    first = False
                if not len(idx):
                    # carry the (zero-hit) candidate count for the rollup
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(-1)
                    out["sim"].append(-2.0)
                    out["n_candidates"].append(n_cand)
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                    "n_candidates": pa.array(out["n_candidates"], pa.int64()),
                }
            )

    local = (
        ds.map_batches(
            warm_factory(("s_ann_lsh", bref.hex()), ProbeScore),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    n_cand = local.groupby("query_id")["n_candidates"].sum()
    local = local[local["vec_id"] >= 0]

    exact = s_knn_bruteforce(sf_dir)
    out = {"query_id": [], "n_candidates": [], "recall_at_k": []}
    for qid in qids:
        g = local[local["query_id"] == qid]
        g = g.assign(sim=round_half_away(g["sim"].to_numpy(), 4)).sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        ).head(TOP_K)
        approx = set(g["vec_id"].astype(int))
        truth = set(exact[exact["query_id"] == qid]["vec_id"])
        out["query_id"].append(int(qid))
        out["n_candidates"].append(int(n_cand.get(qid, 0)))
        out["recall_at_k"].append(round(len(approx & truth) / max(1, len(truth)), 4))
    return pd.DataFrame(out)


def _kmeans(sample: np.ndarray, k: int, seed: int = 23, iters: int = 10) -> np.ndarray:
    """Deterministic spherical Lloyd k-means over a NORMALIZED sample
    (cosine assignment via argmax dot).  Empty clusters re-seed from the
    sample deterministically.  Runs on the driver over a BOUNDED sample —
    the standard IVF training pattern: train small, broadcast, assign at
    scale in-stream."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n:
                    centroids[j] = v / n
            else:
                centroids[j] = sample[rng.randint(len(sample))]
    return centroids


def _kmeans_l2(sample: np.ndarray, k: int, seed: int = 29, iters: int = 10):
    """Deterministic EUCLIDEAN Lloyd k-means on the driver (raw
    subvectors, no normalization) — the product-quantization trainer.
    Assignment uses argmin(-2 x·c + |c|^2), the |x|^2-free form the
    in-stream assigner and the SQL oracle replay verbatim."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        scores = -2.0 * (sample @ centroids.T) + (centroids * centroids).sum(axis=1)
        assign = scores.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
            else:
                centroids[j] = sample[rng.randint(len(sample))]
    return centroids


PQ_SUBSPACES = 4
PQ_CODEBOOK = 16  # codes per subspace: dim floats -> SUBSPACES x 4 bits


def _pq_bounds(dim: int):
    return [round(m * dim / PQ_SUBSPACES) for m in range(PQ_SUBSPACES + 1)]


def pq_codebooks(sample: np.ndarray):
    """Per-subspace codebooks from a deterministic sample (pure numpy —
    shared verbatim by the engine and the oracle generator, which feeds it
    an independently-read sample)."""
    bounds = _pq_bounds(sample.shape[1])
    return [
        _kmeans_l2(
            np.ascontiguousarray(sample[:, bounds[m] : bounds[m + 1]]), PQ_CODEBOOK
        )
        for m in range(PQ_SUBSPACES)
    ]


def s_pq(sf_dir: str):
    """Product quantization of the embedding column — the high-ratio
    vector-store compression stage next to s_scalar_quantize: the vector
    splits into PQ_SUBSPACES contiguous subvectors, each assigned to one
    of PQ_CODEBOOK trained centroids (4 bits/subspace here vs 8
    bits/dimension scalar).  Codebooks train driver-side on the
    deterministic 50*k-lowest-vec_id sample (streaming local min-k, no
    sort shuffle) and broadcast once; assignment is one matmul per
    subspace per batch.  Long format (vec_id, subspace, code); the DuckDB
    oracle retrains the codebooks independently from the raw parquet,
    embeds them as literals, and replays the argmin(-2 x·c + |c|^2)
    assignment per row."""
    import ray

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_rows == 0:
        return _empty_result(vec_id="i", subspace="i", code="i")
    sample_df = _topk(ds, min(n_rows, 50 * PQ_CODEBOOK), ["vec_id"], [False])
    sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    books = pq_codebooks(sample)
    bref = ray.put(books)

    class Assign:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "subspace": pa.array([], pa.int64()),
                        "code": pa.array([], pa.int64()),
                    }
                )
            X = _batch_matrix(t)
            bounds = _pq_bounds(X.shape[1])
            n = len(X)
            codes = np.empty((n, PQ_SUBSPACES), dtype=np.int64)
            for m, C in enumerate(self.books):
                sub = X[:, bounds[m] : bounds[m + 1]]
                scores = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)
                codes[:, m] = scores.argmin(axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(
                        np.repeat(
                            t.column("vec_id").to_numpy(zero_copy_only=False),
                            PQ_SUBSPACES,
                        ),
                        pa.int64(),
                    ),
                    "subspace": pa.array(
                        np.tile(np.arange(PQ_SUBSPACES, dtype=np.int64), n),
                        pa.int64(),
                    ),
                    "code": pa.array(codes.ravel(), pa.int64()),
                }
            )

    out = ds.map_batches(
        warm_factory(("s_pq", bref.hex()), Assign), batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values(["vec_id", "subspace"]).reset_index(drop=True)


def _raw_query_vectors(sf_dir: str):
    """RAW (unnormalized) query vectors for the shared workload — ADC runs
    in the PQ training space, which quantizes raw coordinates.  Same
    zone-map-pruned probe read as `_query_matrix` (via its cached ids),
    then one tiny filtered parquet read."""
    import pyarrow.parquet as pq

    qids, _ = _query_matrix(sf_dir)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(i) for i in qids])],
    )
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return df["vec_id"].to_numpy(), np.stack(df["embedding"].to_numpy()).astype(
        np.float64
    )


def s_pq_adc(sf_dir: str):
    """Approximate top-k via ASYMMETRIC DISTANCE COMPUTATION over the PQ
    codes — the search half of the IVF-PQ layout every corpus-scale vector
    store ships (Jégou et al.): s_pq writes the 4-bit codes, this query
    scans them.  Per query the driver precomputes a (SUBSPACES x CODEBOOK)
    lookup table of squared subvector distances ||q_m - c_{m,j}||^2 — for
    the whole workload that is n_queries x 4 x 16 doubles, broadcast once
    with the codebooks — and each batch then scores ALL queries with one
    integer gather + sum over the batch's code matrix: the scan never
    touches raw vector floats at deployment (codes are 4 bits/subspace; the
    raw column here only feeds the in-stream assignment, exactly like
    s_pq).  Local top-k per batch under the global order (rounded dist
    asc, vec_id asc), tiny driver merge — zero shuffle, the s_knn shape.

    The DuckDB oracle retrains the codebooks independently, replays the
    code assignment per row, and joins a literal LUT VALUES table, so the
    entire ADC pipeline — training, assignment, table lookup, ranking —
    is value-checked end to end."""
    return _adc_shortlist(sf_dir, TOP_K)


def _adc_shortlist(sf_dir: str, k: int) -> pd.DataFrame:
    """ADC top-``k`` per query (the s_pq_adc engine body, parameterized so
    s_ann_rerank can pull a wider shortlist through the identical scan)."""
    import ray

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_rows == 0:
        return _empty_result(query_id="i", rank="i", vec_id="i", dist="f")
    sample_df = _topk(ds, min(n_rows, 50 * PQ_CODEBOOK), ["vec_id"], [False])
    sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    books = pq_codebooks(sample)
    qids, qmat = _raw_query_vectors(sf_dir)
    bounds = _pq_bounds(qmat.shape[1])
    # LUT[q, m, j] = ||q_m - c_{m,j}||^2
    lut = np.empty((len(qids), PQ_SUBSPACES, PQ_CODEBOOK), dtype=np.float64)
    for m, C in enumerate(books):
        qs = qmat[:, bounds[m] : bounds[m + 1]]
        lut[:, m, :] = ((qs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    bref = ray.put((books, qids, lut))

    class AdcScore:
        def __init__(self):
            self.books, self.qids, self.lut = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "dist": pa.array([], pa.float64()),
                    }
                )
            X = _batch_matrix(t)
            bounds_ = _pq_bounds(X.shape[1])
            n = len(X)
            codes = np.empty((n, PQ_SUBSPACES), dtype=np.int64)
            for m, C in enumerate(self.books):
                sub = X[:, bounds_[m] : bounds_[m + 1]]
                scores = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)
                codes[:, m] = scores.argmin(axis=1)
            # dists[n, nq]: gather each subspace's LUT row by code, sum
            dists = np.zeros((n, len(self.qids)), dtype=np.float64)
            for m in range(PQ_SUBSPACES):
                dists += self.lut[:, m, :].T[codes[:, m]]
            vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            out = {"query_id": [], "vec_id": [], "dist": []}
            kk = min(k, n)
            for qi, qid in enumerate(self.qids):
                col = dists[:, qi]
                # local top-k under the SAME order as the merge and the
                # oracle: rounded dist ASC, vec_id ASC
                order = np.lexsort((vec_ids, round_half_away(col, 4)))
                for j in order[:kk]:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["dist"].append(float(col[j]))
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "dist": pa.array(out["dist"], pa.float64()),
                }
            )

    local = ds.map_batches(
        warm_factory(("s_pq_adc", k, bref.hex()), AdcScore), batch_format="pyarrow"
    ).to_pandas()
    return _adc_merge(local, k)


def _adc_merge(local: pd.DataFrame, k: int = TOP_K) -> pd.DataFrame:
    """Driver merge of per-batch ADC top-k candidates (tiny frame): rounded
    dist ASC, vec_id ASC — the same total order the batches pre-ranked on
    and the oracle replays."""
    local = local.copy()
    local["dist"] = round_half_away(local["dist"].to_numpy(), 4)
    out = []
    for qid, g in local.groupby("query_id"):
        g = g.sort_values(["dist", "vec_id"], ascending=[True, True]).head(k)
        out.append(g.assign(rank=range(1, len(g) + 1)))
    df = pd.concat(out).reset_index(drop=True)
    return df[["query_id", "rank", "vec_id", "dist"]]


RERANK_SHORTLIST = 32  # ADC candidates per query fed to the exact refine


def s_ann_rerank(sf_dir: str):
    """Two-stage retrieval: ADC shortlist -> EXACT cosine re-rank — the
    refine step every production IVF-PQ deployment runs (Jégou et al.'s
    ADC is a lossy 4-bit rank; re-scoring the top RERANK_SHORTLIST
    candidates with true similarities recovers near-exact quality while
    the full corpus is still scanned as codes only).

    Scale shape: stage 1 is the identical bytes-only ADC scan as s_pq_adc
    (shared `_adc_shortlist`, local top-k + driver merge, zero shuffle);
    stage 2 touches raw floats for ONLY queries x shortlist vectors — a
    zone-map-pruned parquet read of the candidate ids (row groups whose
    [min,max] cover them), never a second corpus pass.  The exact rerank
    math is the s_knn kernel: normalized dot with the zero-operand mask
    (`_mask_zero_cosine` — DuckDB pins any zero operand to -1).

    The oracle composes the retrained-literal ADC CTE family (shortlist
    replayed verbatim) with list_cosine_similarity over the same
    candidate join — shortlist recall and the refine ranking are both
    value-checked."""
    import pyarrow.parquet as pq

    short = _adc_shortlist(sf_dir, RERANK_SHORTLIST)
    if len(short) == 0:
        return _empty_result(query_id="i", rank="i", vec_id="i", sim="f")
    qids, qn = _query_matrix(sf_dir)
    _, qraw = _query_matrix_raw(sf_dir)
    cand_ids = sorted({int(v) for v in short["vec_id"]})
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", cand_ids)],
    )
    cdf = t.to_pandas()
    raw = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
    cnorm = _normalize(raw)
    sims = _mask_zero_cosine(cnorm @ qn.T, raw, qraw)
    row_of = {int(v): i for i, v in enumerate(cdf["vec_id"].to_numpy())}
    qcol_of = {int(q): i for i, q in enumerate(qids)}
    out = []
    for qid, g in short.groupby("query_id"):
        vids = np.sort(g["vec_id"].to_numpy(np.int64))
        s = round_half_away(
            sims[[row_of[int(v)] for v in vids], qcol_of[int(qid)]], 4
        )
        order = np.lexsort((vids, -s))[:TOP_K]
        for r, j in enumerate(order, 1):
            out.append((int(qid), r, int(vids[j]), float(s[j])))
    df = pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "sim"])
    return df.astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64", "sim": "float64"}
    )


def s_ann_ivfpq(sf_dir: str, n_centroids: int = 0, nprobe: int = 0):
    """IVF-PQ — the canonical corpus-scale ANN layout (Jégou et al.),
    composed from the two exact-oracled halves this engine already ships:
    the IVF coarse quantizer restricts each query to its probed cells
    (`_ivf_index`, cell = argmax centroid dot on the normalized vector)
    and ADC scores ONLY those candidates from the 4-bit PQ codes
    (`s_pq_adc`'s LUT gather, raw-coordinate space).  One broadcast
    carries centroids + probe sets + codebooks + LUTs; each batch assigns
    cells and codes once, masks per query, local-top-ks the survivors —
    zero shuffle, and at deployment the scan reads cell-partitioned 4-bit
    codes: I/O scales with the probe set (the s_ann_partitioned layout)
    and bytes-per-vector is ~50x under the raw floats.

    The DuckDB oracle composes the SAME two independently-retrained CTE
    families (probed-cell candidates x ADC scoring), so the full
    train/probe/assign/lookup/rank composition is value-checked."""
    import ray

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_rows == 0:
        return _empty_result(query_id="i", rank="i", vec_id="i", dist="f")
    qids, _qmat_norm, centroids, probes, _k, _np_ = _ivf_index(
        sf_dir, n_centroids, nprobe
    )
    sample_df = _topk(ds, min(n_rows, 50 * PQ_CODEBOOK), ["vec_id"], [False])
    sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    books = pq_codebooks(sample)
    _, qraw = _raw_query_vectors(sf_dir)
    bounds = _pq_bounds(qraw.shape[1])
    lut = np.empty((len(qids), PQ_SUBSPACES, PQ_CODEBOOK), dtype=np.float64)
    for m, C in enumerate(books):
        qs = qraw[:, bounds[m] : bounds[m + 1]]
        lut[:, m, :] = ((qs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    bref = ray.put((qids, centroids, probes, books, lut))

    class IvfPqScore:
        def __init__(self):
            (
                self.qids,
                self.centroids,
                self.probes,
                self.books,
                self.lut,
            ) = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "dist": pa.array([], pa.float64()),
                    }
                )
            X = _batch_matrix(t)
            cells = (_normalize(X) @ self.centroids.T).argmax(axis=1)
            bounds_ = _pq_bounds(X.shape[1])
            n = len(X)
            codes = np.empty((n, PQ_SUBSPACES), dtype=np.int64)
            for m, C in enumerate(self.books):
                sub = X[:, bounds_[m] : bounds_[m + 1]]
                codes[:, m] = (-2.0 * (sub @ C.T) + (C * C).sum(axis=1)).argmin(
                    axis=1
                )
            dists = np.zeros((n, len(self.qids)), dtype=np.float64)
            for m in range(PQ_SUBSPACES):
                dists += self.lut[:, m, :].T[codes[:, m]]
            vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            out = {"query_id": [], "vec_id": [], "dist": []}
            for qi, qid in enumerate(self.qids):
                hit = np.isin(cells, self.probes[qi])
                if not hit.any():
                    continue
                col = dists[hit, qi]
                ids = vec_ids[hit]
                order = np.lexsort((ids, round_half_away(col, 4)))[: min(TOP_K, len(ids))]
                for j in order:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(ids[j]))
                    out["dist"].append(float(col[j]))
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "dist": pa.array(out["dist"], pa.float64()),
                }
            )

    local = ds.map_batches(
        warm_factory(("s_ann_ivfpq", bref.hex()), IvfPqScore),
        batch_format="pyarrow",
    ).to_pandas()
    return _adc_merge(local)


def _ivf_index(sf_dir: str, n_centroids: int = 0, nprobe: int = 0):
    """Deterministic IVF coarse index shared by s_ann_ivf and its
    exact-oracle candidates companion: trains the quantizer on the 50*k
    lowest vec_ids (streaming local min-k — no sort shuffle) and derives
    each query's probe cells.  Returns (qids, qmat, centroids, probes,
    n_centroids, nprobe)."""
    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_centroids <= 0:
        n_centroids = max(2, int(np.sqrt(n_rows)))
    if nprobe <= 0:
        nprobe = max(1, -(-n_centroids // 4))
    sample_df = _topk(ds, min(n_rows, 50 * n_centroids), ["vec_id"], [False])
    sample = _normalize(
        np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    )
    centroids = _kmeans(sample, n_centroids)
    qids, qmat = _query_matrix(sf_dir)
    probes = [
        np.argsort(-(qmat[qi] @ centroids.T), kind="stable")[:nprobe]
        for qi in range(len(qids))
    ]
    return qids, qmat, centroids, probes, n_centroids, nprobe


def s_ann_ivf(sf_dir: str, n_centroids: int = 0, nprobe: int = 0):
    """IVF approximate top-k + per-query recall vs the exact result.

    The inverted-file scale path next to the LSH one: a coarse quantizer is
    TRAINED on a bounded sample (driver k-means, sqrt(N) centroids — the
    standard IVF sizing), broadcast once, and each batch assigns its
    vectors with one matmul.  A query probes its ``nprobe`` nearest
    centroids and scores ONLY vectors assigned to those cells, so the
    per-batch matmul shrinks to the probed fraction (~nprobe/k of the
    corpus as cells balance).  At deployment the centroid id is the
    hive-partition key of the vector store — the same
    write-partitioned/read-probed layout `build_vector_store` implements
    for LSH signatures, with cell ids instead of signatures.

    Returns (query_id, n_candidates, recall_at_k, n_probed, n_centroids);
    EXACT-oracled since round 5: the retrained-quantizer candidate CTEs
    join the exact-top-k CTE, and recall = |cand ∩ truth| / |truth| — no
    re-scoring needed because the approximate ranking uses the same total
    order as the exact one (see __ray_entry__._RECALL_CORE).
    """
    import ray

    ds = _read_embeddings(sf_dir)
    if ds.count() == 0:
        return _empty_result(
            query_id="i",
            n_candidates="i",
            recall_at_k="f",
            n_probed="i",
            n_centroids="i",
        )
    qids, qmat, centroids, probes, n_centroids, nprobe = _ivf_index(
        sf_dir, n_centroids, nprobe
    )
    bref = ray.put((qids, qmat, centroids, probes))

    class IvfProbeScore:
        def __init__(self):
            self.qids, self.qmat, self.centroids, self.probes = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {"query_id": [], "vec_id": [], "sim": [], "n_candidates": []}
            if len(t):
                raw = _batch_matrix(t)
                vecs = _normalize(raw)
                zero_rows = ~raw.any(axis=1)
                vec_ids = t.column("vec_id").to_numpy()
                assign = (vecs @ self.centroids.T).argmax(axis=1)
                for qi, qid in enumerate(self.qids):
                    mask = np.isin(assign, self.probes[qi])
                    n_cand = int(mask.sum())
                    if n_cand:
                        sims = vecs[mask] @ self.qmat[qi]
                        # zero-operand cosine -> -1 (see _mask_zero_cosine)
                        sims[zero_rows[mask]] = -1.0
                        if not self.qmat[qi].any():
                            sims[:] = -1.0
                        cand_ids = vec_ids[mask]
                        order = np.lexsort((cand_ids, -round_half_away(sims, 4)))
                        first = True
                        for j in order[: min(TOP_K, n_cand)]:
                            out["query_id"].append(int(qid))
                            out["vec_id"].append(int(cand_ids[j]))
                            out["sim"].append(float(sims[j]))
                            out["n_candidates"].append(n_cand if first else 0)
                            first = False
                    else:
                        out["query_id"].append(int(qid))
                        out["vec_id"].append(-1)
                        out["sim"].append(-2.0)
                        out["n_candidates"].append(0)
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                    "n_candidates": pa.array(out["n_candidates"], pa.int64()),
                }
            )

    local = ds.map_batches(
        warm_factory(("s_ann_ivf", bref.hex()), IvfProbeScore),
        batch_format="pyarrow",
        batch_size=2048,
    ).to_pandas()
    n_cand = local.groupby("query_id")["n_candidates"].sum()
    local = local[local["vec_id"] >= 0]
    exact = s_knn_bruteforce(sf_dir)
    out = {
        "query_id": [],
        "n_candidates": [],
        "recall_at_k": [],
        "n_probed": [],
        "n_centroids": [],
    }
    for qid in qids:
        g = local[local["query_id"] == qid]
        g = g.assign(sim=round_half_away(g["sim"].to_numpy(), 4)).sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        ).head(TOP_K)
        approx = set(g["vec_id"].astype(int))
        truth = set(exact[exact["query_id"] == qid]["vec_id"])
        out["query_id"].append(int(qid))
        out["n_candidates"].append(int(n_cand.get(qid, 0)))
        out["recall_at_k"].append(round(len(approx & truth) / max(1, len(truth)), 4))
        out["n_probed"].append(nprobe)
        out["n_centroids"].append(n_centroids)
    return pd.DataFrame(out)


def s_lsh_buckets(sf_dir: str, n_planes: int = 0):
    """LSH bucket histogram: (sig, n_vecs) per occupied bucket.

    The Sign stage + a counted groupby over (vec_id, sig) rows — the
    partition layout a bucketed vector store would be written with.  The
    quadratic within-bucket pair expansion lives in `lsh_candidate_pairs`
    and is only appropriate at high dup thresholds."""
    import ray
    from ray.data.aggregate import Count

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_planes <= 0:
        n_planes = _auto_planes(n_rows)
    rng = np.random.RandomState(17)
    if n_rows == 0:  # empty corpus: no buckets
        return pd.DataFrame(
            {
                "sig": pd.Series([], dtype="int64"),
                "n_vecs": pd.Series([], dtype="int64"),
            }
        )
    first = ds.take(1)[0]
    planes = rng.randn(len(first["embedding"]), n_planes).astype(np.float64)
    planes_ref = ray.put(planes)

    class SignFromRef:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.shifts = 1 << np.arange(self.planes.shape[1])

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"sig": pa.array([], pa.int64())})
            vecs = _normalize(_batch_matrix(t))
            sigs = (((vecs @ self.planes) > 0) * self.shifts).sum(axis=1)
            return pa.table({"sig": pa.array(sigs.astype(np.int64), pa.int64())})

    out = typed_collect(
        ds.map_batches(
            warm_factory(("s_lsh_buckets", planes_ref.hex()), SignFromRef),
            batch_format="pyarrow",
        )
        .groupby("sig")
        .aggregate(Count(alias_name="n_vecs")),
        pa.schema([("sig", pa.int64()), ("n_vecs", pa.int64())]),
    )
    return out.sort_values("sig").reset_index(drop=True)


def lsh_candidate_pairs(sf_dir: str, n_planes: int = 0):
    """LSH-bucketed near-dup CANDIDATE pairs (the high-threshold scale path).

    Signatures via map_batches, then the shared vectorized pair generator
    from `textops._candidate_pairs` (Acero self-join on the bucket key — the
    groupby().map_groups form costs ~1 ms of Python per mostly-singleton
    group).  Correct when the duplicate threshold is high (sim >= ~0.9,
    where per-plane collision probability approaches 1); NOT used for
    `s_embedding_dupes`' 0.42 threshold, where exactness requires all-pairs
    (see module docstring)."""
    import ray

    from .textops import _candidate_pairs

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_planes <= 0:
        n_planes = _auto_planes(n_rows)
    rng = np.random.RandomState(17)

    # dim discovered from the first row's list length (single row-group read)
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    planes = rng.randn(dim, n_planes).astype(np.float64)
    planes_ref = ray.put(planes)

    class SignBuckets:
        """(vec_id, band, band_key) rows for the shared pair generator —
        one band whose key is the full signature."""

        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.shifts = 1 << np.arange(self.planes.shape[1])

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "band": pa.array([], pa.int32()),
                        "band_key": pa.array([], pa.string()),
                    }
                )
            vecs = _normalize(_batch_matrix(t))
            sigs = (((vecs @ self.planes) > 0) * self.shifts).sum(axis=1)
            return pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "band": pa.array(np.zeros(len(t), np.int32), pa.int32()),
                    "band_key": pa.array([format(int(s), "x") for s in sigs]),
                }
            )

    buckets = ds.map_batches(
        warm_factory(("lsh_cand", planes_ref.hex()), SignBuckets),
        batch_format="pyarrow",
    )
    pairs = _candidate_pairs(buckets, "vec_id").to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
        )
    pairs = pairs.rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})
    return pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# partitioned vector store: the deployment layout `s_ann_lsh` documents —
# vectors written once partitioned by LSH signature, queries read ONLY the
# probed partitions (touched files scale with the probe set, not the corpus)

def build_vector_store(sf_dir: str, out_dir: str, n_planes: int = 0) -> dict:
    """Write the embeddings hive-partitioned by LSH signature.

    Each vector's signature is computed in-stream (one matmul per batch
    against the broadcast plane matrix) and becomes both a data column
    (``sig``) and the hive partition key (``sigp``), so a reader that
    selects partition directories still has the signature without re-signing.
    Returns {"n_planes", "n_rows", "planes"} — planes are regenerated from
    the fixed seed at query time, so the store needs no sidecar file.
    """
    import ray
    import ray.data as rd  # noqa: F401

    ds = _read_embeddings(sf_dir)
    n_rows = ds.count()
    if n_planes <= 0:
        n_planes = _auto_planes(n_rows)
    if n_rows == 0:
        # empty corpus: an empty store (no partition dirs) — the query
        # side already treats zero probed partitions as zero candidates
        import os

        os.makedirs(out_dir, exist_ok=True)
        return {"n_planes": n_planes, "n_rows": 0, "dim": 0}
    rng = np.random.RandomState(17)
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    planes = rng.randn(dim, n_planes).astype(np.float64)
    planes_ref = ray.put(planes)

    class Sign:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.shifts = 1 << np.arange(self.planes.shape[1])

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "embedding": pa.array([], pa.list_(pa.float64())),
                        "sig": pa.array([], pa.int64()),
                        "sigp": pa.array([], pa.int64()),
                    }
                )
            vecs = _normalize(_batch_matrix(t))
            sigs = ((vecs @ self.planes) > 0) * self.shifts
            sigs = sigs.sum(axis=1).astype(np.int64)
            sig_arr = pa.array(sigs, pa.int64())
            return (
                t.append_column("sig", sig_arr).append_column("sigp", sig_arr)
            )

    ds.map_batches(
        warm_factory(("vstore_sign", planes_ref.hex()), Sign), batch_format="pyarrow"
    ).write_parquet(
        out_dir, partition_cols=["sigp"]
    )
    return {"n_planes": n_planes, "n_rows": n_rows, "dim": dim}


def query_vector_store(store_dir: str, sf_dir: str, n_planes: int) -> pd.DataFrame:
    """ANN top-k against the partitioned store, reading ONLY probed partitions.

    The probe sets (exact bucket + Hamming<=2) pick partition DIRECTORIES;
    everything else never leaves storage — the pruning `s_ann_lsh` performs
    in-stream becomes an I/O-level skip here.  Returns per-query
    (query_id, n_candidates, recall_at_k, n_parts_read, n_parts_total).
    """
    import os

    import ray
    import ray.data as rd

    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    rng = np.random.RandomState(17)
    planes = rng.randn(dim, n_planes).astype(np.float64)
    qsigs = ((qmat @ planes) > 0) * (1 << np.arange(n_planes))
    qsigs = qsigs.sum(axis=1)
    probes = [_probe_set(int(s), n_planes) for s in qsigs]

    all_parts = sorted(d for d in os.listdir(store_dir) if d.startswith("sigp="))
    wanted = set()
    for p in probes:
        wanted.update(int(v) for v in p)
    read_parts = [
        os.path.join(store_dir, d)
        for d in all_parts
        if int(d.split("=", 1)[1]) in wanted
    ]
    # expand to files: a path LIST is taken file-wise by the parquet reader
    read_files = [
        os.path.join(d, f)
        for d in read_parts
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not read_parts:
        return pd.DataFrame(
            {
                "query_id": pd.Series(qids, dtype="int64"),
                "n_candidates": 0,
                "recall_at_k": 0.0,
                "n_parts_read": 0,
                "n_parts_total": len(all_parts),
            }
        )
    bref = ray.put((qids, qmat, probes))

    class ScoreProbed:
        def __init__(self):
            self.qids, self.qmat, self.probes = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {"query_id": [], "vec_id": [], "sim": [], "n_candidates": []}
            if len(t):
                raw = _batch_matrix(t)
                vecs = _normalize(raw)
                zero_rows = ~raw.any(axis=1)
                vec_ids = t.column("vec_id").to_numpy()
                sigs = t.column("sig").to_numpy()
                for qi, qid in enumerate(self.qids):
                    mask = np.isin(sigs, self.probes[qi])
                    n_cand = int(mask.sum())
                    if not n_cand:
                        continue
                    sims = vecs[mask] @ self.qmat[qi]
                    # zero-operand cosine -> -1 (see _mask_zero_cosine)
                    sims[zero_rows[mask]] = -1.0
                    if not self.qmat[qi].any():
                        sims[:] = -1.0
                    cand_ids = vec_ids[mask]
                    order = np.lexsort((cand_ids, -round_half_away(sims, 4)))
                    first = True
                    for j in order[: min(TOP_K, n_cand)]:
                        out["query_id"].append(int(qid))
                        out["vec_id"].append(int(cand_ids[j]))
                        out["sim"].append(float(sims[j]))
                        out["n_candidates"].append(n_cand if first else 0)
                        first = False
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                    "n_candidates": pa.array(out["n_candidates"], pa.int64()),
                }
            )

    local = (
        rd.read_parquet(read_files, columns=["vec_id", "embedding", "sig"])
        .map_batches(
            warm_factory(("vstore_query", bref.hex()), ScoreProbed),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    n_cand = (
        local.groupby("query_id")["n_candidates"].sum()
        if len(local)
        else pd.Series(dtype="int64")
    )
    exact = s_knn_bruteforce(sf_dir)
    out = {
        "query_id": [],
        "n_candidates": [],
        "recall_at_k": [],
        "n_parts_read": [],
        "n_parts_total": [],
    }
    for qid in qids:
        g = local[local["query_id"] == qid] if len(local) else local
        if len(g):
            g = g.assign(sim=round_half_away(g["sim"].to_numpy(), 4)).sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            ).head(TOP_K)
            approx = set(g["vec_id"].astype(int))
        else:
            approx = set()
        truth = set(exact[exact["query_id"] == qid]["vec_id"])
        out["query_id"].append(int(qid))
        out["n_candidates"].append(int(n_cand.get(qid, 0)))
        out["recall_at_k"].append(round(len(approx & truth) / max(1, len(truth)), 4))
        out["n_parts_read"].append(len(read_parts))
        out["n_parts_total"].append(len(all_parts))
    return pd.DataFrame(out)


_STORE_CACHE: dict = {}
# The cached demo store lives on the DRIVER's /tmp and is read by workers
# via plain paths — valid single-node or on a shared filesystem only (a
# real deployment passes build_vector_store an out_dir on shared/object
# storage and keeps it, that being the point of a vector store).  The
# atexit hook below stops the per-process /tmp leak ADVICE r04 flagged.


def _cached_store(sf_dir: str):
    if sf_dir not in _STORE_CACHE:
        import atexit
        import shutil
        import tempfile

        out_dir = tempfile.mkdtemp(prefix="pdfray_vecstore_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        info = build_vector_store(sf_dir, out_dir)
        _STORE_CACHE[sf_dir] = (out_dir, info)
    return _STORE_CACHE[sf_dir]


def s_ann_partitioned(sf_dir: str):
    """ANN through the write-partitioned / read-probed vector store layout.
    EXACT-oracled since round 5 (recall + the partition read/total counts
    all recomputed in SQL from the embedded planes/probe sets —
    __ray_entry__._ann_lsh_recall_oracle(partitioned=True)); the
    partition-pruning guarantees are additionally pinned by unit tests."""
    out_dir, info = _cached_store(sf_dir)
    return query_vector_store(out_dir, sf_dir, info["n_planes"])


def _lsh_probe_setup(sf_dir: str):
    """Planes / query probe sets of the seeded, fully-determined LSH index
    (shared by the in-stream and store-backed candidate companions)."""
    ds = _read_embeddings(sf_dir)
    n_planes = _auto_planes(ds.count())
    qids, qmat = _query_matrix(sf_dir)
    planes = (
        np.random.RandomState(17).randn(qmat.shape[1], n_planes).astype(np.float64)
    )
    shifts = 1 << np.arange(n_planes)
    qsigs = (((qmat @ planes) > 0) * shifts).sum(axis=1)
    probes = [_probe_set(int(s), n_planes) for s in qsigs]
    return ds, qids, planes, probes, n_planes


def s_ann_lsh_candidates(sf_dir: str):
    """EXACT-ORACLE companion to s_ann_lsh: the per-query candidate sets of
    the seeded LSH index — (query_id, vec_id) for every corpus vector whose
    signature falls in the query's Hamming<=2 probe set.  The DuckDB oracle
    recomputes signatures from the same literal-embedded planes and probe
    lists (s_lsh_buckets precedent), so the candidate machinery itself is
    value-checked — and since round 5 the recall metric itself is exact
    too (the same CTEs joined against the exact-top-k CTE)."""
    import ray

    ds, qids, planes, probes, _ = _lsh_probe_setup(sf_dir)
    bref = ray.put((qids, planes, probes))

    class Cand:
        def __init__(self):
            self.qids, self.planes, self.probes = ray.get(bref)
            self.shifts = 1 << np.arange(self.planes.shape[1])

        def __call__(self, t: pa.Table) -> pa.Table:
            qs: list = []
            vs: list = []
            if len(t):
                vecs = _normalize(_batch_matrix(t))
                sigs = (((vecs @ self.planes) > 0) * self.shifts).sum(axis=1)
                vec_ids = t.column("vec_id").to_numpy()
                for qi, qid in enumerate(self.qids):
                    hit = vec_ids[np.isin(sigs, self.probes[qi])]
                    qs.extend([int(qid)] * len(hit))
                    vs.extend(int(v) for v in hit)
            return pa.table(
                {
                    "query_id": pa.array(qs, pa.int64()),
                    "vec_id": pa.array(vs, pa.int64()),
                }
            )

    out = typed_collect(
        ds.map_batches(
            warm_factory(("s_lsh_cand", bref.hex()), Cand), batch_format="pyarrow"
        ),
        pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64())]),
    )
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def s_ann_partitioned_candidates(sf_dir: str):
    """Store-backed twin of s_ann_lsh_candidates: build (or reuse) the
    hive-partitioned vector store, read ONLY the probed partition
    directories, and emit the same (query_id, vec_id) sets.  The oracle is
    the identical SQL — a match certifies that the write-partitioned /
    read-probed layout loses and invents nothing vs the in-stream path."""
    import os

    import ray.data as rd

    _, qids, planes, probes, n_planes = _lsh_probe_setup(sf_dir)
    store_dir, info = _cached_store(sf_dir)
    assert info["n_planes"] == n_planes
    wanted = sorted({int(v) for p in probes for v in p})
    files = []
    for s in wanted:
        d = os.path.join(store_dir, f"sigp={s}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not files:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
            }
        )
    # probed partitions only — candidate-sized, never the corpus
    hits = rd.read_parquet(files, columns=["vec_id", "sig"]).to_pandas()
    frames = []
    for qi, qid in enumerate(qids):
        g = hits[hits["sig"].isin(probes[qi])]
        frames.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(g), int(qid), np.int64),
                    "vec_id": g["vec_id"].to_numpy(np.int64),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def s_ann_ivf_candidates(sf_dir: str):
    """EXACT-ORACLE companion to s_ann_ivf: (query_id, vec_id) for every
    vector assigned to one of the query's probed IVF cells.  The trained
    coarse quantizer is fully determined (seeded driver k-means on the
    50*k lowest vec_ids), so the oracle retrains it independently from the
    raw parquet and embeds the centroids as SQL literals; cell assignment
    (argmax of the centroid dot products) is recomputed per vector in
    DuckDB.  Since round 5 s_ann_ivf's recall metric is exact as well
    (same CTEs + the exact-top-k join)."""
    import ray

    ds = _read_embeddings(sf_dir)
    if ds.count() == 0:
        return _empty_result(query_id="i", vec_id="i")
    qids, _qmat, centroids, probes, _k, _np_ = _ivf_index(sf_dir)
    bref = ray.put((qids, centroids, probes))

    class Cand:
        def __init__(self):
            self.qids, self.centroids, self.probes = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            qs: list = []
            vs: list = []
            if len(t):
                vecs = _normalize(_batch_matrix(t))
                assign = (vecs @ self.centroids.T).argmax(axis=1)
                vec_ids = t.column("vec_id").to_numpy()
                for qi, qid in enumerate(self.qids):
                    hit = vec_ids[np.isin(assign, self.probes[qi])]
                    qs.extend([int(qid)] * len(hit))
                    vs.extend(int(v) for v in hit)
            return pa.table(
                {
                    "query_id": pa.array(qs, pa.int64()),
                    "vec_id": pa.array(vs, pa.int64()),
                }
            )

    out = typed_collect(
        ds.map_batches(
            warm_factory(("s_ivf_cand", bref.hex()), Cand), batch_format="pyarrow"
        ),
        pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64())]),
    )
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


# exact all-pairs scoring is O(N^2) compute by design (see module
# docstring); above this row count it cannot be the right tool and the
# caller must choose the bucketed generator (`lsh_candidate_pairs`) or
# explicitly force the quadratic run
EXACT_PAIRS_MAX_ROWS = 250_000


def _require_exact_pairs_feasible(n_rows: int, force: bool):
    if force or n_rows <= EXACT_PAIRS_MAX_ROWS:
        return
    raise ValueError(
        f"s_embedding_dupes is exact all-pairs (O(N^2)): {n_rows} rows exceed "
        f"EXACT_PAIRS_MAX_ROWS={EXACT_PAIRS_MAX_ROWS}. Use lsh_candidate_pairs "
        f"(bucketed, high-threshold) or pass force_exact=True if the quadratic "
        f"cost is intended."
    )


def s_embedding_dupes(sf_dir: str, threshold: float = 0.42, force_exact: bool = False):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= threshold).

    Exact block-pair scoring: the normalized vectors are materialized as
    object-store blocks of PAIR_BLOCK_ROWS rows; a Dataset of (i, j) block
    index pairs drives one task per pair, each fetching exactly two blocks
    and emitting its qualifying pairs.  Per-task memory is two blocks; the
    driver only ever holds block REFERENCES and the final (rare) dup pairs.
    Compute is O(N^2/2) by necessity — the threshold sits inside the bulk
    sim distribution, so no sublinear candidate scheme is exact here.
    A hard row-count gate (`EXACT_PAIRS_MAX_ROWS`) keeps the quadratic
    plan from ever being silently chosen at corpus scale."""
    import ray
    import ray.data as rd

    _require_exact_pairs_feasible(_read_embeddings(sf_dir).count(), force_exact)

    def normalize(t: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(t))
        dim = vecs.shape[1] if len(vecs) else 0
        offs = pa.array(np.arange(0, (len(t) + 1) * dim, max(dim, 1), dtype=np.int32))
        emb = pa.ListArray.from_arrays(offs, pa.array(vecs.ravel(), pa.float64()))
        return pa.table({"vec_id": t.column("vec_id"), "embedding": emb})

    # normalized blocks live in the object store; the driver sees refs only
    _mat = (
        _read_embeddings(sf_dir)
        .map_batches(normalize, batch_format="pyarrow", batch_size=PAIR_BLOCK_ROWS)
        .materialize()
    )
    if _mat.count() == 0:  # empty corpus: no pairs (an empty block would
        # reach the scorer as a zero-column table and IndexError)
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
    blocks = _mat.to_arrow_refs()

    idx_pairs = [
        {"bi": i, "bj": j} for i in range(len(blocks)) for j in range(i, len(blocks))
    ]
    refs_ref = ray.put(blocks)

    class ScoreBlockPair:
        CHUNK = PAIR_BLOCK_ROWS  # bounds the sims submatrix independent of block size

        def __init__(self):
            self.blocks = ray.get(refs_ref)  # list of refs (tiny)

        def __call__(self, t: pa.Table) -> pa.Table:
            import ray as _ray

            out = {"vec_a": [], "vec_b": [], "sim": []}
            for bi, bj in zip(t.column("bi").to_pylist(), t.column("bj").to_pylist()):
                tbl_i = _ray.get(self.blocks[bi])
                tbl_j = tbl_i if bj == bi else _ray.get(self.blocks[bj])
                ids_i = tbl_i.column("vec_id").to_numpy()
                ids_j = tbl_j.column("vec_id").to_numpy()
                mat_i = _batch_matrix(tbl_i)
                mat_j = mat_i if bj == bi else _batch_matrix(tbl_j)
                ch = self.CHUNK
                for r0 in range(0, len(ids_i), ch):
                    for c0 in range(0, len(ids_j), ch):
                        sims = mat_i[r0 : r0 + ch] @ mat_j[c0 : c0 + ch].T
                        rows, cols = np.nonzero(sims >= threshold)
                        for r, c in zip(rows, cols):
                            a = int(ids_i[r0 + r])
                            b = int(ids_j[c0 + c])
                            if a == b:
                                continue  # self-sim on the diagonal block
                            lo, hi = (a, b) if a < b else (b, a)
                            if bi == bj and a > b:
                                continue  # each in-block pair appears twice
                            out["vec_a"].append(lo)
                            out["vec_b"].append(hi)
                            out["sim"].append(float(round_half_away(sims[r, c], 4)))
            return pa.table(
                {
                    "vec_a": pa.array(out["vec_a"], pa.int64()),
                    "vec_b": pa.array(out["vec_b"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    res = (
        rd.from_items(idx_pairs)
        .map_batches(
            warm_factory(("emb_dupes", refs_ref.hex()), ScoreBlockPair),
            batch_format="pyarrow",
            batch_size=1,
        )
        .to_pandas()
    )
    if len(res) == 0:
        return pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
    return res.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def s_label_centroids(sf_dir: str):
    """Per-label centroid of the embedding column, long format: one row
    per (label, dim) with the member count and the centroid coordinate.

    ZERO shuffle: each batch collapses to (label, dim, partial-sum, n)
    rows — 10 labels x 64 dims regardless of batch size — and the driver
    combines the reduced partials (labels x dims x blocks rows, the
    collect-only-grouped-rows pattern).  float32 vectors are upcast to
    float64 BEFORE summing so both sides accumulate in double like DuckDB's
    SUM; coordinates are rounded to 4 decimals on both sides.  This is the
    k-means M-step / class-prototype primitive at corpus scale."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        labels = t.column("label").to_numpy(zero_copy_only=False)
        emb = np.stack(
            t.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lab in np.unique(labels):
            sel = emb[labels == lab]
            s = sel.sum(axis=0)
            d = np.arange(1, emb.shape[1] + 1, dtype=np.int64)
            rows_l.append(np.full(emb.shape[1], lab, np.int64))
            rows_d.append(d)
            rows_s.append(s)
            rows_n.append(np.full(emb.shape[1], sel.shape[0], np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(rows_l), pa.int64()),
                "dim": pa.array(np.concatenate(rows_d), pa.int64()),
                "s": pa.array(np.concatenate(rows_s), pa.float64()),
                "n": pa.array(np.concatenate(rows_n), pa.int64()),
            }
        )

    partials = typed_collect(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("s", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )
    g = partials.groupby(["label", "dim"], as_index=False).sum()
    g["centroid"] = round_half_away((g["s"] / g["n"]).to_numpy(), 4)
    out = g[["label", "dim", "n", "centroid"]].copy()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


KMEANS_K = 10
KMEANS_ITERS = 8


def s_kmeans(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS, stats: dict = None):
    """Fully DISTRIBUTED Lloyd's k-means over the embedding table — the
    canonical iterative broadcast-reduce ML shape (unlike `_kmeans`, which
    trains on a driver-side bounded sample for IVF).

    Per iteration: centroids ship once via ``ray.put``; every batch
    assigns its vectors (one matmul) and collapses to k x (dim+1) partial
    rows (per-centroid sum + count) — ZERO shuffle, the driver M-step sums
    k x blocks reduced rows.  Euclidean objective; a cluster that receives
    no points KEEPS its previous centroid (standard Lloyd choice — no
    re-seeding, which keeps the run deterministic and matches the test's
    reference implementation); init = the k lowest-vec_id vectors
    (seedless, so retries reproduce the run).  The
    iteration loop is the part SQL cannot express — driver-checked
    rows-only, with an independent numpy reference implementation in the
    tests asserting bit-equal assignments and monotone inertia.
    Returns (vec_id, cluster); pass ``stats={}`` for per-iteration inertia
    and the final centroids."""
    import ray
    import ray.data as rd

    def _read():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    # deterministic init: the k lowest vec_ids via per-block local min-k
    # (one streaming pass; sort().limit() would range-shuffle the table)
    if _read().count() == 0:
        if stats is not None:
            stats["centroids"] = np.zeros((0, 0), np.float64)
            stats["inertia"] = []
        return _empty_result(vec_id="i", cluster="i")
    init = _topk(_read(), k, ["vec_id"], [False])
    centroids = np.stack(init["embedding"].to_numpy()).astype(np.float64)

    inertia_track = []
    for _ in range(iters):
        cref = ray.put(centroids)

        def estep(t: pa.Table, _cref=cref) -> pa.Table:
            C = ray.get(_cref)  # (k, d) — zero-copy from the object store
            X = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
            d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            best = d2[np.arange(len(X)), assign] + (X * X).sum(axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, X)
            counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
            inertia = np.zeros(len(C))
            inertia[0] = best.sum()  # one scalar per batch, summed later
            return pa.table(
                {
                    "c": pa.array(np.arange(len(C)), pa.int64()),
                    "n": pa.array(counts, pa.int64()),
                    "sum": pa.array(list(sums), pa.list_(pa.float64())),
                    "inertia": pa.array(inertia, pa.float64()),
                }
            )

        part = _read().map_batches(estep, batch_format="pyarrow").to_pandas()
        g = part.groupby("c")
        counts = g["n"].sum()
        sums = np.stack(
            [np.sum(np.stack(gg["sum"].to_numpy()), axis=0) for _, gg in g]
        )
        inertia_track.append(float(part["inertia"].sum()))
        new_c = centroids.copy()
        nz = counts.to_numpy() > 0
        new_c[nz] = sums[nz] / counts.to_numpy()[nz, None]
        centroids = new_c

    cref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64), pa.int64()),
            }
        )

    out = (
        _read()
        .map_batches(final_assign, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    if stats is not None:
        stats["centroids"] = centroids
        stats["inertia"] = inertia_track
    return out


def s_scalar_quantize(sf_dir: str):
    """Scalar (int8-range) quantization of the embedding column — the
    vector-store compression stage: per-dimension global [min, max] maps
    each coordinate to a 0..255 code.

    Two passes, the global-statistic shape: per-batch per-dim min/max
    partials (2 x dim values per block) reduce on the driver — min/max are
    float-order-independent, so the stats are EXACT — then the quantize
    map broadcasts (mn, mx) and emits codes.  The code arithmetic
    ``floor((x - mn) * 255 / (mx - mn) + 0.5)`` is written with the same
    association on both engine and oracle sides, so the doubles (and the
    codes) are bit-identical.  Long format (vec_id, dim, code) keeps the
    oracle a plain unnest."""
    import ray
    import ray.data as rd

    def _read():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    def minmax(t: pa.Table) -> pa.Table:
        X = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        d = np.arange(1, X.shape[1] + 1, dtype=np.int64)
        return pa.table(
            {
                "dim": pa.array(d, pa.int64()),
                "mn": pa.array(X.min(axis=0), pa.float64()),
                "mx": pa.array(X.max(axis=0), pa.float64()),
            }
        )

    part = typed_collect(
        _read().map_batches(minmax, batch_format="pyarrow"),
        pa.schema([("dim", pa.int64()), ("mn", pa.float64()), ("mx", pa.float64())]),
    )
    g = part.groupby("dim")
    mn = g["mn"].min().sort_index().to_numpy()
    mx = g["mx"].max().sort_index().to_numpy()
    ref = ray.put((mn, mx))

    def quantize_factory():
        mn_, mx_ = ray.get(ref)
        span = mx_ - mn_
        span[span == 0] = 1.0  # constant dim: every code 0

        def quantize(t: pa.Table) -> pa.Table:
            X = np.stack(
                t.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            codes = np.floor((X - mn_) * 255.0 / span + 0.5).astype(np.int64)
            n, d = X.shape
            return pa.table(
                {
                    "vec_id": pa.array(
                        np.repeat(
                            t.column("vec_id").to_numpy(zero_copy_only=False), d
                        ),
                        pa.int64(),
                    ),
                    "dim": pa.array(
                        np.tile(np.arange(1, d + 1, dtype=np.int64), n), pa.int64()
                    ),
                    "code": pa.array(codes.ravel(), pa.int64()),
                }
            )

        return quantize

    from .textops import warm_factory

    out = typed_collect(
        _read().map_batches(
            warm_factory(("s_quantize", ref.hex()), quantize_factory),
            batch_format="pyarrow",
        ),
        pa.schema(
            [("vec_id", pa.int64()), ("dim", pa.int64()), ("code", pa.int64())]
        ),
    )
    return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)


def s_kmeans_init_assign(sf_dir: str, k: int = KMEANS_K):
    """EXACT-ORACLE companion to s_kmeans: one E-step with the FIXED
    deterministic init centroids (the k lowest-vec_id vectors) — the same
    argmin(-2 x·c + |c|^2) assignment arithmetic the iterative loop runs
    every round, value-checked in SQL with literal centroids (only the
    Lloyd ITERATION stays rows-only, its convergence pinned by the
    bit-equal numpy test)."""
    import ray

    ds = _read_embeddings(sf_dir)
    if ds.count() == 0:
        return _empty_result(vec_id="i", cluster="i")
    init = _topk(ds, k, ["vec_id"], [False])
    centroids = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        C = ray.get(cref)
        X = _batch_matrix(t)
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(
        warm_factory(("s_kmeans_init", cref.hex()), lambda: assign),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def s_mips_topk(sf_dir: str):
    """Exact MAXIMUM-INNER-PRODUCT top-k per query — the similarity-search
    metric recommendation and two-tower retrieval engines rank by (dot
    product, NOT cosine: vector magnitude carries signal, so neither side
    is normalized).  Same scale shape as s_knn_bruteforce: the raw query
    matrix is ray.put once, every batch does one (batch, dim) x (dim, q)
    matmul and keeps only its local top-k UNDER THE SAME TOTAL ORDER as
    the global merge and the oracle (rounded score desc, vec_id asc), so
    at most k rows per (query, block) reach the driver."""
    import ray

    qids, qmat = _query_matrix_raw(sf_dir)
    qref = ray.put((qids, qmat))

    class Score:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "dot": pa.array([], pa.float64()),
                    }
                )
            vecs = _batch_matrix(t)  # RAW, magnitude-sensitive
            dots = vecs @ self.qmat.T
            vec_ids = t.column("vec_id").to_numpy()
            out = {"query_id": [], "vec_id": [], "dot": []}
            k = min(TOP_K, len(vec_ids))
            for qi, qid in enumerate(self.qids):
                col = dots[:, qi]
                order = np.lexsort((vec_ids, -round_half_away(col, 4)))
                for j in order[:k]:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["dot"].append(float(col[j]))
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "dot": pa.array(out["dot"], pa.float64()),
                }
            )

    local = (
        _read_embeddings(sf_dir)
        .map_batches(
            warm_factory(("s_mips", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    return _merge_topk(local, col="dot")


KNN_GRAPH_K = 5


def s_knn_graph(sf_dir: str, k: int = KNN_GRAPH_K, force_exact: bool = False):
    """Exact k-nearest-neighbor GRAPH over the embedding table — every
    vector's top-k cosine neighbors (self excluded), the building block
    under semantic dedup, diversity sampling and graph-based ANN index
    construction (it is s_knn_bruteforce with the whole corpus as the
    query side).

    Same block-pair shape as s_embedding_dupes: normalized blocks live in
    the object store, one task per unordered block pair fetches exactly
    two blocks and emits LOCAL top-k partials for both directions (each
    vector's best k within that opposite block, under the SAME total
    order as the merge: rounded sim desc, neighbor id asc), so at most
    k rows per (vector, block) leave any task.  The driver merge is
    O(n_vecs x n_blocks x k); at corpus scale the identical merge rides
    a (vec_id)-keyed groupby instead (the partials are already the
    shuffle-ready shape).  Compute is O(N^2) by necessity (exact graph);
    the `EXACT_PAIRS_MAX_ROWS` gate refuses the quadratic plan at corpus
    scale — the scale path is the ANN family's candidate generation.

    Zero vectors follow the pinned DuckDB convention (`_mask_zero_cosine`):
    any zero operand scores -1.0, ranking zero vectors' edges last."""
    import ray
    import ray.data as rd

    n_rows = _read_embeddings(sf_dir).count()
    _require_exact_pairs_feasible(n_rows, force_exact)
    if n_rows == 0:
        return _empty_result(vec_id="i", rank="i", nbr_id="i", sim="f")

    def normalize(t: pa.Table) -> pa.Table:
        raw = _batch_matrix(t)
        zero = (np.linalg.norm(raw, axis=1) == 0.0) if len(raw) else np.zeros(0, bool)
        vecs = _normalize(raw)
        dim = vecs.shape[1] if len(vecs) else 0
        offs = pa.array(np.arange(0, (len(t) + 1) * dim, max(dim, 1), dtype=np.int32))
        emb = pa.ListArray.from_arrays(offs, pa.array(vecs.ravel(), pa.float64()))
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "embedding": emb,
                "is_zero": pa.array(zero, pa.bool_()),
            }
        )

    blocks = (
        _read_embeddings(sf_dir)
        .map_batches(normalize, batch_format="pyarrow", batch_size=PAIR_BLOCK_ROWS)
        .materialize()
        .to_arrow_refs()
    )
    idx_pairs = [
        {"bi": i, "bj": j} for i in range(len(blocks)) for j in range(i, len(blocks))
    ]
    refs_ref = ray.put(blocks)

    def _local_topk(out, ids_q, sims, ids_n, self_mask):
        """Append each query row's top-k (sim desc, nbr asc) partials."""
        kk = min(k, sims.shape[1])
        for r in range(sims.shape[0]):
            row = sims[r]
            if self_mask is not None:
                row = row.copy()
                row[ids_n == ids_q[r]] = -np.inf  # self never an edge
            order = np.lexsort((ids_n, -row))[:kk]
            for j in order:
                if row[j] == -np.inf:
                    continue
                out["vec_id"].append(int(ids_q[r]))
                out["nbr_id"].append(int(ids_n[j]))
                out["sim"].append(float(row[j]))

    class ScoreBlockPair:
        def __init__(self):
            self.blocks = ray.get(refs_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import ray as _ray

            out = {"vec_id": [], "nbr_id": [], "sim": []}
            for bi, bj in zip(t.column("bi").to_pylist(), t.column("bj").to_pylist()):
                tbl_i = _ray.get(self.blocks[bi])
                tbl_j = tbl_i if bj == bi else _ray.get(self.blocks[bj])
                ids_i = tbl_i.column("vec_id").to_numpy()
                ids_j = tbl_j.column("vec_id").to_numpy()
                z_i = tbl_i.column("is_zero").to_numpy(zero_copy_only=False)
                z_j = tbl_j.column("is_zero").to_numpy(zero_copy_only=False)
                mat_i = _batch_matrix(tbl_i.drop_columns(["is_zero"]))
                mat_j = mat_i if bj == bi else _batch_matrix(tbl_j.drop_columns(["is_zero"]))
                sims = mat_i @ mat_j.T
                sims[z_i, :] = -1.0  # pinned zero-operand convention
                sims[:, z_j] = -1.0
                sims = round_half_away(sims, 4)
                _local_topk(out, ids_i, sims, ids_j, self_mask=True)
                if bj != bi:
                    _local_topk(out, ids_j, sims.T, ids_i, self_mask=True)
            return pa.table(
                {
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "nbr_id": pa.array(out["nbr_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    parts = typed_collect(
        rd.from_items(idx_pairs).map_batches(
            warm_factory(("knn_graph", refs_ref.hex()), ScoreBlockPair),
            batch_format="pyarrow",
            batch_size=1,
        ),
        pa.schema(
            [("vec_id", pa.int64()), ("nbr_id", pa.int64()), ("sim", pa.float64())]
        ),
    )
    rows = []
    for vid, g in parts.groupby("vec_id"):
        g = g.sort_values(["sim", "nbr_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        rows.append(g)
    out = pd.concat(rows) if rows else _empty_result(
        vec_id="i", nbr_id="i", sim="f", rank="i"
    )
    for c in ("vec_id", "rank", "nbr_id"):
        out[c] = out[c].astype("int64")
    return (
        out[["vec_id", "rank", "nbr_id", "sim"]]
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )


SEMDEDUP_TAU = 0.42  # same near-dup threshold as s_embedding_dupes


def s_semdedup(sf_dir: str, k: int = KMEANS_K, tau: float = SEMDEDUP_TAU):
    """SemDeDup-shape semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings, then drop within-cluster
    near-duplicates — the clustering makes the quadratic pair scoring
    tractable because it only ever runs INSIDE a cluster.

    Deterministic replay of the paper's shape: cluster assignment is the
    exact k-means E-step s_kmeans_init_assign pins (centroids = the k
    lowest-vec_id vectors, argmin of -2x.c + c.c with first-index ties),
    then one (cluster)-keyed exchange groups members and each group marks
    vec v keep=0 iff a SAME-CLUSTER member with a LOWER vec_id scores
    rounded cosine >= tau against it (greedy keep-first, the same
    deterministic keep rule the delta-dedup family uses).  Per-group
    work is one dense matmul; at 100 TB the operator's contract is that
    k scales with the corpus so cluster membership stays bounded — the
    in-group gate raises loudly if a cluster exceeds
    `EXACT_PAIRS_MAX_ROWS` instead of going silently quadratic.

    Zero vectors score -1.0 against everything (the pinned DuckDB
    list_cosine_similarity convention) so they are always kept."""
    import ray

    ds = _read_embeddings(sf_dir)
    if ds.count() == 0:
        return _empty_result(vec_id="i", cluster="i", keep="i")
    init = _topk(ds, k, ["vec_id"], [False])
    centroids = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        C = ray.get(cref)
        X = _batch_matrix(t)
        # the EXACT s_kmeans_init_assign E-step expression (oracle parity)
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64), pa.int64()),
                "embedding": t.column("embedding"),
            }
        )

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > EXACT_PAIRS_MAX_ROWS:
            raise ValueError(
                f"s_semdedup cluster of {len(g)} members exceeds "
                f"EXACT_PAIRS_MAX_ROWS={EXACT_PAIRS_MAX_ROWS}: raise k so "
                "cluster membership stays bounded"
            )
        g = g.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        zero = np.linalg.norm(X, axis=1) == 0.0
        S = _normalize(X) @ _normalize(X).T
        S[zero, :] = -1.0
        S[:, zero] = -1.0
        dup = np.tril(round_half_away(S, 4) >= tau, -1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].astype("int64"),
                "cluster": g["cluster"].astype("int64"),
                "keep": (~dup).astype("int64"),
            }
        )

    out = typed_collect(
        ds.map_batches(
            warm_factory(("semdedup_assign", cref.hex()), lambda: assign),
            batch_format="pyarrow",
        )
        .groupby("cluster")
        .map_groups(dedup_group, batch_format="pandas"),
        pa.schema(
            [("vec_id", pa.int64()), ("cluster", pa.int64()), ("keep", pa.int64())]
        ),
    )
    for c in ("vec_id", "cluster", "keep"):
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def _sign_codes(vecs: np.ndarray) -> np.ndarray:
    """Pack each row's sign bits (component > 0, bit i = dimension i) into
    one uint64 — sign binarization, the 1-bit-per-dimension binary
    embedding Hamming-space retrieval uses (64x smaller than float64;
    distances become popcounts).  Dim must be <= 64 (one machine word);
    wider embeddings would pack into ceil(dim/64) words."""
    n, dim = vecs.shape
    if dim > 64:
        raise ValueError(f"_sign_codes packs <= 64 dims per word, got {dim}")
    bits = (vecs > 0).astype(np.uint64)
    weights = np.left_shift(
        np.uint64(1), np.arange(dim, dtype=np.uint64)
    )
    return (bits * weights).sum(axis=1, dtype=np.uint64)


_POPCOUNT_LUT = None


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array -> int64 (numpy 2.x has
    bitwise_count; the byte-LUT fallback keeps numpy 1.x working)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    global _POPCOUNT_LUT
    if _POPCOUNT_LUT is None:
        _POPCOUNT_LUT = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None], axis=1
        ).sum(1).astype(np.int64)
    b = np.ascontiguousarray(x).view(np.uint8)
    return _POPCOUNT_LUT[b].reshape(x.shape + (8,)).sum(-1)


def s_hamming_topk(sf_dir: str):
    """Exact Hamming top-k over SIGN-BINARIZED embeddings — the binary-
    quantized retrieval path (pack sign bits once, rank by popcount of
    XOR): 64x less candidate bandwidth than float scoring, the standard
    first stage of a memory-bound vector index.

    Same scale shape as s_knn_bruteforce: the query codes (one uint64
    each) broadcast via ray.put, every batch packs its vectors with
    vectorized bit ops and XOR-popcounts against all queries at once, and
    only the local top-k per (query, block) reaches the driver under the
    SAME total order as the merge and the oracle (distance asc, vec_id
    asc).  Distances are integers end to end — every tie is pinned, the
    DuckDB oracle is exact at any scale."""
    import ray

    qids, qraw = _query_matrix_raw(sf_dir)
    if len(qids) == 0:  # empty corpus: empty query workload
        return _empty_result(query_id="i", rank="i", vec_id="i", dist="i")
    qcodes = _sign_codes(qraw)
    qref = ray.put((qids, qcodes))

    class Score:
        def __init__(self):
            self.qids, self.qcodes = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
            if len(t) == 0:
                return pa.table(empty)
            codes = _sign_codes(_batch_matrix(t))
            d = _popcount64(codes[:, None] ^ self.qcodes[None, :])
            vec_ids = t.column("vec_id").to_numpy()
            k = min(TOP_K, len(vec_ids))
            out = {"query_id": [], "vec_id": [], "dist": []}
            for qi, qid in enumerate(self.qids):
                col = d[:, qi]
                order = np.lexsort((vec_ids, col))
                for j in order[:k]:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["dist"].append(int(col[j]))
            return pa.table(
                {c: pa.array(v, pa.int64()) for c, v in out.items()}
            )

    local = (
        _read_embeddings(sf_dir)
        .map_batches(
            warm_factory(("s_hamming", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    if len(local) == 0:
        return _empty_result(query_id="i", rank="i", vec_id="i", dist="i")
    out = []
    for _qid, g in local.groupby("query_id"):
        g = g.sort_values(["dist", "vec_id"]).head(TOP_K)
        out.append(g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64)))
    df = pd.concat(out).reset_index(drop=True)
    for c in ("query_id", "rank", "vec_id", "dist"):
        df[c] = df[c].astype("int64")
    return (
        df[["query_id", "rank", "vec_id", "dist"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


SIM_RADIUS = 0.3  # cosine radius, compared on the rounded 1e-4 grid


def s_range_search(sf_dir: str):
    """Radius (range) search: for every query, ALL vectors whose cosine
    similarity is >= SIM_RADIUS — the epsilon-neighborhood retrieval shape
    (dedup-candidate generation, density probes), complementing top-k.

    One streaming pass: each batch matmuls against the broadcast query
    matrix and the radius FILTER runs vectorized inside the stage, so only
    matching (query_id, vec_id, sim) rows ever leave a worker — the output
    scales with the result set, not the corpus, and there is no k-cutoff
    merge step at all (the driver concat is the result).  The compare runs
    on the half-away-rounded 1e-4 grid on BOTH sides so a float at the
    radius boundary cannot flip between engine and oracle; zero vectors
    ride the DuckDB convention (sim pinned to -1, never within radius).
    """
    import ray

    qids, qmat = _query_matrix(sf_dir)
    qref = ray.put((qids, qmat))

    class RangeScore:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
            if len(t) == 0 or self.qmat.size == 0:
                return pa.table(out)
            raw = _batch_matrix(t)
            sims = _normalize(raw) @ self.qmat.T
            sims = _mask_zero_cosine(sims, raw, self.qmat)
            sims = round_half_away(sims, 4)
            rows, cols = np.nonzero(sims >= SIM_RADIUS)
            if len(rows) == 0:
                return pa.table(out)
            vec_ids = t.column("vec_id").to_numpy()
            return pa.table(
                {
                    "query_id": pa.array(self.qids[cols].astype(np.int64)),
                    "vec_id": pa.array(vec_ids[rows].astype(np.int64)),
                    "sim": pa.array(sims[rows, cols]),
                }
            )

    df = (
        _read_embeddings(sf_dir)
        .map_batches(
            warm_factory(("s_range", qref.hex()), RangeScore),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    if len(df.columns) == 0:  # all-empty stream: Ray drops the schema
        return _empty_result(query_id="i", vec_id="i", sim="f")
    for c in ("query_id", "vec_id"):
        df[c] = df[c].astype("int64")
    df["sim"] = df["sim"].astype("float64")
    return df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


PCA_K = 8


def pca_components(mean: np.ndarray, cov: np.ndarray, k: int):
    """Canonical top-k principal axes of a covariance matrix: eigenvalues
    DESCENDING (stable order on ties), each component's sign fixed so its
    largest-|entry| coordinate is positive — the canonicalization both the
    engine and the independent oracle trainer apply, so the inherent
    sign/order ambiguity of eigenvectors can never flip a comparison."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-vals, kind="stable")[:k]
    W = vecs[:, order].copy()
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return W


def pca_moments(X: np.ndarray):
    """(n, sum-vector, gram-matrix) — the mergeable sufficient statistics
    of PCA: sums of sums, gram of grams.  Shared by the engine's per-block
    partials and the oracle's independent single-pass trainer."""
    return len(X), X.sum(axis=0), X.T @ X


def s_pca(sf_dir: str, k: int = PCA_K):
    """Distributed PCA projection of the embedding column — the
    dimensionality-reduction stage of a vector pipeline (embedding
    compression before ANN, Matryoshka-style truncation with learned
    axes instead of prefix dims).

    The decomposition needs only FIXED-SIZE sufficient statistics: each
    block reduces to (n, Σx, XᵀX) — d + d² floats regardless of rows —
    and the driver merges them (sum of sums, gram of grams; zero
    exchanges, the s_label_centroids shape), eigendecomposes the d×d
    covariance once, and broadcasts (mean, W).  Pass 2 projects each
    batch with one matmul: value = (x − mean)·w, emitted LONG
    (vec_id, component, value) with values rounded half-away to 4dp —
    the sim-family convention that absorbs the ulp gap between numpy's
    pairwise and SQL's sequential summation.  The oracle retrains
    (mean, W) INDEPENDENTLY from the raw parquet through the same
    canonicalization and replays the projection as
    list_inner_product − literal scalar."""
    import ray

    ds = _read_embeddings(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t)
        n, s, g = pca_moments(X)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "d": pa.array([X.shape[1]], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "g": pa.array([g.tobytes()], pa.binary()),
            }
        )

    N, S, G, dim = 0, None, None, 0
    for r in ds.map_batches(moments, batch_format="pyarrow").take_all():
        if r["n"] == 0:
            continue
        d = int(r["d"])
        s = np.frombuffer(r["s"], np.float64)
        g = np.frombuffer(r["g"], np.float64).reshape(d, d)
        if S is None:
            S, G, dim = s.copy(), g.copy(), d
        else:
            S += s
            G += g
        N += int(r["n"])
    if N == 0:
        return _empty_result(vec_id="i", component="i", value="f")

    mean = S / N
    cov = G / N - np.outer(mean, mean)
    W = pca_components(mean, cov, min(k, dim))
    mu = mean @ W  # projection offset per component, one scalar each
    ref = ray.put((W, mu))

    class Project:
        def __init__(self):
            self.W, self.mu = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _batch_matrix(t)
            if len(X) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "component": pa.array([], pa.int64()),
                        "value": pa.array([], pa.float64()),
                    }
                )
            P = round_half_away(X @ self.W - self.mu, 4)
            n, kk = P.shape
            return pa.table(
                {
                    "vec_id": pa.array(
                        np.repeat(
                            t.column("vec_id").to_numpy(zero_copy_only=False),
                            kk,
                        ),
                        pa.int64(),
                    ),
                    "component": pa.array(
                        np.tile(np.arange(kk, dtype=np.int64), n), pa.int64()
                    ),
                    "value": pa.array(P.ravel(), pa.float64()),
                }
            )

    df = ds.map_batches(
        warm_factory(("s_pca", ref.hex()), Project), batch_format="pyarrow"
    ).to_pandas()
    for c in ("vec_id", "component"):
        df[c] = df[c].astype("int64")
    df["value"] = df["value"].astype("float64")
    return df.sort_values(["vec_id", "component"]).reset_index(drop=True)


OOD_K = PCA_K  # Mahalanobis in the top-k principal subspace
OOD_EPS = 1e-9  # eigenvalue floor (identical literal on both sides)


def ood_params(mean: np.ndarray, cov: np.ndarray, k: int):
    """(W, mu, lam) of the truncated-Mahalanobis score — shared verbatim
    by the engine and the oracle generator (the pq_codebooks discipline),
    so the two trainings are bit-identical given identical moments."""
    W = pca_components(mean, cov, k)
    lam = np.maximum(np.diag(W.T @ cov @ W), OOD_EPS)
    return W, mean @ W, lam


def s_ood_mahalanobis(sf_dir: str, k: int = OOD_K):
    """Outlier (OOD) scoring of the embedding column — the data-curation
    filter that drops corrupt / out-of-distribution vectors before
    training: the Mahalanobis distance in the top-k principal subspace,
    score = sum_j ((x - mean)·w_j)^2 / max(lambda_j, eps).  The truncated
    form is the standard practical OOD score (full-precision Mahalanobis
    needs the d x d inverse; the top-k subspace carries the distribution's
    mass and the literal-oracle size stays k x d).

    Scale shape: training is the s_pca sufficient-statistics pass — each
    block reduces to (n, Σx, XᵀX), zero exchanges, driver eigh once,
    (mean, W, lambda) broadcast; scoring is one matmul per batch.  The
    score sum runs LEFT-TO-RIGHT over the k terms so the float addition
    order matches the oracle's + chain exactly (the only remaining float
    gap is the shared ulp-rounding convention, absorbed by ROUND(,4) on
    both sides like the whole sim family).

    The oracle retrains (mean, W, lambda) INDEPENDENTLY from the raw
    parquet through the same `pca_components` canonicalization and
    replays the score as a left-associated sum of
    power(list_inner_product(x, w_j) - mu_j, 2) / lam_j literals."""
    import ray

    ds = _read_embeddings(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t)
        n, s, g = pca_moments(X)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "d": pa.array([X.shape[1]], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "g": pa.array([g.tobytes()], pa.binary()),
            }
        )

    N, S, G, dim = 0, None, None, 0
    for r in ds.map_batches(moments, batch_format="pyarrow").take_all():
        if r["n"] == 0:
            continue
        d = int(r["d"])
        s = np.frombuffer(r["s"], np.float64)
        g = np.frombuffer(r["g"], np.float64).reshape(d, d)
        if S is None:
            S, G, dim = s.copy(), g.copy(), d
        else:
            S += s
            G += g
        N += int(r["n"])
    if N == 0:
        return _empty_result(vec_id="i", score="f")

    mean = S / N
    cov = G / N - np.outer(mean, mean)
    W, mu, lam = ood_params(mean, cov, min(k, dim))
    ref = ray.put((W, mu, lam))

    class Score:
        def __init__(self):
            self.W, self.mu, self.lam = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _batch_matrix(t)
            if len(X) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            P = X @ self.W - self.mu
            terms = (P * P) / self.lam
            # LEFT-TO-RIGHT accumulation: the oracle's + chain order
            acc = terms[:, 0].copy()
            for j in range(1, terms.shape[1]):
                acc = acc + terms[:, j]
            return pa.table(
                {
                    "vec_id": pa.array(
                        t.column("vec_id").to_numpy(zero_copy_only=False),
                        pa.int64(),
                    ),
                    "score": pa.array(round_half_away(acc, 4), pa.float64()),
                }
            )

    df = ds.map_batches(
        warm_factory(("s_ood", ref.hex()), Score), batch_format="pyarrow"
    ).to_pandas()
    df["vec_id"] = df["vec_id"].astype("int64")
    df["score"] = df["score"].astype("float64")
    return df.sort_values("vec_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# DBSCAN over the embedding column — density clustering as a composition
# of the repo's own primitives: thresholded pair scoring (the
# epsilon-neighborhood graph) + large-star/small-star connected components

DBSCAN_SIM = 0.35  # epsilon as raw cosine similarity (s_embedding_dupes convention)
DBSCAN_MIN_PTS = 4  # core iff |N_eps(p)| >= MIN_PTS, counting p itself
DBSCAN_DRIVER_EDGES = 2_000_000  # below: driver union-find; above: star rounds


def _dsu_min_labels(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """(node, label) for every node in the edge list, label = MINIMUM node
    id of its connected component — the same fixpoint `_cc_min_label`
    computes, as a driver union-find for result-sized edge sets (min-label
    per component is implementation-independent; the forced-regime test
    pins equality)."""
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(a.tolist(), b.tolist()):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)  # union by MIN keeps roots minimal
    nodes = sorted(parent)
    return pd.DataFrame(
        {
            "node": pd.Series(nodes, dtype="int64"),
            "label": pd.Series([find(n) for n in nodes], dtype="int64"),
        }
    )


def s_dbscan(sf_dir: str, eps_sim: float = DBSCAN_SIM, min_pts: int = DBSCAN_MIN_PTS):
    """DBSCAN density clustering of the embedding column: every vector
    labeled (vec_id, cluster, role) with role core/border/noise and
    cluster = the MINIMUM vec_id of its core-component (noise = -1).

    Composition of in-tree primitives, all distributed: the
    epsilon-neighborhood graph is the exact thresholded pair scorer
    (`s_embedding_dupes` — block-pair tasks, raw-cosine threshold, the
    same feasibility gate; at high eps the banded `lsh_candidate_pairs`
    path swaps in), and core-component labels come from connected
    components over the core-core edges — TWO-REGIME like every merge in
    this repo: a driver union-find below DBSCAN_DRIVER_EDGES (min-label
    per component is implementation-independent, pinned by the
    forced-regime test; Ray's fixed per-exchange cost made the star
    rounds ~10 s on a 300-edge graph), the large-star/small-star
    `textops._cc_min_label` (O(log n) rounds) above it.
    Degrees/border assignment run over the RESULT-SIZED pair table (its
    size is set by eps, not the corpus).  Determinism: classic DBSCAN
    leaves a two-cluster border point implementation-defined; here it
    takes the MINIMUM core-neighbor component, so engine and oracle agree
    on every input.  Core rule: degree (excl. self) >= min_pts - 1.
    Zero vectors score sim 0 here and -1 in DuckDB — both below any
    positive eps, so the convention gap is unobservable (harness-pinned).
    """
    import ray.data as rd

    from .frames import typed_collect
    from .textops import _cc_min_label

    empty = pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "cluster": pd.Series([], dtype="int64"),
            "role": pd.Series([], dtype=object),
        }
    )
    ids_df = typed_collect(
        _read_embeddings(sf_dir).select_columns(["vec_id"]),
        pa.schema([("vec_id", pa.int64())]),
    )
    if len(ids_df) == 0:
        return empty
    pairs = s_embedding_dupes(sf_dir, threshold=eps_sim)

    deg = (
        pd.concat([pairs["vec_a"], pairs["vec_b"]])
        .value_counts()
        .rename_axis("vec_id")
        .rename("deg")
        .reset_index()
    )
    core = set(deg.loc[deg["deg"] >= min_pts - 1, "vec_id"].astype("int64"))

    cc_edges = pairs[
        pairs["vec_a"].isin(core) & pairs["vec_b"].isin(core)
    ][["vec_a", "vec_b"]].rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"})
    if 0 < len(cc_edges) <= DBSCAN_DRIVER_EDGES:
        labels = _dsu_min_labels(
            cc_edges["doc_a"].to_numpy(np.int64),
            cc_edges["doc_b"].to_numpy(np.int64),
        )
    elif len(cc_edges):
        labels = typed_collect(
            _cc_min_label(
                rd.from_pandas(cc_edges.astype({"doc_a": "int64", "doc_b": "int64"}))
            ),
            pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        )
    else:
        labels = pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "label": pd.Series([], dtype="int64")}
        )
    # isolated core points (no core neighbor) root their own cluster
    missing = sorted(core - set(labels["node"]))
    if missing:
        labels = pd.concat(
            [labels, pd.DataFrame({"node": missing, "label": missing})],
            ignore_index=True,
        )
    comp = dict(zip(labels["node"].astype("int64"), labels["label"].astype("int64")))

    # border: non-core adjacent to >=1 core; takes the MIN core-component
    both = pd.concat(
        [
            pairs.rename(columns={"vec_a": "node", "vec_b": "nbr"})[["node", "nbr"]],
            pairs.rename(columns={"vec_b": "node", "vec_a": "nbr"})[["node", "nbr"]],
        ],
        ignore_index=True,
    )
    bmask = (~both["node"].isin(core)) & both["nbr"].isin(core)
    border = (
        both[bmask]
        .assign(comp=lambda d: d["nbr"].map(comp))
        .groupby("node", as_index=False)["comp"]
        .min()
    )
    bcomp = dict(zip(border["node"].astype("int64"), border["comp"].astype("int64")))

    ids = ids_df["vec_id"].astype("int64")
    c = ids.map(comp)  # defined exactly on core nodes
    b = ids.map(bcomp)  # defined exactly on border nodes
    role = np.where(c.notna(), "core", np.where(b.notna(), "border", "noise"))
    cluster = c.fillna(b).fillna(-1).astype("int64")
    out = pd.DataFrame({"vec_id": ids, "cluster": cluster, "role": role})
    return out.sort_values("vec_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# MMR diverse retrieval — Carbonell & Goldstein 1998.  Engine-added brief.

MMR_K = 5  # diverse picks per query
MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # λ = 0.7 as an exact integer ratio


def s_mmr_diverse_topk(sf_dir: str):
    """Maximal-marginal-relevance diverse top-k: greedily pick MMR_K of
    the exact top-TOP_K shortlist, maximizing
    λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) at each step.

    Exactness: every selection comparison runs on INTEGERS — rel and
    pairwise sims live on the 1e-4 grid (ROUND(sim·1e4), the knn rank
    grid) and λ = 7/10 makes the step score mmr_x1e5 = 7·rel − 3·max_pair
    an int64 — so the greedy path is bit-replayable as MMR_K unrolled SQL
    steps (the PageRank-unroll oracle pattern) and no float ever picks a
    winner; ties break by vec_id ascending on both sides.  The seed step
    (S empty) scores 7·rel (diversity term zero by convention).

    Scale shape: stage 1 is the s_knn distributed scan verbatim (local
    per-batch top-k + driver merge — the corpus is read once, nothing
    wide); stage 2 touches raw floats for only the ≤|Q|·TOP_K shortlist
    vectors via a zone-map-pruned candidate read (the s_ann_rerank
    pattern), and the greedy loop runs on the driver over that bounded
    set.  Zero-operand cosine pins to -1 (`_mask_zero_cosine`, DuckDB's
    convention) for both rel and pairwise terms."""
    import pyarrow.parquet as pq

    short = s_knn_bruteforce(sf_dir)  # shared stage: zero shortlist drift
    if len(short) == 0:
        return _empty_result(query_id="i", rank="i", vec_id="i", mmr_x1e5="i")
    cand_ids = sorted({int(v) for v in short["vec_id"]})
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", cand_ids)],
    )
    cdf = t.to_pandas()
    raw = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
    cnorm = _normalize(raw)
    pair = _mask_zero_cosine(cnorm @ cnorm.T, raw, raw)
    pair_int = np.rint(round_half_away(pair, 4) * 1e4).astype(np.int64)
    row_of = {int(v): i for i, v in enumerate(cdf["vec_id"].to_numpy())}
    out = []
    for qid, g in short.groupby("query_id"):
        rel = {
            int(v): int(np.rint(s * 1e4))
            for v, s in zip(g["vec_id"], g["sim"])  # sim already on the grid
        }
        remaining = sorted(rel)
        selected: list[int] = []
        for rank in range(1, MMR_K + 1):
            if not remaining:
                break
            best = None
            for d in remaining:  # ≤ TOP_K candidates — driver-bounded
                if selected:
                    mx = max(pair_int[row_of[d], row_of[s]] for s in selected)
                    score = (
                        MMR_LAMBDA_NUM * rel[d]
                        - (MMR_LAMBDA_DEN - MMR_LAMBDA_NUM) * mx
                    )
                else:
                    score = MMR_LAMBDA_NUM * rel[d]
                if best is None or (score, -d) > (best[0], -best[1]):
                    best = (score, d)
            out.append((int(qid), rank, best[1], best[0]))
            selected.append(best[1])
            remaining.remove(best[1])
    df = pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "mmr_x1e5"])
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True).astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64",
         "mmr_x1e5": "int64"}
    )


def s_mrl_overlap(sf_dir: str):
    """Matryoshka truncation retrieval eval (Kusupati et al. 2022): the
    top-k overlap of HALF-dimension cosine retrieval vs full-dimension —
    the go/no-go report before shipping truncated embeddings (half the
    index bytes, half the matmul).  Per query: k (full-arm result size),
    n_overlap = |top-k_full ∩ top-k_half|, overlap_x1e6 — a floored
    integer-scaled rational, so no float decides a reported value.

    Plan: ONE streaming pass scores BOTH representations per batch (two
    matmuls against the one broadcast query payload; the half arm is a
    zero-copy column slice), emits per-batch local top-k per arm under
    the shared merge order (rounded sim desc, vec_id asc), and the
    driver merges two candidate-sized frames and intersects id sets —
    the corpus is read once, nothing wide.  Zero-vector convention: a
    vector whose TRUNCATED half is all-zero pins to −1 in the half arm
    (`_mask_zero_cosine` on the sliced raw), exactly DuckDB's
    list_cosine_similarity on the sliced list.  Assumes dim ≥ 2 (a
    1-dim embedding has an empty half — nothing to evaluate)."""
    import ray

    qids, qraw = _query_matrix_raw(sf_dir)
    empty = _empty_result(query_id="i", k="i", n_overlap="i", overlap_x1e6="i")
    if len(qids) == 0:
        return empty
    d2 = qraw.shape[1] // 2
    qfull_n = _normalize(qraw)
    qh_raw = qraw[:, :d2]
    qh_n = _normalize(qh_raw)
    qref = ray.put((qids, qraw, qfull_n, qh_raw, qh_n))

    class Score:
        def __init__(self):
            (self.qids, self.qraw, self.qfn, self.qhr, self.qhn) = ray.get(
                qref
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {"arm": [], "query_id": [], "vec_id": [], "sim": []}
            if len(t):
                raw = _batch_matrix(t)
                vec_ids = t.column("vec_id").to_numpy()
                k = min(TOP_K, len(vec_ids))
                arms = (
                    ("full", raw, self.qfn, self.qraw),
                    ("half", raw[:, : self.qhr.shape[1]], self.qhn, self.qhr),
                )
                for arm, r, qn, qr in arms:
                    sims = _normalize(r) @ qn.T
                    sims = _mask_zero_cosine(sims, r, qr)
                    for qi, qid in enumerate(self.qids):
                        col = sims[:, qi]
                        order = np.lexsort((vec_ids, -round_half_away(col, 4)))
                        for j in order[:k]:
                            out["arm"].append(arm)
                            out["query_id"].append(int(qid))
                            out["vec_id"].append(int(vec_ids[j]))
                            out["sim"].append(float(col[j]))
            return pa.table(
                {
                    "arm": pa.array(out["arm"], pa.string()),
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    local = (
        _read_embeddings(sf_dir)
        .map_batches(
            warm_factory(("s_mrl", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    if len(local) == 0:
        return empty
    full = _merge_topk(local[local["arm"] == "full"].drop(columns=["arm"]))
    half = _merge_topk(local[local["arm"] == "half"].drop(columns=["arm"]))
    rows = []
    for qid, g in full.groupby("query_id"):
        ids_f = set(g["vec_id"])
        ids_h = set(half.loc[half["query_id"] == qid, "vec_id"])
        k = len(ids_f)
        novl = len(ids_f & ids_h)
        rows.append((int(qid), k, novl, (1_000_000 * novl) // k))
    return pd.DataFrame(
        rows, columns=["query_id", "k", "n_overlap", "overlap_x1e6"]
    ).astype("int64").sort_values("query_id").reset_index(drop=True)


def s_label_silhouette(sf_dir: str):
    """Simplified SILHOUETTE score per vector — the cluster-quality /
    label-audit primitive: a(x) = euclidean distance to the OWN label's
    centroid (computed over all members, self included), b(x) = the
    minimum distance to any OTHER label's centroid, s = (b - a) /
    max(a, b) in [-1, 1] (0 when both distances are 0 or when only one
    label exists — the degenerate conventions, applied identically in
    the oracle).  The simplified (centroid-based) form is the one that
    scales: the classic pairwise silhouette is O(n^2) by definition.

    Cross-engine alignment: distances accumulate LEFT-TO-RIGHT over the
    dimensions in float64 — measured bit-equal to DuckDB's
    list_distance on both FLOAT and DOUBLE lists (and to SUM over
    unnest in subscript order); min-over-labels then compares IDENTICAL
    doubles on both sides, so even exact distance ties cannot diverge
    (the min is a value, not an argmin).  Centroids are one IEEE
    division of the folded per-block sums; on grid-valued components
    (the hostile-embeddings harness) every quantity is float64-exact
    end-to-end, and the final score is round_half_away(4) on both sides
    (the repo-wide vector-op bar).

    Scale shape: ZERO shuffle — pass 1 collapses each block to
    (label, dim, sum, n) rows (k x d x blocks, corpus-size-free) and the
    driver folds centroids; pass 2 broadcasts the (k x d) centroid
    matrix once via ray.put and scores every block with k vectorized
    dim-chains.  Output is one row per vector."""
    import ray
    import ray.data as rd

    def _read():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )

    def stat_partial(t: pa.Table) -> pa.Table:
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(
            t.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lab in np.unique(labels):
            sel = emb[labels == lab]
            d = np.arange(emb.shape[1], dtype=np.int64)
            rows_l.append(np.full(emb.shape[1], lab, np.int64))
            rows_d.append(d)
            rows_s.append(sel.sum(axis=0))
            rows_n.append(np.full(emb.shape[1], sel.shape[0], np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(rows_l), pa.int64()),
                "dim": pa.array(np.concatenate(rows_d), pa.int64()),
                "s": pa.array(np.concatenate(rows_s), pa.float64()),
                "n": pa.array(np.concatenate(rows_n), pa.int64()),
            }
        )

    parts = typed_collect(
        _read()
        .select_columns(["label", "embedding"])
        .map_batches(stat_partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("s", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return _empty_result(vec_id="i", label="i", sil="f")
    g = parts.groupby(["label", "dim"], as_index=False).sum()
    labs = np.sort(g["label"].unique()).astype(np.int64)
    dims = int(g["dim"].max()) + 1
    C = np.zeros((len(labs), dims), np.float64)
    for li, lab in enumerate(labs):
        gl = g[g["label"] == lab].sort_values("dim")
        C[li] = gl["s"].to_numpy() / gl["n"].to_numpy()  # one IEEE division

    cref = ray.put((labs, C))

    def score(t: pa.Table, _cref=cref) -> pa.Table:
        labs_, C_ = ray.get(_cref)
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "sil": pa.array([], pa.float64()),
                }
            )
        X = np.stack(
            t.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        own = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(labs_)
        D = np.empty((len(X), k), np.float64)
        for li in range(k):
            c = C_[li]
            acc = np.zeros(len(X), np.float64)
            for j in range(X.shape[1]):  # left-to-right == list_distance
                acc += (X[:, j] - c[j]) ** 2
            D[:, li] = np.sqrt(acc)
        own_idx = np.searchsorted(labs_, own)
        a = D[np.arange(len(X)), own_idx]
        if k > 1:
            Dm = D.copy()
            Dm[np.arange(len(X)), own_idx] = np.inf
            b = Dm.min(axis=1)
            mx = np.maximum(a, b)
            with np.errstate(invalid="ignore", divide="ignore"):
                sil = np.where(mx == 0.0, 0.0, (b - a) / mx)
        else:
            sil = np.zeros(len(X), np.float64)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "label": pa.array(own),
                "sil": pa.array(round_half_away(sil, 4), pa.float64()),
            }
        )

    out = typed_collect(
        _read().map_batches(score, batch_format="pyarrow"),
        pa.schema(
            [("vec_id", pa.int64()), ("label", pa.int64()), ("sil", pa.float64())]
        ),
    )
    if len(out) == 0:
        return _empty_result(vec_id="i", label="i", sil="f")
    return out.sort_values("vec_id").reset_index(drop=True)


RRF_POOL = 20  # per-metric candidate list depth fed to the fusion
RRF_K0 = 60.0  # the standard reciprocal-rank-fusion damping constant


def s_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    two exact retrieval channels — float cosine (s_knn_bruteforce's
    metric) and sign-binarized Hamming (s_hamming_topk's) — the standard
    hybrid-retrieval combiner: rrf = Σ_channels 1/(60 + rank), docs
    missing from a channel's top-RRF_POOL contribute 0.

    Scale shape: ONE streaming pass computes BOTH metrics per batch
    (queries broadcast once via ray.put; the two existing operators
    would read the corpus twice), emits only per-(query, block) local
    top-RRF_POOL rows per channel, and the driver merges the tiny
    candidate frames.  Ranks are integers under each channel's pinned
    total order (rounded-sim desc / dist asc, vec_id asc); the fused
    score is two exactly-ordered IEEE terms (cos + ham), so the oracle
    replays it bit-for-bit and the final (rrf desc, vec_id) order cannot
    diverge.  rank_cos/rank_ham report 0 for 'absent from that
    channel'."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    if len(qids) == 0:
        return _empty_result(
            query_id="i", rank="i", vec_id="i", rrf="f", rank_cos="i", rank_ham="i"
        )
    _, qraw = _query_matrix_raw(sf_dir)
    qcodes = _sign_codes(qraw)
    qref = ray.put((qids, qmat, qraw, qcodes))

    class Score:
        def __init__(self):
            self.qids, self.qmat, self.qraw, self.qcodes = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "metric": pa.array([], pa.int64()),
                "key": pa.array([], pa.float64()),
            }
            if len(t) == 0:
                return pa.table(empty)
            raw = _batch_matrix(t)
            sims = _normalize(raw) @ self.qmat.T
            sims = _mask_zero_cosine(sims, raw, self.qmat)
            dists = _popcount64(_sign_codes(raw)[:, None] ^ self.qcodes[None, :])
            vec_ids = t.column("vec_id").to_numpy()
            k = min(RRF_POOL, len(vec_ids))
            out = {"query_id": [], "vec_id": [], "metric": [], "key": []}
            for qi, qid in enumerate(self.qids):
                col = round_half_away(sims[:, qi], 4)
                for j in np.lexsort((vec_ids, -col))[:k]:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["metric"].append(0)
                    out["key"].append(float(col[j]))
                dcol = dists[:, qi]
                for j in np.lexsort((vec_ids, dcol))[:k]:
                    out["query_id"].append(int(qid))
                    out["vec_id"].append(int(vec_ids[j]))
                    out["metric"].append(1)
                    out["key"].append(float(dcol[j]))
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "metric": pa.array(out["metric"], pa.int64()),
                    "key": pa.array(out["key"], pa.float64()),
                }
            )

    local = (
        _read_embeddings(sf_dir)
        .map_batches(
            warm_factory(("s_rrf", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    if len(local) == 0:
        return _empty_result(
            query_id="i", rank="i", vec_id="i", rrf="f", rank_cos="i", rank_ham="i"
        )
    outs = []
    for qid, g in local.groupby("query_id"):
        ranks: dict = {}
        gc = g[g["metric"] == 0].sort_values(
            ["key", "vec_id"], ascending=[False, True]
        ).head(RRF_POOL)
        for r, vid in enumerate(gc["vec_id"].to_numpy(), start=1):
            ranks[int(vid)] = [r, 0]
        gh = g[g["metric"] == 1].sort_values(["key", "vec_id"]).head(RRF_POOL)
        for r, vid in enumerate(gh["vec_id"].to_numpy(), start=1):
            ranks.setdefault(int(vid), [0, 0])[1] = r
        rows = []
        for vid, (rc, rh) in ranks.items():
            rrf = (1.0 / (RRF_K0 + float(rc)) if rc else 0.0) + (
                1.0 / (RRF_K0 + float(rh)) if rh else 0.0
            )
            rows.append((vid, rrf, rc, rh))
        rows.sort(key=lambda x: (-x[1], x[0]))
        for rank, (vid, rrf, rc, rh) in enumerate(rows[:TOP_K], start=1):
            outs.append(
                {
                    "query_id": int(qid),
                    "rank": rank,
                    "vec_id": vid,
                    "rrf": rrf,
                    "rank_cos": rc,
                    "rank_ham": rh,
                }
            )
    df = pd.DataFrame(outs)
    for c in ("query_id", "rank", "vec_id", "rank_cos", "rank_ham"):
        df[c] = df[c].astype("int64")
    df["rrf"] = df["rrf"].astype("float64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# Distributed batch perceptron (integer-exact iterative training)
PERC_EPOCHS = 3
PERC_GRID = 64  # feature quantization: x_int = floor(x * 64 + 0.5)


def s_perceptron(sf_dir: str):
    """Distributed BATCH perceptron training — the iterative-ML family's
    linear classifier, with an EXACT oracle: features are quantized to
    the 1/64 grid (x_int = floor(x*64 + 0.5), a power-of-two scale so
    x*64 is exact in float64 and both sides floor the same double) and
    the epoch update is the BATCH rule

        w += sum over misclassified i of (y_i * x_i),   b += sum y_i,
        misclassified: y_i * (<w, x_i> + b) <= 0

    whose per-epoch update is a SUM of integer vectors — addition-order-
    free, so the distributed fold is bit-equal to any serial replay and
    the oracle is the recurrence unrolled as chained SQL CTEs (the
    q_pagerank_bipartite scheme applied to model training; a float SGD
    could never hash-match — its updates depend on visit order, which is
    exactly why the classic parallel form IS the batch/mini-batch rule).
    Labels: y = +1 for even `label`, -1 for odd.

    Plan: one embeddings scan per epoch; the weight vector broadcasts
    once per epoch via `ray.put`; every batch emits a constant-width
    partial — the (dim+2) integer column sums (update vector, bias
    update, misclassified count) — and the driver folds exact int64.
    Zero shuffles.  Output pins the whole trajectory: one row per
    (epoch, j) with j = feature index, -1 = bias, -2 = misclassified
    count.  Overflow headroom: |x_int| <= 64*max|x|, |w_j| <=
    epochs * n_rows * max|x_int|, margins <= dim * |w| * |x_int| —
    ~2^45 at sf1-scale inputs, far inside int64."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .frames import typed_collect

    path = f"{sf_dir}/embeddings.parquet"
    cols = ["epoch", "j", "w"]
    pf = pq.ParquetFile(path)
    if pf.metadata.num_rows == 0:
        # zero vectors: no weight rows exist, but the per-epoch count and
        # bias scalars still do (they are scalar aggregates over the empty
        # set on the SQL side) — emit the same six rows
        out = pd.DataFrame(
            [(e, j, 0) for e in range(1, PERC_EPOCHS + 1) for j in (-2, -1)],
            columns=cols,
        )
        return out.astype("int64")
    # dim from ONE footer-guided row read, never a full scan
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first.column("embedding")[0])
    ds = rd.read_parquet(path, columns=["embedding", "label"])

    w = np.zeros(dim + 1, np.int64)  # [0:dim] weights, [dim] bias
    rows = []
    part_schema = pa.schema([("j", pa.int64()), ("val", pa.int64())])
    for epoch in range(1, PERC_EPOCHS + 1):
        ref = ray.put(w.copy())

        class Epoch:
            def __init__(self):
                self.w = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                X = _batch_matrix(t)
                Xi = np.floor(X * PERC_GRID + 0.5).astype(np.int64)
                lab = t.column("label").to_numpy(zero_copy_only=False)
                y = np.where(lab % 2 == 0, 1, -1).astype(np.int64)
                margins = y * (Xi @ self.w[:dim] + self.w[dim])
                m = margins <= 0
                upd = (y[m, None] * Xi[m]).sum(axis=0, dtype=np.int64)
                j = np.arange(dim, dtype=np.int64)
                return pa.table(
                    {
                        "j": pa.array(
                            np.concatenate([j, [-1, -2]]), pa.int64()
                        ),
                        "val": pa.array(
                            np.concatenate(
                                [upd, [int(y[m].sum()), int(m.sum())]]
                            ).astype(np.int64),
                            pa.int64(),
                        ),
                    }
                )

        parts = typed_collect(
            ds.map_batches(
                warm_factory(("s_perceptron", ref.hex()), Epoch),
                batch_format="pyarrow",
            ),
            part_schema,
        )
        folded = parts.groupby("j", as_index=False)["val"].sum()
        real = folded[folded["j"] >= 0]
        w[real["j"].to_numpy(np.int64)] += real["val"].to_numpy(np.int64)
        w[dim] += int(folded.loc[folded["j"] == -1, "val"].sum())
        n_miss = int(folded.loc[folded["j"] == -2, "val"].sum())
        rows.append((epoch, -2, n_miss))
        rows.append((epoch, -1, int(w[dim])))
        rows.extend((epoch, int(j), int(w[j])) for j in range(dim))
    out = pd.DataFrame(rows, columns=cols)
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values(["epoch", "j"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# Model-calibration evaluation (reliability diagram + ECE digits)
CALIB_BINS = 10
CALIB_SCALE = 1_000_000


def s_calibration_report(sf_dir: str):
    """Reliability-diagram / expected-calibration-error report — the
    model-EVAL member the registry's confusion (t_langid_eval) and
    ranking (q_auc) metrics were missing: scores bucket into 10
    confidence bins; each bin reports support, positives, total
    confidence mass and the |accuracy - confidence| gap, plus the
    bin = -1 total row whose gap sum IS the (unnormalized) ECE.

    The score is a deterministic pseudo-probability from the embedding's
    first component, clamp((x0+1)/2, 0, 1) — in production this column
    comes from a model head; the OPERATOR under test is the binned
    calibration fold.  Scores enter the compare as floor(p*1e6)
    microunits: floor of the IDENTICAL double expression on both sides
    (no rounding-mode boundary to disagree on), after which everything
    is order-free integer sums.  Labels: y = 1 for even `label` (the
    s_perceptron convention).

    Plan: one embeddings scan; each block emits <= CALIB_BINS partial
    rows (bin, n, n_pos, sum_p_micro); `_two_regime_sum` folds; the
    driver derives gaps.  Zero full-width shuffles."""
    from .frames import typed_collect
    from .relational import _read, _two_regime_sum

    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "bin": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                    "sum_p_micro": pa.array([], pa.int64()),
                }
            )
        X = _batch_matrix(t)
        x0 = X[:, 0]
        p = np.minimum(np.maximum((x0 + 1) / 2, 0), 1)
        pm = np.floor(p * CALIB_SCALE).astype(np.int64)
        bins = np.minimum(pm // (CALIB_SCALE // CALIB_BINS), CALIB_BINS - 1)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        y = (lab % 2 == 0).astype(np.int64)
        n = np.bincount(bins, minlength=CALIB_BINS)
        npos = np.bincount(bins, weights=y, minlength=CALIB_BINS).astype(np.int64)
        sp = np.bincount(bins, weights=pm, minlength=CALIB_BINS).astype(np.int64)
        present = n > 0
        return pa.table(
            {
                "bin": pa.array(np.flatnonzero(present).astype(np.int64)),
                "n": pa.array(n[present].astype(np.int64)),
                "n_pos": pa.array(npos[present]),
                "sum_p_micro": pa.array(sp[present]),
            }
        )

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"],
        ["n", "n_pos", "sum_p_micro"],
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("bin", pa.int64()),
                ("n", pa.int64()),
                ("n_pos", pa.int64()),
                ("sum_p_micro", pa.int64()),
            ]
        ),
    )
    cols = ["bin", "n", "n_pos", "sum_p_micro", "gap_micro"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out["gap_micro"] = (
        out["n_pos"] * CALIB_SCALE - out["sum_p_micro"]
    ).abs()
    total = pd.DataFrame(
        {
            "bin": [-1],
            "n": [out["n"].sum()],
            "n_pos": [out["n_pos"].sum()],
            "sum_p_micro": [out["sum_p_micro"].sum()],
            "gap_micro": [out["gap_micro"].sum()],
        }
    )
    out = pd.concat([out, total], ignore_index=True)
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[cols].sort_values("bin").reset_index(drop=True)


# ----------------------------------------------------------------------
# Hard-example mining for contrastive training
N_TRIPLET_ANCHORS = 8


def s_triplet_mining(sf_dir: str):
    """Hard positive/negative TRIPLET mining for contrastive training
    (FaceNet-style batch-hard): for each of the first N_TRIPLET_ANCHORS
    anchors (by vec_id — the _query_matrix zone-map read, plus labels),
    the hardest positive = the SAME-label vector with minimum cosine
    similarity and the hardest negative = the DIFFERENT-label vector with
    maximum similarity — the mining pass that turns an embedding corpus
    into metric-learning training data.

    Plan: one embeddings scan; the anchor matrix broadcasts once; every
    block emits only its LOCAL hardest candidate per (anchor, class) —
    2 x anchors rows per block — and the driver merges under the same
    (rounded sim, vec_id) total order that ranks the whole family, so
    block layout cannot flip a tie.  Zero vectors follow the pinned
    list_cosine_similarity convention (sim -1: they become trivially
    'hardest' positives and sit last among negatives — identically on
    both sides).  Anchors lacking a positive or a negative partner are
    dropped (the oracle's inner joins mirror that)."""
    import heapq

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    cols = dict(
        anchor_id="i", pos_id="i", pos_sim="f", neg_id="i", neg_sim="f"
    )
    if pf.metadata.num_rows == 0:
        return _empty_result(**cols)
    col_idx = pf.schema_arrow.get_field_index("vec_id")
    mins = []
    for g in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(g).column(col_idx).statistics
        if st is None or not st.has_min_max:
            mins = None
            break
        mins.append((st.min, g))
    groups = (
        list(range(pf.metadata.num_row_groups))
        if mins is None
        else [g for _, g in heapq.nsmallest(N_TRIPLET_ANCHORS, mins)]
    )
    adf = (
        pf.read_row_groups(groups, columns=["vec_id", "embedding", "label"])
        .to_pandas()
        .sort_values("vec_id")
        .head(N_TRIPLET_ANCHORS)
        .reset_index(drop=True)
    )
    araw = np.stack(adf["embedding"].to_numpy()).astype(np.float64)
    anorm = _normalize(araw)
    aids = adf["vec_id"].to_numpy(np.int64)
    alabs = adf["label"].to_numpy(np.int64)
    ref = ray.put((aids, alabs, anorm, araw))

    class Mine:
        def __init__(self):
            self.aids, self.alabs, self.anorm, self.araw = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {
                "anchor_id": [],
                "cls": [],
                "vec_id": [],
                "sim": [],
            }
            if len(t):
                raw = _batch_matrix(t)
                vecs = _normalize(raw)
                sims = vecs @ self.anorm.T
                sims = _mask_zero_cosine(sims, raw, self.araw)
                vids = t.column("vec_id").to_numpy(zero_copy_only=False)
                labs = t.column("label").to_numpy(zero_copy_only=False)
                for ai in range(len(self.aids)):
                    col = sims[:, ai]
                    key = round_half_away(col, 4)
                    same = (labs == self.alabs[ai]) & (vids != self.aids[ai])
                    diff = labs != self.alabs[ai]
                    if same.any():
                        # hardest positive: min rounded sim, vec_id asc
                        order = np.lexsort((vids[same], key[same]))
                        j = np.flatnonzero(same)[order[0]]
                        out["anchor_id"].append(int(self.aids[ai]))
                        out["cls"].append(0)
                        out["vec_id"].append(int(vids[j]))
                        out["sim"].append(float(col[j]))
                    if diff.any():
                        # hardest negative: max rounded sim, vec_id asc
                        order = np.lexsort((vids[diff], -key[diff]))
                        j = np.flatnonzero(diff)[order[0]]
                        out["anchor_id"].append(int(self.aids[ai]))
                        out["cls"].append(1)
                        out["vec_id"].append(int(vids[j]))
                        out["sim"].append(float(col[j]))
            return pa.table(
                {
                    "anchor_id": pa.array(out["anchor_id"], pa.int64()),
                    "cls": pa.array(out["cls"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "sim": pa.array(out["sim"], pa.float64()),
                }
            )

    local = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .map_batches(
            warm_factory(("s_triplet_mining", ref.hex()), Mine),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    if len(local) == 0:
        return _empty_result(**cols)
    local["key"] = round_half_away(local["sim"].to_numpy(), 4)
    rows = []
    for aid in aids:
        mine = local[local["anchor_id"] == aid]
        pos = mine[mine["cls"] == 0].sort_values(["key", "vec_id"])
        neg = mine[mine["cls"] == 1].sort_values(
            ["key", "vec_id"], ascending=[False, True]
        )
        if len(pos) == 0 or len(neg) == 0:
            continue
        rows.append(
            (
                int(aid),
                int(pos["vec_id"].iloc[0]),
                float(pos["key"].iloc[0]),
                int(neg["vec_id"].iloc[0]),
                float(neg["key"].iloc[0]),
            )
        )
    if not rows:
        return _empty_result(**cols)
    out = pd.DataFrame(
        rows, columns=["anchor_id", "pos_id", "pos_sim", "neg_id", "neg_sim"]
    )
    for c in ("anchor_id", "pos_id", "neg_id"):
        out[c] = out[c].astype("int64")
    return out.sort_values("anchor_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# Filtered vector search (metadata predicate pushed into the scan)
FILTER_LABEL = 3


def s_filtered_knn(sf_dir: str):
    """FILTERED vector search — top-k cosine restricted to vectors whose
    label matches the query predicate (label == 3): the hybrid
    metadata+vector retrieval shape every production vector store needs
    (RAG with tenant/ACL filters).  The predicate pushes INTO the scan as
    an Arrow filter before any similarity math — the selective-filter
    regime where post-filtering a global top-k would under-fill; a
    partition-keyed store would prune files by label instead (the
    s_ann_partitioned layout applied to the predicate column).

    Same machinery as s_knn_bruteforce otherwise: broadcast query
    matrix, per-block local top-k under the family's (rounded sim,
    vec_id) order, driver merge."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    qref = ray.put((qids, qmat))

    class Score:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t.column("label"), FILTER_LABEL))
            if len(t) == 0 or len(self.qids) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            raw = _batch_matrix(t)
            vecs = _normalize(raw)
            sims = vecs @ self.qmat.T
            sims = _mask_zero_cosine(sims, raw, self.qmat)
            vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            out = {"query_id": [], "vec_id": [], "sim": []}
            k = min(TOP_K, len(vec_ids))
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                order = np.lexsort((vec_ids, -round_half_away(col, 4)))
                for j in order[:k]:
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

    import ray.data as rd

    local = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .map_batches(
            warm_factory(("s_filtered_knn", qref.hex()), Score),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    return _merge_topk(local)
