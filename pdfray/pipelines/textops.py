"""Training-data text operators over the ``documents`` table.

Engine-added large-scale pipeline components (driver brief): token counting,
language ID, quality scoring, document fingerprinting, exact dedup,
MinHash+LSH / SimHash / n-gram-Jaccard near-dedup.  All hot paths are
vectorized or actor-pooled ``map_batches`` stages; shuffles only on reduced
rows (hashes, bucket keys), never on full text where avoidable.
"""
from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\S+")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "en"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en"},
}

# characteristic letter/word profiles for the n-gram language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "with", "from", "this"},
    "de": {"und", "der", "die", "das", "nicht", "mit"},
    "fr": {"les", "des", "est", "une", "dans", "pour"},
    "es": {"los", "las", "una", "para", "con", "por"},
}
_LANG_CHARS = {"de": "äöüß", "fr": "éèêàçù", "es": "ñáéíóú¿¡"}


def _read_documents(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ----------------------------------------------------------------------
def t_token_stats(sf_dir: str):
    """Per-document token/char counts — pure vectorized projection."""

    def project(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_tokens": n_tokens, "n_chars": n_chars}
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def t_fingerprint(sf_dir: str):
    """Deterministic document fingerprint: md5 over whitespace-normalized text."""

    def project(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        fps = [
            hashlib.md5(" ".join(s.split()).lower().encode("utf-8")).hexdigest()
            for s in texts
        ]
        return pa.table({"doc_id": t.column("doc_id"), "fingerprint": pa.array(fps)})

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def t_exact_dedup(sf_dir: str):
    """Exact dedup: hash-partition on content hash, keep first doc per group.

    At scale this is the canonical hash-shuffle dedup: the shuffle moves only
    (hash, doc_id) pairs, never the text.
    """

    def project(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        hashes = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        return pa.table({"text_hash": pa.array(hashes), "doc_id": t.column("doc_id")})

    from ray.data.aggregate import Count, Min

    out = (
        _read_documents(sf_dir)
        .map_batches(project, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="rep_doc"), Count(alias_name="n_copies"))
    )
    return out.to_pandas().sort_values("text_hash").reset_index(drop=True)


def t_quality(sf_dir: str):
    """Quality features as exact integer counts (ratio = count / n_chars
    downstream; integers keep the oracle comparison rounding-free)."""

    def project(t: pa.Table) -> pa.Table:
        # all-Arrow kernels (RE2), matching the oracle's ASCII [a-zA-Z] class
        text = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                "n_alpha": pc.cast(
                    pc.utf8_length(pc.replace_substring_regex(text, "[^a-zA-Z]", "")),
                    pa.int64(),
                ),
                "n_spaces": pc.cast(pc.count_substring(text, " "), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


class LangId:
    """Actor-pool language-ID stage: marker tables built once per actor."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.chars = _LANG_CHARS
        self.word_re = re.compile(r"[a-zäöüßéèêàçùñáíóú¿¡]+")

    def classify(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        scores = {lang: 0.0 for lang in self.markers}
        wordset = set(words)
        for lang, marks in self.markers.items():
            scores[lang] += 2.0 * len(wordset & marks)
        lower = text.lower()
        for lang, chars in self.chars.items():
            scores[lang] += sum(lower.count(c) for c in chars) * 0.5
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        return best[0] if best[1] > 0 else "en"

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self.classify(s) for s in t.column("text").to_pylist()]
        out = {"doc_id": t.column("doc_id"), "lang_pred": pa.array(preds)}
        if "lang" in t.column_names:
            out["lang"] = t.column("lang")
        return pa.table(out)


def t_langid(sf_dir: str):
    ds = _read_documents(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# near-duplicate detection

_SHINGLE_K = 3
_NUM_HASHES = 64
_NUM_BANDS = 16  # 16 bands x 4 rows


def _shingles(text: str, k: int = _SHINGLE_K):
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor."""

    def __init__(self, num_hashes: int = _NUM_HASHES, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_hashes, dtype=np.int64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_hashes, dtype=np.int64)
        self.p = np.int64((1 << 61) - 1)  # Mersenne prime

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        if not sh:
            return np.zeros(len(self.a), dtype=np.int64)
        hv = np.array(
            [zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.int64
        ).reshape(-1, 1)
        # (n_shingles, n_hashes) permutations, min over shingles — vectorized
        m = (hv * self.a.reshape(1, -1) + self.b.reshape(1, -1)) % self.p
        return m.min(axis=0)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        rows_per_band = len(self.a) // _NUM_BANDS
        for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            sig = self.signature(text)
            for band in range(_NUM_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                ids.append(doc_id)
                bands.append(band)
                keys.append(key)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys, pa.string()),
            }
        )


def t_minhash_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """MinHash+LSH near-dup candidates, verified with true shingle Jaccard.

    shingle -> minhash -> band buckets (explode) -> groupby(band, band_key)
    -> candidate pairs -> verify.  The shuffle carries only
    (doc_id, band, 16-byte key) rows.  Verification re-reads just the
    candidate docs (broadcast of the needed texts).
    """
    import ray

    ds = _read_documents(sf_dir)
    buckets = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 4))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        out = {"doc_a": [], "doc_b": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[j])
        return pd.DataFrame(out)

    pairs = (
        buckets.groupby(["band", "band_key"])
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)

    # fetch ONLY the candidate documents' texts (broadcast the needed-id set;
    # the full table never reaches the driver)
    needed = set(pairs["doc_a"]) | set(pairs["doc_b"])
    needed_ref = ray.put(needed)

    class KeepNeeded:  # actor pool: id set fetched ONCE per actor
        def __init__(self):
            self.wanted = ray.get(needed_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pa.array([d in self.wanted for d in t.column("doc_id").to_pylist()])
            return t.filter(mask)

    texts_df = ds.map_batches(
        KeepNeeded, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    shingle_cache = {
        d: _shingles(t) for d, t in zip(texts_df["doc_id"], texts_df["text"])
    }
    out = {"doc_a": [], "doc_b": [], "jaccard": []}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        sa, sb = shingle_cache[a], shingle_cache[b]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= jaccard_threshold:
            out["doc_a"].append(a)
            out["doc_b"].append(b)
            out["jaccard"].append(round(j, 4))
    return pd.DataFrame(out).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over token features, stateful per actor.

    Vectorized: tokens are md5-hashed once each through an actor-level cache
    (identical values to the scalar definition), unpacked to a ±1 bit matrix,
    and accumulated per document with one np.add.reduceat over the batch's
    token segments — no per-bit Python loop."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self):
        self.word_re = _WORD_RE
        self.cache: dict = {}

    @staticmethod
    def _h64(token: str) -> int:
        return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")

    def _hash_tokens(self, toks) -> np.ndarray:
        cache = self.cache
        if len(cache) > 2_000_000:  # bound actor memory on open vocabularies
            cache.clear()
        h = np.empty(len(toks), dtype=np.uint64)
        h64 = self._h64
        for i, tok in enumerate(toks):
            v = cache.get(tok)
            if v is None:
                v = h64(tok)
                cache[tok] = v
            h[i] = v
        return h

    def simhash_many(self, texts) -> np.ndarray:
        tok_lists = [self.word_re.findall(s.lower()) for s in texts]
        counts = np.array([len(lst) for lst in tok_lists], dtype=np.int64)
        result = np.zeros(len(texts), dtype=np.uint64)
        all_toks = [tok for lst in tok_lists for tok in lst]
        if not all_toks:
            return result
        h = self._hash_tokens(all_toks)
        # (n_tokens, 64) ±1 contributions; int32 keeps reduceat overflow-safe
        bits = ((h[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(np.int32)
        contrib = bits * 2 - 1
        nonempty = counts > 0
        ne_counts = counts[nonempty]
        starts = np.concatenate(([0], np.cumsum(ne_counts)[:-1]))
        acc = np.add.reduceat(contrib, starts, axis=0)
        vals = ((acc > 0).astype(np.uint64) << self._SHIFTS[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        result[nonempty] = vals
        return result

    def simhash(self, text: str) -> int:
        return int(self.simhash_many([text])[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        hv = self.simhash_many(t.column("text").to_pylist())
        hashes = [format(int(v), "016x") for v in hv]
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(hashes)})


def t_simhash(sf_dir: str):
    ds = _read_documents(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 4)
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def t_ngram_jaccard_dupes(sf_dir: str, threshold: float = 0.5):
    """Character-n-gram Jaccard near-dup pairs within simhash-prefix buckets.

    Bucketing bounds the O(n^2) verify to same-prefix groups, and the
    per-bucket pair scan runs distributed in groupby().map_groups — only the
    surviving pairs reach the driver."""

    def add_bucket(t: pa.Table) -> pa.Table:
        hasher = SimHasher()
        hashes = [format(hasher.simhash(s), "016x") for s in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "bucket": pa.array([h[:2] for h in hashes]),
            }
        )

    def char_ngrams(s: str, n: int = 4):
        s = " ".join(s.split()).lower()
        return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = list(zip(g["doc_id"], g["text"]))
        grams = [char_ngrams(t) for _, t in rows]
        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                union = len(grams[i] | grams[j])
                jac = len(grams[i] & grams[j]) / union if union else 0.0
                if jac >= threshold:
                    a, b = sorted((rows[i][0], rows[j][0]))
                    out["doc_a"].append(a)
                    out["doc_b"].append(b)
                    out["jaccard"].append(round(jac, 4))
        return pd.DataFrame(out)

    pairs = (
        _read_documents(sf_dir)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
