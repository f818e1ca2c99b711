"""Training-data text operators over the ``documents`` table.

Engine-added large-scale pipeline components (driver brief): token counting,
language ID, quality scoring, document fingerprinting, exact dedup,
MinHash+LSH / SimHash / n-gram-Jaccard near-dedup.  All hot paths are
vectorized or actor-pooled ``map_batches`` stages; shuffles only on reduced
rows (hashes, bucket keys), never on full text where avoidable.
"""
from __future__ import annotations

import hashlib
import math
import os
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


_DOC_TYPES = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "lang": pa.string(),
    "source": pa.string(),
    "n_chars": pa.int64(),
}


def _empty_docs(columns=("doc_id", "text")):
    """A 0-row documents batch with the real column types — the probe
    input `_collect_sorted` feeds a stage UDF to learn its output schema."""
    return pa.table({c: pa.array([], _DOC_TYPES[c]) for c in columns})


def _collect_sorted(ds, sort_cols, schema_probe=None, schema=None):
    """Collect + sort that survives an all-empty stream (Ray drops empty
    blocks and loses the schema — see frames.typed_collect).  The fallback
    schema comes from ``schema`` or from ``schema_probe()`` — typically
    the stage's own UDF applied to `_empty_docs`, so the declared empty
    output can never drift from the real one."""
    df = ds.to_pandas()
    if len(df.columns) == 0:
        arrow = schema
        if arrow is None and schema_probe is not None:
            probe = schema_probe()
            if isinstance(probe, pd.DataFrame):
                probe = pa.Table.from_pandas(probe, preserve_index=False)
            arrow = probe.schema
        if arrow is None:
            s = ds.schema()
            arrow = getattr(s, "base_schema", None) if s is not None else None
        if arrow is None:
            raise ValueError("_collect_sorted: all-empty stream needs a schema")
        df = arrow.empty_table().to_pandas()
    return df.sort_values(list(sort_cols)).reset_index(drop=True)


_WARM_STAGE_CACHE: dict = {}


def warm_stage(cls, **kwargs):
    """Task-pool form of a stateful stage with WARM per-worker-process state.

    Ray reuses worker processes across map tasks, so a process-global
    instance gives the same cache/compiled-pattern reuse an actor pool
    would, WITHOUT actor-pool startup latency (measured: the autoscaling
    actor pools dominated small-stage wall time) and with elastic task
    scheduling — the same trade `extraction._warm_extract_fn` measured ~40%
    faster for the flagship.  Use a real actor pool only when per-instance
    setup is genuinely expensive or the stage must bound concurrency."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))
    return warm_factory(key, lambda: cls(**kwargs))


def warm_factory(key, factory):
    """`warm_stage` for stages whose class is defined in function scope
    (cloudpickle ships the definition): ``key`` must uniquely identify the
    stage AND its broadcast inputs (e.g. include the ObjectRef hex) so a
    worker never reuses an instance across different broadcasts."""

    def fn(batch):
        obj = _WARM_STAGE_CACHE.get(key)
        if obj is None:
            if len(_WARM_STAGE_CACHE) > 16:  # bound worker memory: stage
                _WARM_STAGE_CACHE.clear()  # instances can hold big caches
            obj = factory()
            _WARM_STAGE_CACHE[key] = obj
        return obj(batch)

    return fn


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
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


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
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


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
    return _collect_sorted(
        out,
        ("text_hash",),
        schema=pa.schema(
            [
                ("text_hash", pa.string()),
                ("rep_doc", pa.int64()),
                ("n_copies", pa.int64()),
            ]
        ),
    )


_ALL_STOPWORDS = sorted(set().union(*STOPWORDS.values()))


def t_quality(sf_dir: str):
    """Quality features as exact integer counts (ratio = count / n_chars or
    / n_tokens downstream; integers keep the oracle comparison
    rounding-free).  Stopword counts use the union marker set — the
    standard natural-text-vs-gibberish quality signal."""

    stop_set = pa.array(_ALL_STOPWORDS)

    def project(t: pa.Table) -> pa.Table:
        # all-Arrow kernels (RE2), matching the oracle's ASCII [a-zA-Z] class
        text = t.column("text")
        # vectorized stopword count: lower -> split -> flatten -> is_in,
        # summed back per row via the list offsets (no Python row loop)
        toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+").combine_chunks()
        member = pc.cast(
            pc.is_in(pc.list_flatten(toks), value_set=stop_set), pa.int8()
        ).to_numpy(zero_copy_only=False)
        # raw offsets are absolute into the value buffer; rebase so they
        # index `member` (list_flatten already dropped any slice slack)
        offsets = toks.offsets.to_numpy()
        offsets = offsets - offsets[0]
        sums = np.add.reduceat(
            np.concatenate([member, [0]]), offsets[:-1]
        ) * (np.diff(offsets) > 0)
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
                "n_stopwords": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


# the eight Gopher stop words (Rae et al. 2021 §A1.1): a document must
# contain at least two DISTINCT ones to pass the natural-language gate
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_project(t: pa.Table) -> pa.Table:
    """Per-batch Gopher rule flags (shared by t_gopher_rules and
    t_filter_attrition — ONE kernel, no rule drift)."""
    text = t.column("text")
    lower = pc.utf8_lower(text)
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    sum_word_chars = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, r"\s", "")), pa.int64()
    )
    n_symbols = pc.add(
        pc.add(
            pc.cast(pc.count_substring(text, "#"), pa.int64()),
            pc.cast(pc.count_substring(text, "…"), pa.int64()),
        ),
        pc.cast(pc.count_substring(text, "..."), pa.int64()),
    )
    n_alpha_words = pc.cast(
        pc.count_substring_regex(text, r"[^\s]*[A-Za-z][^\s]*"), pa.int64()
    )
    stop_hits = None
    for w in _GOPHER_STOPS:
        hit = pc.cast(
            pc.match_substring_regex(lower, rf"(^|\s){w}(\s|$)"), pa.int64()
        )
        stop_hits = hit if stop_hits is None else pc.add(stop_hits, hit)
    n_lines_l, n_bullet_l, n_ell_l = [], [], []
    for s in text.to_pylist():
        lines = [ln for ln in s.split("\n") if ln]
        n_lines_l.append(len(lines))
        n_bullet_l.append(
            sum(ln.startswith(("- ", "* ", "• ")) for ln in lines)
        )
        n_ell_l.append(sum(ln.endswith(("...", "…")) for ln in lines))
    n_lines = pa.array(n_lines_l, pa.int64())
    n_bullet = pa.array(n_bullet_l, pa.int64())
    n_ell = pa.array(n_ell_l, pa.int64())
    ten_words = pc.multiply(n_words, pa.scalar(10, pa.int64()))
    keep = pc.and_(
        pc.and_(
            pc.and_(
                pc.greater_equal(n_words, pa.scalar(50, pa.int64())),
                pc.less_equal(n_words, pa.scalar(100_000, pa.int64())),
            ),
            pc.and_(
                pc.less_equal(
                    pc.multiply(n_words, pa.scalar(3, pa.int64())),
                    sum_word_chars,
                ),
                pc.less_equal(sum_word_chars, ten_words),
            ),
        ),
        pc.and_(
            pc.and_(
                pc.less_equal(
                    pc.multiply(n_symbols, pa.scalar(10, pa.int64())), n_words
                ),
                pc.and_(
                    pc.less_equal(
                        pc.multiply(n_bullet, pa.scalar(10, pa.int64())),
                        pc.multiply(n_lines, pa.scalar(9, pa.int64())),
                    ),
                    pc.less_equal(
                        pc.multiply(n_ell, pa.scalar(10, pa.int64())),
                        pc.multiply(n_lines, pa.scalar(3, pa.int64())),
                    ),
                ),
            ),
            pc.and_(
                pc.greater_equal(
                    pc.multiply(n_alpha_words, pa.scalar(5, pa.int64())),
                    pc.multiply(n_words, pa.scalar(4, pa.int64())),
                ),
                pc.greater_equal(stop_hits, pa.scalar(2, pa.int64())),
            ),
        ),
    )
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_words": n_words,
            "sum_word_chars": sum_word_chars,
            "n_symbols": n_symbols,
            "n_lines": n_lines,
            "n_bullet": n_bullet,
            "n_ellipsis_lines": n_ell,
            "n_alpha_words": n_alpha_words,
            "n_stop_distinct": stop_hits,
            "keep": keep,
        }
    )


def t_gopher_rules(sf_dir: str):
    """Gopher quality-rule metrics (Rae et al. 2021, public): per document
    the integer counts each rule reads, plus the keep verdict.  All rule
    thresholds are evaluated as INTEGER cross-multiplications (e.g. mean
    word length in [3,10] <=> 3*n_words <= sum_word_chars <= 10*n_words),
    so the DuckDB oracle is rounding-free.  Rules: 50..100k words; mean
    word length 3..10; symbol-to-word ratio ('#'/'…'/'...') <= 0.1; <= 90%
    of lines bullet-led; <= 30% of lines ellipsis-terminated; >= 80% of
    words contain an alphabetic char; >= 2 distinct stop words."""

    ds = _read_documents(sf_dir).map_batches(_gopher_project, batch_format="pyarrow")
    return _collect_sorted(
        ds, ("doc_id",), lambda: _gopher_project(_empty_docs())
    )


_C4_TERMINAL = (".", "!", "?", '"')


def _c4_project(t: pa.Table) -> pa.Table:
    """Per-batch C4 rule flags (shared by t_c4_filter and
    t_filter_attrition — ONE kernel, no rule drift)."""
    word = re.compile(r"\S+")
    ids = t.column("doc_id")
    n_lines_l, n_kept_l, lorem_l, brace_l = [], [], [], []
    for s in t.column("text").to_pylist():
        lines = [
            ln
            for ln in (raw.strip(" \t\r") for raw in s.split("\n"))
            if ln
        ]
        kept = 0
        for ln in lines:
            if (
                ln.endswith(_C4_TERMINAL)
                and len(word.findall(ln)) >= 3
                and "javascript" not in ln.lower()
            ):
                kept += 1
        n_lines_l.append(len(lines))
        n_kept_l.append(kept)
        lorem_l.append("lorem ipsum" in s.lower())
        brace_l.append("{" in s)
    keep = [
        k >= 3 and not lo and not br
        for k, lo, br in zip(n_kept_l, lorem_l, brace_l)
    ]
    return pa.table(
        {
            "doc_id": ids,
            "n_lines": pa.array(n_lines_l, pa.int64()),
            "n_kept_lines": pa.array(n_kept_l, pa.int64()),
            "has_lorem": pa.array(lorem_l, pa.bool_()),
            "has_brace": pa.array(brace_l, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def t_c4_filter(sf_dir: str):
    """C4-style line/page cleaning metrics (Raffel et al. 2020, public):
    a line survives iff it ends in terminal punctuation, has >= 3 words,
    and does not mention 'javascript'; a page survives iff it has >= 3
    surviving lines, no 'lorem ipsum', and no '{'.  Lines are
    newline-split and space/tab/CR-trimmed (the pipeline_line_dedup
    convention).  Integer counts + booleans only — rounding-free oracle."""
    ds = _read_documents(sf_dir).map_batches(_c4_project, batch_format="pyarrow")
    return _collect_sorted(
        ds, ("doc_id",), lambda: _c4_project(_empty_docs())
    )


# PII patterns, deliberately written in the RE2 dialect BOTH engines share
# (Arrow's count_substring_regex/replace_substring_regex and DuckDB's
# regexp_* all run RE2, so the same pattern string is bit-identical on
# both sides — no Python `re` in the loop)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+?\d[\d -]{7,}\d"


def t_pii_scrub(sf_dir: str):
    """PII detection + redaction metrics: per document the email / IPv4 /
    phone match counts and the md5 of the scrubbed text (emails ->
    <EMAIL>, then IPs -> <IP>, then phones -> <PHONE>; the order is pinned
    because it is observable through the fingerprint).  All counting and
    replacing is Arrow RE2 — the DuckDB oracle replays the identical
    pattern strings through its own RE2, so the comparison certifies the
    scrub byte-for-byte via the fingerprint without shipping text."""

    def project(t: pa.Table) -> pa.Table:
        text = t.column("text")
        scrubbed = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.replace_substring_regex(text, _PII_EMAIL, "<EMAIL>"),
                _PII_IP,
                "<IP>",
            ),
            _PII_PHONE,
            "<PHONE>",
        )
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in scrubbed.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_emails": pc.cast(
                    pc.count_substring_regex(text, _PII_EMAIL), pa.int64()
                ),
                "n_ips": pc.cast(
                    pc.count_substring_regex(text, _PII_IP), pa.int64()
                ),
                "n_phones": pc.cast(
                    pc.count_substring_regex(text, _PII_PHONE), pa.int64()
                ),
                "scrubbed_fp": pa.array(fps, pa.string()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


def _word_codes(t: pa.Table):
    """Space-tokenize a batch into integer word codes, Arrow-side.

    Returns ``(parent, codes, dictionary)``: doc index and dictionary code
    per non-empty token, plus the batch dictionary array.  Shared by the
    word-statistics stages so they all agree on tokenization (and with the
    oracles' ``list_filter(string_split(text, ' '), w -> w <> '')``)."""
    n_docs = t.num_rows
    toks = pc.split_pattern(t.column("text"), " ").combine_chunks()
    offsets = toks.offsets.to_numpy()
    offsets = offsets - offsets[0]
    parent = np.repeat(np.arange(n_docs), np.diff(offsets))
    # toks was combine_chunks()'d, so list_flatten yields a plain Array and
    # the encode builds ONE dictionary (chunked inputs would get a
    # dictionary per chunk, breaking the shared code space)
    enc = pc.list_flatten(toks).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    empty = np.flatnonzero(pc.equal(enc.dictionary, "").to_numpy(zero_copy_only=False))
    if empty.size:  # split artifacts (leading/double spaces)
        keep = codes != int(empty[0])
        codes, parent = codes[keep], parent[keep]
    return parent, codes, enc.dictionary


def t_tfidf(sf_dir: str):
    """Per-document TF-IDF mass: two passes, global stat then broadcast.

    Pass 1 reduces the corpus to the vocab-sized (word, df) table (same
    combiner shuffle as ``t_doc_frequency``); pass 2 broadcasts it via
    ``ray.put`` and scores every document in a map stage —
    ``sum(tf * ln(N / df))`` — so the global statistic ships to workers
    once, not per batch, and no second shuffle exists.  This is the
    canonical two-pass corpus-weighting shape (IDF weighting, quality
    reweighting, temperature sampling all look like this at 100 TB).

    Scores are emitted as half-up-rounded integer milli-units: ln() is
    transcendental, so true values never sit on a rounding boundary and
    the integer comparison is rounding-mode-safe across engines.
    """
    import ray
    from ray.data.aggregate import Sum

    def df_partials(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        pair_codes = np.unique(parent * vocab + codes) % vocab if codes.size else codes
        df = np.bincount(pair_codes, minlength=vocab)
        present = df > 0
        return pa.table(
            {
                "word": dictionary.filter(pa.array(present)),
                "df": pa.array(df[present], pa.int64()),
            }
        )

    df_table = _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df")),
        ("word",),
        schema=pa.schema([("word", pa.string()), ("df", pa.int64())]),
    )
    n_total = _read_documents(sf_dir, columns=("doc_id",)).count()
    bref = ray.put(
        (
            pa.array(df_table["word"], pa.string()),
            df_table["df"].to_numpy().astype(np.float64),
            float(n_total),
        )
    )

    class Score:
        def __init__(self):
            self.words, self.df, self.n_total = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            parent, codes, dictionary = _word_codes(t)
            # per-(doc, word) tf via unique doc-scoped keys
            vocab = len(dictionary)
            if codes.size:
                keys, tf = np.unique(parent * vocab + codes, return_counts=True)
                pair_parent, pair_code = keys // vocab, keys % vocab
            else:
                pair_parent = pair_code = tf = codes
            # batch dictionary -> global df via one index_in over the vocab.
            # The dictionary can hold entries NO code references (the ""
            # split artifact survives dictionary_encode even though its
            # codes are filtered) — those miss the global df table, so the
            # lookup must null-guard; their idf is never consumed because
            # pair_code only ranges over filtered codes.
            pos = (
                pc.fill_null(pc.index_in(dictionary, value_set=self.words), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            if self.df.size:
                idf_by_code = np.log(
                    self.n_total / self.df[np.where(pos >= 0, pos, 0)]
                )
                idf_by_code[pos < 0] = 0.0  # unused entries only
            else:  # corpus with no tokens at all
                idf_by_code = np.zeros(vocab)
            contrib = tf * idf_by_code[pair_code]
            score = np.bincount(pair_parent, weights=contrib, minlength=t.num_rows)
            n_words = np.bincount(parent, minlength=t.num_rows)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
                    "tfidf_x1e3": pa.array(
                        np.floor(score * 1000.0 + 0.5).astype(np.int64), pa.int64()
                    ),
                }
            )

    out = _read_documents(sf_dir).map_batches(
        warm_factory(("t_tfidf", bref.hex()), Score), batch_format="pyarrow"
    )
    return _collect_sorted(out, ("doc_id",), lambda: Score()(_empty_docs()))


N_INDEX_BUCKETS = 16
# common template words + one absent probe (absent words must cost zero
# postings, and the oracle must agree they produce no rows)
INDEX_PROBE_WORDS = ("hash", "query", "row", "table", "zzz_absent")


def _word_bucket(word: str) -> int:
    """Deterministic word -> partition bucket (md5 prefix, like the url
    partitioner): recomputable by any reader, stable across runs."""
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16) % N_INDEX_BUCKETS


def _postings_batch(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        if codes.size:
            keys, tf = np.unique(parent * vocab + codes, return_counts=True)
            pair_parent, pair_code = keys // vocab, keys % vocab
        else:
            pair_parent = pair_code = tf = codes
        doc_ids = t.column("doc_id").to_numpy()[pair_parent]
        bucket_by_code = np.array(
            [_word_bucket(w) for w in dictionary.to_pylist()] or [0], np.int64
        )
        return pa.table(
            {
                "word": dictionary.take(pa.array(pair_code)),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
                "bucket": pa.array(bucket_by_code[pair_code], pa.int64()),
            }
        )

def build_inverted_index(sf_dir: str, out_dir: str) -> None:
    """Build a word->postings store partitioned by word-hash bucket.

    The text-side analog of `simsearch.build_vector_store`: one map pass
    collapses each batch to (word, doc_id, tf) postings — text dropped in
    the worker — and `write_parquet(partition_cols=['bucket'])` lays them
    out so a lookup touches only the probed words' buckets.  No shuffle:
    hive partitioning splits inside each write task, and a posting list
    split across files is still one directory scan at read time.  At
    100 TB the bucket count scales with vocabulary; co-locating a word's
    postings entirely (one file per word range) would add a repartition on
    bucket — the directory layout already gives the pruning."""
    _read_documents(sf_dir).map_batches(
        _postings_batch, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["bucket"])


def update_inverted_index(
    sf_dir: str, out_dir: str, min_doc_id: int, delta_id: str = None
) -> None:
    """Incremental (watermark) append to an existing bucket store: only
    the delta docs (doc_id >= min_doc_id) are tokenized, and their postings
    land in the SAME hive layout.  `compact_inverted_index` restores
    file-count hygiene after many deltas.  This is the daily-crawl index
    maintenance shape: index cost scales with the delta, not the corpus.

    Idempotency (pass ``delta_id``, e.g. the crawl date): the delta is
    staged to a scratch dir, any ``delta-{id}-*`` files from a previous
    crashed attempt are removed, the staged files are renamed into the
    bucket partitions under DETERMINISTIC ``delta-{id}-`` names, and a
    ``_delta_{id}_SUCCESS`` marker makes a rerun a no-op — so a retried
    job can never double-append postings.  Without ``delta_id`` the append
    is fire-once (the original uniquely-named-files behavior)."""

    def delta_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids >= min_doc_id))

    postings = _read_documents(sf_dir).map_batches(
        delta_only, batch_format="pyarrow"
    ).map_batches(_postings_batch, batch_format="pyarrow")
    if delta_id is None:
        postings.write_parquet(out_dir, partition_cols=["bucket"])
        return

    import glob as _glob
    import os
    import shutil
    import tempfile

    marker = os.path.join(out_dir, f"_delta_{delta_id}_SUCCESS")
    if os.path.exists(marker):
        return  # this delta is already committed
    stage = tempfile.mkdtemp(prefix=f".delta-{delta_id}-", dir=out_dir)
    try:
        postings.write_parquet(stage, partition_cols=["bucket"])
        for bdir in sorted(_glob.glob(os.path.join(stage, "bucket=*"))):
            bucket = os.path.basename(bdir)
            dest = os.path.join(out_dir, bucket)
            os.makedirs(dest, exist_ok=True)
            # clear a crashed attempt's partial move, then commit under
            # deterministic names (retry-safe: same names overwrite)
            for f in _glob.glob(os.path.join(dest, f"delta-{delta_id}-*")):
                os.remove(f)
            for i, f in enumerate(
                sorted(_glob.glob(os.path.join(bdir, "*.parquet")))
            ):
                os.replace(
                    f, os.path.join(dest, f"delta-{delta_id}-{i:05d}.parquet")
                )
        with open(marker, "w") as fh:
            fh.write("ok")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def compact_inverted_index(store_dir: str) -> dict:
    """Merge each bucket partition's files into one (per-bucket Ray task:
    buckets are independent, so compaction fans out across the cluster and
    never touches unrelated partitions).

    Consistency: the merged file is staged under a non-matching name, the
    old files are RETIRED (renamed out of the readers' ``*.parquet`` glob)
    and only then is the merged file published — so a concurrent reader
    can briefly see a bucket with some postings missing, but NEVER
    double-counted (publish-before-retire would double every posting in
    the bucket during the window).  Crash-safe via a per-bucket intent
    manifest written BEFORE any mutation: recovery rolls forward (finish
    deleting retired files) when the merged file was published, and rolls
    back (restore retired files) when it was not — either way no posting
    is lost or double-counted and re-running converges.  Run during a
    maintenance window when readers need point-in-time counts.
    Returns {'files_before': n, 'files_after': m}."""
    import glob as _glob
    import os
    import uuid

    import ray

    @ray.remote
    def _compact_bucket(bdir: str) -> tuple:
        import glob
        import json as _json
        import os

        import pyarrow.parquet as pq_

        manifest = os.path.join(bdir, ".compact-manifest")
        # recovery: the manifest says which way an interrupted run must roll.
        # Final published -> the merge already CONTAINS the retired rows:
        # finish the delete (restoring them would double-count).  Final
        # absent -> the merge never happened: restore the retired files.
        if os.path.exists(manifest):
            with open(manifest) as fh:
                m = _json.load(fh)
            if os.path.exists(os.path.join(bdir, m["final"])):
                for r in m["retired"]:
                    p = os.path.join(bdir, r)
                    if os.path.exists(p):
                        os.remove(p)
            else:
                for r in m["retired"]:
                    p = os.path.join(bdir, r)
                    if os.path.exists(p):
                        os.rename(
                            p, os.path.join(bdir, r[len(".retired-"):])
                        )
            os.remove(manifest)
        for f in glob.glob(os.path.join(bdir, ".compact-*.tmp")):
            os.remove(f)  # orphan staging files from any crashed run
        files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
        if len(files) <= 1:
            return (len(files), len(files))
        merged = pa.concat_tables([pq_.read_table(f) for f in files])
        token = uuid.uuid4().hex
        tmp = os.path.join(bdir, f".compact-{token}.tmp")
        pq_.write_table(merged, tmp, row_group_size=64 * 1024)
        retired_names = [".retired-" + os.path.basename(f) for f in files]
        final_name = f"compact-{token}.parquet"
        mtmp = manifest + ".tmp"
        with open(mtmp, "w") as fh:
            _json.dump({"final": final_name, "retired": retired_names}, fh)
        os.rename(mtmp, manifest)  # intent recorded BEFORE any mutation
        for f, r in zip(files, retired_names):
            os.rename(f, os.path.join(bdir, r))
        os.rename(tmp, os.path.join(bdir, final_name))
        for r in retired_names:
            os.remove(os.path.join(bdir, r))
        os.remove(manifest)
        return (len(files), 1)

    buckets = sorted(_glob.glob(os.path.join(store_dir, "bucket=*")))
    results = ray.get([_compact_bucket.remote(b) for b in buckets])
    return {
        "files_before": sum(r[0] for r in results),
        "files_after": sum(r[1] for r in results),
    }


def query_inverted_index(store_dir: str, words) -> pd.DataFrame:
    """Postings lookup reading ONLY the probed words' bucket partitions."""
    import os

    import ray.data as rd

    import glob as _glob

    paths = [
        f
        for b in sorted({_word_bucket(w) for w in words})
        for f in sorted(
            _glob.glob(os.path.join(store_dir, f"bucket={b}", "*.parquet"))
        )
    ]
    if not paths:
        return pd.DataFrame(
            {
                "word": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "tf": pd.Series(dtype="int64"),
            }
        )
    probe = pa.array(sorted(words))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("word"), value_set=probe))

    out = (
        rd.read_parquet(paths, columns=["word", "doc_id", "tf"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    if "word" not in out.columns:  # no probed word present: every block
        # empty and Ray drops the schema — return the typed empty frame
        return pd.DataFrame(
            {
                "word": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "tf": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(["word", "doc_id"]).reset_index(drop=True)


_INDEX_STORE_CACHE: dict = {}


def t_inverted_lookup(sf_dir: str):
    """Driver query: build (cached) the bucket-partitioned inverted index,
    then look up the probe words through the pruned read path."""
    import tempfile

    if sf_dir not in _INDEX_STORE_CACHE:
        out_dir = tempfile.mkdtemp(prefix="pdfray_invidx_")
        build_inverted_index(sf_dir, out_dir)
        _INDEX_STORE_CACHE[sf_dir] = out_dir
    return query_inverted_index(_INDEX_STORE_CACHE[sf_dir], INDEX_PROBE_WORDS)


def t_doc_frequency(sf_dir: str, top_k: int = 100):
    """Corpus document-frequency / term-frequency table (the IDF building
    block): for the ``top_k`` highest-df words, how many documents contain
    the word and how many times it occurs in total.

    The scale shape is the textbook combiner: each batch collapses its
    texts to per-word partials (tf via bincount over dictionary codes, df
    via unique (doc, word) pairs), so the one shuffle carries vocab-sized
    partial rows — never tokens, never text.  The grouped result is
    bounded by vocabulary, not corpus size; only that small table is
    collected for the deterministic (df desc, word asc) top-k.
    """

    def partials(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        tf = np.bincount(codes, minlength=vocab)
        pair_codes = np.unique(parent * vocab + codes) % vocab if codes.size else codes
        df = np.bincount(pair_codes, minlength=vocab)
        present = tf > 0  # the empty-string slot (and unused dict slack)
        return pa.table(
            {
                "word": dictionary.filter(pa.array(present)),
                "tf": pa.array(tf[present], pa.int64()),
                "df": pa.array(df[present], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    grouped = (
        _read_documents(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
    )
    out = _collect_sorted(
        grouped,
        ("word",),
        schema=pa.schema(
            [("word", pa.string()), ("tf", pa.int64()), ("df", pa.int64())]
        ),
    )
    out = out.sort_values(["df", "word"], ascending=[False, True], kind="mergesort")
    return out.head(top_k).reset_index(drop=True)[["word", "df", "tf"]]


BPE_EOW = "</w>"  # end-of-word marker (Sennrich et al. 2016 convention)


def bpe_train_merges(word_counts: dict, n_merges: int) -> list:
    """Classic BPE merge learning (Sennrich et al. 2016) over a word
    FREQUENCY table: start from characters + an end-of-word marker, merge
    the most frequent adjacent symbol pair each round (ties: higher count,
    then lexicographic (left, right) — fully deterministic).  Pure Python
    over the vocab-bounded table; shared verbatim by the engine and the
    test's independent path."""
    words = {
        w: tuple(w[:-1]) + (w[-1] + BPE_EOW,) for w in word_counts if w
    }
    merges = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for w, syms in words.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        merges.append((left, right, count))
        joined = left + right
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def bpe_apply_to_word(word: str, ranks: dict) -> int:
    """Number of BPE symbols for one word under trained merges: apply the
    lowest-rank merge present until none applies (the standard greedy
    application order).  Pure Python, shared by the engine's vocab-table
    builder and the oracle's independent recomputation."""
    syms = list(word[:-1]) + [word[-1] + BPE_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        left, right = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def _bpe_word_counts(sf_dir: str) -> dict:
    """ONE combiner-reduced word-frequency pass (vocab-sized shuffle rows)."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        _parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        tf = np.bincount(codes, minlength=vocab)
        present = tf > 0
        return pa.table(
            {
                "word": dictionary.filter(pa.array(present)),
                "tf": pa.array(tf[present], pa.int64()),
            }
        )

    wc = _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("tf", alias_name="tf")),
        ("word",),
        schema=pa.schema([("word", pa.string()), ("tf", pa.int64())]),
    )
    return dict(zip(wc["word"], wc["tf"].astype(int)))


def t_bpe_apply(sf_dir: str, n_merges: int = 12):
    """Tokenize the corpus with the TRAINED BPE merges — the 100 TB-scale
    half of the tokenizer story.  Train = the t_bpe_train pass; APPLY is
    where the scale shape matters: merges are applied to the VOCAB once on
    the driver (vocab-bounded work), the resulting word -> subtoken-count
    table broadcasts, and each batch resolves its tokens with one
    dictionary-encode + vectorized lookup + per-doc bincount — no per-word
    Python in the distributed stage.  Emits (doc_id, n_words,
    n_bpe_tokens); the oracle embeds golden per-doc counts computed by an
    INDEPENDENT pure-Python pass over the raw parquet (the
    _image_hash_oracle scheme)."""
    import ray

    counts = _bpe_word_counts(sf_dir)
    merges = bpe_train_merges(counts, n_merges)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    words = np.array(sorted(counts), dtype=object)
    lens = np.array([bpe_apply_to_word(w, ranks) for w in words], dtype=np.int64)
    bref = ray.put((pa.array(words, pa.string()), lens))

    def score_factory():
        wlist, wlens = ray.get(bref)

        def score(t: pa.Table) -> pa.Table:
            parent, codes, dictionary = _word_codes(t)
            n_docs = t.num_rows
            n_words = np.bincount(parent, minlength=n_docs)
            if codes.size:
                pos = pc.fill_null(
                    pc.index_in(dictionary, value_set=wlist), -1
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                dict_lens = np.where(pos >= 0, wlens[np.clip(pos, 0, None)], -1)
                per_tok = dict_lens[codes]
                if (per_tok < 0).any():
                    raise ValueError("word missing from the broadcast BPE vocab")
                n_bpe = np.bincount(parent, weights=per_tok, minlength=n_docs)
            else:
                n_bpe = np.zeros(n_docs)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
                    "n_bpe_tokens": pa.array(n_bpe.astype(np.int64), pa.int64()),
                }
            )

        return score

    out = _read_documents(sf_dir).map_batches(
        warm_factory(("bpe_apply", bref.hex()), score_factory),
        batch_format="pyarrow",
    )
    return _collect_sorted(
        out,
        ("doc_id",),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_words", pa.int64()),
                ("n_bpe_tokens", pa.int64()),
            ]
        ),
    )


def t_bpe_train(sf_dir: str, n_merges: int = 12):
    """Distributed BPE tokenizer TRAINING: the corpus-scale step is ONE
    combiner-reduced word-frequency pass (vocab-sized partials on the
    shuffle — t_doc_frequency's shape); the merge-learning loop then runs
    on the driver over the vocab-bounded frequency table, which is how BPE
    trains at any corpus size (the table, not the corpus, is the loop's
    input).  Deterministic tie-breaks make retries bit-stable.  Returns
    (rank, left, right, count); rows-only driver entry — the iterative
    argmax isn't SQL-expressible — with a bit-equal independent-reference
    test (same evidence class as s_kmeans)."""
    counts = _bpe_word_counts(sf_dir)
    merges = bpe_train_merges(counts, n_merges)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(1, len(merges) + 1), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "count": pd.Series([m[2] for m in merges], dtype="int64"),
        }
    )


def t_repetition(sf_dir: str):
    """Gopher-style repetition-quality counts per document, integer-exact.

    Web crawls are full of template/boilerplate pages whose text is
    dominated by a few repeated words or phrases; the standard filters
    threshold on the most-common-word fraction and the duplicate-n-gram
    fraction.  This stage emits the exact integer numerators so any
    downstream threshold is a cheap arithmetic filter (ratios stay
    rounding-free for the oracle): per doc, total/unique word counts, the
    top word's occurrence count, and the same for adjacent word bigrams
    plus the duplicate-bigram occurrence count (occurrences beyond each
    bigram's first).

    Fully vectorized: one Arrow split per batch, then numpy unique/reduceat
    group math on integer codes — no Python row loop.  Bigram keys are
    encoded in two stages (word-pair code, then doc-scoped code) so the
    int64 key space never overflows regardless of batch vocabulary.  At
    100 TB this is embarrassingly parallel: no shuffle, narrow integer
    output, text never leaves the map stage.
    """

    def project(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        parent, inv, dictionary = _word_codes(t)
        vocab = len(dictionary) + 1

        def group_stats(parent_ids, code_inv, code_space):
            """(n_items, n_unique, top_count) per doc from doc-scoped keys;
            np.unique sorts, so each doc's keys are contiguous for
            reduceat."""
            n_items = np.bincount(parent_ids, minlength=n_docs)
            key = parent_ids.astype(np.int64) * code_space + code_inv
            uniq, counts = np.unique(key, return_counts=True)
            owner = (uniq // code_space).astype(np.int64)
            n_unique = np.bincount(owner, minlength=n_docs)
            top = np.zeros(n_docs, np.int64)
            if counts.size:
                starts = np.flatnonzero(np.r_[True, owner[1:] != owner[:-1]])
                top[owner[starts]] = np.maximum.reduceat(counts, starts)
            return n_items.astype(np.int64), n_unique.astype(np.int64), top

        n_words, n_unique_words, top_word = group_stats(parent, inv, vocab)

        adj = parent[1:] == parent[:-1] if parent.size else np.zeros(0, bool)
        pair = inv[:-1][adj].astype(np.int64) * vocab + inv[1:][adj]
        bparent = parent[1:][adj]
        _, binv = np.unique(pair, return_inverse=True)
        bspace = int(binv.max()) + 1 if binv.size else 1
        n_bigrams, n_unique_bigrams, top_bigram = group_stats(
            bparent, binv, bspace
        )

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_unique_words": pa.array(n_unique_words, pa.int64()),
                "top_word_count": pa.array(top_word, pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "dup_bigram_occurrences": pa.array(
                    n_bigrams - n_unique_bigrams, pa.int64()
                ),
                "top_bigram_count": pa.array(top_bigram, pa.int64()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


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
        warm_stage(LangId), batch_format="pyarrow"
    )
    return _collect_sorted(
        ds,
        ("doc_id",),
        lambda: LangId()(_empty_docs(("doc_id", "text", "lang"))),
    )


def t_langid_eval(sf_dir: str):
    """Classifier evaluation harness over t_langid's predictions vs the
    labeled ``lang`` column — per-class support/predicted/TP and
    precision/recall/F1 as floored integer-scaled rationals (no float
    ever decides a reported metric; zero denominators report 0 by the
    CASE convention both sides implement).

    Scale shape: the corpus reduces per block to (lang, lang_pred)
    confusion partials (Arrow group_by inside the LangId pass's
    consumer), `_two_regime_sum` merges them — the ONLY exchange, and it
    moves at most |langs|² rows per block — and the driver folds the
    bounded confusion table into the metric rows.  This is the
    eval-harness member of the corpus-shaping family: every filter model
    (langid, quality, CCNet buckets) wants exactly this pass before it
    gates a 100 TB run."""
    from .frames import typed_collect
    from .relational import _two_regime_sum  # lazy (import cycle)

    pred = _read_documents(sf_dir, ("doc_id", "text", "lang")).map_batches(
        warm_stage(LangId), batch_format="pyarrow"
    )

    def conf_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "lang": t.column("lang"),
                "lang_pred": t.column("lang_pred"),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by(["lang", "lang_pred"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "lang_pred", "n"])

    red, _n = _two_regime_sum(
        pred.map_batches(conf_partial, batch_format="pyarrow"),
        ["lang", "lang_pred"],
        ["n"],
        empty_types={"lang": pa.string(), "lang_pred": pa.string()},
    )
    conf = typed_collect(
        red,
        pa.schema(
            [("lang", pa.string()), ("lang_pred", pa.string()), ("n", pa.int64())]
        ),
    )
    classes = sorted(set(conf["lang"]) | set(conf["lang_pred"]))
    rows = []
    for c in classes:
        support = int(conf.loc[conf["lang"] == c, "n"].sum())
        predicted = int(conf.loc[conf["lang_pred"] == c, "n"].sum())
        tp = int(
            conf.loc[(conf["lang"] == c) & (conf["lang_pred"] == c), "n"].sum()
        )
        rows.append(
            (
                c,
                support,
                predicted,
                tp,
                (1_000_000 * tp) // predicted if predicted > 0 else 0,
                (1_000_000 * tp) // support if support > 0 else 0,
                (2_000_000 * tp) // (predicted + support)
                if predicted + support > 0
                else 0,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "lang",
            "support",
            "predicted",
            "tp",
            "p_x1e6",
            "r_x1e6",
            "f_x1e6",
        ],
    ).astype(
        {
            c: "int64"
            for c in ("support", "predicted", "tp", "p_x1e6", "r_x1e6", "f_x1e6")
        }
    )


# BPE-style pre-tokenizer: GPT-2's shape restricted to RE2-compatible
# explicit classes so the DuckDB oracle runs the IDENTICAL pattern
BPE_PATTERN = (
    r" ?[A-Za-zÀ-ÖØ-öø-ÿ]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-zÀ-ÖØ-öø-ÿ0-9\s]+"
    r"|\s+"
)


class BpeTokenCounter:
    """Actor-pool stage: BPE-ish pre-tokenization counts (pattern compiled
    once per actor — the realistic shape of a tokenizer-stats pass, where
    __init__ would load the merges/vocab)."""

    def __init__(self):
        self.pattern = re.compile(BPE_PATTERN)

    def __call__(self, t: pa.Table) -> pa.Table:
        findall = self.pattern.findall
        counts = []
        for s in t.column("text").to_pylist():
            counts.append(sum(1 for m in findall(s) if m.strip()))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )


def t_bpe_tokens(sf_dir: str):
    """BPE-ish token counting per document (oracle: same RE2 pattern in
    DuckDB, whitespace-only matches excluded on both sides)."""
    ds = _read_documents(sf_dir).map_batches(
        warm_stage(BpeTokenCounter), batch_format="pyarrow"
    )
    return _collect_sorted(ds, ("doc_id",), lambda: BpeTokenCounter()(_empty_docs()))


# ----------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al., MOSS): k-gram rolling hash +
# per-window minimum sampling — the standard document-fingerprint sketch

_WINNOW_K = 5  # gram size (tokens)
_WINNOW_W = 4  # window size


class WinnowFingerprinter:
    """(doc_id, n_fps, fp_digest) — winnowed fingerprint set per document.

    Rolling k-token-gram hashes (md5-64: first 8 bytes big-endian, the
    engine-wide `_hash64` — chosen over crc32 so a DuckDB oracle can
    recompute the identical values), then the minimum of each sliding
    window of w hashes; the selected set is order-insensitively digested.
    Near-dup documents share most selected fingerprints, so the digest
    equality / overlap is a cheap corpus-level dup signal that is robust to
    small edits (unlike the whole-text md5 of `t_fingerprint`)."""

    def __init__(self, k: int = _WINNOW_K, w: int = _WINNOW_W):
        self.k = k
        self.w = w

    def fingerprints(self, text: str) -> np.ndarray:
        toks = _WORD_RE.findall(text.lower())
        if len(toks) < self.k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [
                " ".join(toks[i : i + self.k])
                for i in range(len(toks) - self.k + 1)
            ]
        if not grams:
            return np.empty(0, dtype=np.uint64)
        h = np.fromiter(
            (_hash64(g) for g in grams),
            dtype=np.uint64,
            count=len(grams),
        )
        if len(h) <= self.w:
            return np.unique(h.min(keepdims=True))
        # sliding-window minima, vectorized: stride trick over the hash array
        win = np.lib.stride_tricks.sliding_window_view(h, self.w)
        return np.unique(win.min(axis=1))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, counts, digests = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            fps = self.fingerprints(text)
            ids.append(doc_id)
            counts.append(len(fps))
            digests.append(hashlib.md5(fps.tobytes()).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_fps": pa.array(counts, pa.int64()),
                "fp_digest": pa.array(digests, pa.string()),
            }
        )


def t_winnow_fp(sf_dir: str):
    """Winnowing fingerprint counts per document.  Exact-oracle-checkable:
    the md5-64 gram hashes and the k-gram/window-min arithmetic are
    recomputed verbatim in DuckDB (list comprehensions over
    string_split_regex).  The fp_digest column stays a unit-test concern
    (the oracle cannot md5 a raw uint64 buffer) — the stage still emits it;
    this query projects the oracle-comparable pair."""
    ds = _read_documents(sf_dir).map_batches(
        warm_stage(WinnowFingerprinter), batch_format="pyarrow"
    )
    return _collect_sorted(
        ds.select_columns(["doc_id", "n_fps"]),
        ("doc_id",),
        schema=pa.schema([("doc_id", pa.int64()), ("n_fps", pa.int64())]),
    )


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


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor.

    Emits one (id, band, 16-byte band key) row per band per document — the
    only thing the LSH shuffle ever carries.  Documents with no shingles
    (empty/whitespace text) emit no rows: they cannot be NEAR-dups of
    anything (their true Jaccard is 0), and at corpus scale they would
    otherwise all share one signature and create a quadratic pair bomb in
    a single bucket."""

    def __init__(self, num_hashes: int = _NUM_HASHES, seed: int = 13, id_col: str = "doc_id"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_hashes, dtype=np.int64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_hashes, dtype=np.int64)
        self.p = np.int64((1 << 61) - 1)  # Mersenne prime
        self.id_col = id_col

    def signature(self, text: str):
        sh = _shingles(text)
        if not sh:
            return None
        hv = np.array(
            [zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.int64
        ).reshape(-1, 1)
        # (n_shingles, n_hashes) permutations, min over shingles — vectorized
        m = (hv * self.a.reshape(1, -1) + self.b.reshape(1, -1)) % self.p
        return m.min(axis=0)

    def band_keys(self, sig) -> list:
        """The _NUM_BANDS 16-hex band keys of a signature — THE banding
        rule, shared by the self-join (`__call__`) and broadcast
        (`t_fuzzy_decontaminate`) LSH forms so they can never drift."""
        rows_per_band = len(self.a) // _NUM_BANDS
        return [
            hashlib.md5(
                sig[b * rows_per_band : (b + 1) * rows_per_band].tobytes()
            ).hexdigest()[:16]
            for b in range(_NUM_BANDS)
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        id_type = t.schema.field(self.id_col).type
        for doc_id, text in zip(
            t.column(self.id_col).to_pylist(), t.column("text").to_pylist()
        ):
            sig = self.signature(text)
            if sig is None:
                continue
            for band, key in enumerate(self.band_keys(sig)):
                ids.append(doc_id)
                bands.append(band)
                keys.append(key)
        return pa.table(
            {
                self.id_col: pa.array(ids, id_type),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys, pa.string()),
            }
        )


class ShingleSetHasher:
    """(id, sh) — 64-bit hashes of the document's token-shingle set, used for
    exact Jaccard verification without shuffling text (md5-64 collisions are
    negligible, so hashed-set Jaccard == string-set Jaccard).  The set is
    packed into one binary blob (uint64 little-endian) because Acero hash
    joins don't carry list-typed payload columns."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def features(self, text: str):
        return _shingles(text)

    def _hash_features(self, feats) -> bytes:
        # sorted-unique: verification intersects with one C merge pass
        return np.unique(
            np.fromiter((_hash64(f) for f in feats), dtype=np.uint64, count=len(feats))
        ).tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, sets = [], []
        for doc_id, text in zip(
            t.column(self.id_col).to_pylist(), t.column("text").to_pylist()
        ):
            ids.append(doc_id)
            sets.append(self._hash_features(self.features(text)))
        id_type = t.schema.field(self.id_col).type
        return pa.table(
            {
                self.id_col: pa.array(ids, id_type),
                "sh": pa.array(sets, pa.binary()),
            }
        )


def _candidate_pairs(
    buckets,
    id_col: str,
    hamming_col: str = None,
    max_hamming: int = 0,
    feat_col: str = None,
    min_pair_feat: int = 0,
    max_feat_ratio: float = 0.0,
):
    """Within-bucket candidate pairs as a vectorized self-join.

    Self-join on (band, band_key) + an a<b filter emits every within-bucket
    pair in C (Acero hash join); a counted aggregate dedups pairs that
    collide in several bands.  A groupby().map_groups formulation costs
    ~1 ms of Python per group, and band keys are mostly singletons, so the
    join form is ~5x faster at any scale.  Both exchanges carry only
    (id, band, 16-byte key) rows; band rows are ~0.3% of corpus bytes, so
    materializing them (production: a parquet checkpoint partitioned by
    band) is the intended layout."""
    from ray.data.aggregate import Count

    buckets = buckets.materialize()
    n = buckets.count()
    if n == 0:
        # joining empty datasets trips the schema-less-block quirk; a typed
        # empty PAIRS dataset is the correct result
        import ray.data as rd

        schema = buckets.schema()
        if schema is None:  # empty CORPUS: even the plan schema is gone
            id_type = pa.int64()
        else:
            id_type = dict(zip(schema.names, schema.types))[id_col]
        return rd.from_arrow(
            pa.table({"doc_a": pa.array([], id_type), "doc_b": pa.array([], id_type)})
        )
    # compact: guarantees nonempty blocks (Ray join schema quirk) and sizes
    # partitions for the join data-proportionally with a cluster-derived
    # slot floor (round 5: the node-tuned min(32, ...) cap is gone)
    from .sizing import shuffle_partitions

    n_parts = shuffle_partitions(n)
    buckets = buckets.repartition(n_parts).materialize()

    def _rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return fn

    lcols = ["doc_a", "band", "band_key"] + (["ham_a"] if hamming_col else [])
    rcols = ["doc_b", "band", "band_key"] + (["ham_b"] if hamming_col else [])
    if feat_col:
        lcols.append("feat_a")
        rcols.append("feat_b")
    left = buckets.map_batches(_rename(lcols), batch_format="pyarrow")
    right = buckets.map_batches(_rename(rcols), batch_format="pyarrow")
    joined = left.join(
        right, join_type="inner", num_partitions=n_parts, on=("band", "band_key")
    )

    def ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("doc_a"), t.column("doc_b")))
        if feat_col and len(t):
            fa = t.column("feat_a").to_numpy()
            fb = t.column("feat_b").to_numpy()
            mask = np.ones(len(t), bool)
            if min_pair_feat:
                # regime-ownership rule: pairs whose BOTH docs sit under the
                # short-regime bound are delegated to the minhash bands
                mask &= np.maximum(fa, fb) >= min_pair_feat
            if max_feat_ratio:
                # exact size bound: j >= t forces max(|A|,|B|)/min <= 1/t,
                # so cross-size template collisions die before the dedup
                mask &= np.maximum(fa, fb) <= max_feat_ratio * np.minimum(fa, fb)
            t = t.filter(pa.array(mask))
        if hamming_col and len(t):
            a = t.column("ham_a").to_numpy().astype(np.uint64)
            b = t.column("ham_b").to_numpy().astype(np.uint64)
            x = np.bitwise_xor(a, b)
            # whole-hash Hamming prefilter: a random band collision has
            # d ~ Binom(64, 1/2) ≈ 32 while true near-dups sit well under
            # max_hamming — this kills the accidental-collision bulk before
            # the expensive feature-set verify
            d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            # first-match-band ownership: a near-dup pair collides in several
            # bands and would otherwise be emitted once per band; keeping it
            # only where band == first matching band makes each pair unique
            # BY CONSTRUCTION, so no dedup shuffle is needed at all
            band = t.column("band").to_numpy()
            first = np.full(len(d), _SIMHASH_BANDS, dtype=np.int64)
            for k in range(_SIMHASH_BANDS - 1, -1, -1):
                chunk_eq = ((x >> np.uint64(16 * k)) & np.uint64(0xFFFF)) == 0
                first = np.where(chunk_eq, k, first)
            t = t.filter(pa.array((d <= max_hamming) & (band == first)))
        return t.select(["doc_a", "doc_b"])

    candidates = joined.map_batches(ordered, batch_format="pyarrow")
    if hamming_col:
        return candidates  # unique by first-match-band ownership

    def drop_count(t: pa.Table) -> pa.Table:
        return t.select(["doc_a", "doc_b"])

    return (
        candidates.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(drop_count, batch_format="pyarrow")
    )


def write_band_checkpoint(buckets, out_dir: str) -> str:
    """Persist LSH band rows hive-partitioned by band — the production
    checkpoint layout `_candidate_pairs` documents: each band directory is
    independently readable/resumable, and the downstream bucket self-join
    can run band-at-a-time against one partition without touching the rest
    (band is the leading join key)."""
    buckets.write_parquet(out_dir, partition_cols=["band"])
    return out_dir


def read_band_checkpoint(out_dir: str, bands=None):
    """Read band rows back; ``bands`` selects specific band partitions
    (None = all).  Re-attaches the band column that hive partitioning moved
    into the directory name."""
    import os

    import ray.data as rd

    all_bands = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("band=")
    )
    chosen = all_bands if bands is None else [b for b in all_bands if b in set(bands)]
    if not chosen:
        raise ValueError(
            f"no band partitions to read from {out_dir!r}: on disk "
            f"{all_bands or 'none'}, requested "
            f"{sorted(bands) if bands is not None else 'all'}"
        )
    parts = []
    for b in chosen:
        d = os.path.join(out_dir, f"band={b}")
        files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        ds = rd.read_parquet(files)

        def attach(t: pa.Table, band=b) -> pa.Table:
            # the reader hive-infers `band` from the dir name as a STRING;
            # restore the original int32 (or attach it if inference is off)
            if "band" in t.column_names:
                idx = t.schema.get_field_index("band")
                return t.set_column(idx, "band", pc.cast(t.column("band"), pa.int32()))
            return t.append_column(
                "band", pa.array(np.full(len(t), band, np.int32), pa.int32())
            )

        parts.append(ds.map_batches(attach, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


class _KeepAndHash:
    """Semi-join filter + feature-set hash, warm per worker process: keeps
    only candidate-id rows (broadcast id set) and runs the feature stage."""

    def __init__(self, factory, id_col, ids_ref):
        import ray

        self.inner = factory()
        self.id_col = id_col
        self.wanted = ray.get(ids_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(self.id_col), value_set=self.wanted))
        return self.inner(t)


def _verify_pairs(
    docs_ds,
    pairs_ds,
    set_stage_factory,
    threshold: float,
    id_col: str,
    value_name: str = "jaccard",
    as_dataset: bool = False,
):
    """Distributed exact-Jaccard verification of candidate pairs.

    ``pairs_ds`` is a DATASET end-to-end — at a template-dense 100x corpus
    the candidate list is tens of millions of rows and never fits (or
    belongs) on the driver.  Candidate ids are reduced with a distributed
    distinct; only that id set (the small LSH output) is broadcast for the
    semi-join filter, and the feature sets are computed ONLY for candidate
    ids over one more pruned scan, joined to the pair list, and verified
    inside map_batches.  The driver holds the distinct candidate ids and
    the final verified pairs — never texts, feature sets, or raw pairs."""
    import ray

    from .relational import round_half_away  # lazy (import cycle)

    pairs_ds = pairs_ds.materialize()
    schema = pairs_ds.schema()
    if schema is None:  # zero blocks: no candidates were ever generated
        if as_dataset:
            return None
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                value_name: pd.Series(dtype="float64"),
            }
        )
    id_type = dict(zip(schema.names, schema.types))["doc_a"]
    id_dtype = id_type.to_pandas_dtype()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        if as_dataset:
            return None  # caller handles the no-candidates case
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=id_dtype),
                "doc_b": pd.Series(dtype=id_dtype),
                value_name: pd.Series(dtype="float64"),
            }
        )

    def _both_ids(t: pa.Table) -> pa.Table:
        a = t.select(["doc_a"]).rename_columns(["cand_id"])
        b = t.select(["doc_b"]).rename_columns(["cand_id"])
        return pa.concat_tables([a, b])

    # distributed distinct: the shuffle carries bare ids; the driver sees
    # only the reduced set it must broadcast anyway
    cand_ids = pairs_ds.map_batches(_both_ids, batch_format="pyarrow").unique("cand_id")
    ids_ref = ray.put(pa.array(cand_ids, id_type))
    keep_and_hash = warm_stage(
        _KeepAndHash, factory=set_stage_factory, id_col=id_col, ids_ref=ids_ref
    )

    # candidate sets are small by construction: safe to pin in the object store.
    # The repartition also works around a Ray 2.49 hash-shuffle-join quirk:
    # a join side whose first block is EMPTY loses its schema and the Acero
    # probe fails with "No match ... FieldRef" — compacting to a few
    # guaranteed-nonempty blocks sidesteps it (filter stages emit empty
    # blocks for batches with no candidates).
    n_parts = max(1, min(8, len(cand_ids) // 10_000 + 1))
    sets_ds = (
        docs_ds.map_batches(keep_and_hash, batch_format="pyarrow")
        .repartition(n_parts)
        .materialize()
    )

    def _rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return fn

    side_a = sets_ds.map_batches(_rename(["doc_a", "sh_a"]), batch_format="pyarrow")
    side_b = sets_ds.map_batches(_rename(["doc_b", "sh_b"]), batch_format="pyarrow")
    # compact the pair list too: the candidate generator's filter stages can
    # leave an empty leading block (same join quirk)
    pairs_ds = pairs_ds.repartition(n_parts).materialize()
    joined = pairs_ds.join(
        side_a, join_type="inner", num_partitions=n_parts, on=("doc_a",)
    )
    # compact between the chained joins: the first join's no-match partitions
    # emit schema-less empty blocks that trip the second join (same Ray quirk)
    joined = joined.repartition(n_parts)
    joined = joined.join(side_b, join_type="inner", num_partitions=n_parts, on=("doc_b",))

    def verify(t: pa.Table) -> pa.Table:
        keep_a, keep_b, vals = [], [], []
        for a, b, sa, sb in zip(
            t.column("doc_a").to_pylist(),
            t.column("doc_b").to_pylist(),
            t.column("sh_a").to_pylist(),
            t.column("sh_b").to_pylist(),
        ):
            A = np.frombuffer(sa, dtype=np.uint64)
            B = np.frombuffer(sb, dtype=np.uint64)
            inter = np.intersect1d(A, B, assume_unique=True).size
            union = A.size + B.size - inter
            j = (inter / union) if union else 0.0
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                # half-away like DuckDB ROUND (a Python round() here is
                # banker's and diverges on exact 5th-decimal ties)
                vals.append(float(round_half_away(j, 4)))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, t.schema.field("doc_a").type),
                "doc_b": pa.array(keep_b, t.schema.field("doc_b").type),
                value_name: pa.array(vals, pa.float64()),
            }
        )

    verified_ds = joined.map_batches(verify, batch_format="pyarrow")
    if as_dataset:
        return verified_ds  # (doc_a, doc_b, value) — stays distributed
    out = verified_ds.to_pandas()
    if len(out) == 0:  # all candidates refuted: emit a typed empty frame
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=id_dtype),
                "doc_b": pd.Series(dtype=id_dtype),
                value_name: pd.Series(dtype="float64"),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def t_minhash_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    shingle -> minhash -> band buckets (explode) -> groupby(band, band_key)
    -> candidate pairs -> distributed pair dedup -> hash-join against
    candidate shingle-hash sets -> verify inside map_batches.  Shuffles
    carry (doc_id, band, 16-byte key) and candidate rows only; texts never
    leave their extraction tasks and verification never runs on the driver.
    """
    ds = _read_documents(sf_dir)
    buckets = ds.map_batches(warm_stage(MinHasher), batch_format="pyarrow")
    pairs = _candidate_pairs(buckets, "doc_id")
    return _verify_pairs(ds, pairs, ShingleSetHasher, jaccard_threshold, "doc_id")


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
        warm_stage(SimHasher), batch_format="pyarrow"
    )
    return _collect_sorted(ds, ("doc_id",), lambda: SimHasher()(_empty_docs()))


_SIMHASH_BANDS = 4  # 4 x 16-bit chunks of the 64-bit simhash


def char_ngrams(s: str, n: int = 4):
    s = " ".join(s.split()).lower()
    return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}


class GramSetHasher(ShingleSetHasher):
    """(id, sh) — 64-bit hashes of the doc's char-4-gram set, with an
    actor-level gram cache (grams repeat heavily across documents)."""

    def __init__(self, id_col: str = "doc_id"):
        super().__init__(id_col)
        self.cache: dict = {}

    def features(self, text: str):
        return char_ngrams(text)

    def hashed(self, feats) -> np.ndarray:
        """Sorted-unique uint64 hashes of a feature set (cached)."""
        cache = self.cache
        if len(cache) > 2_000_000:
            cache.clear()
        hs = np.empty(len(feats), dtype=np.uint64)
        for i, g in enumerate(feats):
            v = cache.get(g)
            if v is None:
                v = _hash64(g)
                cache[g] = v
            hs[i] = v
        return np.unique(hs)

    def _hash_features(self, feats) -> bytes:
        return self.hashed(feats).tobytes()


# Two-regime thresholds for the gram near-dup machinery, in GRAM-SET SIZE
# (the same measure Jaccard uses, so the size-ratio bound applies): j >= 0.5
# forces max(|A|,|B|) <= 2*min, so a pair can never straddle "one doc below
# LONG_MIN, the other at/above SHORT_MAX" — the overlap zone [LONG_MIN,
# SHORT_MAX) participates in BOTH regimes and every true pair lands wholly
# in at least one.
_GRAM_LONG_MIN = 256
_GRAM_SHORT_MAX = 512
_SHORT_BLOCK_ROWS = 512  # short-class docs per scoring block
# all-pairs over the short class is O(S^2) by design; above this many short
# docs the caller must shard the class (e.g. by size band — only pairs with
# size ratio <= 1/t matter, so bands of width x2 only pair with neighbors)
# or accept the cost explicitly
SHORT_CLASS_MAX_ROWS = 100_000


def _require_short_class_feasible(n_rows: int, force: bool):
    if force or n_rows <= SHORT_CLASS_MAX_ROWS:
        return
    raise ValueError(
        f"short-class all-pairs is O(S^2): {n_rows} short docs exceed "
        f"SHORT_CLASS_MAX_ROWS={SHORT_CLASS_MAX_ROWS}. Shard the class by "
        f"gram-count bands (x2-wide bands only pair with adjacent bands at "
        f"threshold 0.5) or pass force_short_allpairs=True."
    )


class GramNearDupBander:
    """Simhash band rows for the LONG regime of the gram near-dup pipeline.

    Simhash banding assumes the per-bit accumulation CONCENTRATES — true
    only when a document has enough features.  A 60-gram document pair at
    Jaccard 0.93 was measured at token-simhash Hamming 10 with no clean
    16-bit band (a genuine recall miss found by the all-pairs oracle), so
    only docs with >= _GRAM_LONG_MIN grams emit band rows here; the short
    class is handled exactly by `_short_allpairs` (and long-regime pairs
    whose docs BOTH sit under _GRAM_SHORT_MAX are delegated there via the
    ``min_pair_feat`` ownership filter, keeping the two pair sets disjoint).
    """

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col
        self.simhasher = SimHasher()
        self.gram_hasher = GramSetHasher(id_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        hv = self.simhasher.simhash_many(texts)
        id_type = t.schema.field(self.id_col).type
        ids, bands, keys, hashes, feats = [], [], [], [], []
        for doc_id, text, v in zip(t.column(self.id_col).to_pylist(), texts, hv):
            if not _WORD_RE.search(text):
                continue  # token-less: Jaccard 0 to everything; skipping
                # avoids a degenerate shared bucket at corpus scale
            n_feat = len(self.gram_hasher.hashed(char_ngrams(text)))
            if n_feat < _GRAM_LONG_MIN:
                continue
            v = int(v)
            sh64 = v - (1 << 64) if v >= 1 << 63 else v  # int64 bitcast
            for band in range(_SIMHASH_BANDS):
                ids.append(doc_id)
                bands.append(band)
                keys.append(format((v >> (band * 16)) & 0xFFFF, "04x"))
                hashes.append(sh64)
                feats.append(n_feat)
        return pa.table(
            {
                self.id_col: pa.array(ids, id_type),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys, pa.string()),
                "sh64": pa.array(hashes, pa.int64()),
                "n_feat": pa.array(feats, pa.int32()),
            }
        )


class ShortGramSets:
    """(id, sh) gram-hash blobs for SHORT-class docs (0 < n_feat < bound)."""

    def __init__(self, id_col: str = "doc_id", bound: int = _GRAM_SHORT_MAX):
        self.inner = GramSetHasher(id_col)
        self.id_col = id_col
        self.bound = bound

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for doc_id, text in zip(
            t.column(self.id_col).to_pylist(), t.column("text").to_pylist()
        ):
            if not _WORD_RE.search(text):
                continue
            gh = self.inner.hashed(char_ngrams(text))
            if len(gh) >= self.bound:
                continue
            ids.append(doc_id)
            blobs.append(gh.tobytes())
        id_type = t.schema.field(self.id_col).type
        return pa.table(
            {self.id_col: pa.array(ids, id_type), "sh": pa.array(blobs, pa.binary())}
        )


class _ScoreShortBlockPair:
    """Block-pair scorer for the short class, warm per worker process:
    deserializes each block's gram sets once (bounded cache) and verifies
    its pair grid with C-speed frozenset intersections."""

    def __init__(self, refs_ref, threshold, value_name):
        import ray

        self.blocks = ray.get(refs_ref)
        self.threshold = threshold
        self.value_name = value_name
        self.cache: dict = {}

    def _sets(self, bi):
        import ray

        got = self.cache.get(bi)
        if got is None:
            if len(self.cache) > 8:
                self.cache.clear()
            tbl = ray.get(self.blocks[bi])
            ids = tbl.column(0).to_pylist()
            sets = [
                frozenset(np.frombuffer(b, np.uint64).tolist())
                for b in tbl.column("sh").to_pylist()
            ]
            got = (ids, sets)
            self.cache[bi] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        threshold = self.threshold
        ratio = 1.0 / threshold
        for bi, bj in zip(t.column("bi").to_pylist(), t.column("bj").to_pylist()):
            ids_i, sets_i = self._sets(bi)
            ids_j, sets_j = self._sets(bj) if bj != bi else (ids_i, sets_i)
            for x in range(len(ids_i)):
                sa = sets_i[x]
                la = len(sa)
                y0 = x + 1 if bi == bj else 0
                for y in range(y0, len(ids_j)):
                    sb = sets_j[y]
                    lb = len(sb)
                    if la > lb * ratio or lb > la * ratio:
                        continue  # exact size bound for j >= threshold
                    inter = len(sa & sb)
                    union = la + lb - inter
                    if union and inter / union >= threshold:
                        a, b = ids_i[x], ids_j[y]
                        if a == b:
                            continue
                        lo, hi = (a, b) if a < b else (b, a)
                        out_a.append(lo)
                        out_b.append(hi)
                        out_j.append(round(inter / union, 4))
        return pa.table(
            {
                "doc_a": pa.array(out_a),
                "doc_b": pa.array(out_b),
                self.value_name: pa.array(out_j, pa.float64()),
            }
        )


def _short_allpairs(
    docs_ds,
    threshold: float,
    id_col: str,
    value_name: str = "jaccard",
    force: bool = False,
    bound: int = _GRAM_SHORT_MAX,
) -> pd.DataFrame:
    """EXACT all-pairs Jaccard over the SHORT class, block-pair scored.

    Sketching degrades exactly where documents are short: simhash stops
    concentrating (measured misses at j 0.93/0.97) and minhash banding on a
    template-dense corpus puts most of the class in one bucket (measured:
    r=1 -> 79% of docs in one bucket; r=2 still quadratic).  So the short
    class gets deterministic all-pairs treatment with the s_embedding_dupes
    block-pair pattern: gram-set blobs live as object-store blocks, one
    task per (block_i, block_j) holds just two blocks and verifies its
    pairs with C-speed frozenset intersections, pre-filtered by the EXACT
    size bound (j >= t forces max/min <= 1/t).  Quadratic compute is
    confined to this bounded class — at web scale shorts are a minority
    tail (this synthetic corpus is unusually short), and the class is
    further shardable by size bands since only ratio<=1/t pairs matter."""
    import ray
    import ray.data as rd

    blocks = (
        docs_ds.map_batches(
            warm_stage(ShortGramSets, id_col=id_col, bound=bound),
            batch_format="pyarrow",
        )
        .repartition(target_num_rows_per_block=_SHORT_BLOCK_ROWS)
        .materialize()
    )
    n_short = blocks.count()
    _require_short_class_feasible(n_short, force)
    if n_short == 0:
        # an empty corpus still materializes one EMPTY block whose table
        # has zero columns — the block-pair scorer would IndexError on it
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=object),
                "doc_b": pd.Series(dtype=object),
                value_name: pd.Series(dtype="float64"),
            }
        )
    blocks = blocks.to_arrow_refs()
    idx_pairs = [
        {"bi": i, "bj": j} for i in range(len(blocks)) for j in range(i, len(blocks))
    ]
    refs_ref = ray.put(blocks)

    if not blocks:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=object),
                "doc_b": pd.Series(dtype=object),
                value_name: pd.Series(dtype="float64"),
            }
        )
    out = (
        rd.from_items(idx_pairs)
        .map_batches(
            warm_stage(
                _ScoreShortBlockPair,
                refs_ref=refs_ref,
                threshold=threshold,
                value_name=value_name,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        .to_pandas()
    )
    return out


def t_ngram_jaccard_dupes(
    sf_dir: str, threshold: float = 0.5, force_short_allpairs: bool = False
):
    """Character-n-gram Jaccard near-dup pairs, length-aware two-regime.

    LONG docs (>= _GRAM_LONG_MIN grams, where simhash concentrates):
    4 x 16-bit simhash bands -> Acero self-join candidates -> Hamming
    prefilter -> distributed exact-Jaccard verify, with pairs wholly under
    _GRAM_SHORT_MAX delegated away (ownership filter).  SHORT docs
    (< _GRAM_SHORT_MAX grams): deterministic all-pairs block scoring
    (`_short_allpairs`) — sketching is provably unreliable there and the
    class is bounded.  The two pair sets are disjoint by the size-ratio
    bound; their union is exact-oracle-checked at sf0.01 against a DuckDB
    ALL-PAIRS recomputation (which previously EXPOSED two short-doc pairs
    at Jaccard 0.93/0.97 that pure simhash banding missed)."""
    # Long-regime cost note: the synthetic `documents` table is built from
    # a small snippet vocabulary, so its simhash space is ~100x denser than
    # real web text; the Hamming prefilter (long-regime verified max 10,
    # margin to 12) bounds the candidate set to the near-pair population.
    # A PPJoin/AllPairs prefix-filter generator was prototyped and MEASURED
    # WORSE here (>10 min at sf0.1: at t=0.5 the prefix is half of each
    # doc's grams and template-frequency grams give the per-gram self-join
    # a quadratic bulge); minhash banding for the short class measured the
    # same pathology (r=1: 79% of docs in ONE bucket; r=2 still quadratic),
    # which is why the short class is all-pairs instead.
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # Regime-ownership bound derived from the threshold: the only pairs
    # neither regime owns would have min < _GRAM_LONG_MIN grams and
    # max >= short_max, i.e. size ratio > short_max/_GRAM_LONG_MIN — and
    # j >= t forces ratio <= 1/t, so short_max >= _GRAM_LONG_MIN/t closes
    # the gap for ANY threshold (the 512 default encodes t >= 0.5).
    short_max = max(_GRAM_SHORT_MAX, int(math.ceil(_GRAM_LONG_MIN / threshold)))
    ds = _read_documents(sf_dir)
    long_rows = ds.map_batches(
        warm_stage(GramNearDupBander), batch_format="pyarrow"
    )
    long_pairs = _candidate_pairs(
        long_rows,
        "doc_id",
        hamming_col="sh64",
        max_hamming=12,
        feat_col="n_feat",
        min_pair_feat=short_max,
    )
    long_df = _verify_pairs(ds, long_pairs, GramSetHasher, threshold, "doc_id")
    short_df = _short_allpairs(
        ds, threshold, "doc_id", force=force_short_allpairs, bound=short_max
    )
    out = pd.concat([long_df, short_df], ignore_index=True)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# corpus-shaping operators: stratified sampling, sequence packing, exact
# distributed quantiles — the post-dedup steps a pretraining-data pipeline
# runs before tokenizer/sharding (engine-added brief, no reference analog).

# per-language keep thresholds as 4-hex-digit md5-prefix bounds; hex-string
# comparison == numeric comparison for fixed-width lowercase hex, so DuckDB
# reproduces the decision with substr(md5(..),1,4) < thresh exactly.
# '8000'/65536 = 50%, '4000' = 25%, '1999' ~= 10%, 'c000' = 75%.
SAMPLE_THRESHOLDS = {"en": "8000", "de": "4000", "fr": "1999", "es": "c000"}


def t_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: keep a per-language fraction of
    documents, decided by an md5 prefix of the doc id — no RNG state, so
    the sample is stable under re-runs, resumes, and repartitioning (the
    property that matters at 100 TB: a retry must not change the sample).
    md5-per-row is a short-string hash (~0.5us) chosen because the oracle
    can recompute it; a production variant would swap in a vectorized
    splitmix64 with the same threshold layout."""

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        langs = t.column("lang").to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest()[:4]
            < SAMPLE_THRESHOLDS.get(lang, "0000")
            for i, lang in zip(ids, langs)
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    ds = _read_documents(sf_dir, ("doc_id", "lang", "source")).map_batches(
        sample, batch_format="pyarrow"
    )
    return _collect_sorted(
        ds, ("doc_id",), schema=_empty_docs(("doc_id", "lang", "source")).schema
    )


PACK_CAPACITY = 2048  # tokens per packed training sequence
PACK_BUCKET = 256  # docs per packing stream; one shuffle group each


def t_pack_sequences(sf_dir: str):
    """Sequence packing (concatenate-then-chop, the GPT-style pretraining
    layout): documents are concatenated in doc_id order within fixed
    buckets and chopped into PACK_CAPACITY-token sequences; each doc
    reports its (pack_id, pack_off) placement.  Token counts come from the
    same \\S+ rule as t_token_stats.

    Distribution: the count projection is a vectorized Arrow stage that
    drops text BEFORE the shuffle; the groupby moves only (bucket, doc_id,
    n_tokens) and each group does one numpy cumsum.  Buckets are contiguous
    doc_id ranges so packed streams are reproducible independent of block
    layout."""

    def project(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.count_substring_regex(t.column("text"), r"\S+"), pa.int64()
        )
        bucket = pc.divide(t.column("doc_id"), pa.scalar(PACK_BUCKET))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": pc.cast(bucket, pa.int64()),
                "n_tokens": n_tokens,
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        off = g["n_tokens"].to_numpy(np.int64).cumsum() - g["n_tokens"].to_numpy(
            np.int64
        )
        g["pack_id"] = off // PACK_CAPACITY
        g["pack_off"] = off % PACK_CAPACITY
        return g

    out = (
        _read_documents(sf_dir)
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )
    return _collect_sorted(
        out,
        ("doc_id",),
        lambda: pack(project(_empty_docs()).to_pandas()),
    )


QUANTILE_PS = (0.25, 0.5, 0.75, 0.9)


def t_length_quantiles(sf_dir: str):
    """EXACT distributed quantiles of document length per language via the
    bounded-domain histogram trick: each block pre-aggregates (lang,
    n_chars) -> count, the groupby sums the tiny histogram, and the driver
    walks cumulative counts — no distributed sort, no sampling error.  The
    shuffle carries one row per distinct (lang, length), independent of
    corpus size; for unbounded domains you'd first quantize to buckets
    (t-digest-style) and lose exactness.  Matches DuckDB quantile_disc
    (index = ceil(p*n) - 1, verified empirically)."""

    def histogram(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["lang", "n_chars"])
            .aggregate([("n_chars", "count")])
            .rename_columns(["lang", "n_chars", "cnt"])
        )

    from ray.data.aggregate import Sum

    hist = _collect_sorted(
        _read_documents(sf_dir, ("lang", "n_chars"))
        .map_batches(histogram, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt")),
        ("lang",),
        schema=pa.schema(
            [("lang", pa.string()), ("n_chars", pa.int64()), ("cnt", pa.int64())]
        ),
    )  # bounded: |langs| x |distinct lengths| rows
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        row = {"lang": lang, "n_docs": n}
        for p in QUANTILE_PS:
            rank = int(np.ceil(p * n))
            row[f"p{int(p * 100)}"] = int(vals[np.searchsorted(cum, rank)])
        rows.append(row)
    cols = ["lang", "n_docs"] + [f"p{int(p * 100)}" for p in QUANTILE_PS]
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("lang")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# benchmark decontamination: flag documents sharing any 8-token n-gram with
# a benchmark set — the standard pre-training hygiene step (engine-added
# brief; no reference analog).

DECONTAM_N = 8  # gram width used by common decontamination setups
DECONTAM_BENCH_MOD = 97  # doc_id % MOD == 0 defines the benchmark subset


def _gram_hashes(text: str) -> np.ndarray:
    """Distinct 64-bit hashes of the doc's word 8-grams (md5-64 per gram:
    deterministic across machines; 64-bit collisions are ~1e-10 even at
    1e4 distinct grams per shard, and the oracle joins on gram STRINGS so
    a collision would surface as a hash mismatch, not pass silently)."""
    words = text.split()
    if len(words) < DECONTAM_N:
        return np.empty(0, np.uint64)
    grams = {
        " ".join(words[i : i + DECONTAM_N])
        for i in range(len(words) - DECONTAM_N + 1)
    }
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
            for g in grams
        ),
        np.uint64,
        len(grams),
    )


def collect_bench_gram_hashes(sf_dir: str) -> np.ndarray:
    """Distinct 8-gram hashes of the benchmark subset, reduced in the
    workers (benchmark selection + hashing happen per batch; only per-block
    distinct hashes reach the driver).  Shared by t_decontaminate and
    pipeline_training_mix."""

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0)).column("text")
        hs = [_gram_hashes(s) for s in texts.to_pylist()]
        merged = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        return pa.table({"h": pa.array(merged, pa.uint64())})

    df = (
        _read_documents(sf_dir)
        .map_batches(bench_grams, batch_format="pyarrow")
        .to_pandas()
    )
    if "h" not in df.columns:  # every block empty: Ray drops the schema
        return np.empty(0, np.uint64)
    return np.unique(df["h"].to_numpy()).astype(np.uint64)


def t_decontaminate(sf_dir: str):
    """Benchmark decontamination via broadcast small side: the benchmark
    docs' distinct 8-gram hashes are collected ONCE (the benchmark is tiny
    by construction — eval sets are), sorted, `ray.put` into the object
    store, and every worker membership-tests its batches with vectorized
    np.isin against the shared array.  No shuffle at all: the corpus
    streams through one map stage; only the small side moves.  At 100 TB
    this is exactly how you'd run it — the alternative (gram-join through a
    groupby) shuffles every gram of every document."""
    import ray

    ref = ray.put(collect_bench_gram_hashes(sf_dir))

    def flag_factory():
        table = ray.get(ref)  # once per worker process, zero-copy numpy

        def flag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            texts = t.column("text").to_pylist()
            n_hits = [
                int(np.isin(_gram_hashes(s), table, assume_unique=True).sum())
                for s in texts
            ]
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "is_benchmark": pa.array(
                        [i % DECONTAM_BENCH_MOD == 0 for i in ids], pa.bool_()
                    ),
                    "n_contaminated_grams": pa.array(n_hits, pa.int64()),
                    "contaminated": pa.array([n > 0 for n in n_hits], pa.bool_()),
                }
            )

        return flag

    out = _read_documents(sf_dir).map_batches(
        warm_factory(("decontam", ref.hex()), flag_factory),
        batch_format="pyarrow",
    )
    return _collect_sorted(out, ("doc_id",), lambda: flag_factory()(_empty_docs()))


# ----------------------------------------------------------------------
# per-domain document cap (RefinedWeb-style source balancing): keep at most
# DOMAIN_CAP docs per source, preferring longer documents.  Engine-added
# brief; no reference analog.

DOMAIN_CAP = 20


def domain_cap_prune(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Per-batch per-source top-``cap`` prune (runs BEFORE the shuffle)."""
    df = df.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    return df.groupby("source", sort=False).head(cap)


def domain_cap_rank(g: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Final per-source merge: ranked top-``cap`` by (n_chars DESC, doc_id)."""
    g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(cap)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def t_domain_cap(sf_dir: str, cap: int = DOMAIN_CAP):
    """Per-domain document cap: top-``cap`` docs per source by
    (n_chars DESC, doc_id ASC), with the per-source rank.

    Scale shape: BOUNDED top-N per key.  The map stage first prunes each
    batch to its own per-source top-``cap`` (text never read — only
    (doc_id, source, n_chars) move), so the shuffle carries at most
    ``cap x n_blocks`` rows per source regardless of corpus size; one
    groupby then merges candidates and emits the final ranked top-``cap``.
    This is the per-key bounded-accumulator pattern every "cap docs per
    domain" webtext step needs at 100 TB — a naive window function would
    sort the whole corpus."""

    out = (
        _read_documents(sf_dir, ("doc_id", "source", "n_chars"))
        .map_batches(lambda df: domain_cap_prune(df, cap), batch_format="pandas")
        .groupby("source")
        .map_groups(lambda g: domain_cap_rank(g, cap), batch_format="pandas")
    )
    return _collect_sorted(
        out,
        ("doc_id",),
        lambda: domain_cap_rank(
            domain_cap_prune(
                _empty_docs(("doc_id", "source", "n_chars")).to_pandas(), cap
            ),
            cap,
        ),
    )


# ----------------------------------------------------------------------
# bigram LM scoring (the CCNet-perplexity-filter shape): pass 1 reduces the
# corpus to a bigram count model, pass 2 broadcasts it and scores every
# document.  Engine-added brief; no reference analog.


def _bigram_codes(t: pa.Table):
    """(doc index, left code, right code, dictionary) for every in-document
    adjacent word pair of a batch — `_word_codes` tokenization, so bigram
    semantics agree with the word-statistics family and the oracles'
    space-split."""
    parent, codes, dictionary = _word_codes(t)
    if codes.size < 2:
        z = np.empty(0, np.int64)
        return z, z, z, dictionary
    same = parent[1:] == parent[:-1]
    return parent[:-1][same], codes[:-1][same], codes[1:][same], dictionary


def _bigram_count_partials(t: pa.Table) -> pa.Table:
    """Per-batch (w1, w2, c) bigram-count partial — numpy unique over
    integer code pairs; the text never leaves the worker."""
    _, left, right, dictionary = _bigram_codes(t)
    vocab = len(dictionary)
    if left.size:
        keys, c = np.unique(left * vocab + right, return_counts=True)
        lc, rc = keys // vocab, keys % vocab
    else:
        lc = rc = c = left
    return pa.table(
        {
            "w1": dictionary.take(pa.array(lc, pa.int64())),
            "w2": dictionary.take(pa.array(rc, pa.int64())),
            "c": pa.array(c, pa.int64()),
        }
    )


def _bigram_model_df(sf_dir: str) -> pd.DataFrame:
    """The corpus bigram-count table (w1, w2, c) — one combiner pass +
    one groupby; vocab²-bounded, NOT corpus-bounded (a production run
    would prune low-count pairs inside the combiner, like KenLM does).
    Shared by `_bigram_scored` (the LM build) and `t_pmi_collocations`
    (association mining) so their bigram semantics can never drift."""
    from ray.data.aggregate import Sum

    return _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(_bigram_count_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c")),
        ("w1",),
        schema=pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("c", pa.int64())]
        ),
    )


def _bigram_scored(sf_dir: str):
    """Build the corpus bigram LM once and return ``(make, probe)``:
    ``make(prefilter=None)`` is a factory of lazy scored Datasets
    (doc_id, n_bigrams, logprob_x1e3) over the documents table —
    ``prefilter`` (a pyarrow batch fn) runs BEFORE scoring, so a sampled
    pass only pays for the sample — and ``probe`` yields the typed empty
    output for `_collect_sorted`.  Shared by t_bigram_logprob (collects
    one full pass) and t_ccnet_buckets (sample pass for thresholds +
    full pass for assignment, same broadcast model).

    The canonical two-pass model-score shape (CCNet's KenLM perplexity
    filter at 100 TB looks exactly like this): pass 1 collapses the corpus
    to (w1, w2, count) partials inside each batch — numpy unique over
    integer code pairs, text dropped in the worker — and one combiner
    groupby sums them; the model that reaches the driver is vocabulary-
    bounded, not corpus-bounded (a production run would prune low-count
    bigrams here, like KenLM does).  Pass 2 ships the model ONCE via
    ``ray.put`` as (sorted pair-key int64 array, logprob array) and scores
    each batch with two vectorized lookups: ``index_in`` maps the batch
    dictionary onto the model vocab, ``searchsorted`` resolves pair keys.
    Score = sum(ln(c(w1,w2) / c(w1·))) over the doc's bigrams, where
    c(w1·) counts w1 as a bigram CONTEXT (so conditionals normalize); MLE
    is total because the model was built from the same corpus.  Emitted as
    half-up-rounded milli-units — ln() is transcendental, so no true score
    sits on a rounding boundary."""
    import ray

    model_df = _bigram_model_df(sf_dir)
    # model vocab = every word seen on either side of a bigram
    words = pd.unique(pd.concat([model_df["w1"], model_df["w2"]]).to_numpy())
    words.sort()
    widx = pd.Series(np.arange(len(words), dtype=np.int64), index=words)
    v = np.int64(len(words))
    i1 = widx[model_df["w1"]].to_numpy()
    i2 = widx[model_df["w2"]].to_numpy()
    c2 = model_df["c"].to_numpy(np.float64)
    c1 = np.bincount(i1, weights=c2, minlength=len(words))  # context counts
    order = np.argsort(i1 * v + i2)
    pair_keys = (i1 * v + i2)[order]
    pair_lp = np.log(c2 / c1[i1])[order]
    bref = ray.put((pa.array(words, pa.string()), pair_keys, pair_lp))

    class Score:
        def __init__(self):
            self.words, self.pair_keys, self.pair_lp = ray.get(bref)
            self.v = np.int64(len(self.words))

        def __call__(self, t: pa.Table) -> pa.Table:
            doc_of_bg, left, right, dictionary = _bigram_codes(t)
            n_bigrams = np.bincount(doc_of_bg, minlength=t.num_rows)
            if left.size:
                pos = pc.fill_null(
                    pc.index_in(dictionary, value_set=self.words), -1
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                pl, pr = pos[left], pos[right]
                # by construction the model vocab covers every bigram side
                # (built from the same corpus pass); fail loudly rather than
                # let a NaN->int64 index fetch a wrong logprob silently
                if pl.size and (min(pl.min(), pr.min()) < 0):
                    raise ValueError(
                        "bigram word missing from the broadcast model vocab"
                    )
                key = pl * self.v + pr
                idx = np.searchsorted(self.pair_keys, key)
                if (idx >= self.pair_keys.size).any() or (
                    self.pair_keys[idx] != key
                ).any():
                    raise ValueError(
                        "bigram pair missing from the broadcast model"
                    )
                lp = self.pair_lp[idx]
                score = np.bincount(doc_of_bg, weights=lp, minlength=t.num_rows)
            else:
                score = np.zeros(t.num_rows)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_bigrams": pa.array(n_bigrams.astype(np.int64), pa.int64()),
                    "logprob_x1e3": pa.array(
                        np.floor(score * 1000.0 + 0.5).astype(np.int64), pa.int64()
                    ),
                }
            )

    def make(prefilter=None):
        ds = _read_documents(sf_dir)
        if prefilter is not None:
            ds = ds.map_batches(prefilter, batch_format="pyarrow")
        return ds.map_batches(
            warm_factory(("t_bigram_logprob", bref.hex()), Score),
            batch_format="pyarrow",
        )

    return make, (lambda: Score()(_empty_docs()))


def t_bigram_logprob(sf_dir: str):
    """Per-document bigram-LM log-probability — one full collected pass of
    `_bigram_scored` (see its docstring for the model/score design)."""
    make, probe = _bigram_scored(sf_dir)
    return _collect_sorted(make(), ("doc_id",), probe)


CCNET_SALT = "cc42:"
CCNET_SAMPLE_MOD = 4  # ~25% deterministic threshold-training sample


def _ccnet_sample_mask(ids: np.ndarray) -> np.ndarray:
    """md5_number_lower(salt || doc_id) % MOD == 0 — the same integer
    md5-grid rule the oracle replays (no float anywhere)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5((CCNET_SALT + str(i)).encode()).digest()[8:], "little"
            )
            % CCNET_SAMPLE_MOD
            == 0
            for i in ids
        ),
        bool,
        len(ids),
    )


def t_ccnet_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): partition
    the corpus into head / middle / tail thirds by language-model score —
    the canonical quality-partitioning stage of a webtext pipeline (CCNet
    trains KenLM on Wikipedia and buckets Common Crawl by perplexity;
    here the in-corpus bigram LM from `_bigram_scored` plays the LM).

    Scale shape — thresholds come from a SAMPLE, exactly like CCNet's:
    a deterministic md5-grid sample (~1/4 of docs, integer rule, no RNG)
    is scored FIRST (the prefilter runs before scoring, so the pass pays
    only for the sample), tercile thresholds are interpolated on the
    driver from the sorted sample scores (quantile_cont's (m-1)p formula,
    the same IEEE expression the oracle replays), and one full streaming
    pass assigns buckets against the two broadcast doubles.  Nothing
    corpus-sized ever reaches the driver; the model build is shared with
    t_bigram_logprob.  A corpus too small for the hash sample to hit
    (possible below ~MOD docs) deterministically falls back to
    thresholding on ALL docs — the oracle replays the same rule.

    Score = avg bigram logprob (logprob_x1e3 / n_bigrams, the SAME int64
    division both sides — bit-identical doubles; 0.0 for <2-token docs),
    monotone in perplexity so the thirds are CCNet's thirds.  HIGHER
    score = more predictable = head."""
    make, probe = _bigram_scored(sf_dir)
    scored_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("logprob_x1e3", pa.int64()),
        ]
    )

    def samp_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_ccnet_sample_mask(ids)))

    samp = _collect_sorted(make(samp_filter), ("doc_id",), schema=scored_schema)
    if len(samp) == 0:  # hash hit nothing (tiny corpus) — threshold on all
        samp = _collect_sorted(make(), ("doc_id",), schema=scored_schema)

    def avg_score(df: pd.DataFrame) -> np.ndarray:
        lp = df["logprob_x1e3"].to_numpy(np.int64).astype(np.float64)
        nb = df["n_bigrams"].to_numpy(np.int64).astype(np.float64)
        return np.where(nb == 0, 0.0, lp / np.where(nb == 0, 1.0, nb))

    def interp(sorted_scores: np.ndarray, p: float) -> float:
        # quantile_cont's (m-1)p rule, written as the exact IEEE
        # expression the oracle uses
        m = len(sorted_scores)
        idx = (m - 1) * p
        lo = int(np.floor(idx))
        frac = idx - lo
        if lo + 1 >= m:
            return float(sorted_scores[lo])
        return float(
            sorted_scores[lo] + frac * (sorted_scores[lo + 1] - sorted_scores[lo])
        )

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "n_bigrams": pd.Series([], dtype="int64"),
            "logprob_x1e3": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
            "bucket": pd.Series([], dtype=object),
        }
    )
    if len(samp) == 0:  # empty corpus
        return empty
    ss = np.sort(avg_score(samp))
    thr_mid = interp(ss, 1.0 / 3.0)
    thr_head = interp(ss, 2.0 / 3.0)

    def assign(t: pa.Table) -> pa.Table:
        # in-stream: the two thresholds are the only broadcast state
        lp = t.column("logprob_x1e3").to_numpy(zero_copy_only=False)
        nb = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        s = np.where(
            nb == 0, 0.0, lp.astype(np.float64) / np.where(nb == 0, 1.0, nb)
        )
        bucket = np.where(s >= thr_head, "head", np.where(s >= thr_mid, "middle", "tail"))
        t = t.append_column("score", pa.array(s, pa.float64()))
        return t.append_column("bucket", pa.array(bucket, pa.string()))

    out = _collect_sorted(
        make().map_batches(assign, batch_format="pyarrow"),
        ("doc_id",),
        lambda: assign(probe()),
    )
    for c in ("doc_id", "n_bigrams", "logprob_x1e3"):
        out[c] = out[c].astype("int64")
    return out


# ----------------------------------------------------------------------
# deterministic seeded shuffle into training shards — the last stage of a
# webtext pipeline (global shuffle + shard writing).  Engine-added brief.

N_TRAIN_SHARDS = 8  # power of 16 divisor so the oracle can derive the mod
SHUFFLE_SEED = "shuf42"


def _shard_key(doc_id: int) -> str:
    return hashlib.md5(f"{SHUFFLE_SEED}:{doc_id}".encode()).hexdigest()[:8]


def shard_assignments(doc_ids):
    """(keys, shards) for a list of doc ids — THE shard-derivation rule,
    shared by t_shuffle_shards, write_training_shards and
    pipeline_training_mix so their layouts can never drift."""
    keys = [_shard_key(i) for i in doc_ids]
    shards = [int(k, 16) % N_TRAIN_SHARDS for k in keys]
    return keys, shards


def t_shuffle_shards(sf_dir: str):
    """Deterministic seeded shuffle into training shards.

    Each doc's shard and within-shard position come from an md5 hash of
    (seed, doc_id) — NOT an RNG: a retry, resume, or different block
    layout reproduces the identical shard assignment and order, which is
    the property `random_shuffle()` cannot give a resumable 100 TB run.
    The shuffle moves (doc_id, shard, key) only; one groupby per shard
    sorts its own keys (each group is ~corpus/n_shards — at scale you'd
    raise N_TRAIN_SHARDS so a group fits a worker, which also makes the
    per-shard sort the classic terasort bucket phase).  Output is the
    (shard, pos) placement map; `write_training_shards` is the production
    exit that lays the corpus out hive-partitioned by shard."""

    def key(t: pa.Table) -> pa.Table:
        keys, shards = shard_assignments(t.column("doc_id").to_pylist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": pa.array(shards, pa.int64()),
                "k": pa.array(keys, pa.string()),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "doc_id"]).reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g[["doc_id", "shard", "pos"]]

    out = (
        _read_documents(sf_dir, ("doc_id",))
        .map_batches(key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )
    return _collect_sorted(
        out,
        ("doc_id",),
        lambda: rank(key(_empty_docs(("doc_id",))).to_pandas()),
    )


def write_training_shards(sf_dir: str, out_dir: str) -> None:
    """Production exit for the seeded shuffle: the full corpus written
    hive-partitioned by shard (`partition_cols=['shard']`), each shard
    internally ordered by the shuffle key via a per-shard sort column.
    Readers stream one shard directory at a time; the partition column
    comes back as a STRING under hive inference (cast on read — see
    working notes)."""

    def key(t: pa.Table) -> pa.Table:
        keys, shards = shard_assignments(t.column("doc_id").to_pylist())
        return t.append_column("shard", pa.array(shards, pa.int64())).append_column(
            "k", pa.array(keys, pa.string())
        )

    def order(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["k", "doc_id"]).drop(columns=["k"])

    (
        _read_documents(sf_dir, ("doc_id", "text", "lang", "source"))
        .map_batches(key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["shard"])
    )


WDS_DOCS_PER_SHARD = 1000  # shard count = ceil(n / this): data-proportional
WDS_SALT = "wds:"


def t_webdataset_shards(sf_dir: str, out_dir: str = None):
    """WebDataset tar-shard training sink — the corpus laid out as the
    `shard-%06d.tar` archives a training loader actually streams — plus
    its EXACT manifest (shard_id, n_docs, text_bytes, members_md5), which
    is what the query returns and the oracle replays in SQL.

    Shard assignment is a deterministic salted hash (md5 low-64 % S, the
    `md5_number_lower` convention) with S = ceil(n / WDS_DOCS_PER_SHARD)
    — shard COUNT grows with data while shard SIZE stays bounded (the
    knob a 100 TB run turns), and the hash both spreads docs (the
    shuffled-shards property training ingest wants) and survives any
    retry/resume/block-layout change, which `random_shuffle()` cannot.
    Members are ordered by doc_id inside a shard and every tar header is
    normalized (mtime 0, uid/gid 0, ustar) so shard BYTES are
    deterministic: a re-run byte-identically reproduces every archive
    (pinned by test).  Each tar lands via write-to-temp + os.replace, so
    a crashed run's finished shards are complete and a resume can skip
    existing shard files.

    The manifest is the oracle surface: n_docs and utf-8 text_bytes per
    shard, and members_md5 = md5 of the comma-joined member names in
    doc_id order — exact membership, SQL-replayable via
    string_agg(... ORDER BY doc_id).  Exchanges: ONE shard groupby of
    (doc_id, text); nothing corpus-sized ever reaches the driver (each
    group emits one manifest row).  Workers write tars directly, so on a
    multi-node cluster ``out_dir`` must be shared storage (NFS / fuse
    mount) — the same contract as every write_parquet exit."""
    import io
    import shutil
    import tarfile
    import tempfile

    cleanup = out_dir is None
    if cleanup:
        out_dir = tempfile.mkdtemp(prefix="pdfray_wds_")
    os.makedirs(out_dir, exist_ok=True)

    ds = _read_documents(sf_dir)
    n = ds.count()
    n_shards = max(1, (n + WDS_DOCS_PER_SHARD - 1) // WDS_DOCS_PER_SHARD)

    def assign(t: pa.Table) -> pa.Table:
        shards = [
            int.from_bytes(
                hashlib.md5(f"{WDS_SALT}{d}".encode()).digest()[8:], "little"
            )
            % n_shards
            for d in t.column("doc_id").to_pylist()
        ]
        return t.append_column("shard_id", pa.array(shards, pa.int64()))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        shard = int(g["shard_id"].iloc[0])
        names, total = [], 0
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for doc_id, text in zip(g["doc_id"], g["text"]):
                name = f"{int(doc_id):012d}.txt"
                data = text.encode("utf-8")
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
                names.append(name)
                total += len(data)
        path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": pd.Series([shard], dtype="int64"),
                "n_docs": pd.Series([len(names)], dtype="int64"),
                "text_bytes": pd.Series([total], dtype="int64"),
                "members_md5": [hashlib.md5(",".join(names).encode()).hexdigest()],
            }
        )

    try:
        out = (
            ds.map_batches(assign, batch_format="pyarrow")
            .groupby("shard_id")
            .map_groups(write_shard, batch_format="pandas")
        )
        return _collect_sorted(
            out,
            ("shard_id",),
            schema=pa.schema(
                [
                    ("shard_id", pa.int64()),
                    ("n_docs", pa.int64()),
                    ("text_bytes", pa.int64()),
                    ("members_md5", pa.string()),
                ]
            ),
        )
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)


def t_wds_roundtrip(sf_dir: str):
    """Sink→source identity over the tar shards: write the corpus with
    `t_webdataset_shards`, stream it BACK through the distributed tar
    source (`sources.readers.read_webdataset` — one read task per
    shard), and report per-doc (utf-8 byte length, content md5).  The
    oracle computes the same digests from the ORIGINAL table, so a match
    certifies the whole loader path — shard assignment, tar framing,
    member naming, utf-8 round-trip — end to end, doc by doc.  Nothing
    corpus-sized reaches the driver: digests reduce per block on the
    read side."""
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="pdfray_wdsrt_")
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bytes", pa.int64()),
            ("text_md5", pa.string()),
        ]
    )
    try:
        man = t_webdataset_shards(sf_dir, out_dir=out_dir)
        if len(man) == 0:  # no shards were written: nothing to read back
            return schema.empty_table().to_pandas()
        from ..sources.readers import read_webdataset

        def digest(t: pa.Table) -> pa.Table:
            data = [s.encode("utf-8") for s in t.column("text").to_pylist()]
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_bytes": pa.array([len(b) for b in data], pa.int64()),
                    "text_md5": pa.array(
                        [hashlib.md5(b).hexdigest() for b in data], pa.string()
                    ),
                }
            )

        out = read_webdataset(out_dir).map_batches(
            digest, batch_format="pyarrow"
        )
        return _collect_sorted(out, ("doc_id",), schema=schema)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ----------------------------------------------------------------------
# incremental (delta) dedup: new docs tested against the EXISTING corpus's
# fingerprint index — the "daily crawl vs yesterday's corpus" shape.
# Engine-added brief; no reference analog.

DELTA_MOD = 5  # doc_id % MOD == 0 plays the "new batch"; rest is "existing"


def _wordset_fingerprint(text: str) -> str:
    """md5 over the sorted DISTINCT word set — a bag-of-words-insensitive
    content fingerprint (catches reordered/repeated-template copies that
    byte-level md5 misses; the standard cheap tier between exact dedup and
    MinHash)."""
    return hashlib.md5(" ".join(sorted(set(text.split()))).encode()).hexdigest()


def t_delta_dedup(sf_dir: str):
    """Incremental dedup of a new batch against an existing corpus index.

    The existing side never ships text: each batch reduces to its distinct
    word-set fingerprints (dedup inside the worker), the driver uniques the
    vocabulary-of-fingerprints once and `ray.put`s the sorted array; the
    new side streams through one map stage testing membership with
    vectorized np.isin.  No shuffle at all.  At 100 TB the broadcast set
    becomes a bucket-partitioned fingerprint store probed like
    `t_inverted_lookup`'s (or a Bloom filter when false positives are
    acceptable); the streaming shape — new data vs a prebuilt small/indexed
    side — is identical."""
    import ray

    def existing_fps(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.filter(pa.array(ids % DELTA_MOD != 0)).column("text")
        fps = sorted({_wordset_fingerprint(s) for s in texts.to_pylist()})
        return pa.table({"fp": pa.array(fps, pa.string())})

    existing = np.unique(
        _collect_sorted(
            _read_documents(sf_dir).map_batches(
                existing_fps, batch_format="pyarrow"
            ),
            ("fp",),
            schema=pa.schema([("fp", pa.string())]),
        )["fp"].to_numpy()
    )
    ref = ray.put(existing)

    def flag_factory():
        table = ray.get(ref)

        def flag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            new = t.filter(pa.array(ids % DELTA_MOD == 0))
            fps = np.array(
                [_wordset_fingerprint(s) for s in new.column("text").to_pylist()],
                dtype=object,
            )
            hit = np.isin(fps, table, assume_unique=False)
            return pa.table(
                {
                    "doc_id": new.column("doc_id"),
                    "fingerprint": pa.array(list(fps), pa.string()),
                    "is_dup": pa.array(hit.tolist(), pa.bool_()),
                }
            )

        return flag

    out = _read_documents(sf_dir).map_batches(
        warm_factory(("delta_dedup", ref.hex()), flag_factory),
        batch_format="pyarrow",
    ).to_pandas()
    if len(out) == 0:  # empty new batch: keep the typed schema
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="object"),
                "is_dup": pd.Series(dtype="bool"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---- the 100 TB form of the same operator: Bloom prefilter + bucketed
# fingerprint store.  t_delta_dedup's docstring names this upgrade; this
# implements it with EXACT output (the Bloom has no false negatives, and
# every positive is verified against the store), so the two share one
# oracle.
DELTA_BLOOM_BITS_PER_KEY = 16
DELTA_BLOOM_HASHES = 8
DELTA_STORE_BUCKETS = 32


def _fp_hash_pair(fps):
    """Two independent 64-bit hashes per md5-hex fingerprint: the two
    halves of the digest (md5 bits are independent)."""
    h1 = np.array([int(f[:16], 16) for f in fps], dtype=np.uint64)
    h2 = np.array([int(f[16:], 16) for f in fps], dtype=np.uint64)
    return h1, h2


def _bloom_build(fps) -> tuple:
    """(bits, m): double-hashing Bloom filter over the fingerprints —
    m = next power of two >= 16 bits/key, k = 8 (fp rate ~6e-4)."""
    n = max(1, len(fps))
    m = 1 << max(6, int(np.ceil(np.log2(n * DELTA_BLOOM_BITS_PER_KEY))))
    bits = np.zeros(m // 64, dtype=np.uint64)
    if len(fps):
        h1, h2 = _fp_hash_pair(fps)
        for i in range(DELTA_BLOOM_HASHES):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(
                bits, (idx >> np.uint64(6)), np.uint64(1) << (idx & np.uint64(63))
            )
    return bits, m


def _bloom_test(bits: np.ndarray, m: int, fps) -> np.ndarray:
    """Vectorized membership test; True = maybe present (verify), False =
    DEFINITELY absent (no false negatives)."""
    if not len(fps):
        return np.zeros(0, dtype=bool)
    h1, h2 = _fp_hash_pair(fps)
    ok = np.ones(len(fps), dtype=bool)
    for i in range(DELTA_BLOOM_HASHES):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return ok


def build_fp_store(fps, store_dir: str) -> str:
    """Hive-partitioned fingerprint store: bucket = h1(fp) % B directories,
    each independently probe-readable (the t_inverted_lookup layout).  At
    corpus scale this is written by the indexing job itself
    (write_parquet(partition_cols=['bucket']) over the existing corpus);
    here the driver-sized array writes it directly."""
    import os

    import pyarrow.parquet as pq

    h1, _ = _fp_hash_pair(fps)
    bucket = (h1 % np.uint64(DELTA_STORE_BUCKETS)).astype(np.int64)
    for b in range(DELTA_STORE_BUCKETS):
        sel = np.sort(fps[bucket == b])
        d = os.path.join(store_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"fp": pa.array(list(sel), pa.string())}),
            os.path.join(d, "part-0.parquet"),
        )
    return store_dir


def t_delta_dedup_bloom(sf_dir: str, stats: dict = None, store_dir: str = None):
    """t_delta_dedup through its documented scale path: the existing
    corpus's fingerprints live in a BUCKET-PARTITIONED parquet store plus a
    broadcast BLOOM FILTER (16 bits/key — ~1/1700 the bytes of the string
    set).  The new side streams one map stage: Bloom-negative rows are
    exactly non-duplicates (no false negatives) and never touch storage;
    Bloom-positive rows verify against ONLY their fingerprint's bucket
    partition (worker-local bucket cache, so each worker reads a bucket at
    most once).  Output is IDENTICAL to t_delta_dedup — same oracle — while
    the broadcast shrinks from the fingerprint set to the bit array and
    probe I/O scales with the (rare) maybe-duplicate traffic.  Pass
    ``stats={}`` for bloom-hit/probe counters.

    Store placement: with ``store_dir=None`` (the query-contract form) the
    bucket store is a throwaway local-/tmp directory, removed on exit —
    workers read it by plain path, which assumes single-node or a shared
    filesystem.  A multi-node deployment passes an explicit ``store_dir``
    on shared/object storage (the same contract as clean_corpus's
    ``out_dir``); the store then persists for the next delta batch, which
    is the actual production shape (build once, probe per delta)."""
    import os
    import shutil
    import tempfile

    import ray

    def existing_fps(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.filter(pa.array(ids % DELTA_MOD != 0)).column("text")
        fps = sorted({_wordset_fingerprint(s) for s in texts.to_pylist()})
        return pa.table({"fp": pa.array(fps, pa.string())})

    existing = np.unique(
        _collect_sorted(
            _read_documents(sf_dir).map_batches(
                existing_fps, batch_format="pyarrow"
            ),
            ("fp",),
            schema=pa.schema([("fp", pa.string())]),
        )["fp"].to_numpy()
    )
    own_store = store_dir is None
    if own_store:
        store_dir = tempfile.mkdtemp(prefix="pdfray_fpstore_")
    try:
        build_fp_store(existing, store_dir)
        bits, m = _bloom_build(existing)
        bref = ray.put((bits, m, store_dir))
        return _delta_dedup_bloom_run(sf_dir, bref, stats)
    finally:
        if own_store:
            shutil.rmtree(store_dir, ignore_errors=True)


def _delta_dedup_bloom_run(sf_dir: str, bref, stats: dict):
    import os

    import ray  # noqa: F401  (flag_factory closes over ray.get)

    def flag_factory():
        bits_, m_, store = ray.get(bref)
        cache: dict = {}

        def bucket_set(b: int):
            got = cache.get(b)
            if got is None:
                import pyarrow.parquet as pq

                tbl = pq.read_table(
                    os.path.join(store, f"bucket={b}", "part-0.parquet")
                )
                got = np.array(tbl.column("fp").to_pylist(), dtype=object)
                cache[b] = got
            return got

        def flag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            new = t.filter(pa.array(ids % DELTA_MOD == 0))
            fps = np.array(
                [_wordset_fingerprint(s) for s in new.column("text").to_pylist()],
                dtype=object,
            )
            hit = np.zeros(len(fps), dtype=bool)
            maybe = _bloom_test(bits_, m_, fps)
            if maybe.any():
                h1, _ = _fp_hash_pair(fps[maybe])
                buckets = (h1 % np.uint64(DELTA_STORE_BUCKETS)).astype(np.int64)
                verified = np.zeros(int(maybe.sum()), dtype=bool)
                for b in np.unique(buckets):
                    sel = buckets == b
                    verified[sel] = np.isin(fps[maybe][sel], bucket_set(int(b)))
                hit[maybe] = verified
            return pa.table(
                {
                    "doc_id": new.column("doc_id"),
                    "fingerprint": pa.array(list(fps), pa.string()),
                    "is_dup": pa.array(hit.tolist(), pa.bool_()),
                    "_maybe": pa.array(maybe.tolist(), pa.bool_()),
                }
            )

        return flag

    out = (
        _read_documents(sf_dir)
        .map_batches(
            warm_factory(("delta_dedup_bloom", bref.hex()), flag_factory),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if stats is not None:
        stats["n_new"] = int(len(out))
        stats["n_bloom_maybe"] = int(out["_maybe"].sum()) if len(out) else 0
        stats["n_dups"] = int(out["is_dup"].sum()) if len(out) else 0
    if len(out) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="object"),
                "is_dup": pd.Series(dtype="bool"),
            }
        )
    return (
        out.drop(columns=["_maybe"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# duplicate-cluster resolution: connected components over the verified
# near-dup pair graph — the step between "pairs" and "keep one per cluster"
# every dedup pipeline needs.  Engine-added brief; no reference analog.

CC_MAX_ITERS = 64
CC_DRIVER_MAX_PAIRS = 200_000  # below this the pair list is driver-sized


def _edge_fingerprint(edges) -> tuple:
    """Order-insensitive fingerprint of a canonical (u, v) edge set: count
    plus wraparound uint64 sums of both columns and a per-edge mix — one
    streaming pass, one tiny row per block to the driver.  Used as the
    star-contraction fixpoint test (an unchanged fingerprint over a set
    that only ever contracts means the set itself is unchanged)."""

    def part(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy().astype(np.uint64)
        v = t.column("v").to_numpy().astype(np.uint64)
        mix = (u * np.uint64(0x9E3779B97F4A7C15)) ^ (
            v * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        return pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "su": pa.array([int(u.sum(dtype=np.uint64))], pa.uint64()),
                "sv": pa.array([int(v.sum(dtype=np.uint64))], pa.uint64()),
                "sm": pa.array([int(mix.sum(dtype=np.uint64))], pa.uint64()),
            }
        )

    p = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    return (
        int(p["n"].sum()),
        int(p["su"].to_numpy(np.uint64).sum(dtype=np.uint64)),
        int(p["sv"].to_numpy(np.uint64).sum(dtype=np.uint64)),
        int(p["sm"].to_numpy(np.uint64).sum(dtype=np.uint64)),
    )


def _snap(ds):
    """Materialize AND sever logical-plan lineage.

    An iterative Ray Data loop that reassigns `ds = f(ds).materialize()`
    each round keeps the ENTIRE plan history chained through the
    MaterializedDataset: every later operation re-walks the deepening plan,
    so per-round driver overhead grows ~1.5x per round (measured on the CC
    loop: round 11 took 68s where round 1 took 3s, with execution itself
    constant).  Rebuilding from the materialized block refs resets the plan
    to an InputData root — round time becomes flat."""
    import ray.data as rd

    return rd.from_arrow_refs(ds.materialize().to_arrow_refs())


def _star_round(edges, large: bool, num_partitions: int, dedup: bool):
    """One large-star or small-star contraction (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond").  Edges are canonical
    (u, v) with u > v.

    large-star: group every edge under BOTH endpoints; each node u hooks
    its GREATER neighbors to m(u) = min(Γ(u) ∪ {u}).
    small-star: group each edge under its larger endpoint; each node u
    hooks its (all smaller) neighbors and itself to m(u).

    Both steps are one min-groupby plus one hash join carrying (node, nbr)
    pairs only.  ``dedup`` collapses duplicate pairs with a groupby — done
    once per (large, small) round: duplicates are harmless mid-round (the
    min aggregate ignores multiplicity) and bounded by the join fan-out of
    a single round, so skipping the mid-round dedup saves one shuffle."""
    from ray.data.aggregate import Count, Min

    if large:
        sym = edges.map_batches(
            lambda t: pa.concat_tables(
                [
                    pa.table({"node": t.column("u"), "nbr": t.column("v")}),
                    pa.table({"node": t.column("v"), "nbr": t.column("u")}),
                ]
            ),
            batch_format="pyarrow",
        )
    else:
        sym = edges.map_batches(
            lambda t: pa.table({"node": t.column("u"), "nbr": t.column("v")}),
            batch_format="pyarrow",
        )
    sym = sym.repartition(num_partitions).materialize()
    mins = (
        sym.groupby("node")
        .aggregate(Min("nbr", alias_name="mn"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "m": pc.min_element_wise(t.column("node"), t.column("mn")),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )
    joined = sym.join(
        mins, join_type="inner", num_partitions=num_partitions, on=("node",)
    )
    if large:

        def emit(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t.column("nbr"), t.column("node")))
            return pa.table({"u": t.column("nbr"), "v": t.column("m")})

        out = joined.map_batches(emit, batch_format="pyarrow")
    else:

        def emit(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t.column("nbr"), t.column("m")))
            return pa.table({"u": t.column("nbr"), "v": t.column("m")})

        def centers(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t.column("node"), t.column("m")))
            return pa.table({"u": t.column("node"), "v": t.column("m")})

        out = joined.map_batches(emit, batch_format="pyarrow").union(
            mins.map_batches(centers, batch_format="pyarrow")
        )

    if not dedup:
        return _snap(out)

    def drop_count(t: pa.Table) -> pa.Table:
        return t.drop_columns(["_n"])

    return _snap(
        out.groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(drop_count, batch_format="pyarrow")
    )


def _cc_min_label(edges_ds, num_partitions: int = 4, stats: dict = None):
    """Distributed connected components by alternating large-star /
    small-star contraction (Kiveris et al. 2014): each round hooks nodes
    to their neighborhood minimum, halving tree heights, so convergence is
    O(log n) rounds even on adversarial path graphs — the upgrade over
    plain hash-to-min propagation, whose O(diameter) rounds a 10k-node
    chain defeats (pinned by test_cc_path_graph_converges_in_log_rounds).
    Every shuffle carries (node, nbr) int pairs only.  At the fixpoint the
    edge set is a forest of stars rooted at each component's minimum node;
    labels are read directly off the star edges.  The fixpoint test is an
    order-insensitive edge-set fingerprint between rounds.  Pass
    ``stats={}`` to record the round count."""
    from ray.data.aggregate import Min

    def canon(t: pa.Table) -> pa.Table:
        a, b = t.column("doc_a"), t.column("doc_b")
        return pa.table(
            {"u": pc.max_element_wise(a, b), "v": pc.min_element_wise(a, b)}
        )

    # compact blocks: verified-pairs stages emit empty blocks, and a join
    # side whose first block is empty loses its schema (Ray 2.49 quirk —
    # see working notes); the edge list is candidate-sized, so this is cheap
    edges = _snap(
        edges_ds.map_batches(canon, batch_format="pyarrow").repartition(
            num_partitions
        )
    )
    prev_fp = None
    for rounds in range(1, CC_MAX_ITERS + 1):
        edges = _star_round(
            edges, large=True, num_partitions=num_partitions, dedup=False
        )
        edges = _star_round(
            edges, large=False, num_partitions=num_partitions, dedup=True
        )
        fp = _edge_fingerprint(edges)
        if fp == prev_fp:
            if stats is not None:
                stats["rounds"] = rounds
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected components did not converge in {CC_MAX_ITERS} rounds"
        )
    # converged: stars (child u -> root v); labels = children + the roots
    kids = edges.map_batches(
        lambda t: pa.table({"node": t.column("u"), "label": t.column("v")}),
        batch_format="pyarrow",
    )
    roots = edges.map_batches(
        lambda t: pa.table({"node": t.column("v"), "label": t.column("v")}),
        batch_format="pyarrow",
    )
    return (
        kids.union(roots)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )


def t_dup_components(sf_dir: str, jaccard_threshold: float = 0.8):
    """Duplicate clusters: connected components over minhash-verified pairs.

    Reuses the full t_minhash_pairs pipeline (bands -> candidates ->
    distributed exact-Jaccard verify) but keeps the verified pairs a
    DATASET and runs `_cc_min_label` on them, emitting (doc_id, component)
    where component = the cluster's minimum doc_id — the canonical
    "keep one representative per duplicate family" input.  The driver sees
    only the final labels."""
    ds = _read_documents(sf_dir)
    buckets = ds.map_batches(warm_stage(MinHasher), batch_format="pyarrow")
    pairs = _candidate_pairs(buckets, "doc_id")
    verified = _verify_pairs(
        ds, pairs, ShingleSetHasher, jaccard_threshold, "doc_id", as_dataset=True
    )
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "component": pd.Series(dtype="int64"),
        }
    )
    if verified is None:
        return empty
    verified = verified.materialize()
    n_pairs = verified.count()
    if n_pairs == 0:  # every candidate was refuted
        return empty
    if n_pairs <= CC_DRIVER_MAX_PAIRS:
        # the verified pair list IS the reduced output (t_minhash_pairs
        # returns exactly this frame to the driver) — at this size a
        # driver union-find beats paying the per-round shuffle machinery
        # of label propagation; the distributed path below stays the scale
        # route and is exercised directly by the _cc_min_label tests
        pairs_df = verified.to_pandas()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        out = pd.DataFrame(
            {
                "doc_id": sorted(parent),
                "component": [find(n) for n in sorted(parent)],
            }
        ).astype("int64")
        return out.reset_index(drop=True)
    labels = _cc_min_label(verified)
    out = labels.to_pandas().rename(columns={"node": "doc_id", "label": "component"})
    return out.sort_values("doc_id").reset_index(drop=True)


def t_dedup_keep_best(sf_dir: str, jaccard_threshold: float = 0.8):
    """The keep DECISION every dedup pipeline ends with: for each
    duplicate family (t_dup_components), keep the highest-quality member —
    quality = token count, ties to the lower doc_id.

    Composition shape: the component table is dup-family-sized (tiny by
    nature — it lists only documents that have a near-duplicate), so its
    ids broadcast once; ONE streaming pass over the corpus computes token
    counts for member docs only (non-members never leave the scan), and
    the driver resolves the per-family argmax over |families| rows.
    Returns (component, keep_doc, n_members, keep_tokens)."""
    import ray

    comp = t_dup_components(sf_dir, jaccard_threshold)
    if len(comp) == 0:
        return pd.DataFrame(
            {
                "component": pd.Series(dtype="int64"),
                "keep_doc": pd.Series(dtype="int64"),
                "n_members": pd.Series(dtype="int64"),
                "keep_tokens": pd.Series(dtype="int64"),
            }
        )
    ids_ref = ray.put(pa.array(comp["doc_id"].to_numpy(np.int64)))

    def member_tokens(t: pa.Table) -> pa.Table:
        import ray as _ray

        wanted = _ray.get(ids_ref)
        t = t.filter(pc.is_in(t.column("doc_id"), value_set=wanted))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"), pa.int64()
                ),
            }
        )

    toks = (
        _read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(
            warm_factory(("keep_best", ids_ref.hex()), lambda: member_tokens),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    m = comp.merge(toks, on="doc_id")
    m = m.sort_values(
        ["component", "n_tokens", "doc_id"], ascending=[True, False, True]
    )
    best = m.groupby("component", sort=True).first().reset_index()
    counts = m.groupby("component", sort=True).size().reset_index(name="n_members")
    out = best.merge(counts, on="component")
    out = out.rename(columns={"doc_id": "keep_doc", "n_tokens": "keep_tokens"})
    return (
        out[["component", "keep_doc", "n_members", "keep_tokens"]]
        .astype("int64")
        .sort_values("component")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# temperature-balanced multilingual sampling (the mC4/XLM-R resampling
# step): downsample high-resource languages toward a flattened share.
# Engine-added brief; no reference analog.

TEMP_ALPHA = 0.5  # share exponent; 0.5 => keep-rate sqrt(n_min/n_lang).
# alpha=0.5 is deliberate: the keep-rate is then a single sqrt(), which
# IEEE 754 requires to be CORRECTLY ROUNDED — engine and oracle compute the
# bit-identical double, so the floor(65536*p) threshold can never disagree
# (a generic pow() is not correctly rounded and could differ by 1 ulp).


def temperature_thresholds(sf_dir: str) -> dict:
    """Per-language md5-prefix keep-thresholds for temperature sampling
    (pass 1: combiner-reduced lang counts; |langs| rows to the driver).
    Shared by t_temperature_sample and pipeline_training_mix so the two
    can never drift from each other or from the chained-CTE oracle."""
    from ray.data.aggregate import Count

    counts = _collect_sorted(
        _read_documents(sf_dir, ("lang",))
        .groupby("lang")
        .aggregate(Count(alias_name="n")),
        ("lang",),
        schema=pa.schema([("lang", pa.string()), ("n", pa.int64())]),
    )
    if len(counts) == 0:  # empty corpus: no languages, no thresholds
        return {}
    n_min = int(counts["n"].min())
    thresholds = {}
    for lang, n in zip(counts["lang"], counts["n"]):
        if int(n) <= n_min:
            thresholds[lang] = "zzzz"  # keep-all sentinel: every hex < 'z'
        else:
            p = math.sqrt(n_min / float(n))  # NOT pow(): see TEMP_ALPHA note
            thresholds[lang] = format(int(np.floor(65536.0 * p)), "04x")
    return thresholds


def temperature_filter(t: pa.Table, thresholds: dict) -> pa.Table:
    """Pass 2: the deterministic md5-prefix keep decision (RNG-free)."""
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    keep = [
        hashlib.md5(f"temp:{i}".encode()).hexdigest()[:4]
        < thresholds.get(lang, "0000")
        for i, lang in zip(ids, langs)
    ]
    return t.filter(pa.array(keep, pa.bool_()))


def t_temperature_sample(sf_dir: str):
    """Deterministic temperature sampling across languages.

    Two passes, like every global-statistic reweighting at 100 TB: pass 1
    reduces the corpus to per-language counts (combiner groupby, |langs|
    rows to the driver); the keep-rate per language is
    ``(n_min / n_lang) ** (1 - TEMP_ALPHA)`` — the smallest language keeps
    everything, larger ones shrink toward the temperature-flattened share.
    Pass 2 streams the corpus through a filter whose keep decision is an
    md5 prefix of the doc id against the language's rate threshold (RNG-
    free: retries, resumes, and repartitioning reproduce the identical
    sample — same property as t_stratified_sample, independent salt).  The
    tiny threshold table ships inside the task closure; a real deployment
    with thousands of language codes would ray.put it."""
    thresholds = temperature_thresholds(sf_dir)
    ds = _read_documents(sf_dir, ("doc_id", "lang", "source")).map_batches(
        lambda t: temperature_filter(t, thresholds), batch_format="pyarrow"
    )
    return _collect_sorted(
        ds,
        ("doc_id",),
        lambda: temperature_filter(
            _empty_docs(("doc_id", "lang", "source")), thresholds
        ),
    )


# ----------------------------------------------------------------------
# corpus-wide duplicated-span detection (the exact-substring-dedup shape of
# Lee et al., "Deduplicating Training Data Makes Language Models Better"):
# per-doc count of word 8-grams that also occur in ANOTHER document.
# Engine-added brief; no reference analog.

DUP_SPAN_N = 8  # same gram width as decontamination


def t_dup_spans(sf_dir: str, stage_dir: str = None):
    """Per-document count of word 8-grams shared with any other document.

    Unlike t_decontaminate (tiny benchmark side, broadcast), the dup-gram
    set here is CORPUS-scale on a template-dense crawl, so the join side
    cannot be broadcast: the corpus explodes once into distinct (doc_id,
    gram-hash) pairs (dedup inside the worker, text dropped), a combiner
    groupby counts docs per gram, grams with df >= 2 semi-join back
    against the SAME pair table, and one last groupby counts per doc.
    Every shuffle carries (int64, int64) pairs.  This gram-join is the
    standard distributed approximation of suffix-array ExactSubstr dedup;
    collisions of the 62-bit gram hash would surface as an oracle mismatch
    (the SQL joins gram STRINGS), not pass silently.

    The pair table — O(corpus token count) rows, reused by BOTH the
    df-count pass and the join probe — and the df>=2 gram set (itself of
    corpus order on a template-dense crawl) are PARQUET STAGE CHECKPOINTS
    (`staging.stage_checkpoint`), never object-store materializes: the
    store never pins a corpus-order table, each consumer streams a fresh
    read of the files, and with an explicit ``stage_dir`` a crashed run
    resumes at the boundary (default: throwaway /tmp dir removed on
    exit).  Footer row counts then size the join partitions
    data-proportionally (`sizing.shuffle_partitions`), and checkpoint
    read-back blocks are always nonempty, so the empty-first-block join
    quirk cannot trigger.

    Measured alternative, rejected: collapsing the count+semi-join into one
    groupby(gh).map_groups pays a per-GROUP pandas call over millions of
    gram groups — 2-4x slower than this 3-exchange plan.  The shuffle-count
    lesson (q_retention_cohorts) only wins when the merged stage stays
    vectorized; per-tiny-group Python erases it."""
    import os
    import shutil
    import tempfile

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_ids, out_hs = [], []
        for i, s in zip(ids, texts):
            hs = _gram_hashes(s)  # distinct md5-64 hashes of word 8-grams
            out_ids.append(np.full(hs.size, i, np.int64))
            # drop the top 2 bits: join keys stay non-negative int64
            out_hs.append((hs >> np.uint64(2)).astype(np.int64))
        if not out_ids:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "gh": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "gh": pa.array(np.concatenate(out_hs), pa.int64()),
            }
        )

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_dupspans_") if own_stage else stage_dir
    resume = not own_stage
    try:
        pairs = stage_checkpoint(
            lambda: _read_documents(sf_dir).map_batches(
                explode, batch_format="pyarrow"
            ),
            os.path.join(root, "pairs"),
            resume=resume,
            allow_empty=True,
        )
        dup_grams = None
        if pairs is not None:
            # df counting via the bucketed fold (the q_butterfly_count
            # lesson): gh-hash buckets co-locate every copy of a gram, one
            # pandas value_counts per bucket yields the exact df and the
            # df >= 2 filter shrinks the checkpoint in-task — Ray's
            # per-gh-key Aggregate paid seconds of per-key machinery on
            # the corpus-order gram stream
            n_gbuckets = shuffle_partitions(pairs.count())

            def gh_bucket(t: pa.Table) -> pa.Table:
                z = (
                    t.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
                    + np.uint64(0x9E3779B97F4A7C15)
                )
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                z = z ^ (z >> np.uint64(31))
                return t.append_column(
                    "gb", pa.array((z % np.uint64(n_gbuckets)).astype(np.int64))
                )

            def df_fold(g: pd.DataFrame) -> pd.DataFrame:
                vc = g["gh"].value_counts()
                return pd.DataFrame(
                    {"gh": vc.index[vc.to_numpy() >= 2].astype("int64")}
                )

            dup_grams = stage_checkpoint(
                lambda: pairs.map_batches(gh_bucket, batch_format="pyarrow")
                .groupby("gb")
                .map_groups(df_fold, batch_format="pandas"),
                os.path.join(root, "dup_grams"),
                resume=resume,
                allow_empty=True,
            )
        if dup_grams is None:
            # no shared gram anywhere: short-circuit to all zeros
            counts = pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_dup_grams": pd.Series(dtype="int64"),
                }
            )
        else:
            n_parts = shuffle_partitions(pairs.count())  # footer count

            def doc_bucket(t: pa.Table) -> pa.Table:
                z = (
                    t.column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                    + np.uint64(0x9E3779B97F4A7C15)
                )
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = z ^ (z >> np.uint64(31))
                return t.append_column(
                    "db", pa.array((z % np.uint64(n_parts)).astype(np.int64))
                )

            def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
                vc = g["doc_id"].value_counts()
                return pd.DataFrame(
                    {
                        "doc_id": vc.index.astype("int64"),
                        "n_dup_grams": vc.to_numpy().astype("int64"),
                    }
                )

            counts = (
                pairs.join(
                    dup_grams, join_type="inner", num_partitions=n_parts, on=("gh",)
                )
                .map_batches(doc_bucket, batch_format="pyarrow")
                .groupby("db")
                .map_groups(doc_fold, batch_format="pandas")
                .to_pandas()
            )
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)
    all_ids = _collect_sorted(
        _read_documents(sf_dir, ("doc_id",)),
        ("doc_id",),
        schema=pa.schema([("doc_id", pa.int64())]),
    )
    out = all_ids.merge(counts, on="doc_id", how="left")
    out["n_dup_grams"] = out["n_dup_grams"].fillna(0).astype("int64")
    out["has_dup_span"] = out["n_dup_grams"] > 0
    return out.reset_index(drop=True)


# ----------------------------------------------------------------------
# heavy hitters via sketch-then-verify: bounded-memory candidate generation
# plus an exact recount — the skew-diagnosis / hot-key-detection primitive.
# Engine-added brief; no reference analog.

HH_TOP_K = 25
HH_SKETCH_M = 512  # counters kept per batch sketch
_HH_BOUND_SENTINEL = "\x00bound"  # impossible word: tokens never contain \x00


def t_heavy_hitters(
    sf_dir: str,
    top_k: int = HH_TOP_K,
    sketch_m: int = HH_SKETCH_M,
    stats: dict = None,
):
    """Exact top-k words by total occurrences, found with a bounded sketch.

    Pass 1 keeps only the top ``sketch_m`` counters per batch (a mergeable
    truncated-counts sketch, SpaceSaving-style) plus the batch's drop
    bound — the count of the first truncated word, the most any missing
    word could have had.  One groupby merges sketches; a word's true count
    is then within [observed, observed + sum-of-bounds].  The merged
    sketch CERTIFIES itself: if ``total_bound < k-th largest observed``,
    no unseen word can reach the cut, so the true top-k is inside the
    candidate set {observed + total_bound >= k-th largest observed} and
    pass 2 recounts those few words EXACTLY over one more pruned scan.
    If the bound fails (sketch_m too small for the skew profile), the
    operator ESCALATES to the exact vocabulary-sized shuffle rather than
    return a possibly-wrong ranking — either way the output is exact,
    which is why this query has a plain SQL oracle.  At 100 TB the
    certified path finds hot keys with a ``sketch_m x n_blocks``-row
    shuffle regardless of vocabulary; pass ``stats={}`` to observe which
    path ran ('certified': bool)."""
    import ray
    from ray.data.aggregate import Sum

    def sketch(t: pa.Table) -> pa.Table:
        _, codes, dictionary = _word_codes(t)
        cnt = np.bincount(codes, minlength=len(dictionary))
        order = np.argsort(-cnt, kind="stable")  # count desc
        keep = order[: min(sketch_m, len(order))]
        keep = keep[cnt[keep] > 0]
        dropped = order[len(keep) :]
        bound = int(cnt[dropped[0]]) if dropped.size and cnt[dropped[0]] > 0 else 0
        words = dictionary.take(pa.array(keep, pa.int64())).to_pylist()
        counts = cnt[keep].astype(np.int64).tolist()
        words.append(_HH_BOUND_SENTINEL)
        counts.append(bound)
        return pa.table(
            {"word": pa.array(words, pa.string()), "cnt": pa.array(counts, pa.int64())}
        )

    merged = _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(sketch, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt")),
        ("word",),
        schema=pa.schema([("word", pa.string()), ("cnt", pa.int64())]),
    )  # sketch_m x n_blocks rows at most
    is_sent = merged["word"] == _HH_BOUND_SENTINEL
    total_bound = int(merged.loc[is_sent, "cnt"].sum())
    obs = merged[~is_sent].sort_values(["cnt", "word"], ascending=[False, True])
    if len(obs) == 0:
        return pd.DataFrame(
            {"word": pd.Series(dtype="object"), "tf": pd.Series(dtype="int64")}
        )
    kth_lower = int(obs["cnt"].iloc[: top_k].min())
    certified = total_bound < kth_lower and len(obs) >= top_k
    if stats is not None:
        stats["certified"] = certified
        stats["total_bound"] = total_bound
    if not certified:
        # an UNSEEN word's upper bound (total_bound) reaches the cut — no
        # candidate list drawn from the sketch can be proven complete.
        # Escalate to the exact vocabulary shuffle (the t_doc_frequency
        # shape) instead of returning a possibly-wrong ranking.
        def exact_partials(t: pa.Table) -> pa.Table:
            _, codes, dictionary = _word_codes(t)
            cnt = np.bincount(codes, minlength=len(dictionary))
            nz = cnt > 0
            return pa.table(
                {
                    "word": dictionary.filter(pa.array(nz)),
                    "tf": pa.array(cnt[nz].astype(np.int64), pa.int64()),
                }
            )

        full = _collect_sorted(
            _read_documents(sf_dir)
            .map_batches(exact_partials, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("tf", alias_name="tf")),
            ("word",),
            schema=pa.schema([("word", pa.string()), ("tf", pa.int64())]),
        )
        full = full.sort_values(["tf", "word"], ascending=[False, True]).head(top_k)
        return full.reset_index(drop=True)
    cands = obs[obs["cnt"] + total_bound >= kth_lower]["word"]
    cand_ref = ray.put(pa.array(cands, pa.string()))

    def recount_factory():
        cand_words = ray.get(cand_ref)

        def recount(t: pa.Table) -> pa.Table:
            _, codes, dictionary = _word_codes(t)
            pos = (
                pc.fill_null(pc.index_in(dictionary, value_set=cand_words), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            hit = pos[codes]
            valid = hit[hit >= 0]
            cnt = np.bincount(valid, minlength=len(cand_words))
            nz = cnt > 0
            return pa.table(
                {
                    "word": cand_words.take(
                        pa.array(np.flatnonzero(nz), pa.int64())
                    ),
                    "tf": pa.array(cnt[nz].astype(np.int64), pa.int64()),
                }
            )

        return recount

    # no second shuffle: recount partials are candidate-sized per block, so
    # the driver sums |cands| x n_blocks reduced rows directly (the
    # shuffle-count lesson — a groupby here cost seconds for nothing)
    exact = (
        _read_documents(sf_dir)
        .map_batches(
            warm_factory(("heavy_hitters", cand_ref.hex()), recount_factory),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("word", as_index=False)["tf"]
        .sum()
    )
    exact["tf"] = exact["tf"].astype("int64")
    exact = exact.sort_values(["tf", "word"], ascending=[False, True]).head(top_k)
    return exact.reset_index(drop=True)


# ----------------------------------------------------------------------
# retrieval chunking: overlapping token windows per document — the
# RAG-ingestion layout stage.  Engine-added brief; no reference analog.

CHUNK_TOKENS = 64
CHUNK_STRIDE = 32


def t_chunk_windows(sf_dir: str):
    """Overlapping token-window chunking (size 64, stride 32): one row per
    (doc, chunk) with its token offset and length — the layout a retrieval
    index ingests.  Chunks start at every stride boundary below the token
    count; the final chunk is truncated, and every non-empty doc emits at
    least one chunk.

    Pure vectorized map: the window placement depends only on each doc's
    token COUNT (one Arrow regex count — text length never matters), so no
    text leaves the scan and there is no shuffle at all."""

    def chunks(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.count_substring_regex(t.column("text"), r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_chunks = np.where(
            n_tokens == 0, 0, (np.maximum(n_tokens - 1, 0) // CHUNK_STRIDE) + 1
        )
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        chunk_id = np.concatenate(
            [np.arange(c) for c in n_chunks]
        ) if len(ids) else np.empty(0, np.int64)
        start = chunk_id * CHUNK_STRIDE
        length = np.minimum(CHUNK_TOKENS, n_tokens[doc_idx] - start)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "chunk_id": pa.array(chunk_id.astype(np.int64), pa.int64()),
                "start_tok": pa.array(start.astype(np.int64), pa.int64()),
                "n_toks": pa.array(length.astype(np.int64), pa.int64()),
            }
        )

    out = _read_documents(sf_dir).map_batches(chunks, batch_format="pyarrow")
    return (
        _collect_sorted(
            out, ("doc_id", "chunk_id"), lambda: chunks(_empty_docs())
        )
    )


# ----------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis & Spirakis 2006 A-Res):
# the standard way to draw a k-doc training subsample proportional to a
# weight column with ONE streaming pass — each doc gets the deterministic
# key ln(u)/w (u = md5-uniform in (0,1], so reruns and the oracle replay
# the identical draw) and the k largest keys win.

WEIGHTED_SAMPLE_K = 64
WEIGHTED_SAMPLE_SALT = ":ws42"
_TWO53 = 9007199254740992  # 2^53: the md5-uniform grid (exact in float64)


def t_weighted_sample(sf_dir: str):
    """Draw WEIGHTED_SAMPLE_K docs without replacement, probability
    proportional to n_chars.  Scale shape: a per-batch vectorized key pass
    + the local-top-k/driver-merge from relational._topk — at most k rows
    per block reach the driver, no global sort, no shuffle.  u is built on
    the 2^53 grid ((h % 2^53 + 1) / 2^53 — every step exact in float64, so
    the engine and DuckDB compute bit-identical u); the ln/divide ulp gap
    between libms is ~1e-16 relative while adjacent key order statistics
    sit orders of magnitude apart, the same portability argument as
    t_temperature_sample's sqrt.  Zero-weight docs are excluded (their key
    would be -inf — E&S semantics: probability 0)."""

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n_chars"), 0))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        (str(i) + WEIGHTED_SAMPLE_SALT).encode()
                    ).digest()[8:],
                    "little",
                )
                % _TWO53
                for i in ids
            ),
            np.int64,
            len(ids),
        )
        u = (h.astype(np.float64) + 1.0) / float(_TWO53)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": t.column("n_chars"),
                "skey": pa.array(np.log(u) / w),
            }
        )

    # lazy: relational imports this module at load time, so the reverse
    # import must happen at call time
    from .relational import _topk

    ds = _read_documents(sf_dir, ("doc_id", "n_chars")).map_batches(
        score, batch_format="pyarrow"
    )
    top = _topk(
        ds,
        WEIGHTED_SAMPLE_K,
        keys=("skey", "doc_id"),
        descending=(True, False),
        empty_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("skey", pa.float64()),
            ]
        ),
    )
    return (
        top[["doc_id", "n_chars"]]
        .astype({"doc_id": "int64", "n_chars": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005): the frequency-estimate
# member of the sketch family (HLL = distinct count, heavy-hitters = exact
# top-k, CMS = point frequency with one-sided error).  Estimates
# overcount, never undercount; probes of absent words surface collision
# noise bounded by 2N/w per row.

CMS_D = 4
CMS_W = 1024
CMS_PROBES = ("join", "batch", "filter", "order", "zzz-absent")


def _cms_pos(r: int, word: str) -> int:
    """Row-r counter position: md5-lower-64 of 'r:word' mod CMS_W — the
    same md5_number_lower arithmetic DuckDB replays (see the oracle)."""
    return (
        int.from_bytes(
            hashlib.md5(f"{r}:{word}".encode()).digest()[8:], "little"
        )
        % CMS_W
    )


def t_cms_wordcounts(sf_dir: str):
    """Point-frequency estimates for CMS_PROBES via a count-min sketch.

    Scale shape: each block collapses to its local d x w counter matrix —
    at most CMS_D x CMS_W = 4096 (r, pos, c) rows leave the map stage per
    block regardless of token count — merged with the two-regime plan
    (sums are associative, so driver pandas below the bound, distributed
    groupby above).  Exact counting of an unbounded vocabulary would
    shuffle the vocabulary; the sketch shuffles a fixed 32 KiB of state.
    Tokenization shares _word_codes so the probe semantics match every
    other word-statistics stage."""

    def partial(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        mat = np.zeros((CMS_D, CMS_W), np.int64)
        if len(codes):
            cnt = np.bincount(codes, minlength=len(dictionary))
            for wi, word in enumerate(dictionary.to_pylist()):
                c = int(cnt[wi])
                if c == 0:
                    continue
                for r in range(CMS_D):
                    mat[r, _cms_pos(r, word)] += c
        rr, pp = np.nonzero(mat)
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64)),
                "pos": pa.array(pp.astype(np.int64)),
                "c": pa.array(mat[rr, pp]),
            }
        )

    from ray.data.aggregate import Sum

    from .relational import PIVOT_DRIVER_MAX_ROWS  # lazy (import cycle)

    parts = (
        _read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        cells = _collect_sorted(
            parts,
            ("r",),
            schema=pa.schema(
                [("r", pa.int64()), ("pos", pa.int64()), ("c", pa.int64())]
            ),
        ).groupby(["r", "pos"], as_index=False)["c"].sum()
    else:
        cells = (
            parts.groupby(["r", "pos"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
    mat = np.zeros((CMS_D, CMS_W), np.int64)
    mat[cells["r"].to_numpy(np.int64), cells["pos"].to_numpy(np.int64)] = (
        cells["c"].to_numpy(np.int64)
    )
    out = pd.DataFrame(
        {
            "word": list(CMS_PROBES),
            "est": [
                int(min(mat[r, _cms_pos(r, w)] for r in range(CMS_D)))
                for w in CMS_PROBES
            ],
        }
    )
    out["est"] = out["est"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


# ----------------------------------------------------------------------
# fixed-k uniform per-group sampling (the eval-split primitive): exactly
# k docs per language, uniform without replacement, deterministic.
# Complements t_stratified_sample (RATE-based keep, count varies) and
# t_weighted_sample (global draw, probability ∝ weight).

GROUP_SAMPLE_K = 16
GROUP_SAMPLE_SALT = ":gs7"


def t_group_uniform_sample(sf_dir: str):
    """Exactly GROUP_SAMPLE_K docs per lang (fewer when the group is
    smaller), drawn uniformly without replacement by ranking on an
    md5-hex key — RNG-free, so retries/repartitioning/reruns return the
    identical draw and the oracle replays it.

    Scale shape: per-group local top-k inside every block (vectorized
    sort + head-k; at most |langs| x k rows leave a block whatever its
    row count), then one driver merge of the bounded partials — the same
    no-global-sort argument as relational._topk, generalized per-group.
    Keys are md5 HEX PREFIX strings, whose lexicographic order is the
    unsigned order of the hash (the t_shuffle_shards convention), so no
    signedness trap crosses the engine/SQL boundary."""

    def local_head(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        hk = [
            hashlib.md5(f"{i}{GROUP_SAMPLE_SALT}".encode()).hexdigest()[:16]
            for i in ids
        ]
        df = pd.DataFrame(
            {
                "lang": t.column("lang").to_pandas(),
                "doc_id": ids,
                "hk": hk,
            }
        )
        head = (
            df.sort_values(["lang", "hk", "doc_id"])
            .groupby("lang", sort=False)
            .head(GROUP_SAMPLE_K)
        )
        # pin the schema: from_pandas infers NULL-typed columns from an
        # all-empty object column, which would poison the block union
        return pa.table(
            {
                "lang": pa.array(head["lang"].tolist(), pa.string()),
                "doc_id": pa.array(head["doc_id"].to_numpy(np.int64)),
                "hk": pa.array(head["hk"].tolist(), pa.string()),
            }
        )

    parts = _collect_sorted(
        _read_documents(sf_dir, ("doc_id", "lang")).map_batches(
            local_head, batch_format="pyarrow"
        ),
        ("doc_id",),
        schema=pa.schema(
            [("lang", pa.string()), ("doc_id", pa.int64()), ("hk", pa.string())]
        ),
    )  # bounded: |langs| x k x blocks rows
    out = (
        parts.sort_values(["lang", "hk", "doc_id"])
        .groupby("lang", sort=False)
        .head(GROUP_SAMPLE_K)[["lang", "doc_id"]]
        .astype({"doc_id": "int64"})
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return out


# ----------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169): select
# pretraining data whose hashed-n-gram feature distribution matches a
# TARGET domain, by sampling with probability proportional to the
# importance weight p_target(x) / p_source(x).

DSIR_BUCKETS = 1024          # hashed feature space (no OOV by construction)
DSIR_TARGET_LANG = "en"      # the target domain: English docs
DSIR_K = 64                  # sample size
DSIR_SALT = "dsir:"          # feature-hash salt
DSIR_GUMBEL_SALT = "dsirg:"  # per-doc Gumbel-noise salt


def _dsir_buckets_of(dictionary: pa.Array) -> np.ndarray:
    """Feature bucket per DISTINCT word (hash once per dictionary entry,
    not per token) — md5_number_lower(salt || word) % B, the same integer
    arithmetic the oracle replays."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5((DSIR_SALT + w).encode()).digest()[8:], "little"
            )
            % DSIR_BUCKETS
            for w in dictionary.to_pylist()
        ),
        np.int64,
        len(dictionary),
    )


def t_dsir_sample(sf_dir: str):
    """DSIR data selection: draw DSIR_K docs with probability proportional
    to the importance weight p_target / p_source over HASHED unigram
    features — the importance-resampling counterpart of t_ccnet_buckets'
    cutoff filter (both are LM-guided corpus selection; DSIR reweights
    toward a target domain instead of thresholding quality).

    Three bounded passes, nothing corpus-sized on the driver:
      1. ONE combiner pass builds BOTH hashed-unigram models (target =
         DSIR_TARGET_LANG docs, source = all docs) as (bucket, c_all,
         c_tgt) partials — the reduced table is B-bounded (1024 rows),
         not vocabulary-bounded: feature hashing IS the OOV story, like
         the paper's.
      2. The driver turns counts into a B-length log-ratio array
         diff_b = ln((c_tgt+1)/(N_tgt+B)) - ln((c_all+1)/(N_all+B))
         (add-one smoothing keeps an EMPTY target defined: every bucket
         then scores ln(1/B)-ln(p_src) — uniform target) and broadcasts
         it once.
      3. A scoring pass computes log w(doc) = sum_b c_{doc,b} * diff_b
         vectorized (np.unique over doc*B+bucket keys, then bincount),
         plus the Gumbel-top-k sampling key logw + (-ln(-ln(u))) with u
         on the exact 2^53 md5 grid (t_weighted_sample's RNG-free
         without-replacement trick — Gumbel-max sampling is exactly
         proportional-to-weight); per-block local top-k + driver merge,
         never a global sort.

    Float portability rides the established arguments: u is grid-exact
    both sides, ln/divide ulp gaps are ~1e-16 relative while adjacent
    order statistics sit far apart (t_weighted_sample), and milli-unit
    rounding of the transcendental logw never lands on a boundary
    (t_bigram_logprob)."""
    import ray
    from ray.data.aggregate import Sum

    B = DSIR_BUCKETS

    def count_partials(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        tok_b = _dsir_buckets_of(dictionary)[codes] if len(dictionary) else codes
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        is_tgt = (langs == DSIR_TARGET_LANG)[parent] if len(parent) else codes > 0
        c_all = np.bincount(tok_b, minlength=B)
        c_tgt = np.bincount(tok_b[is_tgt], minlength=B)
        nz = np.flatnonzero(c_all)  # c_tgt <= c_all everywhere
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_all": pa.array(c_all[nz], pa.int64()),
                "c_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    counts = _collect_sorted(
        _read_documents(sf_dir, ("doc_id", "text", "lang"))
        .map_batches(count_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_all", alias_name="c_all"), Sum("c_tgt", alias_name="c_tgt")),
        ("bucket",),
        schema=pa.schema(
            [("bucket", pa.int64()), ("c_all", pa.int64()), ("c_tgt", pa.int64())]
        ),
    )
    ca = np.zeros(B, np.float64)
    ct = np.zeros(B, np.float64)
    if len(counts):
        ca[counts["bucket"].to_numpy(np.int64)] = counts["c_all"].to_numpy(np.int64)
        ct[counts["bucket"].to_numpy(np.int64)] = counts["c_tgt"].to_numpy(np.int64)
    na, nt = float(ca.sum()), float(ct.sum())
    diff = np.log((ct + 1.0) / (nt + B)) - np.log((ca + 1.0) / (na + B))
    dref = ray.put(diff)

    class Score:
        def __init__(self):
            self.diff = ray.get(dref)

        def __call__(self, t: pa.Table) -> pa.Table:
            parent, codes, dictionary = _word_codes(t)
            n_words = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
            if len(parent):
                tok_b = _dsir_buckets_of(dictionary)[codes]
                keys, c = np.unique(parent * B + tok_b, return_counts=True)
                contrib = c.astype(np.float64) * self.diff[keys % B]
                logw = np.bincount(
                    keys // B, weights=contrib, minlength=t.num_rows
                )
            else:
                logw = np.zeros(t.num_rows)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(
                            (DSIR_GUMBEL_SALT + str(i)).encode()
                        ).digest()[8:],
                        "little",
                    )
                    % _TWO53
                    for i in ids
                ),
                np.int64,
                len(ids),
            )
            u = (h.astype(np.float64) + 1.0) / float(_TWO53)
            gkey = logw + -np.log(-np.log(u))
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "lang": t.column("lang"),
                    "n_words": pa.array(n_words, pa.int64()),
                    "logw_x1e3": pa.array(
                        np.floor(logw * 1000.0 + 0.5).astype(np.int64), pa.int64()
                    ),
                    "gkey": pa.array(gkey, pa.float64()),
                }
            )

    from .relational import _topk

    ds = _read_documents(sf_dir, ("doc_id", "text", "lang")).map_batches(
        warm_factory(("t_dsir", dref.hex()), Score), batch_format="pyarrow"
    )
    top = _topk(
        ds,
        DSIR_K,
        keys=("gkey", "doc_id"),
        descending=(True, False),
        empty_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("n_words", pa.int64()),
                ("logw_x1e3", pa.int64()),
                ("gkey", pa.float64()),
            ]
        ),
    )
    out = top[["doc_id", "lang", "n_words", "logw_x1e3"]].copy()
    for c in ("doc_id", "n_words", "logw_x1e3"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# asymmetric containment dedup: C(a->b) = |Sa ∩ Sb| / |Sa| — catches a
# small document embedded in a big one, the near-dup class symmetric
# Jaccard provably misses (j <= |Sa|/|Sb| however perfect the overlap).

CONTAIN_NUM, CONTAIN_DEN = 9, 10  # threshold 0.9 as exact integers
CONTAIN_HOT_MAX = 1024  # global hot shingles avoided by probe selection
CONTAIN_HOT_MIN_DF = 8  # below this df a shingle is not worth avoiding


class ContainShingleRows:
    """Warm stage: one (hv int64, doc id) row per DISTINCT 3-token shingle
    (the t_minhash_pairs shingle/_hash64 definitions).  With
    ``probe_only`` it emits just the doc's GUARANTEED-RECALL probe subset:
    if C(a->b) >= NUM/DEN then at most floor(|Sa| * (DEN-NUM) / DEN)
    shingles of a are missing from b, so ANY M+1 of a's shingles must hit
    b — the choice is free, and choosing the globally RAREST ones (hot
    set broadcast; lexsort (is_hot, hv)) minimizes join fanout without
    touching recall, the PPJoin prefix-filter idea with a df-bounded
    hot list instead of a total df order."""

    def __init__(self, probe_only: bool = False, hot_ref=None, id_out="doc_b"):
        import ray

        self.probe_only = probe_only
        self.hot = ray.get(hot_ref) if hot_ref is not None else None
        self.id_out = id_out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, hvs = [], []
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            sh = _shingles(text or "")
            if not sh:
                continue  # no shingles: containment is undefined, skip
            hv = np.unique(
                np.fromiter((_hash64(s) for s in sh), np.uint64, len(sh))
            )
            if self.probe_only:
                m1 = (len(hv) * (CONTAIN_DEN - CONTAIN_NUM)) // CONTAIN_DEN + 1
                if self.hot is not None and len(hv) > m1:
                    is_hot = np.isin(hv, self.hot)
                    order = np.lexsort((hv, is_hot))
                    hv = hv[order[:m1]]
                else:
                    hv = hv[:m1]
            ids_out.extend([did] * len(hv))
            hvs.append(hv)
        flat = np.concatenate(hvs) if hvs else np.zeros(0, np.uint64)
        return pa.table(
            {
                "hv": pa.array(flat.view(np.int64)),
                self.id_out: pa.array(np.asarray(ids_out, np.int64)),
            }
        )


def _verify_containment(docs_ds, pairs_ds):
    """Exact containment verification of candidate (doc_a, doc_b) pairs —
    the `_verify_pairs` plan (candidate-id broadcast semi-join, hashed
    feature sets, two compacted joins, in-stage scoring) with the
    asymmetric scorer: keep iff DEN * |A ∩ B| >= NUM * |A|, the integer
    cross-multiplied threshold (a float n/|A| >= 0.9 compare can disagree
    with the oracle's integer test exactly at the rounding boundary)."""
    import ray

    from .relational import round_half_away

    empty = pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "n_inter": pd.Series(dtype="int64"),
            "size_a": pd.Series(dtype="int64"),
            "containment": pd.Series(dtype="float64"),
        }
    )
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.schema() is None or pairs_ds.count() == 0:
        return empty

    def _both_ids(t: pa.Table) -> pa.Table:
        a = t.select(["doc_a"]).rename_columns(["cand_id"])
        b = t.select(["doc_b"]).rename_columns(["cand_id"])
        return pa.concat_tables([a, b])

    cand_ids = pairs_ds.map_batches(_both_ids, batch_format="pyarrow").unique(
        "cand_id"
    )
    ids_ref = ray.put(pa.array(cand_ids, pa.int64()))
    keep_and_hash = warm_stage(
        _KeepAndHash,
        factory=ShingleSetHasher,
        id_col="doc_id",
        ids_ref=ids_ref,
    )
    n_parts = max(1, min(8, len(cand_ids) // 10_000 + 1))
    sets_ds = (
        docs_ds.map_batches(keep_and_hash, batch_format="pyarrow")
        .repartition(n_parts)
        .materialize()
    )

    def _rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return fn

    side_a = sets_ds.map_batches(_rename(["doc_a", "sh_a"]), batch_format="pyarrow")
    side_b = sets_ds.map_batches(_rename(["doc_b", "sh_b"]), batch_format="pyarrow")
    pairs_ds = pairs_ds.repartition(n_parts).materialize()
    joined = pairs_ds.join(
        side_a, join_type="inner", num_partitions=n_parts, on=("doc_a",)
    ).repartition(n_parts)
    joined = joined.join(
        side_b, join_type="inner", num_partitions=n_parts, on=("doc_b",)
    )

    def verify(t: pa.Table) -> pa.Table:
        keep_a, keep_b, inters, sizes, vals = [], [], [], [], []
        for a, b, sa, sb in zip(
            t.column("doc_a").to_pylist(),
            t.column("doc_b").to_pylist(),
            t.column("sh_a").to_pylist(),
            t.column("sh_b").to_pylist(),
        ):
            A = np.frombuffer(sa, dtype=np.uint64)
            B = np.frombuffer(sb, dtype=np.uint64)
            inter = int(np.intersect1d(A, B, assume_unique=True).size)
            if CONTAIN_DEN * inter >= CONTAIN_NUM * A.size:
                keep_a.append(a)
                keep_b.append(b)
                inters.append(inter)
                sizes.append(int(A.size))
                vals.append(round_half_away(inter / A.size, 4))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "n_inter": pa.array(inters, pa.int64()),
                "size_a": pa.array(sizes, pa.int64()),
                "containment": pa.array(vals, pa.float64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return empty
    out["n_inter"] = out["n_inter"].astype("int64")
    out["size_a"] = out["size_a"].astype("int64")
    out["containment"] = out["containment"].astype("float64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def t_containment_dupes(sf_dir: str):
    """Asymmetric near-CONTAINMENT pairs over the shared 3-token shingle
    space: ordered (doc_a, doc_b) with |Sa ∩ Sb| / |Sa| >= 0.9 — the
    doc-inside-doc duplication class (quoted articles, boilerplate-wrapped
    reposts) that symmetric Jaccard structurally misses, completing the
    dedup family next to t_minhash_pairs / t_ngram_jaccard_dupes /
    t_dup_spans.

    Candidate generation is EXACT-recall by pigeonhole: a pair above
    threshold leaves at most M = floor(|Sa|/10) of a's shingles missing
    from b, so probing a's M+1 rarest shingles against the full shingle
    index must produce the pair.  Rarest = non-hot-first (one bounded
    heavy-hitter pass — CONTAIN_HOT_MAX shingles with df >=
    CONTAIN_HOT_MIN_DF — broadcast once), which is PPJoin's prefix-filter
    fanout bound with a fixed-size hot list instead of a global df sort;
    recall never depends on the choice, only fanout does.  One keyed hash
    exchange joins probes to the index (data-proportional partitions),
    pairs dedupe distributed, and `_verify_containment` scores exactly
    with the integer cross-multiplied threshold.  Texts never shuffle;
    the two shingle scans recompute rather than materialize the
    corpus-order gram table (the tfidf two-pass discipline)."""
    import ray

    from .relational import _join_pad, _topk, _two_regime_sum
    from .sizing import shuffle_partitions

    ds = _read_documents(sf_dir)

    def hot_partial(t: pa.Table) -> pa.Table:
        rows = ContainShingleRows(id_out="doc_b")(t)
        tt = pa.table(
            {
                "hv": rows.column("hv"),
                "cnt": pa.array(np.ones(len(rows), np.int64)),
            }
        )
        g = tt.group_by("hv").aggregate([("cnt", "sum")])
        return g.rename_columns(["hv", "cnt"])

    red, _n = _two_regime_sum(
        ds.map_batches(hot_partial, batch_format="pyarrow"), ["hv"], ["cnt"]
    )
    hot_df = _topk(
        red,
        CONTAIN_HOT_MAX,
        keys=("cnt", "hv"),
        descending=(True, False),
        empty_schema=pa.schema([("hv", pa.int64()), ("cnt", pa.int64())]),
    )
    hot = (
        hot_df.loc[hot_df["cnt"] >= CONTAIN_HOT_MIN_DF, "hv"]
        .to_numpy(np.int64)
        .view(np.uint64)
    )
    hot_ref = ray.put(np.sort(hot))

    index_ds = ds.map_batches(
        warm_stage(ContainShingleRows, id_out="doc_b"), batch_format="pyarrow"
    )
    probe_ds = ds.map_batches(
        warm_stage(
            ContainShingleRows, probe_only=True, hot_ref=hot_ref, id_out="doc_a"
        ),
        batch_format="pyarrow",
    )

    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_parts = shuffle_partitions(n_docs * 48)  # ~mean shingles per doc

    joined = _join_pad(
        probe_ds, pa.schema([("hv", pa.int64()), ("doc_a", pa.int64())])
    ).join(
        _join_pad(
            index_ds, pa.schema([("hv", pa.int64()), ("doc_b", pa.int64())])
        ),
        join_type="inner",
        num_partitions=n_parts,
        on=("hv",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_a"), t.column("doc_b")))
        return t.select(["doc_a", "doc_b"]).group_by(["doc_a", "doc_b"]).aggregate([])

    # global pair dedup: bucket-hash co-location + one vectorized
    # drop_duplicates per bucket.  Ray's per-(a, b)-key Aggregate spent
    # ~11 s at sf0.1 deduplicating a 261k-row pair stream that was
    # already 99% distinct (per-block pre-dedup above); the bucketed
    # fold is the same exchange volume with the per-key machinery
    # replaced by one pandas kernel per bucket (the q_butterfly_count
    # lesson applied to dedup).
    n_pb = max(8, n_parts)

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        z = a * np.uint64(0x9E3779B97F4A7C15) ^ (b + np.uint64(0x85EBCA77C2B2AE63))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = z ^ (z >> np.uint64(31))
        return t.append_column(
            "pb", pa.array((z % np.uint64(n_pb)).astype(np.int64))
        )

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]
        return out.astype({"doc_a": "int64", "doc_b": "int64"})

    pairs = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(dedup_bucket, batch_format="pandas")
    )
    return _verify_containment(ds, pairs)


QC_BUCKETS = 1024  # hashed feature space of the linear quality scorer
QC_SALT = "qw:"


def _qc_weights():
    """The classifier's integer weight table: weight of hash bucket b is
    md5-lower-64("qw:b") % 21 - 10, i.e. a deterministic integer in
    [-10, 10] the DuckDB oracle regenerates verbatim — the weights are a
    stand-in for any trained linear model shipped to workers."""
    import numpy as np

    w = np.empty(QC_BUCKETS, np.int64)
    for b in range(QC_BUCKETS):
        hv = int.from_bytes(
            hashlib.md5(f"{QC_SALT}{b}".encode()).digest()[8:], "little"
        )
        w[b] = hv % 21 - 10
    return w


def t_quality_classifier(sf_dir: str):
    """Hashed linear quality classifier (the fastText-style model-scoring
    stage): tokens hash into QC_BUCKETS features, the broadcast integer
    weight table scores every occurrence, and a document keeps iff its
    summed score is non-negative.  This is the batched-model-inference
    shape — swap `_qc_weights` for real trained weights and nothing else
    changes — kept INTEGER end to end so the DuckDB oracle replays the
    exact same scores (md5_number_lower both sides, no sigmoid float).

    Plan: one zero-shuffle streaming pass.  Per block the lowered text
    splits Arrow-side, tokens dictionary-encode so md5 runs once per
    UNIQUE word (not per occurrence), the bucket weights gather from the
    module-level table, and per-doc scores accumulate with one
    np.add.at — no Python row loop anywhere.  The weight table is
    process-global state (built once per worker), the canonical broadcast
    small side."""
    import numpy as np

    weights = _qc_weights()

    def score(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), r"\s+"
        ).combine_chunks()
        offsets = toks.offsets.to_numpy()
        offsets = offsets - offsets[0]
        parent = np.repeat(np.arange(n_docs), np.diff(offsets))
        enc = pc.list_flatten(toks).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        words = enc.dictionary.to_pylist()
        # drop split artifacts (leading/trailing whitespace yields '')
        bucket = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
                % QC_BUCKETS
                if w
                else -1
                for w in words
            ),
            np.int64,
            len(words),
        )
        keep = bucket[codes] >= 0
        parent, codes = parent[keep], codes[keep]
        wt = weights[bucket[codes]] if len(codes) else np.empty(0, np.int64)
        scores = np.zeros(n_docs, np.int64)
        np.add.at(scores, parent, wt)
        n_tokens = np.zeros(n_docs, np.int64)
        np.add.at(n_tokens, parent, 1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "keep": pa.array((scores >= 0).astype(np.int64), pa.int64()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(score, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: score(_empty_docs()))


KEYWORD_TOP_K = 3


def t_keyword_extraction(sf_dir: str):
    """Per-document keyword extraction: the top-3 terms by TF-IDF with a
    deterministic (score DESC, word ASC) tie-break — the document-tagging
    stage of a training-data pipeline (topic bucketing, dedup keys,
    retrieval labels all consume this).

    INTEGER ranking end to end: the IDF is quantized ONCE per word to
    micro-units (floor(ln(N/df)*1e6 + 0.5) — ln is transcendental, so no
    true value sits on the rounding boundary) and the score is the exact
    int64 product tf * idf6, so the top-k cut and tie-break are pure
    integer/string comparisons with no float-order risk anywhere.
    Zero-score words (df == N) are cut — every doc would tie on them
    arbitrarily otherwise.

    Plan mirrors t_tfidf: pass 1 reduces the corpus to the vocab-sized
    (word, df) table, pass 2 broadcasts it (ray.put once, read per
    worker) and each block ranks its own docs vectorized — one lexsort
    over the block's (doc, -score, word-rank) triples, never a per-doc
    Python loop; word-rank comes from argsort of the block dictionary
    (UTF-8 byte order == codepoint order, matching DuckDB's binary
    collation).  No second shuffle exists."""
    import ray
    from ray.data.aggregate import Sum

    def df_partials(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        pair_codes = np.unique(parent * vocab + codes) % vocab if codes.size else codes
        df = np.bincount(pair_codes, minlength=vocab)
        present = df > 0
        return pa.table(
            {
                "word": dictionary.filter(pa.array(present)),
                "df": pa.array(df[present], pa.int64()),
            }
        )

    df_table = _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df")),
        ("word",),
        schema=pa.schema([("word", pa.string()), ("df", pa.int64())]),
    )
    n_total = _read_documents(sf_dir, columns=("doc_id",)).count()
    idf6_global = (
        np.floor(
            np.log(float(n_total) / df_table["df"].to_numpy(np.float64)) * 1e6 + 0.5
        ).astype(np.int64)
        if len(df_table)
        else np.empty(0, np.int64)
    )
    bref = ray.put((pa.array(df_table["word"], pa.string()), idf6_global))

    class Keywords:
        def __init__(self):
            self.words, self.idf6 = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            parent, codes, dictionary = _word_codes(t)
            vocab = len(dictionary)
            doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            if codes.size:
                keys, tf = np.unique(parent * vocab + codes, return_counts=True)
                pair_parent, pair_code = keys // vocab, keys % vocab
            else:
                pair_parent = pair_code = tf = codes.astype(np.int64)
            pos = (
                pc.fill_null(pc.index_in(dictionary, value_set=self.words), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            if len(self.idf6):
                idf6_by_code = self.idf6[np.where(pos >= 0, pos, 0)]
                idf6_by_code[pos < 0] = 0
            else:
                idf6_by_code = np.zeros(vocab, np.int64)
            score = tf.astype(np.int64) * idf6_by_code[pair_code]
            keep = score > 0
            pair_parent, pair_code = pair_parent[keep], pair_code[keep]
            tf, score = tf[keep], score[keep]
            # word rank: argsort of the block dictionary (codepoint order)
            wlist = dictionary.to_pylist()
            wrank = np.empty(vocab, np.int64)
            wrank[np.argsort(np.array(wlist, object))] = np.arange(vocab)
            order = np.lexsort((wrank[pair_code], -score, pair_parent))
            pp = pair_parent[order]
            starts = np.flatnonzero(np.r_[True, pp[1:] != pp[:-1]])
            sizes = np.diff(np.r_[starts, len(pp)])
            rn = np.arange(len(pp)) - np.repeat(starts, sizes)
            cut = rn < KEYWORD_TOP_K
            sel = order[cut]
            wl = np.array(wlist, object) if vocab else np.empty(0, object)
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[pair_parent[sel]], pa.int64()),
                    "kw_rank": pa.array(rn[cut] + 1, pa.int64()),
                    "word": pa.array(list(wl[pair_code[sel]]), pa.string()),
                    "tf": pa.array(tf[order][cut].astype(np.int64), pa.int64()),
                    "score_x1e6": pa.array(score[order][cut], pa.int64()),
                }
            )

    out = _read_documents(sf_dir).map_batches(
        warm_factory(("t_keywords", bref.hex()), Keywords), batch_format="pyarrow"
    )
    return _collect_sorted(
        out, ("doc_id", "kw_rank"), lambda: Keywords()(_empty_docs())
    )


CDC_DIVISOR = 16  # expected chunk length in tokens (cut when md5 % D == 0)
CDC_BUCKETS = 64


def t_cdc_dedup(sf_dir: str, stage_dir: str = None):
    """Content-defined-chunking dedup audit (the FastCDC/backup-dedup idea
    at token granularity, the LLM-corpus variant of ExactSubstr): a chunk
    boundary falls AFTER every token whose md5 is 0 mod CDC_DIVISOR — a
    pure content condition, so an edit anywhere in a document only
    re-chunks its local neighborhood and identical passages align to
    identical chunks regardless of position.  Per document: chunk count,
    how many of its chunks also appear elsewhere in the corpus (or twice
    in the same doc), and the token mass those duplicated chunks cover —
    the dedup-savings estimate a 100 TB corpus pass would act on.

    Plan: pass A chunks each block vectorized (_word_codes, cut mask via
    md5 once per UNIQUE word, exclusive-cumsum chunk ids; only the
    per-chunk md5 of the joined text is a bounded Python loop — ~1/D of
    the token count) and emits narrow (doc_id, hash, h64, n_tok) rows to
    a parquet stage checkpoint (consumed twice, crash-resume via
    ``stage_dir``).  Pass B is ONE bucketed exchange on the chunk hash
    (bucket = h64 % CDC_BUCKETS routes; the full hex hash is the group
    key inside the bucket, so a low-64 collision cannot over-mark):
    each bucket counts global occurrences and emits per-doc dup partials.
    Per-doc totals ride `_two_regime_sum`; only fixed-width hash rows
    ever shuffle, never text."""
    import os as _os
    import shutil
    import tempfile

    import ray.data as rd

    from .staging import stage_checkpoint

    def chunker(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        n = len(codes)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        words = dictionary.to_pylist()
        cutw = np.fromiter(
            (
                bool(w)
                and int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
                % CDC_DIVISOR
                == 0
                for w in words
            ),
            bool,
            len(words),
        )
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "h": pa.array([], pa.string()),
                "h64": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
            }
        )
        if not n:
            return empty
        cut = cutw[codes]
        excl = np.r_[0, np.cumsum(cut)[:-1]]
        starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        sizes = np.diff(np.r_[starts, n])
        chunk_id = excl - np.repeat(excl[starts], sizes)
        key_change = np.r_[
            True, (parent[1:] != parent[:-1]) | (chunk_id[1:] != chunk_id[:-1])
        ]
        gstarts = np.flatnonzero(key_change)
        gsizes = np.diff(np.r_[gstarts, n])
        toks = np.array(words, object)[codes]
        hexes, h64s = [], np.empty(len(gstarts), np.int64)
        for j, (s0, sz) in enumerate(zip(gstarts, gsizes)):
            dg = hashlib.md5(" ".join(toks[s0 : s0 + sz]).encode()).digest()
            hexes.append(dg.hex())
            h64s[j] = int.from_bytes(dg[8:], "little") % (1 << 63)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parent[gstarts]], pa.int64()),
                "h": pa.array(hexes, pa.string()),
                "h64": pa.array(h64s, pa.int64()),
                "n_tok": pa.array(gsizes.astype(np.int64), pa.int64()),
            }
        )

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_cdc_") if own_stage else stage_dir
    try:
        chunks = stage_checkpoint(
            lambda: _read_documents(sf_dir).map_batches(
                chunker, batch_format="pyarrow"
            ),
            _os.path.join(root, "chunks"),
            resume=not own_stage,
            allow_empty=True,
        )
        all_docs = _collect_sorted(
            _read_documents(sf_dir, columns=("doc_id",)),
            ("doc_id",),
            schema=pa.schema([("doc_id", pa.int64())]),
        )
        out = pd.DataFrame({"doc_id": all_docs["doc_id"].astype("int64")})
        for c in ("n_chunks", "n_dup_chunks", "n_dup_tokens"):
            out[c] = np.zeros(len(out), np.int64)
        if chunks is None:
            return out.sort_values("doc_id").reset_index(drop=True)

        # per-doc chunk totals: zero-exchange combiner
        totals_parts = chunks.map_batches(
            lambda t: t.group_by("doc_id")
            .aggregate([("doc_id", "count")])
            .rename_columns(["doc_id", "n"]),
            batch_format="pyarrow",
        )
        totals, _ = _two_regime_sum_rel(totals_parts, ["doc_id"], ["n"])

        def mark_bucket(g: pd.DataFrame) -> pd.DataFrame:
            cnt = g.groupby("h")["h"].transform("size")
            dup = g[cnt >= 2]
            if not len(dup):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "n_dup_chunks": pd.Series(dtype="int64"),
                        "n_dup_tokens": pd.Series(dtype="int64"),
                    }
                )
            p = (
                dup.groupby("doc_id", as_index=False)
                .agg(n_dup_chunks=("h", "size"), n_dup_tokens=("n_tok", "sum"))
                .astype(
                    {
                        "doc_id": "int64",
                        "n_dup_chunks": "int64",
                        "n_dup_tokens": "int64",
                    }
                )
            )
            return p

        def add_bucket(t: pa.Table) -> pa.Table:
            h64 = t.column("h64").to_numpy(zero_copy_only=False)
            return t.append_column(
                "bk", pa.array((h64 % CDC_BUCKETS).astype(np.int64))
            )

        dup_parts = (
            chunks.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bk")
            .map_groups(
                lambda g: mark_bucket(g.drop(columns=["bk"])),
                batch_format="pandas",
            )
        )
        dups, _ = _two_regime_sum_rel(
            dup_parts, ["doc_id"], ["n_dup_chunks", "n_dup_tokens"]
        )

        from .frames import typed_collect

        tdf = typed_collect(
            totals, pa.schema([("doc_id", pa.int64()), ("n", pa.int64())])
        )
        ddf = typed_collect(
            dups,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_dup_chunks", pa.int64()),
                    ("n_dup_tokens", pa.int64()),
                ]
            ),
        )
        out = (
            out[["doc_id"]]
            .merge(tdf.rename(columns={"n": "n_chunks"}), on="doc_id", how="left")
            .merge(ddf, on="doc_id", how="left")
        )
        for c in ("n_chunks", "n_dup_chunks", "n_dup_tokens"):
            out[c] = out[c].fillna(0).astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def _two_regime_sum_rel(parts, keys, sum_cols, empty_types=None):
    """Late import shim for relational._two_regime_sum (textops loads
    before relational; importing at call time avoids the cycle)."""
    from .relational import _two_regime_sum

    return _two_regime_sum(parts, keys, sum_cols, empty_types=empty_types)


# ----------------------------------------------------------------------
# edit-distance (Levenshtein) near-dup pairs over a short-string column —
# the catalog/title/query-log dedup shape the n-gram families cannot
# express (a one-character typo moves every shingle)

EDITDIST_K = 2  # max edit distance; deletion-neighborhood size is O(L^K)


def _deletion_variants(s, k: int) -> set:
    """All sequences reachable from ``s`` by deleting UP TO ``k`` units
    (including ``s`` itself).  SymSpell's symmetric-delete lemma: if
    ed(a,b) <= k, align an optimal edit script — removing from `a` the
    deleted+substituted positions and from `b` the inserted+substituted
    positions leaves the SAME subsequence, and each side removed <= k
    units.  So deletion-neighborhood intersection is a candidate filter
    with GUARANTEED recall (pinned by the brute-force property test).
    Works on str OR bytes; the pipeline passes UTF-8 BYTES because
    DuckDB's levenshtein edits bytes, not codepoints (a 'é'→'a' swap
    costs 2 there)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _bounded_editdist(a, b, k: int) -> int:
    """Banded Levenshtein DP over str or bytes: exact when the distance
    is <= k, else any value > k.  Band width 2k+1 per row, early exit
    when a whole row exceeds k — O(k * max(len)) per pair, and candidates
    are neighborhood-collision-bounded, never all-pairs.  The pipeline
    calls it on UTF-8 bytes for DuckDB levenshtein parity."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la > lb:  # keep b the longer side so the band stays centered
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = [k + 1] * (lb + 1)
        cur[0] = i
        if lo > 1:
            cur[lo - 1] = k + 1
        ca = a[i - 1]
        best = k + 1
        for j in range(lo, hi + 1):
            c = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
            cur[j] = c
            if c < best:
                best = c
        if best > k:
            return k + 1
        prev = cur
    return prev[lb]


def t_editdist_dupes(sf_dir: str, k: int = EDITDIST_K):
    """Edit-distance near-duplicate pairs over the part-name column
    (distinct name_a < name_b with ed <= k, plus each name's part
    multiplicity) — catalog/title dedup, where a single-character typo
    breaks every shingle-based family.

    Distributed SymSpell (symmetric-delete) plan with EXACT recall:
    (1) one (name)-keyed exchange reduces the corpus to distinct names +
    multiplicities — at web scale the quadratic universe is DISTINCT
    strings, not rows; (2) each distinct name explodes into its
    <=k-deletion neighborhood (O(L^k) short keys — this operator is for
    short-string columns; long text belongs to the simhash/minhash
    families); (3) the shared `_candidate_pairs` bucket self-join emits
    neighborhood-collision pairs, dedup'd by its counted aggregate;
    (4) a banded-DP verify (<= k exact) runs over the candidate-sized
    pair stream (UTF-8 BYTE granularity — DuckDB's levenshtein edits
    bytes, not codepoints, so parity demands byte-level DP and variants);
    (5) multiplicities ride the t_dedup_keep_best pattern —
    matched names (result-sized) broadcast, ONE streaming filter over the
    counts table, driver merge.  Only (name, variant) rows and verified
    pairs ever shuffle; recall is provable (SymSpell lemma), pinned by a
    randomized brute-force test."""
    import ray
    from ray.data.aggregate import Count

    from .relational import _read

    empty = pd.DataFrame(
        {
            "name_a": pd.Series([], dtype=object),
            "name_b": pd.Series([], dtype=object),
            "dist": pd.Series([], dtype="int64"),
            "n_parts_a": pd.Series([], dtype="int64"),
            "n_parts_b": pd.Series([], dtype="int64"),
        }
    )
    counts = (
        _read(sf_dir, "part", ["p_name"])
        .groupby("p_name")
        .aggregate(Count(alias_name="n_parts"))
        .materialize()
    )
    if counts.count() == 0:
        return empty

    def explode(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pylist()
        out_n, out_v = [], []
        for nm in names:
            # byte-level variants (DuckDB levenshtein parity); latin-1
            # round-trips any byte sequence into a valid Arrow string key
            vs = _deletion_variants(nm.encode("utf-8"), k)
            out_n.extend([nm] * len(vs))
            out_v.extend(v.decode("latin-1") for v in vs)
        return pa.table(
            {
                "name": pa.array(out_n, pa.string()),
                "band": pa.array(np.zeros(len(out_n), np.int32), pa.int32()),
                "band_key": pa.array(out_v, pa.string()),
            }
        )

    buckets = counts.map_batches(explode, batch_format="pyarrow")
    pairs = _candidate_pairs(buckets, "name")

    def verify(t: pa.Table) -> pa.Table:
        out = {
            "name_a": pa.array([], pa.string()),
            "name_b": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }
        if len(t) == 0:
            return pa.table(out)
        av = t.column("doc_a").to_pylist()
        bv = t.column("doc_b").to_pylist()
        na, nb, nd = [], [], []
        for x, y in zip(av, bv):
            d = _bounded_editdist(x.encode("utf-8"), y.encode("utf-8"), k)
            if d <= k:
                na.append(x)
                nb.append(y)
                nd.append(d)
        return pa.table(
            {
                "name_a": pa.array(na, pa.string()),
                "name_b": pa.array(nb, pa.string()),
                "dist": pa.array(nd, pa.int64()),
            }
        )

    vdf = pairs.map_batches(verify, batch_format="pyarrow").to_pandas()
    if len(vdf) == 0 or len(vdf.columns) == 0:  # all-empty stream drops schema
        return empty
    vdf["dist"] = vdf["dist"].astype("int64")

    # multiplicities: matched names (result-sized) broadcast, one streaming
    # filter over the distinct-name counts, driver merge
    matched = set(vdf["name_a"]) | set(vdf["name_b"])
    mref = ray.put(matched)

    def keep_matched(t: pa.Table) -> pa.Table:
        m = ray.get(mref)  # one object-store fetch per batch, zero-copy set
        names = t.column("p_name").to_pylist()
        mask = pa.array([nm in m for nm in names], pa.bool_())
        return t.filter(mask)

    from .frames import typed_collect

    cdf = typed_collect(
        counts.map_batches(keep_matched, batch_format="pyarrow"),
        pa.schema([("p_name", pa.string()), ("n_parts", pa.int64())]),
    )
    out = (
        vdf.merge(
            cdf.rename(columns={"p_name": "name_a", "n_parts": "n_parts_a"}),
            on="name_a",
        ).merge(
            cdf.rename(columns={"p_name": "name_b", "n_parts": "n_parts_b"}),
            on="name_b",
        )
    )
    for c in ("n_parts_a", "n_parts_b"):
        out[c] = out[c].astype("int64")
    return (
        out[["name_a", "name_b", "dist", "n_parts_a", "n_parts_b"]]
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# PMI collocation mining — the association-mining member of the word-
# statistics family (phrase detection à la word2vec's phrase pass /
# Church & Hanks 1990).  Engine-added brief.

PMI_MIN_COUNT = 3  # noise floor: pairs below this never rank
PMI_TOP_K = 50
PMI_RATIO_SCALE = 1_000_000  # rank-key quantizer (exact integer floor)


def t_pmi_collocations(
    sf_dir: str, min_count: int = PMI_MIN_COUNT, top_k: int = PMI_TOP_K
):
    """Top-k collocations by pointwise mutual information over corpus
    bigrams — PMI = ln(N·c(w1w2) / (cL(w1)·cR(w2))) with positional
    marginals (cL counts w1 as a LEFT side, cR counts w2 as a RIGHT
    side, N = total bigrams), the contingency-table form.

    Exactness: ln is monotone, so PMI order IS the order of the rational
    ratio N·c/(cL·cR) — the rank key is the exact integer
    floor(SCALE·c·N / (cL·cR)), Python-int here and HUGEINT in the
    oracle, so no float ever decides the top-k cut; quantizer collisions
    are broken by (w1, w2) identically on both sides.  The reported
    pmi_x1e3 is FLOOR(ln(ratio)·1000 + 0.5) on the same IEEE double both
    sides (the t_tfidf transcendental-rounding argument).

    Scale shape: the corpus collapses to the vocab²-bounded (w1, w2, c)
    table via `_bigram_model_df` (one combiner pass + one groupby — the
    only exchange); marginals and the top-k run on the driver over that
    reduced table with zero extra shuffles (at 100 TB the combiner would
    also prune c < min_count pairs early, exactly like word2vec's phrase
    pass).  Guards: int64 rank keys overflow only past N·SCALE ≈ 2^63
    (~9×10¹² bigrams) — raise loudly there; drop SCALE a decade per
    decade of corpus beyond it."""
    model = _bigram_model_df(sf_dir)
    empty = pd.DataFrame(
        {
            "w1": pd.Series([], dtype=object),
            "w2": pd.Series([], dtype=object),
            "c_pair": pd.Series([], dtype="int64"),
            "c_left": pd.Series([], dtype="int64"),
            "c_right": pd.Series([], dtype="int64"),
            "ratio_x1e6": pd.Series([], dtype="int64"),
            "pmi_x1e3": pd.Series([], dtype="int64"),
        }
    )
    if len(model) == 0:
        return empty
    n_total = int(model["c"].sum())
    cl = model.groupby("w1")["c"].sum()
    cr = model.groupby("w2")["c"].sum()
    m = model[model["c"] >= min_count]
    if len(m) == 0:
        return empty
    c = m["c"].to_numpy(np.int64)
    clv = cl[m["w1"]].to_numpy(np.int64)
    crv = cr[m["w2"]].to_numpy(np.int64)
    if (
        n_total * PMI_RATIO_SCALE >= 2**62
        or int(c.max()) * n_total >= 2**62
    ):  # see docstring; the oracle's BIGINT c*N product has the same bound
        raise OverflowError(
            "PMI rank key would overflow int64 — lower PMI_RATIO_SCALE"
        )
    # exact integer rank key (driver-side, vocab-bounded candidate set)
    key = np.fromiter(
        (
            (PMI_RATIO_SCALE * int(ci) * n_total) // (int(a) * int(b))
            for ci, a, b in zip(c, clv, crv)
        ),
        np.int64,
        len(m),
    )
    # pmi on the SAME expression shape the oracle evaluates:
    # ln(CAST(c*N AS DOUBLE) / CAST(cL*cR AS DOUBLE))
    num = (c * np.int64(n_total)).astype(np.float64)
    den = (clv * crv).astype(np.float64)
    pmi = np.floor(np.log(num / den) * 1000.0 + 0.5).astype(np.int64)
    out = pd.DataFrame(
        {
            "w1": m["w1"].to_numpy(),
            "w2": m["w2"].to_numpy(),
            "c_pair": c,
            "c_left": clv,
            "c_right": crv,
            "ratio_x1e6": key,
            "pmi_x1e3": pmi,
        }
    )
    out = out.sort_values(
        ["ratio_x1e6", "w1", "w2"], ascending=[False, True, True]
    ).head(top_k)
    return out.reset_index(drop=True)


# ----------------------------------------------------------------------
# fuzzy benchmark decontamination — the LSH form of t_decontaminate
# (GPT-3 appendix C / Gopher: eval contamination is NEAR-duplication,
# not just exact gram overlap).  Engine-added brief.


def t_fuzzy_decontaminate(sf_dir: str, jaccard_threshold: float = 0.8):
    """TRAIN×BENCH near-duplicate pairs at shingle-Jaccard ≥ t — the
    asymmetric broadcast-LSH join.  The benchmark side (doc_id %
    DECONTAM_BENCH_MOD == 0, the t_decontaminate split; tiny by
    construction, eval sets are) reduces in one pruned pass to its
    band-key index AND its hashed shingle sets, both shipped to workers
    ONCE via ray.put.  The corpus then streams through a SINGLE map stage
    that band-matches each train doc against the broadcast index and
    exactly verifies hits against the broadcast bench sets in place —
    ZERO shuffles and one corpus pass, vs the symmetric self-join form's
    (t_minhash_pairs) two exchanges: when one join side is small, the
    broadcast plan is the 100 TB-correct one.  At production scale the
    bench side is its own (small) input table; the mod split stands in
    for it here.

    Banding (16 bands × 4 rows, `MinHasher.band_keys` — the identical
    rule as the self-join form) and exact hashed-shingle verification
    (`ShingleSetHasher`) are shared, so recall characteristics are pinned
    by the same all-pairs oracles; jaccard emits half-away-rounded 4 dp
    (threshold compared UNROUNDED on the identical IEEE division both
    sides)."""
    import ray

    from .relational import round_half_away  # lazy (import cycle)

    ds = _read_documents(sf_dir)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "bench_doc": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    ref = _bench_lsh_index(ds)
    if ref is None:
        return empty

    def scan_factory():
        idx, bsets, _ = ray.get(ref)  # once per worker process
        mh = MinHasher()
        shh = ShingleSetHasher()

        def scan(t: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for doc_id, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                sig = None if doc_id % DECONTAM_BENCH_MOD == 0 else mh.signature(text)
                if sig is None:
                    continue
                A = None
                for bid in _band_candidates(mh, idx, sig):
                    if A is None:
                        A = np.frombuffer(
                            shh._hash_features(shh.features(text)),
                            dtype=np.uint64,
                        )
                    B = bsets[bid]
                    inter = int(np.intersect1d(A, B, assume_unique=True).size)
                    union = A.size + B.size - inter
                    if union and inter / union >= jaccard_threshold:
                        out_a.append(doc_id)
                        out_b.append(bid)
                        out_j.append(float(round_half_away(inter / union, 4)))
            return pa.table(
                {
                    "doc_id": pa.array(out_a, pa.int64()),
                    "bench_doc": pa.array(out_b, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

        return scan

    out = ds.map_batches(
        warm_factory(("fuzzy_decontam", ref.hex()), scan_factory),
        batch_format="pyarrow",
    )
    return _collect_sorted(out, ("doc_id", "bench_doc"), lambda: empty)


def _bigram_arrays(text: str):
    """Multiset of token BIGRAMS as (sorted unique md5-64 hashes, counts,
    total) — the ROUGE-2 unit.  Hashed-multiset min-intersection equals
    string-multiset intersection (the ShingleSetHasher collision
    argument)."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < 2:
        e = np.zeros(0, np.uint64)
        return e, np.zeros(0, np.int64), 0
    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    h = np.fromiter(
        (_hash64(g) for g in grams), dtype=np.uint64, count=len(grams)
    )
    uniq, counts = np.unique(h, return_counts=True)
    return uniq, counts.astype(np.int64), len(grams)


def _bench_lsh_index(ds, with_bigrams: bool = False):
    """The benchmark side reduced to its broadcast index: one pruned pass
    emits per bench doc the 16 band keys (`MinHasher.band_keys`), the
    packed shingle set (exact-Jaccard verification), and — when
    ``with_bigrams`` — the bigram multiset for ROUGE scoring.  The driver
    assembles {(band, key) → [doc_id]} plus the per-doc payloads and
    ships ONE ray.put handle; returns None when the bench side is empty.
    Driver-tiny by construction (eval sets are small — at production
    scale the bench side is its own input table)."""
    import ray

    class BenchIndexer:
        def __init__(self):
            self.mh = MinHasher()
            self.sh = ShingleSetHasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))
            out = {
                "doc_id": [],
                "bands": [],
                "sh": [],
                "bg_h": [],
                "bg_c": [],
                "bg_n": [],
            }
            for doc_id, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                sig = self.mh.signature(text)
                if sig is None:  # no shingles: cannot be a near-dup
                    continue
                out["doc_id"].append(doc_id)
                out["bands"].append(",".join(self.mh.band_keys(sig)))
                out["sh"].append(self.sh._hash_features(self.sh.features(text)))
                bh, bc, bn = (
                    _bigram_arrays(text)
                    if with_bigrams
                    else (np.zeros(0, np.uint64), np.zeros(0, np.int64), 0)
                )
                out["bg_h"].append(bh.tobytes())
                out["bg_c"].append(bc.tobytes())
                out["bg_n"].append(bn)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], pa.int64()),
                    "bands": pa.array(out["bands"], pa.string()),
                    "sh": pa.array(out["sh"], pa.binary()),
                    "bg_h": pa.array(out["bg_h"], pa.binary()),
                    "bg_c": pa.array(out["bg_c"], pa.binary()),
                    "bg_n": pa.array(out["bg_n"], pa.int64()),
                }
            )

    bench = _collect_sorted(
        ds.map_batches(warm_stage(BenchIndexer), batch_format="pyarrow"),
        ("doc_id",),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("bands", pa.string()),
                ("sh", pa.binary()),
                ("bg_h", pa.binary()),
                ("bg_c", pa.binary()),
                ("bg_n", pa.int64()),
            ]
        ),
    )
    if len(bench) == 0:
        return None
    band_index: dict = {}
    bench_sets: dict = {}
    bench_bigrams: dict = {}
    for row in bench.itertuples(index=False):
        did = int(row.doc_id)
        bench_sets[did] = np.frombuffer(row.sh, dtype=np.uint64)
        if with_bigrams:
            bench_bigrams[did] = (
                np.frombuffer(row.bg_h, dtype=np.uint64),
                np.frombuffer(row.bg_c, dtype=np.int64),
                int(row.bg_n),
            )
        for b, k in enumerate(row.bands.split(",")):
            band_index.setdefault((b, k), []).append(did)
    return ray.put((band_index, bench_sets, bench_bigrams))


def _band_candidates(mh, idx, sig):
    """Sorted bench candidates band-matching a signature."""
    cands: set = set()
    for b, k in enumerate(mh.band_keys(sig)):
        cands.update(idx.get((b, k), ()))
    return sorted(cands)


def t_rouge_report(sf_dir: str, jaccard_threshold: float = 0.8):
    """ROUGE-2 contamination report for the fuzzy-flagged TRAIN×BENCH
    pairs — the MULTISET counterpart of t_fuzzy_decontaminate's set
    Jaccard: I = Σ_g min(c_train(g), c_bench(g)) over token bigrams,
    precision I/|train|, recall I/|bench|, F1 = 2I/(|train|+|bench|) —
    the report GPT-3 App. C-style audits attach to each flagged pair.

    All three scores are INTEGER cross-multiplied (p/r/f_x1e6 = floored
    scaled rationals), so no float ever decides a reported value; pairs
    where either side has no bigram are dropped (P/R undefined — the
    oracle's inner join on the totals CTE enforces the same rule).

    Plan: the same single broadcast-scan shape as t_fuzzy_decontaminate
    (shared `_bench_lsh_index`, built once with the bigram multisets
    riding along) — band-match, exact-Jaccard gate, then the multiset
    min-intersection via one sorted-array intersect per flagged pair.
    ZERO shuffles, one corpus pass."""
    import ray

    ds = _read_documents(sf_dir)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "bench_doc": pd.Series([], dtype="int64"),
            "inter_c": pd.Series([], dtype="int64"),
            "p_x1e6": pd.Series([], dtype="int64"),
            "r_x1e6": pd.Series([], dtype="int64"),
            "f_x1e6": pd.Series([], dtype="int64"),
        }
    )
    ref = _bench_lsh_index(ds, with_bigrams=True)
    if ref is None:
        return empty

    def scan_factory():
        idx, bsets, bbig = ray.get(ref)
        mh = MinHasher()
        shh = ShingleSetHasher()

        def scan(t: pa.Table) -> pa.Table:
            rows = {k: [] for k in empty.columns}
            for doc_id, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                sig = None if doc_id % DECONTAM_BENCH_MOD == 0 else mh.signature(text)
                if sig is None:
                    continue
                A = None
                ah = ac = an = None
                for bid in _band_candidates(mh, idx, sig):
                    if A is None:
                        A = np.frombuffer(
                            shh._hash_features(shh.features(text)),
                            dtype=np.uint64,
                        )
                    B = bsets[bid]
                    inter = int(np.intersect1d(A, B, assume_unique=True).size)
                    union = A.size + B.size - inter
                    if not union or inter / union < jaccard_threshold:
                        continue
                    if ah is None:
                        ah, ac, an = _bigram_arrays(text)
                    bh, bc, bn = bbig[bid]
                    if an == 0 or bn == 0:
                        continue  # P/R undefined: dropped on both sides
                    _, ia, ib = np.intersect1d(
                        ah, bh, assume_unique=True, return_indices=True
                    )
                    mi = int(np.minimum(ac[ia], bc[ib]).sum())
                    rows["doc_id"].append(doc_id)
                    rows["bench_doc"].append(bid)
                    rows["inter_c"].append(mi)
                    rows["p_x1e6"].append((1_000_000 * mi) // an)
                    rows["r_x1e6"].append((1_000_000 * mi) // bn)
                    rows["f_x1e6"].append((2_000_000 * mi) // (an + bn))
            return pa.table(
                {k: pa.array(v, pa.int64()) for k, v in rows.items()}
            )

        return scan

    out = ds.map_batches(
        warm_factory(("rouge_report", ref.hex()), scan_factory),
        batch_format="pyarrow",
    )
    return _collect_sorted(out, ("doc_id", "bench_doc"), lambda: empty)


# ----------------------------------------------------------------------
# Filter-cascade attrition funnel — the instrumentation pass every staged
# cleaning pipeline (C4, Gopher, RefinedWeb, FineWeb) publishes before
# committing a 100 TB run.  Engine-added brief.

ATTRITION_MIN_CHARS = 200
ATTRITION_MIN_WORDS, ATTRITION_MAX_WORDS = 50, 100_000
ATTRITION_STAGES = ("min_length", "word_count", "stopword", "exact_dedup")


def _attrition_partial(t: pa.Table) -> pa.Table:
    """Per-block reduction of the cascade: ONE counts row (total +
    cumulative survivors of each rule gate) plus the block-DISTINCT md5s
    of full-cascade survivors, in a union schema (`is_count` selects).
    The rule gates read the SAME `_gopher_project` kernel the
    t_gopher_rules query registers, so the cascade can never drift from
    the audited rules."""
    g = _gopher_project(t)
    n_words = g.column("n_words").to_numpy(zero_copy_only=False)
    stops = g.column("n_stop_distinct").to_numpy(zero_copy_only=False)
    n_chars = t.column("n_chars").to_numpy(zero_copy_only=False)
    p1 = n_chars >= ATTRITION_MIN_CHARS
    p12 = p1 & (n_words >= ATTRITION_MIN_WORDS) & (n_words <= ATTRITION_MAX_WORDS)
    p123 = p12 & (stops >= 1)
    texts = t.column("text").to_pylist()
    uniq = sorted(
        {
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s, f in zip(texts, p123)
            if f
        }
    )
    k = len(uniq)
    return pa.table(
        {
            "is_count": pa.array([1] + [0] * k, pa.int64()),
            "n": pa.array([len(t)] + [0] * k, pa.int64()),
            "n1": pa.array([int(p1.sum())] + [0] * k, pa.int64()),
            "n12": pa.array([int(p12.sum())] + [0] * k, pa.int64()),
            "n123": pa.array([int(p123.sum())] + [0] * k, pa.int64()),
            "md5": pa.array([None] + uniq, pa.string()),
        }
    )


def t_filter_attrition(sf_dir: str, stage_dir: str = None):
    """Gate-cascade attrition report: one row per stage of the cleaning
    funnel (input → min_length → word_count → stopword → exact_dedup)
    with n_in / n_dropped / n_out — the number a pipeline owner reads
    before deciding whether a gate is too aggressive for a corpus.

    Scale shape: ONE streaming pass evaluates every gate per block
    (`_attrition_partial` — blocks reduce to one counts row plus their
    DISTINCT survivor md5s, never raw text) into a parquet stage
    checkpoint (corpus-order worst case, so the object store never pins
    it and a crashed run resumes; the house rule for two-consumer
    streams).  Consumer A folds the counts rows on the driver (one per
    block); consumer B counts distinct survivor hashes — the dedup
    stage — through the two-regime plan (driver set below
    PIVOT_DRIVER_MAX_ROWS md5 rows, a distributed (md5) groupby above).
    Gates are integer rules over `_gopher_project` columns + the n_chars
    column; dedup is first-per-md5, so survivors = distinct hashes."""
    import tempfile

    from .staging import stage_checkpoint

    def report(n, n1, n12, n123, n4):
        cuts = [n, n1, n12, n123, n4]
        recs = []
        for i, name in enumerate(["input"] + list(ATTRITION_STAGES)):
            n_in = cuts[max(i - 1, 0)]
            n_out = cuts[i] if i else cuts[0]
            recs.append(
                {
                    "stage_idx": i,
                    "stage": name,
                    "n_in": n_in,
                    "n_dropped": n_in - n_out,
                    "n_out": n_out,
                }
            )
        df = pd.DataFrame(recs)
        for c in ("stage_idx", "n_in", "n_dropped", "n_out"):
            df[c] = df[c].astype("int64")
        return df

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_attrition_") if own_stage else stage_dir
    try:
        st = stage_checkpoint(
            lambda: _read_documents(
                sf_dir, columns=("doc_id", "text", "n_chars")
            ).map_batches(_attrition_partial, batch_format="pyarrow"),
            os.path.join(root, "flags"),
            resume=not own_stage,
            allow_empty=True,
        )
        if st is None:
            return report(0, 0, 0, 0, 0)

        from .frames import typed_collect
        from .relational import PIVOT_DRIVER_MAX_ROWS  # lazy (import cycle)

        counts = typed_collect(
            st.map_batches(
                lambda t: t.filter(pc.equal(t.column("is_count"), 1)).select(
                    ["n", "n1", "n12", "n123"]
                ),
                batch_format="pyarrow",
            ),
            pa.schema(
                [
                    ("n", pa.int64()),
                    ("n1", pa.int64()),
                    ("n12", pa.int64()),
                    ("n123", pa.int64()),
                ]
            ),
        )
        n, n1, n12, n123 = (int(counts[c].sum()) for c in ("n", "n1", "n12", "n123"))

        # md5s stays FILE-backed (st reads the checkpoint): each consumer
        # below streams a fresh read — no corpus-order object-store pin
        md5s = st.map_batches(
            lambda t: t.filter(pc.equal(t.column("is_count"), 0)).select(["md5"]),
            batch_format="pyarrow",
        )
        if md5s.count() <= PIVOT_DRIVER_MAX_ROWS:
            mdf = md5s.to_pandas()
            n4 = 0 if len(mdf.columns) == 0 else int(mdf["md5"].nunique())
        else:
            from ray.data.aggregate import Count

            n4 = md5s.groupby("md5").aggregate(Count(alias_name="_n")).count()
        return report(n, n1, n12, n123, n4)
    finally:
        if own_stage:
            import shutil

            shutil.rmtree(root, ignore_errors=True)


# ----------------------------------------------------------------------
# Dataset card — the datasheet summary every released corpus ships
# (Gebru et al., Datasheets for Datasets; HF dataset cards).  Engine-added.


def t_dataset_card(sf_dir: str):
    """One-pass dataset datasheet over documents: corpus size, EXACT
    distinct-text count (the dup-rate denominator), total/mean chars,
    and the per-lang / per-source composition — the (metric, value)
    long-format card a corpus release publishes and a mixture designer
    reads before weighting sources.

    Scale shape: ONE streaming pass reduces each block to a union-schema
    partial (bounded metric rows — langs and sources are label enums —
    plus the block-DISTINCT text md5s for the exact-dedup metric, the
    t_filter_attrition discipline); the two-regime merge folds metric
    rows on the driver and counts distinct hashes (driver set below
    PIVOT_DRIVER_MAX_ROWS, a bucketed fold above).  All values are
    integers: mean_chars_x100 is the floored integer cross-product, so
    no float decides a published number."""

    def partial(t: pa.Table) -> pa.Table:
        metrics: list[tuple[str, int]] = [
            ("n_docs", len(t)),
            (
                "total_chars",
                int(
                    pc.sum(t.column("n_chars")).as_py() or 0
                ),
            ),
        ]
        for col, prefix in (("lang", "lang:"), ("source", "source:")):
            arr = t.column(col)
            g = (
                pa.table({col: arr, "n": pa.array(np.ones(len(t), np.int64))})
                .group_by(col)
                .aggregate([("n", "sum")])
            )
            for k, v in zip(g.column(col).to_pylist(), g.column("n_sum").to_pylist()):
                if k is None:  # oracle's 'lang:' || NULL row is filtered too
                    continue
                metrics.append((f"{prefix}{k}", int(v)))
        uniq = sorted(
            {
                hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in t.column("text").to_pylist()
            }
        )
        k = len(uniq)
        return pa.table(
            {
                "metric": pa.array([m for m, _ in metrics] + [None] * k, pa.string()),
                "value": pa.array([v for _, v in metrics] + [0] * k, pa.int64()),
                "md5": pa.array([None] * len(metrics) + uniq, pa.string()),
            }
        )

    parts = (
        _read_documents(sf_dir, columns=("doc_id", "text", "lang", "source", "n_chars"))
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    from .frames import typed_collect
    from .relational import PIVOT_DRIVER_MAX_ROWS  # lazy (import cycle)

    mrows = typed_collect(
        parts.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("metric"))).select(
                ["metric", "value"]
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("metric", pa.string()), ("value", pa.int64())]),
    )
    md5s = parts.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("md5"))).select(["md5"]),
        batch_format="pyarrow",
    )
    if md5s.count() <= PIVOT_DRIVER_MAX_ROWS:
        mdf = md5s.to_pandas()
        n_distinct = 0 if len(mdf.columns) == 0 else int(mdf["md5"].nunique())
    else:
        from ray.data.aggregate import Count

        n_distinct = md5s.groupby("md5").aggregate(Count(alias_name="_n")).count()

    agg = (
        mrows.groupby("metric", as_index=False)["value"].sum()
        if len(mrows)
        else pd.DataFrame({"metric": pd.Series([], dtype=object), "value": pd.Series([], dtype="int64")})
    )
    by = dict(zip(agg["metric"], agg["value"].astype("int64")))
    n_docs = int(by.get("n_docs", 0))
    total_chars = int(by.get("total_chars", 0))
    rows = [
        ("n_docs", n_docs),
        ("n_distinct_texts", int(n_distinct)),
        ("total_chars", total_chars),
        ("mean_chars_x100", 0 if n_docs == 0 else total_chars * 100 // n_docs),
    ]
    rows.extend(
        (m, int(v)) for m, v in sorted(by.items()) if m.startswith(("lang:", "source:"))
    )
    out = pd.DataFrame(rows, columns=["metric", "value"])
    out["value"] = out["value"].astype("int64")
    return out.sort_values("metric").reset_index(drop=True)


def t_unicode_dedup(sf_dir: str):
    """Unicode-normalization-invariant exact dedup: two byte-distinct
    documents whose NFC canonical forms coincide (decomposed vs
    precomposed accents, Hangul jamo vs syllables, canonical combining
    reorders) are the SAME text to any tokenizer, and byte-exact dedup
    (`t_exact_dedup`) provably misses them.  Per NFC-equal class with
    >= 2 members: canonical keep doc (min doc_id), member count, and the
    number of DISTINCT raw byte forms inside the class — n_raw_variants
    > 1 is precisely the duplicate mass invisible to byte-hash dedup.

    Scale shape: one streaming pass hashes md5(NFC(text)) and md5(text)
    per doc — the exchange carries (norm_hash, raw_hash, doc_id) only,
    never text — then ONE bucketed exchange on the norm-hash prefix
    co-locates each class whole, where a vectorized pandas fold per
    bucket yields the class rows (per-key Ray Aggregate over a
    corpus-sized hash key-space is the measured pathology this replaces;
    see the q_butterfly_count lesson).  NFC is Python's `unicodedata`;
    the oracle's `nfc_normalize` implements the same Unicode
    canonicalization — parity probed over combining / Hangul / astral /
    ligature classes in tests (NFC, unlike NFKC, must NOT fold
    compatibility ligatures, which the ﬁ/ﬀ probe pins)."""
    import unicodedata

    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_buckets = shuffle_partitions(max(1, n_docs))

    def project(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        norm_hashes, raw_hashes = [], []
        for s in texts:
            norm_hashes.append(
                hashlib.md5(
                    unicodedata.normalize("NFC", s).encode("utf-8")
                ).hexdigest()
            )
            raw_hashes.append(hashlib.md5(s.encode("utf-8")).hexdigest())
        # md5 is already uniform: the top-16-hex prefix IS the bucket key
        bucket = np.array(
            [int(h[:16], 16) % n_buckets for h in norm_hashes], np.int64
        )
        return pa.table(
            {
                "norm_hash": pa.array(norm_hashes, pa.string()),
                "raw_hash": pa.array(raw_hashes, pa.string()),
                "doc_id": t.column("doc_id"),
                "bucket": pa.array(bucket),
            }
        )

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("norm_hash", sort=False).agg(
            rep_doc=("doc_id", "min"),
            n_copies=("doc_id", "size"),
            n_raw_variants=("raw_hash", "nunique"),
        )
        agg = agg[agg["n_copies"] >= 2].reset_index()
        return pd.DataFrame(
            {
                "norm_hash": agg["norm_hash"].astype(object),
                "rep_doc": agg["rep_doc"].astype("int64"),
                "n_copies": agg["n_copies"].astype("int64"),
                "n_raw_variants": agg["n_raw_variants"].astype("int64"),
            }
        )

    out = (
        _read_documents(sf_dir)
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
    )
    return _collect_sorted(
        out,
        ("norm_hash",),
        schema=pa.schema(
            [
                ("norm_hash", pa.string()),
                ("rep_doc", pa.int64()),
                ("n_copies", pa.int64()),
                ("n_raw_variants", pa.int64()),
            ]
        ),
    )


HOLDOUT_SALT = "split:"  # independent of every other sampler's hash stream
HOLDOUT_TRAIN_MAX = "c000"  # md5-hex4 < this -> train  (0.75)
HOLDOUT_VAL_MAX = "e000"  # .. < this -> val (0.125); else test (0.125)


def t_group_holdout_split(sf_dir: str):
    """Leakage-safe GROUP-AWARE train/val/test holdout: the split key is
    the document's source (domain), never the document — every doc of a
    domain lands in the SAME split, so near-duplicates and templated
    siblings (which cluster within a domain) cannot straddle the
    train/eval boundary.  A per-doc split would leak them; this is the
    GroupShuffleSplit discipline at corpus scale.

    Assignment is a deterministic salted md5-hex prefix of the source
    (the t_stratified_sample scheme: fixed-width lowercase hex compares
    like the number it encodes) — no RNG state, stable under re-runs,
    resumes, and repartitioning, and recomputable in SQL.  NULL-source
    docs are excluded on both sides (no domain -> no leakage-safe
    assignment).

    Scale shape: one streaming pass reduces each block to distinct
    (split, source) partial rows with doc/char counts; `_two_regime_sum`
    merges them over the source key-space; a final combiner collapses to
    per-(block, split) integer partials and the driver folds O(blocks×3)
    rows.  The per-doc assignment table is never collected — at
    production scale the same `assign` projection feeds
    `write_training_shards(partition_cols=['split'])` directly."""
    from .relational import _two_regime_sum  # lazy (import cycle)

    def assign(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("source")))
        sources = t.column("source").to_pylist()
        splits = []
        for s in sources:
            h = hashlib.md5((HOLDOUT_SALT + s).encode("utf-8")).hexdigest()[:4]
            splits.append(
                "train"
                if h < HOLDOUT_TRAIN_MAX
                else ("val" if h < HOLDOUT_VAL_MAX else "test")
            )
        tt = pa.table(
            {
                "split": pa.array(splits, pa.string()),
                "source": t.column("source"),
                "n_docs": pa.array(np.ones(len(t), np.int64)),
                "chars": pc.cast(t.column("n_chars"), pa.int64()),
            }
        )
        g = tt.group_by(["split", "source"]).aggregate(
            [("n_docs", "sum"), ("chars", "sum")]
        )
        return g.rename_columns(["split", "source", "n_docs", "chars"])

    reduced, _ = _two_regime_sum(
        _read_documents(sf_dir, ("doc_id", "source", "n_chars")).map_batches(
            assign, batch_format="pyarrow"
        ),
        ["split", "source"],
        ["n_docs", "chars"],
    )

    def split_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "split": t.column("split"),
                "n_sources": pa.array(np.ones(len(t), np.int64)),
                "n_docs": t.column("n_docs"),
                "total_chars": t.column("chars"),
            }
        )
        g = tt.group_by("split").aggregate(
            [("n_sources", "sum"), ("n_docs", "sum"), ("total_chars", "sum")]
        )
        return g.rename_columns(["split", "n_sources", "n_docs", "total_chars"])

    from .frames import typed_collect

    parts = typed_collect(
        reduced.map_batches(split_partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("split", pa.string()),
                ("n_sources", pa.int64()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return parts
    out = (
        parts.groupby("split", sort=True)[["n_sources", "n_docs", "total_chars"]]
        .sum()
        .reset_index()
    )
    return out.astype(
        {"n_sources": "int64", "n_docs": "int64", "total_chars": "int64"}
    )


def t_dup_size_profile(sf_dir: str):
    """Duplicate-class SIZE DISTRIBUTION — the one-line answer to "how
    duplicated is this corpus?": for each class size f, the number of
    exact-duplicate classes (md5 of raw text) with exactly f members.
    The (1, huge) row is the unique mass; the tail is what exact dedup
    will delete — the curation report t_exact_dedup's per-class listing
    is too large to eyeball at corpus scale, and this profile is BOUNDED
    (distinct class sizes) no matter the corpus.

    Scale shape: the count-of-counts trick (the q_skew_report plan on a
    string key): (md5, doc) pairs bucket by hash prefix so each class
    co-locates whole, one vectorized pandas fold per bucket yields class
    sizes then their value_counts, and the driver merges O(buckets ×
    distinct-sizes) int rows.  Full 128-bit md5 hex is the class key on
    BOTH sides — no truncated-hash collision can merge classes the
    oracle keeps apart."""
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_buckets = shuffle_partitions(max(1, n_docs))

    def project(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t.column("text").to_pylist()
        ]
        bucket = np.array([int(h[:15], 16) % n_buckets for h in hs], np.int64)
        return pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h", sort=False).size()
        hist = sizes.value_counts()
        return pd.DataFrame(
            {
                "class_size": hist.index.to_numpy(np.int64),
                "n_classes": hist.to_numpy(np.int64),
            }
        )

    parts = _collect_sorted(
        _read_documents(sf_dir)
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas"),
        ("class_size",),
        schema=pa.schema([("class_size", pa.int64()), ("n_classes", pa.int64())]),
    )
    if len(parts) == 0:
        return parts
    out = parts.groupby("class_size", sort=True)["n_classes"].sum().reset_index()
    return out.astype({"class_size": "int64", "n_classes": "int64"})


VOCAB_COVERAGE_PCTS = (90, 99)


def t_vocab_coverage(sf_dir: str):
    """Tokenizer vocabulary-budget planning: the MINIMAL number of
    distinct words (by frequency, ties word-asc) covering >= 90 / 99 %
    of all token occurrences — the coverage curve that decides a vocab
    size before a BPE train run commits to one.

    Scale shape: per-batch tf partials over dictionary codes (the
    t_doc_frequency combiner — the exchange carries vocab-bounded rows,
    never tokens), one grouped reduction, then the vocab-bounded table
    folds on the driver (the t_bpe_train precedent).  The head cut is
    the integer cross-multiplication 100·cum >= pct·total, and the
    answer is tie-order independent (equal counts contribute equally).
    Empty / word-free corpora degenerate to the typed empty frame on
    both sides."""
    import numpy as np

    def partials(t: pa.Table) -> pa.Table:
        _parent, codes, dictionary = _word_codes(t)
        vocab = len(dictionary)
        tf = np.bincount(codes, minlength=vocab)
        present = tf > 0
        return pa.table(
            {
                "word": dictionary.filter(pa.array(present)),
                "tf": pa.array(tf[present], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    grouped = (
        _read_documents(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("tf", alias_name="tf"))
    )
    df = _collect_sorted(
        grouped,
        ("word",),
        schema=pa.schema([("word", pa.string()), ("tf", pa.int64())]),
    )
    empty = pd.DataFrame(
        {
            "pct": pd.Series([], dtype="int64"),
            "vocab_size": pd.Series([], dtype="int64"),
            "covered_tokens": pd.Series([], dtype="int64"),
            "total_tokens": pd.Series([], dtype="int64"),
            "total_vocab": pd.Series([], dtype="int64"),
        }
    )
    if len(df) == 0:
        return empty
    df = df.sort_values(["tf", "word"], ascending=[False, True], kind="mergesort")
    tf = df["tf"].to_numpy(np.int64)
    cum = np.cumsum(tf)
    total = int(cum[-1])
    if total <= 0:
        return empty
    rows = []
    for pct in VOCAB_COVERAGE_PCTS:
        k = int(np.argmax(100 * cum >= pct * total))
        rows.append(
            {
                "pct": pct,
                "vocab_size": k + 1,
                "covered_tokens": int(cum[k]),
                "total_tokens": total,
                "total_vocab": len(df),
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ----------------------------------------------------------------------
# Okapi BM25 retrieval (Robertson & Walker; the SPARCK-Jones idf form)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def t_bm25_search(sf_dir: str):
    """Okapi BM25 retrieval: top-10 documents per probe word, scored with
    the classic (k1=1.2, b=0.75) single-term formula

        idf(w) * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)),
        idf(w) = ln((N - df + 0.5) / (df + 0.5))

    — the ranking half of the search-engine family (t_inverted_lookup is
    the postings half, t_tfidf the weighting half).

    Plan (two scans, ZERO shuffle): pass 1 reduces each batch to ONE
    constant-width partial row (n_docs, n_tokens, df per probe word) —
    driver folds the block partials into the corpus stats, exactly the
    t_tfidf global-stat shape but without even the vocab-sized groupby,
    because the query vocabulary is fixed.  Pass 2 broadcasts (df, N,
    avgdl) once via ray.put and scores every batch vectorized through the
    shared `_word_codes` tokenizer; each block emits only its LOCAL
    top-10 per word, so the driver merge is (10 x words x blocks)-sized
    no matter the corpus.  At 100 TB both scans stream; nothing
    corpus-order ever collects.

    Exactness: each output row's score is a SINGLE IEEE expression (one
    term, no sum), written token-for-token identically in the oracle; the
    milli-unit grid absorbs libm ulp skew and ln() is transcendental so
    no true score sits on a rounding boundary (the t_tfidf argument).
    The top-10 cut orders by the ROUNDED integer then doc_id on both
    sides, so boundary ties cannot diverge."""
    import ray

    from .frames import typed_collect

    probes = [w for w in INDEX_PROBE_WORDS]
    npr = len(probes)

    def stats_partial(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        pidx_by_code = (
            pc.fill_null(
                pc.index_in(dictionary, value_set=pa.array(probes, pa.string())),
                -1,
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pidx = pidx_by_code[codes] if codes.size else codes
        keep = pidx >= 0
        if codes.size:
            pair_keys = np.unique(parent[keep] * npr + pidx[keep])
            df = np.bincount(pair_keys % npr, minlength=npr)
        else:
            df = np.zeros(npr, np.int64)
        cols = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_tokens": pa.array([int(parent.size)], pa.int64()),
        }
        for i in range(npr):
            cols[f"df_{i}"] = pa.array([int(df[i])], pa.int64())
        return pa.table(cols)

    stats_schema = pa.schema(
        [("n_docs", pa.int64()), ("n_tokens", pa.int64())]
        + [(f"df_{i}", pa.int64()) for i in range(npr)]
    )
    parts = typed_collect(
        _read_documents(sf_dir).map_batches(stats_partial, batch_format="pyarrow"),
        stats_schema,
    )
    n_docs = int(parts["n_docs"].sum()) if len(parts) else 0
    n_tokens = int(parts["n_tokens"].sum()) if len(parts) else 0
    df_vec = (
        np.array([int(parts[f"df_{i}"].sum()) for i in range(npr)], np.float64)
        if len(parts)
        else np.zeros(npr)
    )

    out_schema = pa.schema(
        [
            ("word", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
            ("bm25_x1e3", pa.int64()),
        ]
    )
    if n_docs == 0:
        return out_schema.empty_table().to_pandas()

    nd = float(n_docs)
    # ONE double division, written identically in the oracle
    avgdl = float(n_tokens) / nd
    idf = np.log((nd - df_vec + 0.5) / (df_vec + 0.5))
    bref = ray.put((probes, idf, avgdl))

    class Score:
        def __init__(self):
            self.probes, self.idf, self.avgdl = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            parent, codes, dictionary = _word_codes(t)
            pidx_by_code = (
                pc.fill_null(
                    pc.index_in(
                        dictionary, value_set=pa.array(self.probes, pa.string())
                    ),
                    -1,
                )
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            pidx = pidx_by_code[codes] if codes.size else codes
            keep = pidx >= 0
            if not codes.size or not keep.any():
                return out_schema.empty_table()
            dl = np.bincount(parent, minlength=t.num_rows)
            keys, tf = np.unique(parent[keep] * npr + pidx[keep], return_counts=True)
            pair_parent, pair_pidx = keys // npr, keys % npr
            tf_d = tf.astype(np.float64)
            dl_pair = dl[pair_parent]
            dl_d = dl_pair.astype(np.float64)
            # the SINGLE-term BM25 chain, token-identical to the oracle SQL
            score = self.idf[pair_pidx] * (
                (tf_d * 2.2) / (tf_d + 1.2 * (0.25 + 0.75 * (dl_d / self.avgdl)))
            )
            x1e3 = np.floor(score * 1000.0 + 0.5).astype(np.int64)
            doc_ids = t.column("doc_id").to_numpy()[pair_parent]
            out = pd.DataFrame(
                {
                    "word": np.array(self.probes, object)[pair_pidx],
                    "doc_id": doc_ids,
                    "tf": tf.astype(np.int64),
                    "dl": dl_pair.astype(np.int64),
                    "bm25_x1e3": x1e3,
                }
            )
            # local top-k: the global top-10 per word is contained in the
            # union of per-block top-10s
            out = out.sort_values(
                ["word", "bm25_x1e3", "doc_id"], ascending=[True, False, True]
            )
            out = out.groupby("word", sort=False).head(BM25_TOP_K)
            return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    cands = typed_collect(
        _read_documents(sf_dir).map_batches(
            warm_factory(("t_bm25_search", bref.hex()), Score),
            batch_format="pyarrow",
        ),
        out_schema,
    )
    cands = cands.sort_values(
        ["word", "bm25_x1e3", "doc_id"], ascending=[True, False, True]
    )
    final = cands.groupby("word", sort=False).head(BM25_TOP_K)
    return final.sort_values(["word", "doc_id"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# Feature hashing (the hashing-trick vectorizer, Weinberger et al. 2009)
FH_BUCKETS = 16
FH_SALT = "fh:"


def t_feature_hashing(sf_dir: str):
    """Hashing-trick document vectorizer: every document becomes a
    FH_BUCKETS-dim count vector with bucket = md5('fh:'||word) mod 16 —
    the fixed-dimension, vocabulary-free text featurizer (Weinberger et
    al. 2009) that bridges the text family to the vector family (the
    hashed vectors feed kNN / kmeans / classifiers with NO global
    dictionary pass — the property that matters at 100 TB, where even
    the vocab-bounded t_tfidf broadcast is a pass you'd rather skip).

    One streaming scan, zero shuffles: per batch the shared
    `_word_codes` tokenizer + one md5 per UNIQUE batch word (never per
    token), counts via one bincount over (doc, bucket) keys.  The full
    vector rides the compare as a FINGERPRINT — md5 of the canonical
    'bucket:count' string (nonzero buckets in bucket order) — the
    t_pii_scrub scheme, certifying every component byte-for-byte without
    emitting corpus x 16 rows; nnz and token totals come along as plain
    integers.  The oracle rebuilds the vectors verbatim in SQL (mod 16
    of a hex number is its last hex digit — the t_shuffle_shards
    strpos trick — and the canonical string is an ORDER BY string_agg)."""

    def project(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        words = dictionary.to_pylist()
        bucket_by_code = np.array(
            [
                int(hashlib.md5((FH_SALT + w).encode("utf-8")).hexdigest()[:8], 16)
                % FH_BUCKETS
                for w in words
            ]
            or [0],
            np.int64,
        )
        n_docs = t.num_rows
        if codes.size:
            keys = parent * FH_BUCKETS + bucket_by_code[codes]
            counts = np.bincount(keys, minlength=n_docs * FH_BUCKETS).reshape(
                n_docs, FH_BUCKETS
            )
        else:
            counts = np.zeros((n_docs, FH_BUCKETS), np.int64)
        fps, nnzs = [], []
        for row in counts:
            nz = np.flatnonzero(row)
            canon = ",".join(f"{b}:{row[b]}" for b in nz)
            fps.append(hashlib.md5(canon.encode("utf-8")).hexdigest())
            nnzs.append(len(nz))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(
                    np.bincount(parent, minlength=n_docs).astype(np.int64),
                    pa.int64(),
                ),
                "nnz": pa.array(np.array(nnzs, np.int64), pa.int64()),
                "vec_md5": pa.array(fps, pa.string()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


# ----------------------------------------------------------------------
# MLM masking (BERT-style pretraining corruption, deterministic)
MLM_SALT = "mlm:"
MLM_THRESH = "26"  # md5-hex2 < '26' => ~14.8% mask rate
MLM_TOKEN = "<mask>"


def t_mlm_masking(sf_dir: str):
    """Deterministic masked-language-model corruption — the BERT-style
    pretraining transform as a corpus operator: each token masks iff
    md5('mlm:'||doc_id||':'||pos||':'||token) starts below hex '26'
    (~15%, the BERT rate), so the mask set is a pure function of the data
    (reproducible across runs, resumable shards, and replayable in SQL —
    an RNG mask could never be oracle-checked).  Output per document:
    token/mask counts and the md5 fingerprint of the masked text (tokens
    joined by single spaces, masked ones replaced by '<mask>') — the
    t_pii_scrub fingerprint scheme certifying the rewritten corpus
    byte-for-byte without shipping text.

    One streaming pass, zero shuffles; the per-token md5 is the honest
    cost of a content-keyed mask rule (same class as the BPE train
    pass), confined to the map stage."""

    def project(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        words = np.asarray(dictionary.to_pylist(), object)
        doc_ids = t.column("doc_id").to_numpy()
        n_docs = t.num_rows
        # per-token position within its doc
        if codes.size:
            pos = np.arange(len(parent)) - np.concatenate(
                [[0], np.cumsum(np.bincount(parent, minlength=n_docs))[:-1]]
            )[parent]
        else:
            pos = codes
        n_tok = np.bincount(parent, minlength=n_docs).astype(np.int64)
        toks = words[codes] if codes.size else np.empty(0, object)
        masked = np.zeros(len(toks), bool)
        for i in range(len(toks)):
            h = hashlib.md5(
                f"{MLM_SALT}{doc_ids[parent[i]]}:{pos[i]}:{toks[i]}".encode(
                    "utf-8"
                )
            ).hexdigest()
            masked[i] = h[:2] < MLM_THRESH
        n_masked = np.bincount(
            parent[masked], minlength=n_docs
        ).astype(np.int64) if codes.size else np.zeros(n_docs, np.int64)
        out_tokens = np.where(masked, MLM_TOKEN, toks)
        fps = []
        start = 0
        for d in range(n_docs):
            k = int(n_tok[d])
            fps.append(
                hashlib.md5(
                    " ".join(out_tokens[start : start + k]).encode("utf-8")
                ).hexdigest()
            )
            start += k
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_masked": pa.array(n_masked, pa.int64()),
                "masked_md5": pa.array(fps, pa.string()),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


# ----------------------------------------------------------------------
# Blocklist content gate (moderation / brand-safety filter)
BLOCKLIST_TERMS = ("casino", "viagra", "xxx", "lottery", "warez")
BLOCKLIST_MAX = 0  # any hit drops the document


def t_blocklist_filter(sf_dir: str):
    """Blocklist content-moderation gate — the BRAND-SAFETY member of the
    filter family (t_gopher_rules/t_c4_filter measure quality; this
    enforces policy): per document the count of blocklisted whole-word
    case-insensitive hits and the keep/drop verdict (any hit drops).
    One streaming pass, zero shuffles: the shared `_word_codes`
    tokenizer, ONE lowercase+index_in over the batch dictionary (never
    per token), one bincount."""

    terms = pa.array(list(BLOCKLIST_TERMS), pa.string())

    def project(t: pa.Table) -> pa.Table:
        parent, codes, dictionary = _word_codes(t)
        hit_by_code = (
            pc.is_in(pc.utf8_lower(dictionary), value_set=terms)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_docs = t.num_rows
        hits = (
            np.bincount(parent, weights=hit_by_code[codes], minlength=n_docs)
            .astype(np.int64)
            if codes.size
            else np.zeros(n_docs, np.int64)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_blocked": pa.array(hits, pa.int64()),
                "verdict": pa.array(
                    np.where(hits > BLOCKLIST_MAX, "drop", "keep"), pa.string()
                ),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))


# ----------------------------------------------------------------------
# Code-vs-prose detection (LLM corpus routing filter)
CODE_SYMBOLS = "{});=<>[]"


def t_code_detect(sf_dir: str):
    """Code-vs-prose detection — the corpus ROUTING filter an LLM data
    pipeline needs before mixing (code gets its own dedup/quality rules
    and mixture weight): per document the line count, indented-line count
    (4-space or tab), code-symbol count, and a verdict from two integer
    cross-multiplied rules (>= 30% indented lines OR >= 5% symbol chars
    on nonempty text).  One streaming Arrow pass, zero shuffles; counts
    are codepoint-based on both sides (utf8_length / DuckDB length,
    char-wise translate)."""

    def project(t: pa.Table) -> pa.Table:
        text = t.column("text")
        lines = pc.split_pattern(text, "\n")
        n_lines = pc.cast(pc.list_value_length(lines), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_sym = None
        for ch in CODE_SYMBOLS:
            c = pc.cast(pc.count_substring(text, ch), pa.int64())
            n_sym = c if n_sym is None else pc.add(n_sym, c)
        flat = pc.list_flatten(lines)
        indented = pc.or_(
            pc.starts_with(flat, "    "), pc.starts_with(flat, "\t")
        )
        # per-doc sums over the flattened line list
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(t)), lens)
        ind = np.bincount(
            parent,
            weights=indented.to_numpy(zero_copy_only=False),
            minlength=len(t),
        ).astype(np.int64)
        nl = n_lines.to_numpy(zero_copy_only=False)
        nc = n_chars.to_numpy(zero_copy_only=False)
        ns = n_sym.to_numpy(zero_copy_only=False)
        is_code = (10 * ind >= 3 * nl) | ((nc > 0) & (20 * ns >= nc))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_lines": pa.array(nl, pa.int64()),
                "indent_lines": pa.array(ind, pa.int64()),
                "n_symbols": pa.array(ns, pa.int64()),
                "verdict": pa.array(
                    np.where(is_code, "code", "prose"), pa.string()
                ),
            }
        )

    ds = _read_documents(sf_dir).map_batches(project, batch_format="pyarrow")
    return _collect_sorted(ds, ("doc_id",), lambda: project(_empty_docs()))
