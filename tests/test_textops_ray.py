"""Text/dedup/similarity operators: planted-duplicate detection + invariants."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def docs_dir(ray_session, tmp_path_factory):
    """A documents table with planted exact and near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    near = base.replace("warm", "cold") + " today"
    rows = {
        "doc_id": list(range(10)),
        "text": [
            base,                      # 0
            base,                      # 1 exact dup of 0
            near,                      # 2 near dup of 0
            "completely different content about database query engines",
            "another unrelated piece of text mentioning ray data pipelines",
            base,                      # 5 exact dup of 0
            "short text",
            "the quick brown fox jumps over the lazy dog",  # 7 prefix overlap
            "numbers 123 456 789 and symbols #!? here",
            near,                      # 9 exact dup of 2
        ],
        "lang": ["en"] * 10,
        "source": ["t"] * 10,
        "n_chars": [0] * 10,
    }
    d = tmp_path_factory.mktemp("docs")
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_groups(docs_dir):
    from pdfray.pipelines.textops import t_exact_dedup

    out = t_exact_dedup(docs_dir)
    groups = {r.rep_doc: r.n_copies for r in out.itertuples()}
    assert groups[0] == 3  # docs 0, 1, 5
    assert groups[2] == 2  # docs 2, 9
    assert sum(groups.values()) == 10


def test_minhash_finds_planted_near_dups(docs_dir):
    from pdfray.pipelines.textops import t_minhash_pairs

    pairs = t_minhash_pairs(docs_dir, jaccard_threshold=0.5)
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    # exact dups must be found (jaccard 1.0)
    assert (0, 1) in found and (0, 5) in found and (1, 5) in found
    assert (2, 9) in found
    # near dup pair (word substitution) above 0.5 shingle jaccard
    assert (0, 2) in found or (1, 2) in found
    # unrelated docs must not pair
    assert not any(a == 3 or b == 3 for a, b in found)
    jac = dict(zip(zip(pairs["doc_a"], pairs["doc_b"]), pairs["jaccard"]))
    assert jac[(0, 1)] == 1.0


def test_simhash_properties(docs_dir):
    from pdfray.pipelines.textops import t_simhash

    out = t_simhash(docs_dir)
    h = dict(zip(out["doc_id"], out["simhash"]))
    assert h[0] == h[1] == h[5]  # identical text -> identical hash
    # near dup -> small hamming distance
    d = bin(int(h[0], 16) ^ int(h[2], 16)).count("1")
    assert d <= 12
    d_far = bin(int(h[0], 16) ^ int(h[3], 16)).count("1")
    assert d_far > d


def test_ngram_jaccard_dupes(docs_dir):
    from pdfray.pipelines.textops import t_ngram_jaccard_dupes

    pairs = t_ngram_jaccard_dupes(docs_dir, threshold=0.5)
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in found  # same simhash bucket + identical

    # the hamming<=12 candidate prefilter is an empirically-tuned margin
    # (token simhash vs char-gram Jaccard has no analytic bound): assert no
    # LONG-REGIME verified pair sits near it, so a corpus change that
    # erodes the margin fails loudly here instead of silently losing
    # recall.  Short-class pairs are exempt — they are found by exact
    # all-pairs scoring precisely because their hamming is unbounded.
    from pdfray.pipelines.textops import (
        _GRAM_SHORT_MAX,
        GramSetHasher,
        SimHasher,
        char_ngrams,
    )

    docs = pq.read_table(f"{docs_dir}/documents.parquet").to_pandas()
    sh = SimHasher()
    gh = GramSetHasher()
    hv = dict(zip(docs["doc_id"], sh.simhash_many(list(docs["text"]))))
    nfeat = {
        i: len(gh.hashed(char_ngrams(s)))
        for i, s in zip(docs["doc_id"], docs["text"])
    }
    for a, b in found:
        if max(nfeat[a], nfeat[b]) < _GRAM_SHORT_MAX:
            continue  # short-regime pair: exact path, no hamming bound
        d = bin(int(hv[a]) ^ int(hv[b])).count("1")
        assert d <= 10, (a, b, d)  # measured max 10; prefilter margin to 12


def test_neardup_generators_match_bruteforce_truth(ray_session):
    """Both near-dup pipelines reproduce the exact all-pairs ground truth
    on real testdata (this style of check exposed two short-doc pairs at
    Jaccard 0.93/0.97 that pure simhash banding missed in round 2)."""
    from pdfray.pipelines.textops import (
        _shingles,
        char_ngrams,
        t_minhash_pairs,
        t_ngram_jaccard_dupes,
        _WORD_RE,
    )

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    feats_by_kind = {
        "gram": {}, "shingle": {},
    }
    for i, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if not _WORD_RE.search(s):
            continue
        feats_by_kind["gram"][i] = char_ngrams(s)
        feats_by_kind["shingle"][i] = _shingles(s)

    def truth(kind, thr):
        feats = feats_by_kind[kind]
        ids = sorted(feats)
        out = set()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                A, B = feats[ids[x]], feats[ids[y]]
                inter = len(A & B)
                union = len(A | B)
                if union and inter / union >= thr:
                    out.add((ids[x], ids[y], round(inter / union, 4)))
        return out

    got_gram = {
        (int(a), int(b), float(j))
        for a, b, j in t_ngram_jaccard_dupes(sf).values.tolist()
    }
    assert got_gram == truth("gram", 0.5)
    got_min = {
        (int(a), int(b), float(j))
        for a, b, j in t_minhash_pairs(sf).values.tolist()
    }
    assert got_min == truth("shingle", 0.8)

    # threshold BELOW the 0.5 the static bounds were sized for: the regime
    # split must widen (short_max >= LONG_MIN/threshold) so no true pair
    # straddles the two regimes unowned
    got_low = {
        (int(a), int(b), float(j))
        for a, b, j in t_ngram_jaccard_dupes(sf, threshold=0.35).values.tolist()
    }
    assert got_low == truth("gram", 0.35)
    with pytest.raises(ValueError, match="threshold"):
        t_ngram_jaccard_dupes(sf, threshold=0.0)


def test_langid_on_snippets(ray_session, tmp_path):
    from pdfray.sources.fixtures import SNIPPETS
    from pdfray.pipelines.textops import t_langid

    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    i = 0
    for lang, snippets in SNIPPETS.items():
        for s in snippets:
            rows["doc_id"].append(i)
            rows["text"].append(s + " " + s)
            rows["lang"].append(lang)
            rows["source"].append("t")
            rows["n_chars"].append(len(s))
            i += 1
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = t_langid(str(tmp_path))
    acc = (out["lang_pred"] == out["lang"]).mean()
    assert acc >= 0.6  # a heuristic, but far above the 0.25 chance level


def test_knn_bruteforce_matches_numpy(ray_session):
    from pdfray.pipelines.simsearch import s_knn_bruteforce, TOP_K, N_QUERIES

    sf_dir = "/root/testdata/sf0.001"
    out = s_knn_bruteforce(sf_dir)
    assert set(out["query_id"]) == set(range(N_QUERIES))
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().sort_values("vec_id")
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    for qi in range(N_QUERIES):
        sims = vecs @ vecs[qi]
        order = np.lexsort((ids, -np.round(sims, 4)))[:TOP_K]
        expected = [int(ids[j]) for j in order]
        got = out[out["query_id"] == ids[qi]].sort_values("rank")["vec_id"].tolist()
        assert got == expected


def test_ann_lsh_recall(ray_session):
    from pdfray.pipelines.simsearch import s_ann_lsh

    out = s_ann_lsh("/root/testdata/sf0.001")
    assert (out["recall_at_k"] >= 0.3).all()
    assert (out["n_candidates"] > 0).all()


def test_ann_ivf_recall_and_pruning(ray_session):
    from pdfray.pipelines.simsearch import s_ann_ivf

    sf = "/root/testdata/sf0.001"
    out = s_ann_ivf(sf)
    n_rows = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows
    assert (out["n_candidates"] > 0).all()
    assert (out["n_candidates"] < n_rows).all()  # probing actually prunes
    assert (out["recall_at_k"] >= 0.3).all()
    # probing EVERY centroid recovers the exact result
    full = s_ann_ivf(sf, nprobe=10**6)
    assert (full["recall_at_k"] == 1.0).all()


def test_ann_candidate_companions_consistent(ray_session):
    """The exact-oracle candidate companions agree with each other and with
    the index definitions: the store-backed path reproduces the in-stream
    LSH candidate sets row-for-row, and every IVF query probes a nonempty
    strict subset of the corpus."""
    from pdfray.pipelines.simsearch import (
        s_ann_ivf_candidates,
        s_ann_lsh_candidates,
        s_ann_partitioned_candidates,
    )

    sf = "/root/testdata/sf0.001"
    in_stream = s_ann_lsh_candidates(sf)
    store = s_ann_partitioned_candidates(sf)
    pd.testing.assert_frame_equal(in_stream, store)
    assert len(in_stream) > 0

    ivf = s_ann_ivf_candidates(sf)
    n_rows = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows
    per_q = ivf.groupby("query_id").size()
    assert (per_q > 0).all() and (per_q < n_rows).all()


def test_ann_partitioned_store_prunes_io_at_equal_recall(ray_session, tmp_path):
    """The write-partitioned / read-probed store touches a strict subset of
    partitions and matches the in-stream ANN's recall (same planes/probes)."""
    from pdfray.pipelines.simsearch import (
        build_vector_store,
        query_vector_store,
        s_ann_lsh,
    )

    sf_dir = "/root/testdata/sf0.001"
    # force enough planes that the probe union cannot cover every bucket
    n_planes = 6
    store = str(tmp_path / "store")
    info = build_vector_store(sf_dir, store, n_planes=n_planes)
    assert info["n_planes"] == n_planes
    out = query_vector_store(store, sf_dir, n_planes)
    assert (out["n_parts_read"] < out["n_parts_total"]).all()
    assert (out["n_parts_read"] > 0).all()
    instream = s_ann_lsh(sf_dir, n_planes=n_planes)
    merged = out.merge(instream, on="query_id", suffixes=("_store", "_stream"))
    # identical planes + probe sets -> identical candidate sets and recall
    assert (
        merged["n_candidates_store"] == merged["n_candidates_stream"]
    ).all()
    assert (merged["recall_at_k_store"] == merged["recall_at_k_stream"]).all()


def test_vector_store_partition_readable_in_isolation(ray_session, tmp_path):
    from pdfray.pipelines.simsearch import build_vector_store

    import os

    sf_dir = "/root/testdata/sf0.001"
    store = str(tmp_path / "store")
    build_vector_store(sf_dir, store, n_planes=4)
    parts = sorted(d for d in os.listdir(store) if d.startswith("sigp="))
    assert len(parts) > 1
    one = pq.read_table(os.path.join(store, parts[0]))
    assert {"vec_id", "embedding", "sig"} <= set(one.column_names)
    # the data-side sig column matches the hive key for every row
    sig_val = int(parts[0].split("=", 1)[1])
    assert (one.column("sig").to_numpy() == sig_val).all()


def test_band_checkpoint_roundtrip_and_isolation(ray_session, tmp_path, docs_dir):
    """Band rows survive a hive-partitioned checkpoint; one band partition is
    readable in isolation and pairs generated from the checkpoint match the
    in-stream generator."""
    import os

    from pdfray.pipelines.textops import (
        MinHasher,
        _candidate_pairs,
        _read_documents,
        read_band_checkpoint,
        write_band_checkpoint,
    )

    ds = _read_documents(str(docs_dir))
    buckets = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 2))
    direct = set(
        map(tuple, _candidate_pairs(buckets, "doc_id").to_pandas().values.tolist())
    )
    store = str(tmp_path / "bands")
    buckets2 = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 2))
    write_band_checkpoint(buckets2, store)
    # one band partition in isolation
    one = read_band_checkpoint(store, bands=[0]).to_pandas()
    assert set(one["band"]) == {0}
    assert {"doc_id", "band_key", "band"} <= set(one.columns)
    # full roundtrip reproduces the candidate pairs
    restored = read_band_checkpoint(store)
    rt = set(
        map(tuple, _candidate_pairs(restored, "doc_id").to_pandas().values.tolist())
    )
    assert rt == direct and len(direct) > 0
    # a band filter matching nothing is a clear error, not an IndexError
    with pytest.raises(ValueError, match="no band partitions"):
        read_band_checkpoint(store, bands=[999])
    empty = str(tmp_path / "empty_bands")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no band partitions"):
        read_band_checkpoint(empty)


def test_embedding_dupes_scale_gate():
    from pdfray.pipelines.simsearch import (
        EXACT_PAIRS_MAX_ROWS,
        _require_exact_pairs_feasible,
    )

    _require_exact_pairs_feasible(EXACT_PAIRS_MAX_ROWS, force=False)  # at cap: ok
    with pytest.raises(ValueError, match="lsh_candidate_pairs"):
        _require_exact_pairs_feasible(EXACT_PAIRS_MAX_ROWS + 1, force=False)
    _require_exact_pairs_feasible(10**12, force=True)  # explicit override


def test_embedding_dupes_exact(ray_session):
    from pdfray.pipelines.simsearch import s_embedding_dupes

    sf_dir = "/root/testdata/sf0.001"
    out = s_embedding_dupes(sf_dir, threshold=0.4)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vecs @ vecs.T
    ids = t["vec_id"].to_numpy()
    expected = set()
    for r, c in zip(*np.nonzero(sims >= 0.4)):
        if ids[r] < ids[c]:
            expected.add((int(ids[r]), int(ids[c])))
    got = {(a, b) for a, b in zip(out["vec_a"], out["vec_b"])}
    assert got == expected


def test_token_stats_and_quality(docs_dir):
    from pdfray.pipelines.textops import t_quality, t_token_stats

    stats = t_token_stats(docs_dir)
    assert stats[stats["doc_id"] == 6]["n_tokens"].iloc[0] == 2
    quality = t_quality(docs_dir)
    row = quality[quality["doc_id"] == 8].iloc[0]
    assert row["n_chars"] == len("numbers 123 456 789 and symbols #!? here")
    assert row["n_alpha"] == sum(c.isalpha() for c in "numbers 123 456 789 and symbols #!? here")


def test_lsh_buckets_and_candidates(ray_session, tmp_path):
    """Planted identical vectors share a bucket; histogram covers the table."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.simsearch import lsh_candidate_pairs, s_lsh_buckets

    rng = np.random.RandomState(5)
    vecs = rng.randn(200, 16).astype(np.float32)
    vecs[7] = vecs[3]  # exact dup pair (3, 7)
    vecs[11] = vecs[3] + rng.randn(16).astype(np.float32) * 0.01  # near dup
    rows = {
        "vec_id": list(range(200)),
        "embedding": [list(map(float, v)) for v in vecs],
        "label": [0] * 200,
    }
    pq_.write_table(pa.table(rows), str(tmp_path / "embeddings.parquet"))

    hist = s_lsh_buckets(str(tmp_path))
    assert hist["n_vecs"].sum() == 200
    assert len(hist) > 1  # signatures actually split the space

    pairs = lsh_candidate_pairs(str(tmp_path))
    found = {(a, b) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    assert (3, 7) in found  # identical vectors always collide
    assert (3, 11) in found  # tiny perturbation stays in-bucket
    # candidate volume is bucket-bounded, far below all-pairs
    assert len(pairs) < 200 * 199 / 2 / 2


def test_bpe_token_counts(docs_dir):
    from pdfray.pipelines.textops import BpeTokenCounter, t_bpe_tokens

    c = BpeTokenCounter()
    t = pa.table({"doc_id": [0], "text": ["Hello world, it's 42 degrees!"]})
    # Hello | world | , | it | ' | s | 42 | degrees | !
    assert c(t)["n_bpe_tokens"][0].as_py() == 9
    out = t_bpe_tokens(docs_dir)
    assert (out["n_bpe_tokens"] > 0).sum() >= 9  # every non-trivial doc


def test_winnow_fingerprints_edit_robust(docs_dir):
    from pdfray.pipelines.textops import WinnowFingerprinter, t_winnow_fp

    w = WinnowFingerprinter()
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    edited = base.replace("warm", "cold")
    a, b = w.fingerprints(base), w.fingerprints(edited)
    inter = len(np.intersect1d(a, b))
    assert inter / max(len(a), len(b)) >= 0.5  # small edit, most fps shared
    far = w.fingerprints("completely different content about query engines")
    assert len(np.intersect1d(a, far)) == 0

    out = t_winnow_fp(docs_dir)
    assert set(out.columns) == {"doc_id", "n_fps"}  # oracle-comparable pair
    # digests come from the stage (the query projects them away)
    t = pq.read_table(f"{docs_dir}/documents.parquet", columns=["doc_id", "text"])
    full = w(t)
    d = dict(zip(full["doc_id"].to_pylist(), full["fp_digest"].to_pylist()))
    assert d[0] == d[1] == d[5]  # identical docs -> identical digest
    assert d[0] != d[3]


def test_asof_attribution_semantics(ray_session, tmp_path):
    """Purchases attribute to the latest prior click; clickless purchases drop."""
    import datetime

    import pyarrow.parquet as pq_

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, user, typ):
        return (eid, base + datetime.timedelta(seconds=sec), user, typ)

    rows = [
        ev(1, 0, 7, "purchase"),   # before any click -> dropped
        ev(2, 10, 7, "click"),
        ev(3, 20, 7, "click"),
        ev(4, 30, 7, "purchase"),  # -> click 3
        ev(5, 40, 7, "purchase"),  # -> click 3 (still latest)
        ev(6, 5, 8, "click"),
        ev(7, 6, 8, "purchase"),   # -> click 6
        ev(8, 50, 9, "view"),      # other types ignored
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    from pdfray.pipelines.relational import q_asof_attribution

    out = q_asof_attribution(str(tmp_path))
    got = {r.purchase_id: (r.click_id, r.gap_us) for r in out.itertuples()}
    assert got == {4: (3, 10_000_000), 5: (3, 20_000_000), 7: (6, 1_000_000)}


def test_short_class_scale_gate():
    from pdfray.pipelines.textops import (
        SHORT_CLASS_MAX_ROWS,
        _require_short_class_feasible,
    )

    _require_short_class_feasible(SHORT_CLASS_MAX_ROWS, force=False)
    with pytest.raises(ValueError, match="gram-count bands"):
        _require_short_class_feasible(SHORT_CLASS_MAX_ROWS + 1, force=False)
    _require_short_class_feasible(10**12, force=True)


def test_packed_argmax_matches_pandas(ray_session, tmp_path):
    """q_top_order_per_customer's order-preserving packing equals a plain
    pandas argmax under randomized cents-exact prices and tie groups."""
    rng = np.random.RandomState(11)
    n = 5000
    cust = rng.randint(0, 400, n)
    okey = rng.permutation(n) + 1
    price = np.round(rng.randint(100, 10_000_000, n) / 100.0, 2)
    # plant exact ties: several orders with identical price per customer
    price[: n // 10] = 12345.67
    df = pd.DataFrame(
        {"o_custkey": cust, "o_orderkey": okey, "o_totalprice": price}
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    from pdfray.pipelines.relational import q_top_order_per_customer

    got = q_top_order_per_customer(str(tmp_path))
    want = (
        df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        .groupby("o_custkey", as_index=False)
        .head(1)
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["o_custkey", "o_orderkey", "o_totalprice"]],
        want[["o_custkey", "o_orderkey", "o_totalprice"]],
    )


def test_repetition_counts_hand_verified(ray_session, tmp_path):
    """Planted repetition: a boilerplate doc (one word + one bigram looping),
    an all-unique doc, a single-word doc, and an empty doc."""
    from pdfray.pipelines.textops import t_repetition

    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "buy now buy now buy now buy again",  # template spam
            "five totally distinct simple words",
            "lonely",
            "",
        ],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
        "n_chars": [0] * 4,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = t_repetition(str(tmp_path)).set_index("doc_id")

    # doc 0: words = buy x4, now x3, again x1 -> 8 words, 3 unique, top 4
    # bigrams: "buy now" x3, "now buy" x2, "buy again" x1 -> 7 total,
    # 3 unique -> 4 duplicate occurrences, top 3
    assert out.loc[0].tolist() == [8, 3, 4, 7, 4, 3]
    assert out.loc[1].tolist() == [5, 5, 1, 4, 0, 1]
    assert out.loc[2].tolist() == [1, 1, 1, 0, 0, 0]
    assert out.loc[3].tolist() == [0, 0, 0, 0, 0, 0]


def test_doc_frequency_hand_verified(ray_session, tmp_path):
    """df counts documents (repeats inside one doc count once), tf counts
    occurrences; ties at the cut are broken by word order."""
    from pdfray.pipelines.textops import t_doc_frequency

    rows = {
        "doc_id": [0, 1, 2],
        "text": ["apple apple banana", "banana cherry", "apple  cherry"],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [0] * 3,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = t_doc_frequency(str(tmp_path), top_k=2)
    assert out["word"].tolist() == ["apple", "banana"]  # cherry loses the tie
    assert out["df"].tolist() == [2, 2]
    assert out["tf"].tolist() == [3, 2]


def test_tfidf_hand_verified(ray_session, tmp_path):
    """3 docs: a word in every doc has idf ln(1)=0; rarer words weigh in
    proportion to tf * ln(N/df)."""
    import math

    from pdfray.pipelines.textops import t_tfidf

    rows = {
        "doc_id": [0, 1, 2],
        "text": ["common rare rare", "common", "common unique"],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [0] * 3,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = t_tfidf(str(tmp_path)).set_index("doc_id")
    assert out["n_words"].tolist() == [3, 1, 2]
    # doc 0: common df3 -> 0, rare tf2 df1 -> 2*ln(3)
    assert out.loc[0, "tfidf_x1e3"] == int(math.floor(2 * math.log(3) * 1000 + 0.5))
    assert out.loc[1, "tfidf_x1e3"] == 0
    assert out.loc[2, "tfidf_x1e3"] == int(math.floor(math.log(3) * 1000 + 0.5))


def test_inverted_index_prunes_buckets_and_matches_truth(ray_session, tmp_path):
    """The store lookup reads only the probed words' bucket partitions and
    returns exactly the postings a full scan would."""
    import os

    from pdfray.pipelines.textops import (
        N_INDEX_BUCKETS,
        _word_bucket,
        build_inverted_index,
        query_inverted_index,
    )

    rows = {
        "doc_id": [0, 1, 2],
        "text": ["apple apple banana", "banana cherry", "apple cherry durian"],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [0] * 3,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    store = str(tmp_path / "store")
    build_inverted_index(str(tmp_path), store)

    probes = ("apple", "durian", "missing_word")
    out = query_inverted_index(store, probes)
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [("apple", 0, 2), ("apple", 2, 1), ("durian", 2, 1)]

    # pruning: the probed buckets are a strict subset of what exists
    on_disk = {d for d in os.listdir(store) if d.startswith("bucket=")}
    probed = {f"bucket={_word_bucket(w)}" for w in probes}
    assert len(probed) < len(on_disk) or len(on_disk) < N_INDEX_BUCKETS
    # a word outside the probed buckets never gets read: banana's bucket
    # differs from every probe's or the subset assertion above covers it
    assert query_inverted_index(store, ("missing_word",)).empty


def test_word_stats_family_matches_python_reference(ray_session, tmp_path):
    """Adversarial tokenization inputs (empty, all-spaces, leading/trailing/
    double spaces, unicode, single word): t_repetition and t_doc_frequency
    must agree with a naive Python recomputation."""
    from collections import Counter

    from pdfray.pipelines.textops import t_doc_frequency, t_repetition

    texts = [
        "",
        " ",
        "   ",
        "a",
        " a ",
        "a  b   a",
        "über ünïcode über",
        "x " * 50 + "x",
        "tab\tkeeps tab\ttogether",  # split is on ' ' only, like the oracle
    ]
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [0] * len(texts),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))

    rep = t_repetition(str(tmp_path)).set_index("doc_id")
    for i, s in enumerate(texts):
        words = [w for w in s.split(" ") if w]
        bigrams = list(zip(words, words[1:]))
        wc, bc = Counter(words), Counter(bigrams)
        assert rep.loc[i, "n_words"] == len(words)
        assert rep.loc[i, "n_unique_words"] == len(wc)
        assert rep.loc[i, "top_word_count"] == (max(wc.values()) if wc else 0)
        assert rep.loc[i, "n_bigrams"] == len(bigrams)
        assert rep.loc[i, "dup_bigram_occurrences"] == len(bigrams) - len(bc)
        assert rep.loc[i, "top_bigram_count"] == (max(bc.values()) if bc else 0)

    df = t_doc_frequency(str(tmp_path), top_k=1000)
    truth_df = Counter()
    truth_tf = Counter()
    for s in texts:
        words = [w for w in s.split(" ") if w]
        truth_tf.update(words)
        truth_df.update(set(words))
    assert dict(zip(df["word"], df["df"])) == dict(truth_df)
    assert dict(zip(df["word"], df["tf"])) == dict(truth_tf)


def test_cc_min_label_synthetic_graph(ray_session):
    """Chain (worst-case diameter), triangle, isolated edge — labels must
    converge to the component minimum for every node."""
    import ray.data as rd
    from pdfray.pipelines.textops import _cc_min_label

    edges = pd.DataFrame(
        {
            # chain 10-11-...-19, triangle 30-31-32, pair 50-51
            "doc_a": [10, 11, 12, 13, 14, 15, 16, 17, 18, 30, 31, 30, 50],
            "doc_b": [11, 12, 13, 14, 15, 16, 17, 18, 19, 31, 32, 32, 51],
        }
    ).astype("int64")
    labels = _cc_min_label(rd.from_pandas(edges)).to_pandas()
    comp = dict(zip(labels["node"], labels["label"]))
    assert {comp[n] for n in range(10, 20)} == {10}
    assert {comp[n] for n in (30, 31, 32)} == {30}
    assert {comp[n] for n in (50, 51)} == {50}
    assert len(comp) == 15  # only nodes that appear in an edge


def test_cc_path_graph_converges_in_log_rounds(ray_session):
    """Adversarial 10k-node PATH graph: plain min-label propagation needs
    O(diameter) = 10k rounds (it would blow CC_MAX_ITERS); the
    large-star/small-star contraction must finish in O(log n) rounds and
    still label every node with the component minimum."""
    import ray.data as rd

    from pdfray.pipelines.textops import _cc_min_label

    n = 10_000
    edges = pd.DataFrame(
        {
            "doc_a": np.arange(n - 1, dtype=np.int64),
            "doc_b": np.arange(1, n, dtype=np.int64),
        }
    )
    stats: dict = {}
    labels = _cc_min_label(rd.from_pandas(edges), stats=stats).to_pandas()
    assert len(labels) == n
    assert (labels["label"] == 0).all()
    # log2(10k) ~ 13.3 contraction rounds + 1 to observe the fixpoint;
    # generous headroom still excludes any O(diameter) behavior
    assert stats["rounds"] <= 2 * int(np.ceil(np.log2(n)))


def test_dup_components_planted(docs_dir):
    from pdfray.pipelines.textops import t_dup_components

    out = t_dup_components(docs_dir, jaccard_threshold=0.5)
    comp = dict(zip(out["doc_id"], out["component"]))
    # exact dups 0/1/5 and 2/9 connect (2 is a near dup of 0 at 0.5), so
    # the whole family collapses into one component rooted at doc 0
    for n in (0, 1, 2, 5, 9):
        assert comp[n] == 0
    # unrelated docs never enter the pair graph
    assert 3 not in comp and 4 not in comp and 8 not in comp


def test_dup_components_empty_graph(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfray.pipelines.textops import t_dup_components

    rows = {
        "doc_id": [0, 1],
        "text": ["entirely unique alpha", "different beta content"],
        "lang": ["en"] * 2,
        "source": ["t"] * 2,
        "n_chars": [0, 0],
    }
    d = tmp_path / "nodups"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = t_dup_components(str(d))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "component"]
    assert out["doc_id"].dtype == "int64" and out["component"].dtype == "int64"


def test_sessionize_gap_semantics(ray_session, tmp_path):
    """Strict 4h-gap rule: exactly-4h stays in-session, >4h breaks; ids are
    per-user 0-based and users never mix."""
    import datetime

    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import SESSION_GAP_HOURS, q_sessionize

    base = datetime.datetime(2024, 1, 1)
    H = 3600

    def ev(eid, sec, user):
        return (eid, base + datetime.timedelta(seconds=sec), user)

    rows = [
        ev(1, 0, 7),
        ev(2, SESSION_GAP_HOURS * H, 7),        # exactly 4h -> same session
        ev(3, SESSION_GAP_HOURS * H * 2 + 1, 7),  # 4h+1s -> breaks
        ev(4, SESSION_GAP_HOURS * H * 2 + 2, 7),
        ev(5, 0, 8),                              # other user: own session 0
        ev(6, SESSION_GAP_HOURS * H * 10, 8),     # long silence -> session 1
        # user 9 straddles the midnight CHUNK boundary within the gap: the
        # first session of day 1 must merge into day 0's last session
        ev(7, 23 * H + 3000, 9),                  # 23:50 day 0
        ev(8, 24 * H + 1800, 9),                  # 00:30 day 1 -> same session
        ev(9, 40 * H, 9),                         # day 1, >4h later -> breaks
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_sessionize(str(tmp_path))
    got = dict(zip(out["event_id"], out["session_id"]))
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 1, 7: 0, 8: 0, 9: 1}
    assert out["session_id"].dtype == "int64"


def test_sessionize_hot_user_splits_and_matches_reference(ray_session, tmp_path):
    """One user owning 50% of all events must (a) sessionize correctly
    across the time-chunk pre-split — including chains of boundary merges —
    and (b) actually SPREAD over shuffle groups instead of landing whole in
    one straggler bucket."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import (
        SESSION_CHUNK_DAYS,
        SESSION_GAP_HOURS,
        _session_keys,
        q_sessionize,
    )

    rng = np.random.default_rng(42)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    n_hot = 4000
    # hot user: events every 10min-6h over ~60 days — sessions regularly
    # cross midnight chunk edges, exercising merge chains
    hot_steps = rng.integers(600, 6 * 3600, n_hot).cumsum()
    hot_ts = base + hot_steps.astype("timedelta64[s]").astype("timedelta64[us]")
    cold_users = rng.integers(1, 500, n_hot)
    cold_ts = base + rng.integers(0, 60 * 86400, n_hot).astype(
        "timedelta64[s]"
    ).astype("timedelta64[us]")
    users = np.concatenate([np.zeros(n_hot, np.int64), cold_users])
    ts = np.concatenate([hot_ts, cold_ts])
    t = pa.table(
        {
            "event_id": pa.array(np.arange(2 * n_hot, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * (2 * n_hot)),
            "value": pa.array([1.0] * (2 * n_hot)),
            "props": pa.array(["{}"] * (2 * n_hot)),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))

    out = q_sessionize(str(tmp_path))
    # unchunked single-pass reference
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    gap = df["ts"].diff() > np.timedelta64(SESSION_GAP_HOURS, "h")
    same = df["user_id"].eq(df["user_id"].shift())
    df["session_id"] = (
        (gap & same).astype("int64").groupby(df["user_id"].to_numpy()).cumsum()
    )
    want = df.sort_values("event_id")[["event_id", "user_id", "session_id"]]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True)
    )

    # no straggler: the hot user's events spread over many shuffle groups,
    # and no single group holds more than a small fraction of its events
    chunk_us = SESSION_CHUNK_DAYS * 86_400_000_000
    hot_chunks, hot_buckets = _session_keys(
        np.zeros(n_hot, np.int64), hot_ts.astype(np.int64), 64, chunk_us
    )
    assert len(np.unique(hot_buckets)) > 20
    biggest = np.bincount(hot_buckets).max()
    assert biggest < 0.15 * n_hot


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_min_label_random_vs_union_find(ray_session, seed):
    """Randomized cross-check: min-label propagation must agree with a
    driver-side union-find on arbitrary (sparse and clustered) graphs."""
    import ray.data as rd

    from pdfray.pipelines.textops import _cc_min_label

    rng = np.random.RandomState(seed)
    # non-contiguous node ids; edge density spans sparse -> clustered
    nodes = rng.choice(10_000, size=120, replace=False).astype(np.int64)
    n_edges = [30, 80, 200][seed]
    a = nodes[rng.randint(0, len(nodes), n_edges)]
    b = nodes[rng.randint(0, len(nodes), n_edges)]
    keep = a != b  # self-loops excluded: the operator consumes dup PAIRS
    edges = pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges["doc_a"], edges["doc_b"]):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in parent}

    labels = _cc_min_label(rd.from_pandas(edges)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == want


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Users cohort by first-event week; later-week activity counts them."""
    import datetime

    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import q_retention_cohorts

    # week boundaries: 2024-01-01 and 2024-01-08 are both Mondays
    w1 = datetime.datetime(2024, 1, 3)   # inside week of Jan 1
    w2 = datetime.datetime(2024, 1, 10)  # inside week of Jan 8
    rows = [
        (1, w1, 100),  # user 100: cohort w1, active w1+w2
        (2, w2, 100),
        (3, w1, 101),  # user 101: cohort w1, active w1 only
        (4, w2, 102),  # user 102: cohort w2
        (5, w2, 102),  # duplicate same-week activity: counted once
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_retention_cohorts(str(tmp_path))
    got = {
        (r.cohort_week, r.activity_week): r.n_users for r in out.itertuples()
    }
    assert got == {
        ("2024-01-01", "2024-01-01"): 2,  # users 100, 101
        ("2024-01-01", "2024-01-08"): 1,  # user 100 retained
        ("2024-01-08", "2024-01-08"): 1,  # user 102 (deduped)
    }


def test_dup_spans_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import t_dup_spans

    shared = "one two three four five six seven eight"  # exactly one 8-gram
    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            shared + " tail_a",           # shares the 8-gram with doc 1
            "head_b " + shared,           # ...at a different position
            "totally different words with no overlap at all here",
            "short doc",                  # < 8 tokens: no grams
        ],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
        "n_chars": [0] * 4,
    }
    pq_.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = t_dup_spans(str(tmp_path)).set_index("doc_id")
    # docs 0/1 share exactly the one planted 8-gram (their other grams are
    # position-shifted and unique)
    assert out.loc[0, "n_dup_grams"] == 1 and bool(out.loc[0, "has_dup_span"])
    assert out.loc[1, "n_dup_grams"] == 1
    assert out.loc[2, "n_dup_grams"] == 0 and not bool(out.loc[2, "has_dup_span"])
    assert out.loc[3, "n_dup_grams"] == 0


def test_heavy_hitters_exact_under_truncating_sketch(ray_session, tmp_path):
    """Force real sketch truncation (vocab >> sketch_m, batches that each
    drop counters) and check the verify pass still recovers the EXACT
    top-k — the bound arithmetic, not corpus smallness, must carry it."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import t_heavy_hitters

    rng = np.random.RandomState(3)
    # zipf-ish: hot words appear corpus-wide, a long unique tail forces
    # every batch sketch to truncate at m=4
    texts = []
    for i in range(300):
        words = []
        words += ["hot%d" % (j % 7) for j in range(rng.randint(3, 9))]
        words += ["tail_%d_%d" % (i, j) for j in range(30)]
        rng.shuffle(words)
        texts.append(" ".join(words))
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(s) for s in texts],
    }
    pq_.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))

    from collections import Counter

    truth = Counter()
    for s in texts:
        truth.update(s.split())
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    # m=4 cannot certify (7 hot words per batch beat 4 slots): the
    # operator must detect that and escalate to the exact shuffle
    st = {}
    out = t_heavy_hitters(str(tmp_path), top_k=10, sketch_m=4, stats=st)
    assert st["certified"] is False
    got = list(zip(out["word"], out["tf"]))
    assert got == want

    # a big-enough sketch certifies and the recount path is exact too
    st2 = {}
    out2 = t_heavy_hitters(str(tmp_path), top_k=5, sketch_m=512, stats=st2)
    assert st2["certified"] is True
    assert list(zip(out2["word"], out2["tf"])) == want[:5]


def test_inverted_index_incremental_and_compaction(ray_session, tmp_path):
    """Watermark update: index(first half) + delta(second half) answers
    identically to index(full corpus); per-bucket compaction shrinks file
    counts without changing any lookup."""
    import glob

    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import (
        build_inverted_index,
        compact_inverted_index,
        query_inverted_index,
        update_inverted_index,
    )

    texts = [f"alpha beta w{i} gamma shared" for i in range(40)]
    rows = {
        "doc_id": list(range(40)),
        "text": texts,
        "lang": ["en"] * 40,
        "source": ["t"] * 40,
        "n_chars": [len(s) for s in texts],
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(pa.table(rows), str(d / "documents.parquet"))
    # the "yesterday" corpus: only docs < 20
    half = {k: [v[i] for i in range(20)] for k, v in rows.items()}
    dh = tmp_path / "docs_half"
    dh.mkdir()
    pq_.write_table(pa.table(half), str(dh / "documents.parquet"))

    full_store = str(tmp_path / "idx_full")
    incr_store = str(tmp_path / "idx_incr")
    build_inverted_index(str(d), full_store)
    build_inverted_index(str(dh), incr_store)
    update_inverted_index(str(d), incr_store, min_doc_id=20)

    probes = ["alpha", "shared", "w3", "w25", "absent_zz"]
    want = query_inverted_index(full_store, probes)
    got = query_inverted_index(incr_store, probes)
    pd.testing.assert_frame_equal(got, want)

    n_before = len(glob.glob(f"{incr_store}/bucket=*/*.parquet"))
    stats = compact_inverted_index(incr_store)
    n_after = len(glob.glob(f"{incr_store}/bucket=*/*.parquet"))
    assert stats["files_before"] == n_before
    assert stats["files_after"] == n_after < n_before
    pd.testing.assert_frame_equal(query_inverted_index(incr_store, probes), want)


def test_funnel_greedy_semantics(ray_session, tmp_path):
    """Strictly-after greedy path: a click BEFORE the first view does not
    qualify; a purchase between view and click does not qualify."""
    import datetime

    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import q_funnel

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, user, typ):
        return (eid, base + datetime.timedelta(seconds=sec), user, typ)

    rows = [
        # user 1: full path in order
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: click precedes the only view -> stops at view
        ev(4, 10, 2, "click"), ev(5, 20, 2, "view"),
        # user 3: purchase between view and click -> stops at click
        ev(6, 0, 3, "view"), ev(7, 5, 3, "purchase"), ev(8, 10, 3, "click"),
        # user 4: never views -> contributes nothing
        ev(9, 0, 4, "purchase"), ev(10, 5, 4, "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_funnel(str(tmp_path))
    got = dict(zip(out["step"], out["n_users"]))
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_label_centroids_match_numpy(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq_

    from pdfray.pipelines.simsearch import s_label_centroids

    rng = np.random.RandomState(5)
    n, d = 200, 16
    emb = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, 3, n)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int64()),
        }
    )
    pq_.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = s_label_centroids(str(tmp_path))
    for lab in range(3):
        sel = emb[labels == lab].astype(np.float64)
        want = (sel.sum(axis=0) / len(sel)).round(4)
        g = out[out["label"] == lab].sort_values("dim")
        assert (g["n"] == len(sel)).all()
        np.testing.assert_allclose(g["centroid"].to_numpy(), want, atol=1e-9)


def test_kmeans_matches_numpy_reference_and_converges(ray_session, tmp_path):
    """The distributed E-step/M-step must reproduce an independent numpy
    Lloyd implementation bit-for-bit (same deterministic init) and the
    inertia sequence must be non-increasing."""
    import numpy as np
    import pyarrow.parquet as pq_

    from pdfray.pipelines.simsearch import s_kmeans

    rng = np.random.RandomState(9)
    n, d, k, iters = 300, 8, 4, 6
    centers = rng.randn(k, d) * 4
    X = np.vstack([centers[i % k] + rng.randn(1, d) for i in range(n)]).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int64()),
        }
    )
    pq_.write_table(t, str(tmp_path / "embeddings.parquet"))

    # independent reference: plain-loop Lloyd with the same init rule
    Xd = X.astype(np.float64)
    C = Xd[:k].copy()  # k lowest vec_ids
    for _ in range(iters):
        d2 = ((Xd[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = Xd[a == c].mean(axis=0)
    ref_assign = (
        ((Xd[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    )

    st = {}
    out = s_kmeans(str(tmp_path), k=k, iters=iters, stats=st)
    assert (out["cluster"].to_numpy() == ref_assign).all()
    inert = st["inertia"]
    assert all(b <= a + 1e-6 for a, b in zip(inert, inert[1:]))
    np.testing.assert_allclose(st["centroids"], C, rtol=1e-9)


def test_local_topk_matches_full_sort(ray_session):
    """_topk (per-block local top-k + driver merge) reproduces a full
    sort().head(k) — including ties broken by the id column — without the
    global range shuffle sort().limit() would pay."""
    import ray.data as rd

    from pdfray.pipelines.relational import _topk

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 200, 5000),  # dense ties
            "id": np.arange(5000, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = _topk(ds, 50, ["v", "id"], [True, False])
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .head(50)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["v", "id"]], want)
    # k larger than the table: every row survives, still fully ordered
    got_all = _topk(ds, 10_000, ["v", "id"], [True, False])
    want_all = df.sort_values(["v", "id"], ascending=[False, True]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got_all[["v", "id"]], want_all)


def test_user_bucketize_actually_distributes():
    """Regression: int64 user ids x uint64 hash constant must spread across
    buckets — the unfixed numpy promotion to float64 collapsed EVERY user
    into bucket 0 (one worker got the whole table)."""
    users = np.arange(0, 150, dtype=np.int64)
    bucket = (users.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % 64
    assert len(np.unique(bucket)) > 32  # well spread over 64 buckets
    # and the buggy form really did collapse (documents the why)
    bad = (users * np.uint64(0x9E3779B97F4A7C15)) % 64
    assert len(np.unique(bad[1:])) <= 2


def test_inverted_index_delta_idempotent_and_compaction_recovery(
    ray_session, tmp_path
):
    """Retried delta appends must not double postings, and a compaction
    that crashed after publishing must roll FORWARD (delete retired files,
    never restore them next to the merged copy)."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import (
        build_inverted_index,
        compact_inverted_index,
        query_inverted_index,
        update_inverted_index,
    )

    texts = [f"alpha w{i} shared" for i in range(30)]
    rows = {
        "doc_id": list(range(30)),
        "text": texts,
        "lang": ["en"] * 30,
        "source": ["t"] * 30,
        "n_chars": [len(s) for s in texts],
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq_.write_table(pa.table(rows), str(d / "documents.parquet"))
    half = {k: [v[i] for i in range(15)] for k, v in rows.items()}
    dh = tmp_path / "half"
    dh.mkdir()
    pq_.write_table(pa.table(half), str(dh / "documents.parquet"))

    store = str(tmp_path / "idx")
    build_inverted_index(str(dh), store)
    update_inverted_index(str(d), store, min_doc_id=15, delta_id="d1")
    want = query_inverted_index(store, ["alpha", "shared", "w20"])
    # retried delta (same id): marker short-circuits, postings unchanged
    update_inverted_index(str(d), store, min_doc_id=15, delta_id="d1")
    pd.testing.assert_frame_equal(
        query_inverted_index(store, ["alpha", "shared", "w20"]), want
    )
    # simulate a crash mid-commit: marker removed, one bucket's delta files
    # partially present — rerun must converge to the same postings
    os.remove(f"{store}/_delta_d1_SUCCESS")
    update_inverted_index(str(d), store, min_doc_id=15, delta_id="d1")
    pd.testing.assert_frame_equal(
        query_inverted_index(store, ["alpha", "shared", "w20"]), want
    )

    # compaction roll-forward: craft the crashed state (final published,
    # retired files still on disk, manifest present)
    stats = compact_inverted_index(store)
    assert stats["files_after"] <= stats["files_before"]
    pd.testing.assert_frame_equal(
        query_inverted_index(store, ["alpha", "shared", "w20"]), want
    )
    bdirs = [b for b in sorted(glob.glob(f"{store}/bucket=*"))
             if glob.glob(os.path.join(b, "*.parquet"))]
    bdir = bdirs[0]
    final = sorted(glob.glob(os.path.join(bdir, "*.parquet")))[0]
    retired_name = ".retired-stale.parquet"
    shutil.copy(final, os.path.join(bdir, retired_name))  # stale original
    with open(os.path.join(bdir, ".compact-manifest"), "w") as fh:
        json.dump(
            {"final": os.path.basename(final), "retired": [retired_name]}, fh
        )
    compact_inverted_index(store)  # recovery must DELETE the retired copy
    assert not glob.glob(os.path.join(bdir, ".retired-*"))
    pd.testing.assert_frame_equal(
        query_inverted_index(store, ["alpha", "shared", "w20"]), want
    )
    # and roll-back: manifest present but final missing -> restore retired
    files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
    victim = files[0]
    os.rename(victim, os.path.join(bdir, ".retired-" + os.path.basename(victim)))
    with open(os.path.join(bdir, ".compact-manifest"), "w") as fh:
        json.dump(
            {
                "final": "compact-nonexistent.parquet",
                "retired": [".retired-" + os.path.basename(victim)],
            },
            fh,
        )
    compact_inverted_index(store)
    pd.testing.assert_frame_equal(
        query_inverted_index(store, ["alpha", "shared", "w20"]), want
    )


def test_gopher_and_c4_rules_hand_verified(ray_session, tmp_path):
    """Planted documents hitting each rule boundary exactly."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import t_c4_filter, t_gopher_rules

    good = ("the quick brown fox jumps with vigor. " * 8).strip()  # passes all
    texts = [
        good,                                           # 0: keeps
        "the of short",                                 # 1: < 50 words
        " ".join(["supercalifragilistic"] * 60),        # 2: mean word len > 10
        good + " " + "#" * 40,                          # 3: symbol ratio blown
        "\n".join(["- the bullet of line here"] * 10),  # 4: 100% bullet lines
        " ".join(["123"] * 60) + " the of",             # 5: < 80% alpha words
        " ".join(["zz"] * 60),                          # 6: no stop words
    ]
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    d = tmp_path / "gopher"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))

    g = t_gopher_rules(str(d)).set_index("doc_id")
    assert bool(g.loc[0, "keep"]) is True
    assert not g.loc[[1, 2, 3, 4, 5, 6], "keep"].any()
    assert g.loc[4, "n_bullet"] == 10 and g.loc[4, "n_lines"] == 10
    assert g.loc[3, "n_symbols"] >= 40

    c4_texts = [
        "This line is fine.\nAnother good line here!\nAnd a third one?",  # keeps
        "This line is fine.\nAnother good line here!",       # only 2 kept lines
        "No terminal punctuation here\nor here\nor here",    # nothing kept
        "Uses javascript heavily today.\nGood line one here.\n"
        "Good line two here.\nGood line three here.",        # js line dropped, still 3
        "Lorem ipsum dolor sit amet.\nGood line one here.\n"
        "Good line two here.\nGood line three here.",        # page has lorem
        "A brace { appears.\nGood line one here.\n"
        "Good line two here.\nGood line three here.",        # page has brace
    ]
    t2 = pa.table(
        {
            "doc_id": pa.array(range(len(c4_texts)), pa.int64()),
            "text": pa.array(c4_texts),
            "lang": pa.array(["en"] * len(c4_texts)),
            "source": pa.array(["t"] * len(c4_texts)),
            "n_chars": pa.array([len(s) for s in c4_texts], pa.int64()),
        }
    )
    d2 = tmp_path / "c4"
    d2.mkdir()
    pq_.write_table(t2, str(d2 / "documents.parquet"))
    c = t_c4_filter(str(d2)).set_index("doc_id")
    assert bool(c.loc[0, "keep"]) is True and c.loc[0, "n_kept_lines"] == 3
    assert bool(c.loc[1, "keep"]) is False
    assert c.loc[2, "n_kept_lines"] == 0
    assert bool(c.loc[3, "keep"]) is True and c.loc[3, "n_kept_lines"] == 3
    assert bool(c.loc[4, "keep"]) is False and bool(c.loc[4, "has_lorem"])
    assert bool(c.loc[5, "keep"]) is False and bool(c.loc[5, "has_brace"])


def test_pii_scrub_planted(ray_session, tmp_path):
    """Planted emails / IPv4s / phone numbers are counted and redacted; the
    scrubbed fingerprint matches an independently computed md5."""
    import hashlib

    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import t_pii_scrub

    texts = [
        "contact alice.smith+spam@ex-ample.co.uk or bob@x.io today",
        "server at 192.168.0.1 and 10.0.0.255, call +1 555 123 4567",
        "no pii here at all",
        "edge 999.999.999.999 still matches the naive ipv4 shape",
        "",
    ]
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    d = tmp_path / "pii"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    out = t_pii_scrub(str(d)).set_index("doc_id")
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_phones"] == 0
    assert out.loc[1, "n_ips"] == 2 and out.loc[1, "n_phones"] == 1
    assert out.loc[2, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    assert out.loc[3, "n_ips"] == 1
    want0 = hashlib.md5(
        "contact <EMAIL> or <EMAIL> today".encode()
    ).hexdigest()
    assert out.loc[0, "scrubbed_fp"] == want0
    want1 = hashlib.md5(
        "server at <IP> and <IP>, call <PHONE>".encode()
    ).hexdigest()
    assert out.loc[1, "scrubbed_fp"] == want1
    assert out.loc[2, "scrubbed_fp"] == hashlib.md5(texts[2].encode()).hexdigest()


def test_delta_dedup_bloom_matches_exact_and_prunes(ray_session, tmp_path):
    """The Bloom + bucketed-store form is row-identical to the broadcast-set
    form on real testdata, and the Bloom actually prunes: far fewer rows
    reach the store probe than exist, with zero false negatives by
    construction (planted dup must still be flagged)."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import (
        DELTA_MOD,
        t_delta_dedup,
        t_delta_dedup_bloom,
    )

    sf = "/root/testdata/sf0.001"
    want = t_delta_dedup(sf)
    stats: dict = {}
    got = t_delta_dedup_bloom(sf, stats=stats)
    pd.testing.assert_frame_equal(got, want)
    assert stats["n_new"] == len(want)
    assert stats["n_dups"] == int(want["is_dup"].sum())
    # no false negatives: every true dup was bloom-maybe
    assert stats["n_bloom_maybe"] >= stats["n_dups"]

    # planted corpus: one new doc duplicating an existing one, one unique
    texts = {
        0: "alpha beta gamma delta words here",          # new (0 % 5 == 0)
        1: "alpha beta gamma delta words here",          # existing twin
        2: "totally different existing content",         # existing
        5: "nothing like anything else at all",          # new, unique
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["t"] * len(ids)),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    d = tmp_path / "bloomdocs"
    d.mkdir()
    pq_.write_table(t, str(d / "documents.parquet"))
    assert 0 % DELTA_MOD == 0 and 5 % DELTA_MOD == 0
    out = t_delta_dedup_bloom(str(d)).set_index("doc_id")
    assert bool(out.loc[0, "is_dup"]) is True
    assert bool(out.loc[5, "is_dup"]) is False


def test_pq_codes_match_independent_numpy(ray_session):
    """s_pq codes are bit-equal to an independent numpy recomputation from
    the raw parquet (sample -> L2 Lloyd per subspace -> argmin assign), and
    quantize within the advertised width."""
    from pdfray.pipelines.simsearch import (
        PQ_CODEBOOK,
        PQ_SUBSPACES,
        _pq_bounds,
        pq_codebooks,
        s_pq,
    )

    sf = "/root/testdata/sf0.001"
    out = s_pq(sf)
    assert out["code"].between(0, PQ_CODEBOOK - 1).all()
    assert set(out["subspace"]) == set(range(PQ_SUBSPACES))

    df = (
        pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    sample = X[: min(len(X), 50 * PQ_CODEBOOK)]
    books = pq_codebooks(sample)
    bounds = _pq_bounds(X.shape[1])
    want = np.empty((len(X), PQ_SUBSPACES), dtype=np.int64)
    for m, C in enumerate(books):
        sub = X[:, bounds[m] : bounds[m + 1]]
        scores = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)
        want[:, m] = scores.argmin(axis=1)
    got = out.sort_values(["vec_id", "subspace"])["code"].to_numpy().reshape(
        len(X), PQ_SUBSPACES
    )
    assert (got == want).all()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sessionize_randomized_vs_unchunked_reference(ray_session, tmp_path, seed):
    """Randomized cross-check of the chunked sessionizer: arbitrary user/
    timestamp mixes (incl. sub-gap bursts straddling midnight and long
    silences) must match the single-pass unchunked rule exactly."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import SESSION_GAP_HOURS, q_sessionize

    rng = np.random.default_rng(seed)
    n = 3000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    users = rng.integers(0, 40, n)
    # mixture: short bursts, near-gap spacings, and multi-day silences
    steps = rng.choice(
        [60, 3600, SESSION_GAP_HOURS * 3600, SESSION_GAP_HOURS * 3600 + 1, 90000],
        size=n,
        p=[0.3, 0.25, 0.15, 0.15, 0.15],
    ).cumsum()
    ts = base + (steps + rng.integers(0, 50, n)).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    order = rng.permutation(n)  # arbitrary file order
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)[order]),
            "ts": pa.array(ts[order], pa.timestamp("us")),
            "user_id": pa.array(users[order], pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_sessionize(str(tmp_path))

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    gap = df["ts"].diff() > np.timedelta64(SESSION_GAP_HOURS, "h")
    same = df["user_id"].eq(df["user_id"].shift())
    df["session_id"] = (
        (gap & same).astype("int64").groupby(df["user_id"].to_numpy()).cumsum()
    )
    want = df.sort_values("event_id")[["event_id", "user_id", "session_id"]]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_dedup_keep_best_planted(docs_dir):
    """Keep decision: the family {0,1,2,5,9} (exact + near dups) keeps its
    longest member; ties fall to the lower doc_id."""
    from pdfray.pipelines.textops import t_dedup_keep_best

    out = t_dedup_keep_best(docs_dir, jaccard_threshold=0.5)
    row = out.set_index("component").loc[0]
    # docs 2 and 9 are 'near' (base + ' today': one token longer than base);
    # the tie between the two equal-length copies resolves to doc 2
    assert row["keep_doc"] == 2
    assert row["n_members"] == 5
    docs = pq.read_table(f"{docs_dir}/documents.parquet").to_pandas()
    want_tokens = len(docs.set_index("doc_id").loc[2, "text"].split())
    assert row["keep_tokens"] == want_tokens


def test_bpe_train_classic_example_and_distributed_parity(ray_session, tmp_path):
    """Merge learning reproduces the classic Sennrich worked example by
    hand, and the distributed word-count pass feeds the loop exactly what
    a direct single-process count would (bit-equal merge tables)."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import BPE_EOW, bpe_train_merges, t_bpe_train

    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_merges(counts, 3)
    assert merges[0] == ("e", "s", 9)  # ties (e,s)/(s,t</w>) -> lexicographic
    assert merges[1] == ("es", "t" + BPE_EOW, 9)
    assert merges[2] == ("l", "o", 7)

    sf = "/root/testdata/sf0.001"
    got = t_bpe_train(sf, n_merges=10)
    assert list(got.columns) == ["rank", "left", "right", "count"]
    assert (got["rank"] == np.arange(1, len(got) + 1)).all()
    # independent reference: direct count over the raw parquet
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    ref_counts: dict = {}
    for s in docs["text"].to_pylist():
        for w in s.split(" "):
            if w:
                ref_counts[w] = ref_counts.get(w, 0) + 1
    want = bpe_train_merges(ref_counts, 10)
    assert list(map(tuple, got[["left", "right", "count"]].values)) == want


def test_bpe_apply_matches_independent_python(ray_session, tmp_path):
    """Distributed BPE application (vocab-table broadcast + dictionary
    lookup) is bit-equal to a direct per-word Python application, and
    merged words genuinely compress (fewer symbols than characters)."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.textops import (
        BPE_EOW,
        bpe_apply_to_word,
        bpe_train_merges,
        t_bpe_apply,
    )

    sf = "/root/testdata/sf0.001"
    out = t_bpe_apply(sf, n_merges=10).set_index("doc_id")
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    counts: dict = {}
    per_doc = {}
    for i, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ws = [w for w in s.split(" ") if w]
        per_doc[i] = ws
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    merges = bpe_train_merges(counts, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    wlen = {w: bpe_apply_to_word(w, ranks) for w in counts}
    for i, ws in per_doc.items():
        assert out.loc[i, "n_words"] == len(ws)
        assert out.loc[i, "n_bpe_tokens"] == sum(wlen[w] for w in ws)
    # merges compress: total symbols < total chars+EOW for merged words
    merged_word = max(counts, key=lambda w: len(w) - wlen[w])
    assert wlen[merged_word] < len(merged_word) + 1
    # greedy application edge: a single-char word is one EOW-marked symbol
    assert bpe_apply_to_word("a", ranks) == 1
    assert BPE_EOW  # marker nonempty by contract


@pytest.mark.parametrize("seed", [0, 1])
def test_range_join_randomized_vs_bruteforce(ray_session, tmp_path, seed):
    """Randomized cross-check of the banded range join: arbitrary
    view/purchase mixes — including a hot user owning ~40% of events,
    pairs straddling chunk boundaries, and timestamps planted EXACTLY at
    the window edge (dt == W kept, dt == W + 1us dropped, dt == 0
    dropped) — must match the quadratic pandas reference exactly."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import (
        RANGE_JOIN_WINDOW_MIN,
        q_range_join_view_purchase,
    )

    w_us = RANGE_JOIN_WINDOW_MIN * 60_000_000
    rng = np.random.default_rng(seed)
    n = 4000
    base = 1_700_000_000_000_000  # us epoch
    # hot user 7 owns ~40%; spacing mixes sub-window bursts with silences
    users = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 25, n))
    steps = rng.choice(
        [1_000_000, w_us // 3, w_us, 5 * w_us], size=n, p=[0.4, 0.3, 0.2, 0.1]
    ).cumsum()
    ts = base + steps + rng.integers(0, 1000, n)
    kinds = rng.choice(["view", "purchase", "click"], size=n, p=[0.4, 0.4, 0.2])
    # plant exact-boundary cases for one user: dt == 0, dt == W, dt == W+1
    extra_ts = np.array(
        [base, base, base + w_us, base + w_us + 1, base + 10, base + 10 + w_us],
        dtype=np.int64,
    )
    extra_users = np.full(6, 99, dtype=np.int64)
    extra_kinds = ["view", "purchase", "purchase", "purchase", "view", "purchase"]
    users = np.concatenate([users, extra_users])
    ts = np.concatenate([ts, extra_ts])
    kinds = np.concatenate([kinds, extra_kinds])
    n_all = len(ts)
    order = rng.permutation(n_all)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_all, dtype=np.int64)[order]),
            "ts": pa.array(ts[order], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(users[order], pa.int64()),
            "event_type": pa.array(kinds[order].tolist(), pa.string()),
            "value": pa.array([1.0] * n_all),
            "props": pa.array(["{}"] * n_all),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_range_join_view_purchase(str(tmp_path))

    df = t.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    v = df[df["event_type"] == "view"]
    p = df[df["event_type"] == "purchase"]
    ref = v.merge(p, on="user_id", suffixes=("_v", "_p"))
    ref = ref[
        (ref["ts_us_p"] > ref["ts_us_v"])
        & (ref["ts_us_p"] <= ref["ts_us_v"] + w_us)
    ]
    ref = (
        ref[["event_id_v", "event_id_p"]]
        .rename(columns={"event_id_v": "view_id", "event_id_p": "purchase_id"})
        .sort_values(["view_id", "purchase_id"])
        .reset_index(drop=True)
    )
    assert len(ref) > 0  # the planted dt==W pair guarantees a nonempty check
    pd.testing.assert_frame_equal(out, ref)
    # boundary semantics on the planted user-99 rows (event ids n..n+5 in
    # pre-shuffle order: view@0, purchase@0, purchase@W, purchase@W+1,
    # view@10, purchase@10+W): dt == W kept, dt == W+1us and dt == 0 dropped
    got = set(map(tuple, out[out["view_id"].isin([n, n + 4])].to_numpy().tolist()))
    assert (n, n + 2) in got  # dt == W exactly
    assert (n, n + 3) not in got  # dt == W + 1us
    assert (n, n + 1) not in got  # dt == 0
    assert (n, n + 5) not in got  # dt == W + 10us
    assert (n + 4, n + 5) in got  # dt == W exactly, chunk-straddling


def test_range_join_empty_and_no_match(ray_session, tmp_path):
    """Zero views (and a views-only corpus) produce an EMPTY pair table
    with the contract schema — the all-empty map_groups path must not
    lose the (view_id, purchase_id) columns."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import q_range_join_view_purchase

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([5, 5, 5], pa.int64()),
            "event_type": pa.array(["view", "view", "click"]),
            "value": pa.array([0.0, 0.0, 0.0]),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_range_join_view_purchase(str(tmp_path))
    assert list(out.columns) == ["view_id", "purchase_id"]
    assert len(out) == 0
    assert out["view_id"].dtype == np.int64


def test_pivot_event_matrix_matches_crosstab(ray_session, tmp_path):
    """The distributed combiner pivot equals a single-pass pandas
    crosstab, including users missing whole event types (zero-filled
    int64 columns)."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import EVENT_TYPES, q_pivot_event_matrix

    rng = np.random.default_rng(3)
    n = 5000
    users = rng.integers(0, 30, n)
    kinds = rng.choice(list(EVENT_TYPES), size=n)
    kinds[users == 3] = "view"  # user 3 has zero counts in 4 of 5 columns
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.full(n, 1_700_000_000_000_000, dtype=np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(kinds.tolist(), pa.string()),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    out = q_pivot_event_matrix(str(tmp_path))

    ref = pd.crosstab(pd.Series(users, name="user_id"), pd.Series(kinds))
    ref = ref.reindex(columns=list(EVENT_TYPES), fill_value=0).astype("int64")
    ref.columns = [f"n_{c}" for c in EVENT_TYPES]
    ref = ref.reset_index().sort_values("user_id").reset_index(drop=True)
    ref["user_id"] = ref["user_id"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)


def test_pivot_event_matrix_distributed_regime_matches(
    ray_session, tmp_path, monkeypatch
):
    """Forcing the huge-user-universe regime (distributed groupby instead
    of the driver merge) must produce the identical matrix."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(11)
    n = 2000
    users = rng.integers(0, 20, n)
    kinds = rng.choice(list(R.EVENT_TYPES), size=n)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.full(n, 1_700_000_000_000_000, dtype=np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(kinds.tolist(), pa.string()),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    small = R.q_pivot_event_matrix(str(tmp_path))
    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_pivot_event_matrix(str(tmp_path))
    pd.testing.assert_frame_equal(small, big)


def test_pq_adc_matches_independent_numpy(ray_session):
    """s_pq_adc's top-k is identical to an independent numpy ADC pass over
    the raw parquet (retrain books -> assign codes -> LUT gather -> rank
    rounded-dist asc / vec_id asc), and ADC of a query against ITSELF
    ranks its own quantization cell at distance == the query's
    reconstruction error (sanity: top-1 per query has minimal dist)."""
    from pdfray.pipelines.simsearch import (
        N_QUERIES,
        PQ_CODEBOOK,
        PQ_SUBSPACES,
        TOP_K,
        _pq_bounds,
        pq_codebooks,
        s_pq_adc,
    )

    sf = "/root/testdata/sf0.001"
    out = s_pq_adc(sf)

    df = (
        pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    books = pq_codebooks(X[: min(len(X), 50 * PQ_CODEBOOK)])
    bounds = _pq_bounds(X.shape[1])
    codes = np.empty((len(X), PQ_SUBSPACES), dtype=np.int64)
    for m, C in enumerate(books):
        sub = X[:, bounds[m] : bounds[m + 1]]
        codes[:, m] = (-2.0 * (sub @ C.T) + (C * C).sum(axis=1)).argmin(axis=1)
    qmat = X[:N_QUERIES]
    frames = []
    for qi in range(N_QUERIES):
        dist = np.zeros(len(X))
        for m, C in enumerate(books):
            qsub = qmat[qi, bounds[m] : bounds[m + 1]]
            lut = ((qsub[None, :] - C) ** 2).sum(axis=1)
            dist += lut[codes[:, m]]
        dist = np.round(dist, 4)
        order = np.lexsort((ids, dist))[:TOP_K]
        frames.append(
            pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "rank": np.arange(1, len(order) + 1),
                    "vec_id": ids[order],
                    "dist": dist[order],
                }
            )
        )
    want = pd.concat(frames).reset_index(drop=True)
    got = out.copy()
    got["rank"] = got["rank"].astype(want["rank"].dtype)
    pd.testing.assert_frame_equal(got, want)
    # per query the rank-1 dist is the minimum of its column
    for qi in range(N_QUERIES):
        g = want[want["query_id"] == ids[qi]]
        assert g.iloc[0]["dist"] == g["dist"].min()


def test_ivfpq_full_probe_equals_plain_adc_and_subset_property(ray_session):
    """IVF-PQ invariants: (1) probing EVERY cell recovers plain ADC
    exactly (the coarse filter passes everything, leaving pure ADC);
    (2) with the default probe budget each query's result rows are a
    subset of its probed-cell candidate set, ranked by the same rounded
    dist/vec_id order."""
    from pdfray.pipelines.simsearch import (
        _ivf_index,
        s_ann_ivfpq,
        s_pq_adc,
    )

    sf = "/root/testdata/sf0.001"
    _qids, _qm, _cent, _probes, k, _np_ = _ivf_index(sf)
    full = s_ann_ivfpq(sf, n_centroids=k, nprobe=k)
    plain = s_pq_adc(sf)
    pd.testing.assert_frame_equal(full, plain)

    pruned = s_ann_ivfpq(sf)
    assert (pruned.groupby("query_id")["rank"].max() <= 10).all()
    # pruning only REMOVES candidates, so a surviving row's pruned rank
    # can only improve (compress) relative to its all-cells ADC rank, and
    # its ADC distance is identical
    merged = pruned.merge(
        full, on=["query_id", "vec_id"], how="left", suffixes=("", "_full")
    )
    hit = merged["rank_full"].notna()
    assert (merged.loc[hit, "rank_full"] >= merged.loc[hit, "rank"]).all()
    assert (merged.loc[hit, "dist_full"] == merged.loc[hit, "dist"]).all()


def test_ann_rerank_full_shortlist_equals_bruteforce(ray_session, monkeypatch):
    """Re-rank invariants: (1) with the shortlist widened to the corpus
    size the two-stage result IS brute-force kNN (ADC recall can no
    longer lose anything and the refine is the exact kernel); (2) at the
    default shortlist every emitted sim equals the brute-force sim for
    that (query, vec) pair — the refine stage never approximates."""
    import pdfray.pipelines.simsearch as S

    sf = "/root/testdata/sf0.001"
    n = S._read_embeddings(sf).count()
    monkeypatch.setattr(S, "RERANK_SHORTLIST", n)
    full = S.s_ann_rerank(sf)
    brute = S.s_knn_bruteforce(sf)
    pd.testing.assert_frame_equal(full, brute)

    monkeypatch.undo()
    rer = S.s_ann_rerank(sf)
    assert (rer.groupby("query_id")["rank"].max() <= 10).all()
    merged = rer.merge(
        brute, on=["query_id", "vec_id"], how="left", suffixes=("", "_bf")
    )
    hit = merged["sim_bf"].notna()
    assert (merged.loc[hit, "sim_bf"] == merged.loc[hit, "sim"]).all()


def _write_events(tmp_path, users, ts_us, kinds):
    import pyarrow.parquet as pq_

    n = len(users)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(np.asarray(users, np.int64), pa.int64()),
            "event_type": pa.array(list(kinds), pa.string()),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    return t


def test_hll_matches_independent_python_and_truth(ray_session, tmp_path):
    """q_hll_user_days equals an independent per-key-set Python HLL
    (different code path: dedup first, dict registers, int bit_length)
    on every column including the integer register digests, and the
    estimate lands within 5% of the true distinct count."""
    import hashlib

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(7)
    n = 6000
    users = rng.integers(0, 900, n)
    day = rng.integers(0, 40, n)
    base = 1_700_000_000_000_000
    ts = base + day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    kinds = rng.choice(["view", "click"], size=n, p=[0.7, 0.3])
    _write_events(tmp_path, users, ts, kinds)
    out = R.q_hll_user_days(str(tmp_path))

    df = pd.DataFrame({"u": users, "ts": pd.to_datetime(ts, unit="us"), "k": kinds})
    df["key"] = df["u"].astype(str) + "@" + df["ts"].dt.strftime("%Y-%m-%d")
    ref_rows = []
    for et, g in df.groupby("k"):
        regs = {}
        for key in set(g["key"]):
            hv = int.from_bytes(hashlib.md5(key.encode()).digest()[8:], "little")
            b = hv % R.HLL_M
            w = (hv >> R.HLL_P) % (1 << R.HLL_WBITS)
            rho = 33 if w == 0 else 33 - w.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        v_zero = R.HLL_M - len(regs)
        t_scaled = sum(1 << (33 - r) for r in regs.values()) + v_zero * (1 << 33)
        ref_rows.append(
            {
                "event_type": et,
                "v_zero": v_zero,
                "t_scaled": t_scaled,
                "est": R._hll_finalize(v_zero, t_scaled),
                "truth": g["key"].nunique(),
            }
        )
    ref = pd.DataFrame(ref_rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out,
        ref[["event_type", "v_zero", "t_scaled", "est"]].astype(
            {"v_zero": "int64", "t_scaled": "int64"}
        ),
    )
    for _, r in ref.iterrows():
        assert abs(r["est"] - r["truth"]) / r["truth"] < 0.05, dict(r)


def test_hll_distributed_regime_matches(ray_session, tmp_path, monkeypatch):
    """Forcing the distributed-groupby merge regime yields the identical
    sketch (register max is associative/commutative either way)."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(13)
    n = 3000
    users = rng.integers(0, 500, n)
    ts = 1_700_000_000_000_000 + rng.integers(0, 30, n) * 86_400_000_000
    kinds = rng.choice(["view", "purchase"], size=n)
    _write_events(tmp_path, users, ts, kinds)
    small = R.q_hll_user_days(str(tmp_path))
    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_hll_user_days(str(tmp_path))
    pd.testing.assert_frame_equal(small, big)


def _write_lineitem_qty(tmp_path, flags, qty):
    import pyarrow.parquet as pq_

    t = pa.table(
        {
            "l_returnflag": pa.array(list(flags), pa.string()),
            "l_quantity": pa.array(np.asarray(qty, np.float64)),
        }
    )
    pq_.write_table(t, str(tmp_path / "lineitem.parquet"))


@pytest.mark.parametrize("seed", [0, 1])
def test_group_quantiles_matches_duckdb(ray_session, tmp_path, seed):
    """Randomized cross-check of the histogram quantile_cont replay vs
    DuckDB itself — fractional values with heavy ties, a group of one row
    (interpolation degenerates to the value), and a two-row group (pure
    interpolation between distinct values)."""
    import duckdb

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(seed)
    n = 5000
    flags = rng.choice(["A", "N", "R"], size=n).tolist()
    qty = np.round(rng.uniform(0, 30, n) * 4) / 4  # quarter-steps: many ties
    flags += ["X", "Y", "Y"]
    qty = np.concatenate([qty, [7.25, 1.0, 2.0]])
    _write_lineitem_qty(tmp_path, flags, qty)
    out = R.q_group_quantiles(str(tmp_path))

    con = duckdb.connect()
    ref = con.execute(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "ROUND(median(l_quantity), 6) AS med_qty, "
        "ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty "
        f"FROM read_parquet('{tmp_path}/lineitem.parquet') "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ).df()
    pd.testing.assert_frame_equal(out, ref)
    assert out[out["l_returnflag"] == "X"]["med_qty"].iloc[0] == 7.25
    assert out[out["l_returnflag"] == "Y"]["p90_qty"].iloc[0] == pytest.approx(1.9)


def test_bloom_probe_has_no_false_negatives():
    """Property: every inserted key survives the probe (the bloom-join
    correctness precondition), and the false-positive rate on disjoint
    keys stays well under the exact-join cleanup budget."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 62, 4000).astype(np.int64)
    bits = np.zeros(R.BLOOM_BITS // 8, np.uint8)
    idx = R._bloom_probe_idx(keys).ravel()
    np.bitwise_or.at(
        bits,
        (idx >> np.uint64(3)).astype(np.int64),
        (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
    )

    def contains(ks):
        i = R._bloom_probe_idx(ks)
        byte = bits[(i >> np.uint64(3)).astype(np.int64)]
        bit = (np.uint64(1) << (i & np.uint64(7))).astype(np.uint8)
        return ((byte & bit) != 0).all(axis=0)

    assert contains(keys).all()
    others = rng.integers(0, 1 << 62, 20000).astype(np.int64)
    others = others[~np.isin(others, keys)]
    fp = contains(others).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_matches_pandas(ray_session, tmp_path):
    """q_bloom_semi_join_parts equals the plain pandas join+rollup on a
    synthetic star pair, including a build side that matches nothing
    (brand absent from output) and zero-match probe rows."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(21)
    n_part, n_li = 400, 9000
    pkeys = np.arange(n_part, dtype=np.int64)
    psize = rng.integers(1, 51, n_part)
    brand = np.array([f"Brand#{i % 5}" for i in range(n_part)])
    pq_.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_size": pa.array(psize.astype(np.int32), pa.int32()),
                "p_brand": pa.array(brand.tolist(), pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    lkeys = rng.integers(0, n_part + 50, n_li)  # some dangling partkeys
    lqty = rng.integers(1, 51, n_li).astype(np.float64)
    pq_.write_table(
        pa.table(
            {
                "l_partkey": pa.array(lkeys.astype(np.int64)),
                "l_quantity": pa.array(lqty),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = R.q_bloom_semi_join_parts(str(tmp_path))

    p = pd.DataFrame({"p_partkey": pkeys, "p_size": psize, "p_brand": brand})
    li = pd.DataFrame({"l_partkey": lkeys, "l_quantity": lqty})
    ref = li.merge(
        p[p["p_size"] >= R.BLOOM_P_SIZE_MIN],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    ref = (
        ref.groupby("p_brand")
        .agg(n_lines=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
        .reset_index()
    )
    ref["n_lines"] = ref["n_lines"].astype("int64")
    ref["sum_qty"] = ref["sum_qty"].round(2)
    ref = ref.sort_values("p_brand").reset_index(drop=True)
    assert len(ref) > 0
    pd.testing.assert_frame_equal(out, ref)


def test_bloom_semi_join_empty_build(ray_session, tmp_path):
    """A build side with no qualifying parts returns the empty contract
    frame (column names + dtypes) instead of a schema-less join crash."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    pq_.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_size": pa.array([1, 2], pa.int32()),
                "p_brand": pa.array(["Brand#1", "Brand#2"], pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq_.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 3], pa.int64()),
                "l_quantity": pa.array([1.0, 2.0, 3.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = R.q_bloom_semi_join_parts(str(tmp_path))
    assert list(out.columns) == ["p_brand", "n_lines", "sum_qty"]
    assert len(out) == 0
    assert out["n_lines"].dtype == np.int64


def test_weighted_sample_matches_independent_python(ray_session, tmp_path):
    """t_weighted_sample equals an independent pure-Python A-Res pass
    (math.log per doc, full sort — no numpy, no top-k machinery), excludes
    zero-weight docs, and selection probability tracks weight: the heavy
    half of the corpus must dominate the draw."""
    import hashlib
    import math

    import pyarrow.parquet as pq_

    import pdfray.pipelines.textops as T

    rng = np.random.default_rng(9)
    n = 800
    # heavy half: 100x the weight of the light half; a few zero-weight docs
    n_chars = np.where(rng.random(n) < 0.5, 40, 4000).astype(np.int64)
    n_chars[:5] = 0
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x" * int(c) for c in n_chars]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s0"] * n),
            "n_chars": pa.array(n_chars),
        }
    )
    pq_.write_table(t, str(tmp_path / "documents.parquet"))
    out = T.t_weighted_sample(str(tmp_path))

    keyed = []
    for i, w in enumerate(n_chars):
        if w <= 0:
            continue
        h = (
            int.from_bytes(
                hashlib.md5(f"{i}{T.WEIGHTED_SAMPLE_SALT}".encode()).digest()[8:],
                "little",
            )
            % T._TWO53
        )
        u = (h + 1) / T._TWO53
        keyed.append((math.log(u) / w, -i))
    keyed.sort(reverse=True)
    want = sorted(-neg for _, neg in keyed[: T.WEIGHTED_SAMPLE_K])
    assert out["doc_id"].tolist() == want
    assert len(out) == T.WEIGHTED_SAMPLE_K
    assert not set(out["doc_id"]) & set(range(5))  # zero-weight excluded
    # weight-proportional draw: heavy docs are ~100x likelier per doc
    heavy = (out["n_chars"] == 4000).mean()
    assert heavy > 0.9, heavy


def test_interevent_gap_stats_matches_pandas(ray_session, tmp_path):
    """Randomized cross-check vs a single-pass pandas lag reference,
    including planted identical timestamps (event_id tiebreak), a
    single-event user (absent from output), and a hot user owning ~40%
    of events."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(17)
    n = 6000
    users = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 200, n))
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 10**9, n)
    ts[100:110] = ts[100]  # planted exact-tie timestamps
    users[100:110] = 42
    users[0] = 9999  # single-event user
    ts[0] = base - 5
    _write_events(tmp_path, users, ts, ["view"] * n)
    out = R.q_interevent_gap_stats(str(tmp_path))

    df = pd.DataFrame(
        {"user_id": users, "ts_us": ts, "event_id": np.arange(n, dtype=np.int64)}
    ).sort_values(["user_id", "ts_us", "event_id"])
    df["gap"] = df.groupby("user_id")["ts_us"].diff()
    g = df.dropna(subset=["gap"]).copy()
    g["gap"] = g["gap"].astype("int64")
    ref = (
        g.groupby("user_id")["gap"]
        .agg(n_gaps="count", min_gap_us="min", max_gap_us="max", s="sum")
        .reset_index()
    )
    ref["mean_gap_us"] = ref["s"].astype("float64") / ref["n_gaps"]
    ref = ref.drop(columns="s").astype(
        {"user_id": "int64", "n_gaps": "int64", "min_gap_us": "int64", "max_gap_us": "int64"}
    )
    ref = ref.sort_values("user_id").reset_index(drop=True)
    assert 9999 not in set(ref["user_id"])  # sanity: the planted single-event user
    pd.testing.assert_frame_equal(out, ref)
    assert int(out[out["user_id"] == 42]["min_gap_us"].iloc[0]) == 0  # tie gaps


def _write_docs(tmp_path, texts):
    import pyarrow.parquet as pq_

    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(list(texts)),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s0"] * n),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq_.write_table(t, str(tmp_path / "documents.parquet"))


def test_containment_dupes_plants_and_bruteforce(ray_session, tmp_path):
    """t_containment_dupes over a corpus with (1) a 20-token excerpt of a
    100-token doc — containment 1.0 while its Jaccard is ~0.18, the class
    symmetric dedup provably misses; (2) a pair engineered EXACTLY at the
    0.9 boundary (9 of 10 shingles shared: 10*9 >= 9*10 holds — the
    integer threshold keeps it, a float n/s >= 0.9 compare is the bug
    class); (3) random background docs — all checked against a
    brute-force all-pairs shingle recomputation."""
    import pdfray.pipelines.textops as T

    rng = np.random.default_rng(59)
    vocab = [f"w{i}" for i in range(400)]
    big = " ".join(rng.choice(vocab, 100))
    excerpt = " ".join(big.split()[40:60])  # fully contained
    a12 = " ".join(rng.choice(vocab, 12))  # 10 shingles
    boundary = " ".join(a12.split()[:11] + ["zzz"])  # shares 9 of a's 10
    texts = [big, excerpt, a12, boundary] + [
        " ".join(rng.choice(vocab, int(rng.integers(8, 60)))) for _ in range(40)
    ]
    _write_docs(tmp_path, texts)
    out = T.t_containment_dupes(str(tmp_path))

    # brute force over the same shingle definition
    sets = {i: T._shingles(s.lower()) for i, s in enumerate(texts)}
    want = []
    for i, Si in sets.items():
        for j, Sj in sets.items():
            if i == j or not Si:
                continue
            inter = len(Si & Sj)
            if T.CONTAIN_DEN * inter >= T.CONTAIN_NUM * len(Si):
                want.append((i, j, inter, len(Si)))
    want = sorted(want)
    got = list(
        out[["doc_a", "doc_b", "n_inter", "size_a"]].itertuples(
            index=False, name=None
        )
    )
    assert got == want
    # the planted structures are present
    n1 = len(sets[1])
    assert (1, 0, n1, n1) in got  # excerpt fully inside big: containment 1.0
    ham_pair = [p for p in got if p[0] == 3 and p[1] == 2]
    assert ham_pair == [(3, 2, 9, 10)]  # exactly at the 0.9 boundary
    # and the excerpt's Jaccard really is far below any near-dup bar
    j = n1 / len(sets[0] | sets[1])
    assert j < 0.25


def test_cms_one_sided_error_and_exact_truth(ray_session, tmp_path, monkeypatch):
    """CMS invariants on a random corpus: every probe estimate >= its true
    count (one-sided error, the CMS guarantee), a planted high-frequency
    probe word is estimated EXACTLY when its counters dodge collisions is
    not assumed — instead the estimate is bounded by truth + total
    corpus mass / CMS_W per row; and the forced distributed-regime merge
    is identical."""
    from collections import Counter

    import pdfray.pipelines.textops as T

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(300)] + list(T.CMS_PROBES[:4])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 120)))
        for _ in range(200)
    ]
    texts[0] = ""  # empty doc
    _write_docs(tmp_path, texts)
    out = T.t_cms_wordcounts(str(tmp_path))

    truth = Counter(w for s in texts for w in s.split() if w)
    total = sum(truth.values())
    for _, row in out.iterrows():
        tr = truth.get(row["word"], 0)
        assert row["est"] >= tr, (row["word"], row["est"], tr)
        assert row["est"] <= tr + total // (T.CMS_W // 4), (row["word"], row["est"], tr)

    import pdfray.pipelines.relational as R

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = T.t_cms_wordcounts(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_group_uniform_sample_exact_k_and_uniform(ray_session, tmp_path):
    """Exactly k per group (full count for groups >= k, everything for a
    tiny group), identical to an independent pandas replay, and the draw
    is block-layout-invariant: a differently-sharded copy of the corpus
    returns the same sample."""
    import hashlib

    import pyarrow.parquet as pq_

    import pdfray.pipelines.textops as T

    rng = np.random.default_rng(31)
    n = 3000
    langs = rng.choice(["en", "de", "fr"], size=n, p=[0.6, 0.3, 0.1]).tolist()
    langs[:3] = ["xx", "xx", "xx"]  # tiny group, < k members
    texts = ["doc " + str(i) for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(["s0"] * n),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq_.write_table(t, str(tmp_path / "documents.parquet"))
    out = T.t_group_uniform_sample(str(tmp_path))

    df = pd.DataFrame({"lang": langs, "doc_id": np.arange(n, dtype=np.int64)})
    df["hk"] = [
        hashlib.md5(f"{i}{T.GROUP_SAMPLE_SALT}".encode()).hexdigest()[:16]
        for i in df["doc_id"]
    ]
    ref = (
        df.sort_values(["lang", "hk", "doc_id"])
        .groupby("lang", sort=False)
        .head(T.GROUP_SAMPLE_K)[["lang", "doc_id"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    sizes = out.groupby("lang").size()
    assert sizes["en"] == T.GROUP_SAMPLE_K and sizes["xx"] == 3

    # layout invariance: same rows, different shard layout -> same draw
    d2 = tmp_path / "re"
    d2.mkdir()
    perm = rng.permutation(n)
    pq_.write_table(t.take(pa.array(perm)), str(d2 / "documents.parquet"))
    out2 = T.t_group_uniform_sample(str(d2))
    pd.testing.assert_frame_equal(out, out2)


def test_interevent_gap_stats_chunk_split_and_regimes(
    ray_session, tmp_path, monkeypatch
):
    """The hot-key chunk split is exercised hard: a months-long corpus
    with a 1-day chunk width (every user straddles many chunks, so most
    gaps are BOUNDARY gaps stitched in the merge), a planted pair that
    straddles a chunk boundary exactly, and the forced distributed-
    groupby merge regime — all must equal the plain pandas lag reference
    and each other."""
    import pdfray.pipelines.relational as R

    monkeypatch.setattr(R, "GAP_CHUNK_DAYS", 1)
    rng = np.random.default_rng(29)
    n = 4000
    users = np.where(rng.random(n) < 0.5, 3, rng.integers(0, 60, n))
    base = 1_700_000_000_000_000
    day_us = 86_400_000_000
    ts = base + rng.integers(0, 90 * day_us, n)
    # planted boundary-straddling pair: 1us before / after a chunk edge
    edge = (base // day_us + 10) * day_us
    users[:2] = 777
    ts[0], ts[1] = edge - 1, edge + 1
    _write_events(tmp_path, users, ts, ["view"] * n)
    out = R.q_interevent_gap_stats(str(tmp_path))

    df = pd.DataFrame(
        {"user_id": users, "ts_us": ts, "event_id": np.arange(n, dtype=np.int64)}
    ).sort_values(["user_id", "ts_us", "event_id"])
    df["gap"] = df.groupby("user_id")["ts_us"].diff()
    g = df.dropna(subset=["gap"]).copy()
    g["gap"] = g["gap"].astype("int64")
    ref = (
        g.groupby("user_id")["gap"]
        .agg(n_gaps="count", min_gap_us="min", max_gap_us="max", s="sum")
        .reset_index()
    )
    ref["mean_gap_us"] = ref["s"].astype("float64") / ref["n_gaps"]
    ref = (
        ref.drop(columns="s")
        .astype({"user_id": "int64", "n_gaps": "int64",
                 "min_gap_us": "int64", "max_gap_us": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    assert int(out[out["user_id"] == 777]["min_gap_us"].iloc[0]) == 2

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_interevent_gap_stats(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_rollup_pricing_levels_consistent(ray_session, tmp_path):
    """The additive fold invariants: each per-flag subtotal equals the sum
    of its finest cells, the grand total equals everything, and the whole
    frame equals a pandas recomputation on a randomized table."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(41)
    n = 8000
    flags = rng.choice(["A", "N", "R"], size=n)
    status = rng.choice(["F", "O"], size=n)
    qty = rng.integers(1, 51, n).astype(np.float64)
    pq_.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flags.tolist(), pa.string()),
                "l_linestatus": pa.array(status.tolist(), pa.string()),
                "l_quantity": pa.array(qty),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = R.q_rollup_pricing(str(tmp_path))

    df = pd.DataFrame(
        {"l_returnflag": flags, "l_linestatus": status, "l_quantity": qty}
    )
    fine = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] != "ALL")]
    ref_fine = (
        df.groupby(["l_returnflag", "l_linestatus"])
        .agg(n_lines=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
        .reset_index()
    )
    ref_fine["n_lines"] = ref_fine["n_lines"].astype("int64")
    ref_fine["sum_qty"] = ref_fine["sum_qty"].round(2)
    pd.testing.assert_frame_equal(
        fine.reset_index(drop=True), ref_fine.sort_values(
            ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    )
    for f in ("A", "N", "R"):
        sub = out[(out["l_returnflag"] == f) & (out["l_linestatus"] == "ALL")]
        cells = fine[fine["l_returnflag"] == f]
        assert int(sub["n_lines"].iloc[0]) == int(cells["n_lines"].sum())
        assert float(sub["sum_qty"].iloc[0]) == pytest.approx(
            float(cells["sum_qty"].sum())
        )
    tot = out[(out["l_returnflag"] == "ALL")]
    assert int(tot["n_lines"].iloc[0]) == n


def test_filter_topk_empty_match_returns_typed_frame(ray_session, tmp_path):
    """A predicate matching NOTHING must return the empty typed contract
    frame — Ray drops all-empty blocks from the collect, which used to
    KeyError inside _topk's driver sort (hostile-lineitem harness find)."""
    import pyarrow.parquet as pq_

    from pdfray.pipelines.relational import q_filter_topk

    n = 50
    t = pa.table(
        {
            "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
            "l_extendedprice": pa.array(np.full(n, 10.0)),
            "l_discount": pa.array(np.zeros(n)),
            # every row AFTER the 1996-07-01 cut -> zero matches
            "l_shipdate": pa.array(
                np.full(n, 1_700_000_000_000_000, np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    pq_.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_filter_topk(str(tmp_path))
    assert list(out.columns) == ["l_orderkey", "l_linenumber", "revenue"]
    assert len(out) == 0
    assert out["revenue"].dtype == np.float64


def test_ohlc_daily_distributed_regime_and_ties(ray_session, tmp_path, monkeypatch):
    """OHLC partial merge is associative: the forced distributed-groupby
    regime equals the driver merge, and same-ts ties resolve open/close by
    event_id on a randomized corpus (checked against a direct pandas
    window reference)."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(47)
    n = 5000
    users = rng.integers(0, 50, n)
    day_us = 86_400_000_000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 20, n) * day_us + rng.integers(0, 5, n)  # heavy ties
    kinds = rng.choice(["view", "click"], size=n)
    t = _write_events(tmp_path, users, ts, kinds)
    # overwrite value with a varied column (binary grid)
    import pyarrow.parquet as pq_

    vals = rng.integers(-320, 320, n) / 64.0
    t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(vals))
    pq_.write_table(t, str(tmp_path / "events.parquet"))

    out = R.q_ohlc_daily(str(tmp_path))
    df = pd.DataFrame(
        {
            "event_type": kinds,
            "ts_us": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "value": vals,
        }
    )
    df["day"] = pd.to_datetime(df["ts_us"], unit="us").dt.strftime("%Y-%m-%d")
    df = df.sort_values(["ts_us", "event_id"])
    g = df.groupby(["event_type", "day"])
    ref = g.agg(
        n_events=("value", "size"),
        low=("value", "min"),
        high=("value", "max"),
        open_v=("value", "first"),
        close_v=("value", "last"),
    ).reset_index()
    ref["n_events"] = ref["n_events"].astype("int64")
    ref = ref.sort_values(["event_type", "day"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_ohlc_daily(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_left_join_order_counts_regimes_and_fringe(ray_session, tmp_path, monkeypatch):
    """The zero-order fringe survives the left_outer join with (0, 0.0),
    dangling order custkeys produce no rows, and the forced distributed
    merge regime is identical."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(53)
    n_cust, n_ord = 30, 400
    pq_.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    oc = rng.integers(5, 40, n_ord)  # customers 0-4 orderless; 30+ dangle
    price = rng.integers(1, 10_000, n_ord) / 64.0
    pq_.write_table(
        pa.table(
            {
                "o_custkey": pa.array(oc.astype(np.int64)),
                "o_totalprice": pa.array(price.astype(np.float64)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = R.q_left_join_order_counts(str(tmp_path))
    assert len(out) == n_cust
    fringe = out[out["c_custkey"] < 5]
    assert (fringe["n_orders"] == 0).all() and (fringe["total_price"] == 0.0).all()
    df = pd.DataFrame({"o_custkey": oc, "p": price})
    ref = df[df["o_custkey"] < n_cust].groupby("o_custkey").agg(
        n=("p", "size"), s=("p", "sum")
    )
    for ck, r in ref.iterrows():
        row = out[out["c_custkey"] == ck]
        assert int(row["n_orders"].iloc[0]) == int(r["n"])
        assert float(row["total_price"].iloc[0]) == float(
            R.round_half_away(r["s"], 2)
        )

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_left_join_order_counts(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_full_outer_user_activity_fringes(ray_session, tmp_path, monkeypatch):
    """Both fringes survive the full_outer join zero-filled (view-only and
    purchase-only users), other event types are invisible, and the forced
    distributed-merge regime is identical."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(59)
    n = 3000
    users = rng.integers(0, 60, n)
    kinds = rng.choice(["view", "purchase", "click", "weird"], size=n).astype(object)
    kinds[users % 5 == 0] = "view"  # view-only users
    kinds[users % 5 == 1] = "purchase"  # purchase-only users
    base = 1_700_000_000_000_000
    _write_events(tmp_path, users, base + np.arange(n) * 1_000_000, kinds)

    out = R.q_full_outer_user_activity(str(tmp_path))
    df = pd.DataFrame({"user_id": users, "kind": kinds})
    v = df[df["kind"] == "view"].groupby("user_id").size()
    p = df[df["kind"] == "purchase"].groupby("user_id").size()
    ref = (
        pd.DataFrame({"n_views": v, "n_purchases": p})
        .fillna(0)
        .astype("int64")
        .rename_axis("user_id")
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    assert (out["n_purchases"] == 0).any(), "no view-only fringe exercised"
    assert (out["n_views"] == 0).any(), "no purchase-only fringe exercised"

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_full_outer_user_activity(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_skew_join_hot_key_salting(ray_session, tmp_path, monkeypatch):
    """A bot user owning ~half the purchases: the salted plan's output is
    exactly the plain join's (salting changes placement, never values);
    the hot user provably trips detection; and the forced
    everything-hot / nothing-hot regimes all agree."""
    import math

    import pdfray.pipelines.relational as R
    from pdfray.pipelines.sizing import shuffle_partitions

    rng = np.random.default_rng(61)
    n = 4000
    users = rng.integers(0, 50, n)
    users[: n // 2] = 7  # the bot
    kinds = rng.choice(["purchase", "click", "view"], size=n, p=[0.4, 0.4, 0.2])
    base = 1_700_000_000_000_000
    _write_events(tmp_path, users, base + np.arange(n) * 1_000_000, kinds)

    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "user_id": users, "kind": kinds}
    )
    clicks = df[df["kind"] == "click"].groupby("user_id").size().rename("n_clicks")
    ref = (
        df[df["kind"] == "purchase"]
        .join(clicks, on="user_id", how="inner")[
            ["event_id", "user_id", "n_clicks"]
        ]
        .astype("int64")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out = R.q_skew_join_purchase_clicks(str(tmp_path))
    pd.testing.assert_frame_equal(out, ref)

    # at test scale sizing yields ONE partition (no skew possible, nothing
    # hot — the correct call); pin a multi-partition cluster shape so the
    # bot provably trips detection and the salted path runs for real
    import pdfray.pipelines.sizing as sizing_mod

    monkeypatch.setattr(sizing_mod, "shuffle_partitions", lambda *a, **k: 8)
    n_purch = int((df["kind"] == "purchase").sum())
    thr = R._skew_threshold(n_purch, 8)
    assert int(((df["kind"] == "purchase") & (df["user_id"] == 7)).sum()) >= thr
    salted = R.q_skew_join_purchase_clicks(str(tmp_path))
    pd.testing.assert_frame_equal(salted, ref)

    monkeypatch.setattr(R, "_skew_threshold", lambda *_: 1)  # every key hot
    all_hot = R.q_skew_join_purchase_clicks(str(tmp_path))
    pd.testing.assert_frame_equal(all_hot, ref)
    monkeypatch.setattr(R, "_skew_threshold", lambda *_: 10**9)  # none hot
    none_hot = R.q_skew_join_purchase_clicks(str(tmp_path))
    pd.testing.assert_frame_equal(none_hot, ref)


def test_running_user_spend_chunk_stitch(ray_session, tmp_path, monkeypatch):
    """Running totals are exact across chunk boundaries: a tie-heavy
    randomized corpus with a hot user spanning months equals the direct
    pandas prefix scan, with the chunk width forced to 1 day (so nearly
    every consecutive purchase pair crosses a stitch boundary), and a
    stage_dir rerun resumes off the checkpoint to the same result."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(67)
    n = 3000
    users = rng.integers(0, 30, n)
    users[: n // 3] = 3  # hot user across the whole range
    day = 86_400_000_000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 90, n) * day + rng.integers(0, 4, n)  # ties
    kinds = rng.choice(["purchase", "view"], size=n)
    t = _write_events(tmp_path, users, ts, kinds)
    import pyarrow.parquet as pq_

    vals = rng.integers(-320, 320, n) / 64.0  # binary grid incl. .5-cent ties
    t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(vals))
    pq_.write_table(t, str(tmp_path / "events.parquet"))

    monkeypatch.setattr(R, "RUNNING_CHUNK_DAYS", 1)
    out = R.q_running_user_spend(str(tmp_path))

    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "ts": ts,
            "kind": kinds,
            "cents": R.round_half_away(vals * 100.0, 0).astype(np.int64),
        }
    )
    df = df[df["kind"] == "purchase"].sort_values(["user_id", "ts", "event_id"])
    df["running_cents"] = df.groupby("user_id")["cents"].cumsum()
    ref = (
        df[["event_id", "user_id", "running_cents"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)

    stage = tmp_path / "stage"
    first = R.q_running_user_spend(str(tmp_path), stage_dir=str(stage))
    assert (stage / "scanned" / "_DONE").exists()
    resumed = R.q_running_user_spend(str(tmp_path), stage_dir=str(stage))
    pd.testing.assert_frame_equal(first, resumed)
    pd.testing.assert_frame_equal(first, ref)


def test_user_days_exact_vs_pandas(ray_session, tmp_path, monkeypatch):
    """Exact distinct-day counts with planted pre-epoch days (floor, not
    truncation), many same-day repeats, and a forced distributed-dedup
    regime; also cross-checks that the HLL sketch's truth agrees."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(71)
    n = 4000
    users = rng.integers(0, 40, n)
    day = 86_400_000_000
    # pre-epoch block: negative timestamps whose trunc-vs-floor day differs
    ts = rng.integers(-30, 200, n) * day + rng.integers(0, day, n)
    kinds = rng.choice(["view", "click", "purchase"], size=n)
    _write_events(tmp_path, users, ts, kinds)

    out = R.q_user_days_exact(str(tmp_path))
    df = pd.DataFrame({"user_id": users, "day": np.floor_divide(ts, day)})
    ref = (
        df.drop_duplicates()
        .groupby("user_id", as_index=False)
        .size()
        .rename(columns={"size": "n_days"})
        .astype({"user_id": "int64", "n_days": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    assert (ts < 0).any(), "no pre-epoch events planted"

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_user_days_exact(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_topk_per_group_ties_at_cut(ray_session, tmp_path, monkeypatch):
    """Per-group top-3 with rank: a customer whose 2nd..5th orders are an
    exact price TIE straddling the k-cut resolves by orderkey; groups with
    fewer than k orders emit all of them; the forced distributed
    (map_groups) regime is identical."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(73)
    n = 2500
    ck = rng.integers(0, 60, n).astype(np.int64)
    price = (rng.integers(1, 10_000_00, n) / 100.0).round(2)
    price[:800] = 555.55  # massive tie runs across many customers
    ok = np.arange(n, dtype=np.int64)
    ck[:5] = 99  # 5 orders, ranks cut inside the tie run
    price[:5] = [900.0, 555.55, 555.55, 555.55, 555.55]
    ck[5] = 98  # a single-order customer
    pq_.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_custkey": pa.array(ck),
                "o_totalprice": pa.array(price),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = R.q_topk_per_group(str(tmp_path))

    df = pd.DataFrame({"o_custkey": ck, "o_orderkey": ok, "o_totalprice": price})
    df = df.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    )
    df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
    ref = (
        df[df["rnk"] <= 3][["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]
        .astype({"rnk": "int64"})
        .sort_values(["o_custkey", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    assert len(out[out["o_custkey"] == 98]) == 1
    assert list(out[out["o_custkey"] == 99]["o_orderkey"]) == [0, 1, 2]

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_topk_per_group(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_group_moments_exact_digests(ray_session, tmp_path, monkeypatch):
    """The (n, sum, sumsq) digests are exact Python-int equal on 1/64-grid
    quantities, mean/var match the pinned IEEE expression bit-for-bit, an
    off-grid quantity raises loudly, and the forced distributed regime is
    identical."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(79)
    n = 6000
    flags = rng.choice(["A", "N", "R"], size=n)
    status = rng.choice(["F", "O"], size=n)
    qty = rng.integers(1, 201 * 16, n) / 64.0  # 1/64 grid incl. fractions
    d = tmp_path / "m"
    d.mkdir()
    pq_.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flags.tolist(), pa.string()),
                "l_linestatus": pa.array(status.tolist(), pa.string()),
                "l_quantity": pa.array(qty),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    out = R.q_group_moments(str(d))

    qi = [int(v) for v in np.rint(qty * 64.0).astype(np.int64)]
    ref_rows = {}
    for f, s, q in zip(flags, status, qi):
        r = ref_rows.setdefault((f, s), [0, 0, 0])
        r[0] += 1
        r[1] += q
        r[2] += q * q  # exact Python ints, no numpy dtype anywhere
    for (f, s), (cn, cs, css) in sorted(ref_rows.items()):
        row = out[(out["l_returnflag"] == f) & (out["l_linestatus"] == s)]
        assert int(row["n_lines"].iloc[0]) == cn
        assert int(row["sum_q64"].iloc[0]) == cs
        assert int(row["sumsq_q4096"].iloc[0]) == css
        mean = float(cs) / float(cn) / 64.0
        var = (float(css) - float(cs) * float(cs) / float(cn)) / float(cn) / 4096.0
        assert row["mean_qty"].iloc[0] == mean  # bit-identical, not allclose
        assert row["var_qty"].iloc[0] == var

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_group_moments(str(d))
    pd.testing.assert_frame_equal(out, big)

    bad = d / "bad"
    bad.mkdir()
    pq_.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"], pa.string()),
                "l_linestatus": pa.array(["F"], pa.string()),
                "l_quantity": pa.array([1.0 / 3.0]),
            }
        ),
        str(bad / "lineitem.parquet"),
    )
    with pytest.raises(Exception, match="off the 1/64 grid"):
        R.q_group_moments(str(bad))


def test_cube_pricing_folds(ray_session, tmp_path):
    """CUBE = ROLLUP + the per-status grouping set: the shared cells make
    the rollup rows a strict subset, the per-status fold sums its column,
    and the whole frame equals a pandas recomputation."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(83)
    n = 7000
    flags = rng.choice(["A", "N", "R"], size=n)
    status = rng.choice(["F", "O"], size=n)
    qty = rng.integers(1, 51, n).astype(np.float64)
    pq_.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flags.tolist(), pa.string()),
                "l_linestatus": pa.array(status.tolist(), pa.string()),
                "l_quantity": pa.array(qty),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    cube = R.q_cube_pricing(str(tmp_path))
    roll = R.q_rollup_pricing(str(tmp_path))
    merged = cube.merge(
        roll, on=["l_returnflag", "l_linestatus"], suffixes=("", "_r")
    )
    assert len(merged) == len(roll)  # rollup rows are a subset of cube rows
    assert (merged["n_lines"] == merged["n_lines_r"]).all()
    assert (merged["sum_qty"] == merged["sum_qty_r"]).all()

    df = pd.DataFrame(
        {"l_returnflag": flags, "l_linestatus": status, "l_quantity": qty}
    )
    for s in ("F", "O"):
        row = cube[(cube["l_returnflag"] == "ALL") & (cube["l_linestatus"] == s)]
        sub = df[df["l_linestatus"] == s]
        assert int(row["n_lines"].iloc[0]) == len(sub)
        assert float(row["sum_qty"].iloc[0]) == round(float(sub["l_quantity"].sum()), 2)
    assert len(cube) == len(roll) + 2  # the two per-status rows


def test_moving_avg_user_spend_tail_carry(ray_session, tmp_path, monkeypatch):
    """3-row ROWS-frame moving sums are exact across chunk boundaries:
    tie-heavy randomized corpus with a hot user, chunk width forced to 1
    day so nearly every frame spans a stitch; a planted user with ONE
    purchase per day across 3 days exercises the carry reaching back
    through sparse chunks; short histories get short windows (n_window <
    3); and a stage_dir rerun resumes to the same result."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(89)
    n = 3000
    users = rng.integers(0, 30, n)
    users[: n // 3] = 3  # hot user
    day = 86_400_000_000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 60, n) * day + rng.integers(0, 4, n)  # ties
    kinds = rng.choice(["purchase", "view"], size=n).astype(object)
    # planted: user 777 purchases exactly once per day on 3 days — the
    # third frame's carry reaches back through two 1-row chunks
    users[:3] = 777
    kinds[:3] = "purchase"
    ts[0], ts[1], ts[2] = base, base + day, base + 2 * day
    t = _write_events(tmp_path, users, ts, kinds)
    vals = rng.integers(-320, 320, n) / 64.0  # binary grid incl. .5-cent ties
    t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(vals))
    pq_.write_table(t, str(tmp_path / "events.parquet"))

    monkeypatch.setattr(R, "MOVING_CHUNK_DAYS", 1)
    out = R.q_moving_avg_user_spend(str(tmp_path))

    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "ts": ts,
            "kind": kinds,
            "cents": R.round_half_away(vals * 100.0, 0).astype(np.int64),
        }
    )
    df = df[df["kind"] == "purchase"].sort_values(["user_id", "ts", "event_id"])
    g = df.groupby("user_id")["cents"]
    df["moving_sum_cents"] = (
        g.rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    ).astype("int64")
    df["n_window"] = (
        g.rolling(3, min_periods=1).count().reset_index(level=0, drop=True)
    ).astype("int64")
    df["moving_avg"] = df["moving_sum_cents"].to_numpy(np.int64).astype(
        np.float64
    ) / df["n_window"].to_numpy(np.int64).astype(np.float64)
    ref = (
        df[["event_id", "user_id", "n_window", "moving_sum_cents", "moving_avg"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    planted = out[out["user_id"] == 777].sort_values("event_id")
    assert list(planted["n_window"]) == [1, 2, 3]
    assert (out["n_window"] < 3).any() and (out["n_window"] == 3).any()

    stage = tmp_path / "stage"
    first = R.q_moving_avg_user_spend(str(tmp_path), stage_dir=str(stage))
    assert (stage / "scanned" / "_DONE").exists()
    resumed = R.q_moving_avg_user_spend(str(tmp_path), stage_dir=str(stage))
    pd.testing.assert_frame_equal(first, resumed)
    pd.testing.assert_frame_equal(first, ref)


def _write_q5_star(d, rows):
    """Write a minimal star schema for q5 tests from a dict of tables."""
    for name, tbl in rows.items():
        pq.write_table(tbl, str(d / f"{name}.parquet"))


def test_q5_multiway_join_hostile(ray_session, tmp_path):
    """TPC-H Q5 over a hostile star: dangling FKs on every join edge,
    orders outside the date window, customer/supplier nation mismatches,
    a .xx5-tie extendedprice (away-from-zero x100 rounding), and a
    region with zero qualifying rows -> typed empty frame."""
    import pdfray.pipelines.relational as R

    d = tmp_path / "q5"
    d.mkdir()
    region = pa.table(
        {"r_regionkey": pa.array([0, 1], pa.int32()),
         "r_name": pa.array(["ASIA", "EUROPE"])}
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([10, 11, 20], pa.int32()),
            "n_name": pa.array(["JAPAN", "CHINA", "FRANCE"]),
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([10, 11, 20, 10], pa.int32()),
            "c_acctbal": pa.array([0.0] * 4),
            "c_mktsegment": pa.array(["x"] * 4),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([100, 101, 102], pa.int64()),
            "s_name": pa.array(["s0", "s1", "s2"]),
            "s_nationkey": pa.array([10, 11, 20], pa.int32()),
            "s_acctbal": pa.array([0.0] * 3),
        }
    )

    def ts(s):
        return np.datetime64(s, "us")

    orders = pa.table(
        {
            "o_orderkey": pa.array([1000, 1001, 1002, 1003, 1004], pa.int64()),
            "o_custkey": pa.array([1, 2, 3, 999, 1], pa.int64()),  # 999 dangles
            "o_orderstatus": pa.array(["F"] * 5),
            "o_totalprice": pa.array([1.0] * 5),
            # 1002 in-window but FRANCE customer; 1004 out-of-window
            "o_orderdate": pa.array(
                [ts("1996-03-01"), ts("1996-06-01"), ts("1996-07-01"),
                 ts("1996-08-01"), ts("1999-01-01")]
            ),
            "o_orderpriority": pa.array(["p"] * 5),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(
                [1000, 1000, 1001, 1002, 1004, 7777], pa.int64()
            ),  # 7777 dangles
            "l_partkey": pa.array([0] * 6, pa.int64()),
            "l_suppkey": pa.array([100, 101, 101, 102, 100, 100], pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1, 1, 1], pa.int32()),
            "l_quantity": pa.array([1.0] * 6),
            # 100.125 * 100 = 10012.5 exact tie -> away rounds to 10013
            "l_extendedprice": pa.array(
                [100.125, 200.0, 300.0, 400.0, 500.0, 600.0]
            ),
            "l_discount": pa.array([0.05, 0.0, 0.1, 0.0, 0.0, 0.0]),
            "l_tax": pa.array([0.0] * 6),
            "l_returnflag": pa.array(["N"] * 6),
            "l_linestatus": pa.array(["O"] * 6),
            "l_shipdate": pa.array([ts("1996-01-01")] * 6),
        }
    )
    _write_q5_star(
        d,
        {
            "region": region,
            "nation": nation,
            "customer": customer,
            "supplier": supplier,
            "orders": orders,
            "lineitem": lineitem,
        },
    )
    out = R.q5_local_supplier_volume(str(d))
    # qualifying: order 1000 (cust 1 JAPAN): line (supp 100 JAPAN,
    # 100.125 @ 5%) and line (supp 101 CHINA -> nation mismatch, dropped);
    # order 1001 (cust 2 CHINA): line (supp 101 CHINA, 300 @ 10%).
    # order 1002 is FRANCE (outside ASIA), 1004 out-of-window, 7777/999 dangle.
    rev_japan = 10013 * 95          # away-from-zero tie
    rev_china = 30000 * 90
    ref = pd.DataFrame(
        {
            "n_name": ["CHINA", "JAPAN"],
            "revenue_x10000": np.array([rev_china, rev_japan], np.int64),
            "revenue": [rev_china / 10000.0, rev_japan / 10000.0],
            "n_lineitems": np.array([1, 1], np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, ref)

    # empty result: no ASIA region at all
    d2 = tmp_path / "q5e"
    d2.mkdir()
    _write_q5_star(
        d2,
        {
            "region": pa.table(
                {"r_regionkey": pa.array([1], pa.int32()),
                 "r_name": pa.array(["EUROPE"])}
            ),
            "nation": nation,
            "customer": customer,
            "supplier": supplier,
            "orders": orders,
            "lineitem": lineitem,
        },
    )
    empty = R.q5_local_supplier_volume(str(d2))
    assert len(empty) == 0
    assert list(empty.columns) == [
        "n_name", "revenue_x10000", "revenue", "n_lineitems"
    ]
    assert empty["revenue_x10000"].dtype == "int64"


def test_percent_rank_ties_and_regimes(ray_session, tmp_path, monkeypatch):
    """Rank/dense-rank/percent-rank over distinct (nation, value) counts:
    tie runs share the min rank, a single-supplier nation gets
    pct_rank=0, and the forced map_groups regime is identical to the
    pandas reference (rank methods min/dense)."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(17)
    n = 3000
    nk = rng.integers(0, 8, n).astype(np.int32)
    bal = (rng.integers(-500, 500, n) / 4.0)  # coarse grid -> many ties
    nk[0] = 99  # single-supplier nation
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
                "s_name": pa.array(["s"] * n),
                "s_nationkey": pa.array(nk),
                "s_acctbal": pa.array(bal),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = R.q_percent_rank_acctbal(str(tmp_path))

    df = pd.DataFrame({"s_nationkey": nk.astype(np.int64), "s_acctbal": bal})
    df["rnk"] = df.groupby("s_nationkey")["s_acctbal"].rank(method="min")
    df["dense_rnk"] = df.groupby("s_nationkey")["s_acctbal"].rank(method="dense")
    df["n_grp"] = df.groupby("s_nationkey")["s_acctbal"].transform("size")
    df["n_rows"] = df.groupby(["s_nationkey", "s_acctbal"])["rnk"].transform("size")
    df["pct_rank"] = np.where(
        df["n_grp"] > 1, (df["rnk"] - 1) / (df["n_grp"] - 1), 0.0
    )
    ref = (
        df.drop_duplicates(["s_nationkey", "s_acctbal"])
        .astype({"rnk": "int64", "dense_rnk": "int64", "n_rows": "int64"})
        .sort_values(["s_nationkey", "s_acctbal"])
        .reset_index(drop=True)
    )[["s_nationkey", "s_acctbal", "n_rows", "rnk", "dense_rnk", "pct_rank"]]
    pd.testing.assert_frame_equal(out, ref)
    assert (out.loc[out["s_nationkey"] == 99, "pct_rank"] == 0.0).all()

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_percent_rank_acctbal(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_corr_digests_exact(ray_session, tmp_path):
    """The bivariate digests are exact Python-int equal, corr matches the
    pinned IEEE expression bit-for-bit, a zero-variance group yields NaN,
    and off-grid values raise loudly."""
    import pdfray.pipelines.relational as R

    rng = np.random.default_rng(23)
    n = 5000
    flags = rng.choice(["A", "N", "R"], size=n)
    qty = rng.integers(1, 50 * 64, n) / 64.0
    disc = rng.integers(0, 11, n) / 100.0
    # zero-variance group: every Z row has the same qty
    flags = np.where(rng.random(n) < 0.05, "Z", flags)
    qty[flags == "Z"] = 7.0
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flags.tolist(), pa.string()),
                "l_quantity": pa.array(qty),
                "l_discount": pa.array(disc),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    out = R.q_corr_qty_discount(str(d))

    ref = {}
    for f, q, dd in zip(flags, qty, disc):
        r = ref.setdefault(f, [0, 0, 0, 0, 0, 0])
        qi, di = int(round(q * 64)), int(round(dd * 100))
        r[0] += 1
        r[1] += qi
        r[2] += di
        r[3] += qi * qi
        r[4] += di * di
        r[5] += qi * di
    for f, (cn, sx, sy, sxx, syy, sxy) in sorted(ref.items()):
        row = out[out["l_returnflag"] == f]
        assert int(row["n_lines"].iloc[0]) == cn
        fn = float(cn)
        cov = fn * float(sxy) - float(sx) * float(sy)
        vx = fn * float(sxx) - float(sx) * float(sx)
        vy = fn * float(syy) - float(sy) * float(sy)
        got = row["corr_qty_disc"].iloc[0]
        if vx == 0.0 or vy == 0.0:
            assert np.isnan(got)
        else:
            assert got == cov / np.sqrt(vx) / np.sqrt(vy)  # bit-identical
    assert np.isnan(out.loc[out["l_returnflag"] == "Z", "corr_qty_disc"]).all()

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"]),
                "l_quantity": pa.array([1.0]),
                "l_discount": pa.array([1.0 / 3.0]),
            }
        ),
        str(bad / "lineitem.parquet"),
    )
    with pytest.raises(Exception, match="off the 1/100 grid"):
        R.q_corr_qty_discount(str(bad))


def test_mode_event_type_ties(ray_session, tmp_path, monkeypatch):
    """Per-user mode with a planted exact tie (breaks to the smaller
    type string) and a single-event user; forced distributed regime
    identical."""
    import pdfray.pipelines.relational as R

    users = [1, 1, 1, 1, 2, 2, 3]
    types = ["view", "view", "click", "click", "purchase", "view", "zzz"]
    n = len(users)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array([np.datetime64("2020-01-01", "us")] * n),
                "user_id": pa.array(np.array(users, np.int64)),
                "event_type": pa.array(types),
                "value": pa.array([1.0] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = R.q_mode_event_type(str(tmp_path))
    ref = pd.DataFrame(
        {
            "user_id": np.array([1, 2, 3], np.int64),
            # user 1: click==view 2-2 -> 'click' (lexicographic);
            # user 2: purchase==view 1-1 -> 'purchase'
            "mode_type": ["click", "purchase", "zzz"],
            "n_mode": np.array([2, 1, 1], np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, ref)

    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_mode_event_type(str(tmp_path))
    pd.testing.assert_frame_equal(out, big)


def test_mips_matches_full_matmul(ray_session, tmp_path):
    """s_mips_topk == an independent full-matrix numpy MIPS under the
    same (rounded dot desc, vec_id asc) order — magnitude matters, so a
    LARGE far vector must beat a near-parallel small one."""
    import pdfray.pipelines.simsearch as S

    rng = np.random.default_rng(31)
    n, dim = 400, 16
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m[50] *= 40.0  # huge-magnitude vector: top by dot, not by cosine
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    S._QUERY_CACHE.clear()
    out = S.s_mips_topk(str(tmp_path))

    q = m[:5].astype(np.float64)
    dots = m.astype(np.float64) @ q.T
    rows = []
    for qi in range(5):
        col = dots[:, qi]
        order = np.lexsort((np.arange(n), -np.round(col, 4)))
        for rank, j in enumerate(order[: S.TOP_K], 1):
            rows.append((qi, rank, int(j), float(col[j])))
    ref = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "dot"])
    ref["dot"] = ref["dot"].round(4)
    ref["query_id"] = ref["query_id"].astype("int64")
    ref["vec_id"] = ref["vec_id"].astype("int64")
    got = out.reset_index(drop=True)
    got["rank"] = got["rank"].astype(ref["rank"].dtype)
    pd.testing.assert_frame_equal(got, ref)
    assert 50 in set(out["vec_id"])  # the big vector made someone's top-k
    S._QUERY_CACHE.clear()


def test_hamming_topk_matches_unpacked_bruteforce(ray_session, tmp_path):
    """s_hamming_topk == an independent UNPACKED brute force: sign bits as
    a bool matrix, distance = (a != b).sum() per pair — no bit packing,
    no popcount, so the packed/popcount fast path is cross-checked by a
    different arithmetic route.  Plants: an exact duplicate pair (dist-0
    tie resolved by vec_id), a negated vector (all nonzero bits flip),
    and zero components (0 > 0 is False on both sides)."""
    import pdfray.pipelines.simsearch as S

    rng = np.random.default_rng(47)
    n, dim = 300, 16
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m[rng.random(size=(n, dim)) < 0.1] = 0.0  # planted exact zeros
    m[40] = m[2]  # exact duplicate of a query vector
    m[41] = -m[2]  # exact opposite
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    S._QUERY_CACHE.clear()
    out = S.s_hamming_topk(str(tmp_path))

    bits = m.astype(np.float64) > 0  # independent path: bool matrix
    rows = []
    for qi in range(S.N_QUERIES):
        d = (bits != bits[qi]).sum(axis=1).astype(np.int64)
        order = np.lexsort((np.arange(n), d))
        for rank, j in enumerate(order[: S.TOP_K], 1):
            rows.append((qi, rank, int(j), int(d[j])))
    ref = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "dist"])
    for c in ref.columns:
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ref)
    # the planted duplicate ties query 2 at dist 0; vec_id breaks the tie
    q2 = out[out["query_id"] == 2]
    assert list(q2.head(2)["vec_id"]) == [2, 40]
    assert list(q2.head(2)["dist"]) == [0, 0]
    S._QUERY_CACHE.clear()


def test_popcount_lut_fallback_matches_bitwise_count():
    """The numpy-1.x byte-LUT popcount path == the 2.x bitwise_count path
    on adversarial words (0, all-ones, single bits, random)."""
    import pdfray.pipelines.simsearch as S

    rng = np.random.default_rng(3)
    x = np.concatenate(
        [
            np.array([0, 2**64 - 1], np.uint64),
            np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64)),
            rng.integers(0, 2**64, size=200, dtype=np.uint64),
        ]
    ).reshape(2, -1)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
        1
    ).astype(np.int64)
    want = lut[np.ascontiguousarray(x).view(np.uint8)].reshape(x.shape + (8,)).sum(-1)
    got = S._popcount64(x)
    assert got.shape == x.shape and got.dtype == np.int64
    assert (got == want).all()


def test_range_search_matches_bruteforce(ray_session, tmp_path):
    """s_range_search == an independent all-pairs brute force: full n x q
    cosine matrix in one numpy pass (no batching, no streaming filter),
    zero operands pinned to -1, half-away rounding to the 1e-4 grid, then
    the radius cut.  Plants: a zero QUERY vector (matches nothing), a zero
    corpus vector (matched by nothing), an exact duplicate of a query
    (sim 1.0 — always within radius), an exact opposite (sim -1.0 —
    never), and a 64x-magnitude parallel vector (cosine is
    magnitude-blind: same sim as its parallel twin)."""
    import pdfray.pipelines.relational as R
    import pdfray.pipelines.simsearch as S

    rng = np.random.default_rng(53)
    n, dim = 300, 12
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m[0] = 0.0  # zero QUERY vector
    m[40] = m[2]  # exact duplicate of a query vector
    m[41] = -m[2]  # exact opposite
    m[42] = m[2] * 64.0  # parallel, huge magnitude
    m[43] = 0.0  # corpus zero vector
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    S._QUERY_CACHE.clear()
    out = S.s_range_search(str(tmp_path))

    md = m.astype(np.float64)
    norms = np.linalg.norm(md, axis=1)
    safe = np.where(norms == 0, 1.0, norms)
    sims = (md / safe[:, None]) @ (md[:5] / safe[:5, None]).T
    sims[norms == 0, :] = -1.0
    sims[:, norms[:5] == 0] = -1.0
    sims = R.round_half_away(sims, 4)
    rows, cols = np.nonzero(sims >= S.SIM_RADIUS)
    ref = (
        pd.DataFrame(
            {
                "query_id": cols.astype("int64"),
                "vec_id": rows.astype("int64"),
                "sim": sims[rows, cols].astype("float64"),
            }
        )
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ref)
    got = out.set_index(["query_id", "vec_id"])["sim"]
    assert (0, 0) not in got.index  # zero query matches nothing, not even itself
    assert got.loc[(2, 40)] == 1.0 and got.loc[(2, 2)] == 1.0
    assert got.loc[(2, 42)] == 1.0  # magnitude-blind
    assert (2, 41) not in got.index and (2, 43) not in got.index
    S._QUERY_CACHE.clear()


def test_pagerank_join_regime_matches_broadcast(ray_session, monkeypatch):
    """q_pagerank_bipartite's big regime (edges-by-ranks hash joins +
    distributed destination groupby) computes the SAME integer recurrence
    as the broadcast regime — forcing PIVOT_DRIVER_MAX_ROWS=0 must be
    bit-equal (the q_mode_event_type two-regime pin, applied to the
    iterative graph family)."""
    import pdfray.pipelines.relational as R

    sf = "/root/testdata/sf0.001"
    small = R.q_pagerank_bipartite(sf)
    monkeypatch.setattr(R, "PIVOT_DRIVER_MAX_ROWS", 0)
    big = R.q_pagerank_bipartite(sf)
    pd.testing.assert_frame_equal(small, big)
    assert set(small["node_type"]) == {"part", "supplier"}
    # rank mass sanity: every rank >= the undamped base
    assert (small["pr_x1e9"] >= 15 * R.PR_SCALE // 100).all()


def test_pagerank_handmade_graph(ray_session, tmp_path):
    """3-iteration integer PageRank on a hand-checkable star graph: one
    supplier ships every part (bipartite star).  The recurrence is solved
    by hand: every part has deg 1, the hub supplier deg n."""
    import pdfray.pipelines.relational as R

    n = 4  # parts 0..3, all shipped by supplier 0
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_suppkey": pa.array(np.zeros(n, np.int64)),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = R.q_pagerank_bipartite(str(tmp_path))
    S, base = R.PR_SCALE, 15 * R.PR_SCALE // 100
    # hand iteration: hub h, parts p (all identical by symmetry)
    h = p = S
    for _ in range(R.PR_ITERS):
        h_new = base + (85 * (n * (p // 1))) // 100  # each part sends all
        p_new = base + (85 * (h // n)) // 100  # hub splits 1/n
        h, p = h_new, p_new
    want = pd.DataFrame(
        {
            "node_type": ["part"] * n + ["supplier"],
            "key": list(range(n)) + [0],
            "pr_x1e9": [p] * n + [h],
        }
    )
    for c in ("key", "pr_x1e9"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(out, want)


def test_kcore_cascade_graph_vs_bruteforce(ray_session, tmp_path):
    """Multi-round peel cascade vs an independent brute-force peel: a
    K3,3 core + an extra supplier keeps 7 nodes; a supplier whose support
    erodes over three rounds (its neighbors die at rounds 1 and 2) pins
    that the peel really iterates rather than thresholding once."""
    import pdfray.pipelines.relational as R

    edges = [
        # K3,3: parts 1..3 x suppliers 1..3 (the 3-core)
        *[(p, s) for p in (1, 2, 3) for s in (1, 2, 3)],
        # supplier 5 rides the core: deg 3, all neighbors core
        (1, 5), (2, 5), (3, 5),
        # part 4 deg 2 -> dies round 1
        (4, 1), (4, 2),
        # cascade: supplier 7 has deg 3 via parts 1, 2, 8; part 8's other
        # suppliers 8 and 9 are deg-1 -> die round 1 -> part 8 drops to
        # deg 1 -> dies round 2 -> supplier 7 drops to 2 -> dies round 3
        (1, 7), (2, 7), (8, 7), (8, 8), (8, 9),
    ]
    parts = np.array([e[0] for e in edges], np.int64)
    supps = np.array([e[1] for e in edges], np.int64)
    pq.write_table(
        pa.table({"l_partkey": pa.array(parts), "l_suppkey": pa.array(supps)}),
        str(tmp_path / "lineitem.parquet"),
    )
    out = R.q_kcore(str(tmp_path))

    # independent reference peel
    adj = {}
    for p, s in set(edges):
        u, v = 2 * p, 2 * s + 1
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    want = []
    for r in range(R.KCORE_ROUNDS + 1):
        n_edges = sum(len(adj[u] & alive) for u in alive) // 2
        want.append((r, len(alive), n_edges))
        alive = {u for u in alive if len(adj[u] & alive) >= R.KCORE_K}
    want_df = pd.DataFrame(want, columns=["round", "n_alive", "n_core_edges"])
    for c in want_df.columns:
        want_df[c] = want_df[c].astype("int64")
    pd.testing.assert_frame_equal(out, want_df)

    # the cascade really takes three rounds to settle, then is stable
    n_alive = out["n_alive"].tolist()
    assert n_alive[0] > n_alive[1] > n_alive[2] > n_alive[3]
    assert n_alive[3] == n_alive[-1] == 7
    assert out["n_core_edges"].iloc[-1] == 12

    # the sf fixture peels converge inside the round bound (docstring claim)
    sf = R.q_kcore("/root/testdata/sf0.001")
    assert sf.iloc[-1]["n_alive"] == sf.iloc[-2]["n_alive"]


def test_incremental_rollup_resume_uses_checkpointed_base(
    ray_session, tmp_path
):
    """Crash-resume/incremental semantics: after the base rollup is
    checkpointed, a rerun with the same stage_dir must NOT rescan the
    base period — mutating the base-period events between runs leaves
    the result pinned to the ORIGINAL base, while delta rows are
    re-read fresh."""
    import pdfray.pipelines.relational as R

    day = 86_400_000_000
    cut = int(pd.Timestamp(R.INC_CUTOFF).value // 1000)
    ts = np.array([cut - 3 * day, cut - day, cut + day, cut + 2 * day])

    def write_events(base_val):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(4, dtype=np.int64)),
                    "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                    "user_id": pa.array(np.ones(4, np.int64)),
                    "event_type": pa.array(["view"] * 4),
                    "value": pa.array([base_val, base_val, 7.25, 1.75]),
                    "props": pa.array(["{}"] * 4),
                }
            ),
            str(tmp_path / "events.parquet"),
        )

    write_events(10.0)
    sd = str(tmp_path / "state")
    first = R.q_incremental_rollup(str(tmp_path), stage_dir=sd)
    assert first["sum_cents"].sum() == 2 * 1000 + 725 + 175

    write_events(99.0)  # base-period mutation: must be invisible
    second = R.q_incremental_rollup(str(tmp_path), stage_dir=sd)
    pd.testing.assert_frame_equal(first, second)

    fresh = R.q_incremental_rollup(str(tmp_path), stage_dir=str(tmp_path / "s2"))
    assert fresh["sum_cents"].sum() == 2 * 9900 + 725 + 175


def test_pca_matches_independent_numpy_and_is_orthonormal(ray_session):
    """s_pca's distributed moment partials reproduce a direct single-pass
    numpy PCA (projections within float noise, equal after the 4dp
    rounding both sides apply), the trained axes are orthonormal with
    DESCENDING explained variance, and every component's
    largest-|entry| coordinate is positive (the canonicalization that
    removes eigenvector sign/order ambiguity)."""
    from pdfray.pipelines.relational import round_half_away
    from pdfray.pipelines.simsearch import (
        PCA_K,
        pca_components,
        pca_moments,
        s_pca,
    )

    sf = "/root/testdata/sf0.001"
    out = s_pca(sf)

    df = (
        pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, s, g = pca_moments(X)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    W = pca_components(mean, cov, PCA_K)

    # orthonormal axes, canonical signs, descending variance
    assert np.allclose(W.T @ W, np.eye(PCA_K), atol=1e-10)
    for j in range(PCA_K):
        assert W[int(np.argmax(np.abs(W[:, j]))), j] > 0
    proj = (X - mean) @ W
    var = proj.var(axis=0)
    assert (var[:-1] >= var[1:] - 1e-12).all()

    want = pd.DataFrame(
        {
            "vec_id": np.repeat(df["vec_id"].to_numpy(np.int64), PCA_K),
            "component": np.tile(np.arange(PCA_K, dtype=np.int64), len(df)),
            "value": round_half_away(proj.ravel(), 4),
        }
    ).sort_values(["vec_id", "component"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=True)


def test_ood_mahalanobis_outlier_and_numpy_parity(ray_session, tmp_path):
    """s_ood_mahalanobis over a synthetic Gaussian cloud with one planted
    far-out vector: (1) the plant gets the corpus-max score by a wide
    margin; (2) every score is bit-equal to an independent single-pass
    numpy recomputation through the shared `ood_params` (the engine's
    distributed moments merge must not drift); (3) scores are
    non-negative."""
    import pyarrow.parquet as pq_

    import pdfray.pipelines.simsearch as S
    from pdfray.pipelines.relational import round_half_away

    rng = np.random.RandomState(23)
    n, d = 300, 16
    vecs = (rng.randn(n, d) * [1.0 + j / 4 for j in range(d)]).astype(
        np.float32
    )
    vecs[42] = 50.0  # far outside the cloud in every direction
    rows = {
        "vec_id": list(range(n)),
        "embedding": [list(map(float, v)) for v in vecs],
        "label": [0] * n,
    }
    pq_.write_table(pa.table(rows), str(tmp_path / "embeddings.parquet"))

    out = S.s_ood_mahalanobis(str(tmp_path))
    assert len(out) == n
    assert (out["score"] >= 0).all()
    assert int(out.loc[out["score"].idxmax(), "vec_id"]) == 42
    second = out.loc[out["vec_id"] != 42, "score"].max()
    assert float(out["score"].max()) > 5 * float(second)

    X = vecs.astype(np.float64)
    nn, s, g = S.pca_moments(X)
    mean, cov = s / nn, g / nn - np.outer(s / nn, s / nn)
    W, mu, lam = S.ood_params(mean, cov, min(S.OOD_K, d))
    P = X @ W - mu
    terms = (P * P) / lam
    acc = terms[:, 0].copy()
    for j in range(1, terms.shape[1]):
        acc = acc + terms[:, j]
    ref = round_half_away(acc, 4)
    got = out.sort_values("vec_id")["score"].to_numpy()
    # engine blocks may split the moments differently than the single
    # pass; on this table the merge is still bit-identical
    assert (got == ref).all()


def test_mmr_diverse_topk_matches_bruteforce_greedy(ray_session):
    """Independent pure-numpy replay of the integer MMR greedy (shortlist
    from raw parquet, pairwise sims recomputed, selection on the 1e-4
    grid) must reproduce the engine rows exactly."""
    import pdfray.pipelines.simsearch as S

    sf = "/root/testdata/sf0.001"
    out = S.s_mmr_diverse_topk(sf)
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas().sort_values("vec_id")
    ids = t["vec_id"].to_numpy(np.int64)
    raw = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(raw, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    vecs = raw / nrm
    expected = []
    for qi in range(S.N_QUERIES):
        sims = vecs @ vecs[qi]
        order = np.lexsort((ids, -np.round(sims, 4)))[: S.TOP_K]
        rel = {int(ids[j]): int(np.rint(np.round(sims[j], 4) * 1e4)) for j in order}
        row = {int(ids[j]): j for j in order}
        pair = np.rint(np.round(vecs @ vecs.T, 4) * 1e4).astype(np.int64)
        remaining, selected = sorted(rel), []
        for rank in range(1, S.MMR_K + 1):
            if not remaining:
                break
            best = None
            for d in remaining:
                if selected:
                    mx = max(int(pair[row[d], row[s]]) for s in selected)
                    score = 7 * rel[d] - 3 * mx
                else:
                    score = 7 * rel[d]
                if best is None or (score, -d) > (best[0], -best[1]):
                    best = (score, d)
            expected.append((int(ids[qi]), rank, best[1], best[0]))
            selected.append(best[1])
            remaining.remove(best[1])
    got = list(zip(out["query_id"], out["rank"], out["vec_id"], out["mmr_x1e5"]))
    assert got == expected


def test_mmr_prefers_diversity_over_duplicate_run(ray_session, tmp_path):
    """Planted two-direction corpus: the knn top-5 for the planted query is
    a duplicate run from one cluster, while MMR swaps diversity in — at
    least one orthogonal-cluster member enters the MMR picks."""
    import pdfray.pipelines.simsearch as S

    dim = 6
    rows = [np.zeros(dim) for _ in range(5)]
    rows[0] = np.array([1.0, 1.0, 0, 0, 0, 0])  # the planted query (id 0)
    for i in (1, 2, 3, 4):  # filler queries, far corner of the grid
        rows[i] = np.full(dim, -1.0) * (i / 4.0)
    a = np.array([1.0, 0, 0, 0, 0, 0])
    b = np.array([0, 1.0, 0, 0, 0, 0])
    rows += [a, a.copy(), a.copy(), a.copy()]  # ids 5..8: duplicate A run
    rows += [b, b.copy()]                      # ids 9,10: cluster B
    d = tmp_path / "mmr"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(rows), dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32) for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    S._QUERY_CACHE.clear()
    try:
        knn = S.s_knn_bruteforce(str(d))
        mmr = S.s_mmr_diverse_topk(str(d))
    finally:
        S._QUERY_CACHE.clear()
    knn_top = set(
        knn[(knn["query_id"] == 0) & (knn["rank"] <= S.MMR_K)]["vec_id"]
    )
    mmr_top = set(mmr[mmr["query_id"] == 0]["vec_id"])
    assert knn_top & {5, 6, 7, 8} and not knn_top & {9, 10}
    assert mmr_top & {9, 10}, mmr_top
