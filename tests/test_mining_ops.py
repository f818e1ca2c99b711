"""Round-5 continuation additions: market-basket frequent pairs (SON
shape), Markov event-type transitions (hot-key-safe chunk stitch), the 2D
Pareto skyline, and the hashed-linear quality classifier (the
model-inference stage shape).

All four also ride the registered-oracle harnesses automatically
(tools/check_oracles.py, tests/test_empty_input.py, and the hostile
documents/events/lineitem harnesses)."""
from __future__ import annotations

import hashlib
import itertools
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pdfray.pipelines.relational as R
import pdfray.pipelines.textops as T


def _write_lineitem_pairs(tmp_path, orderkeys, partkeys):
    n = len(orderkeys)
    t = pa.table(
        {
            "l_orderkey": pa.array(np.asarray(orderkeys, np.int64)),
            "l_partkey": pa.array(np.asarray(partkeys, np.int64)),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))


def test_frequent_pairs_matches_bruteforce(ray_session, tmp_path):
    """Random baskets with planted hazards: duplicate (order, part) lines
    (the basket must dedup before pair expansion), a HOT 25-part order
    (drives the lag loop past every natural basket size), and
    single-line orders (no pairs)."""
    rng = np.random.default_rng(41)
    o = rng.integers(0, 400, 4000)
    p = rng.integers(0, 60, 4000)
    # duplicates of the same line
    o = np.r_[o, o[:200]]
    p = np.r_[p, p[:200]]
    # hot order with 25 distinct parts
    o = np.r_[o, np.full(25, 9999)]
    p = np.r_[p, np.arange(100, 125)]
    # single-line order
    o = np.r_[o, [12345]]
    p = np.r_[p, [7]]
    _write_lineitem_pairs(tmp_path, o, p)

    out = R.q_frequent_pairs(str(tmp_path))

    baskets = (
        pd.DataFrame({"o": o, "p": p}).drop_duplicates().groupby("o")["p"].apply(sorted)
    )
    counts = {}
    for parts in baskets:
        for a, b in itertools.combinations(parts, 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    ref = (
        pd.DataFrame(
            [
                {"part_a": a, "part_b": b, "n_orders": c}
                for (a, b), c in counts.items()
                if c >= R.FREQ_PAIR_MINSUP
            ]
        )
        .astype({"part_a": "int64", "part_b": "int64", "n_orders": "int64"})
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    assert len(ref) > 0  # the scenario must actually exercise the cut
    pd.testing.assert_frame_equal(out, ref, check_exact=True)


def _write_events(tmp_path, users, ts_us, kinds):
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
    pq.write_table(t, str(tmp_path / "events.parquet"))


def test_markov_transitions_chunk_stitch(ray_session, tmp_path):
    """Random event streams spanning many 7-day chunks, with planted
    hazards: identical-ts ties (event_id is the tiebreak), a hot user
    owning a third of the corpus (split across chunk groups), and a user
    whose populated chunks are NON-adjacent (the stitch must pair the
    next populated chunk, not chunk+1)."""
    rng = np.random.default_rng(57)
    day = 86_400_000_000
    n = 6000
    users = rng.integers(0, 80, n)
    users[: n // 3] = 777  # hot user
    ts = rng.integers(0, 35 * day, n)
    # ts ties: pairs of events sharing a timestamp
    ts[100:200] = ts[0:100]
    users[100:200] = users[0:100]
    kinds = rng.choice(["view", "click", "purchase", "signup"], n)
    # a user active ONLY in chunk 0 and chunk 4 (days 0 and 29)
    users = np.r_[users, [55555, 55555]]
    ts = np.r_[ts, [3 * day, 29 * day]]
    kinds = np.r_[kinds, ["signup", "purchase"]]
    _write_events(tmp_path, users, ts, kinds)

    out = R.q_markov_transitions(str(tmp_path))

    df = pd.DataFrame(
        {
            "user_id": users,
            "ts": ts,
            "event_id": np.arange(len(users), dtype=np.int64),
            "event_type": kinds,
        }
    ).sort_values(["user_id", "ts", "event_id"])
    same = df["user_id"].eq(df["user_id"].shift(-1))
    ref = (
        pd.DataFrame(
            {
                "prev_type": df["event_type"][same.to_numpy()],
                "next_type": df["event_type"].shift(-1)[same.to_numpy()],
            }
        )
        .groupby(["prev_type", "next_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .astype({"n": "int64"})
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # the non-adjacent-chunk user contributed exactly one signup->purchase
    assert (
        ref.set_index(["prev_type", "next_type"]).loc[("signup", "purchase"), "n"]
        >= 1
    )


def test_skyline_matches_bruteforce(ray_session, tmp_path):
    """Random catalog with planted dominance hazards: exact duplicate
    (price, size) pairs (must BOTH survive if on the skyline), same-price
    different-size runs, and same-size different-price runs — checked
    against the O(n^2) dominance definition."""
    rng = np.random.default_rng(11)
    n = 3000
    price = np.round(rng.uniform(1, 50, n) * 4) / 4  # coarse grid -> many ties
    size = rng.integers(1, 40, n)
    # exact duplicates of the first 50 rows
    price = np.r_[price, price[:50]]
    size = np.r_[size, size[:50]]
    key = np.arange(len(price), dtype=np.int64)
    t = pa.table(
        {
            "p_partkey": pa.array(key),
            "p_name": pa.array(["x"] * len(key)),
            "p_brand": pa.array(["b"] * len(key)),
            "p_type": pa.array(["t"] * len(key)),
            "p_size": pa.array(size.astype(np.int32), pa.int32()),
            "p_retailprice": pa.array(price, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))

    out = R.q_skyline_parts(str(tmp_path))

    dominated = np.zeros(len(key), bool)
    for i in range(len(key)):
        dom = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        dominated[i] = dom.any()
    ref = (
        pd.DataFrame(
            {
                "p_partkey": key[~dominated],
                "p_size": size[~dominated].astype("int64"),
                "p_retailprice": price[~dominated],
            }
        )
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    assert len(ref) > 0
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # duplicates-on-the-skyline really occurred (both copies kept)
    pairs = ref[["p_retailprice", "p_size"]].apply(tuple, axis=1)
    assert pairs.duplicated().any() or len(ref) < 4  # hazard exercised


def test_quality_classifier_matches_pure_python(ray_session, tmp_path):
    """Exact integer parity vs an independent per-token Python pass over
    hostile docs: empty text, whitespace-only, unicode (astral plane),
    repeated tokens, and mixed-case collisions (lowering first)."""
    texts = [
        "",
        "   \t\n  ",
        "The quick brown fox JUMPS over the lazy dog",
        "the the the THE tHe",
        "café \U0001f600 中文 token",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "word " * 500,
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = T.t_quality_classifier(str(tmp_path))

    w = T._qc_weights()
    rows = []
    for i, s in enumerate(texts):
        toks = [x for x in s.lower().split() if x]
        score = 0
        for tok in toks:
            b = (
                int.from_bytes(hashlib.md5(tok.encode()).digest()[8:], "little")
                % T.QC_BUCKETS
            )
            score += int(w[b])
        rows.append(
            {
                "doc_id": i,
                "n_tokens": len(toks),
                "score": score,
                "keep": 1 if score >= 0 else 0,
            }
        )
    ref = pd.DataFrame(rows).astype(
        {"doc_id": "int64", "n_tokens": "int64", "score": "int64", "keep": "int64"}
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)


def test_user_entropy_matches_bruteforce(ray_session, tmp_path):
    """Random event mixes plus the exact-arithmetic plants: a single-type
    user (H = 0 exactly), a 2+2 two-type user (H = 1.0 exactly — the
    dyadic case the milli-boundary argument covers), and a 1/2/4/8
    power-of-two mix (fully exact float path)."""
    rng = np.random.default_rng(73)
    n = 4000
    users = rng.integers(0, 100, n)
    kinds = rng.choice(["view", "click", "purchase", "signup", "refund"], n)
    users = np.r_[users, [901] * 5, [902] * 4, [903] * 15]
    kinds = np.r_[
        kinds,
        ["view"] * 5,
        ["view", "view", "click", "click"],
        ["a"] * 1 + ["b"] * 2 + ["c"] * 4 + ["d"] * 8,
    ]
    ts = np.arange(len(users), dtype=np.int64) * 1_000_000
    _write_events(tmp_path, users, ts, kinds)

    out = R.q_user_entropy(str(tmp_path))

    ref_rows = []
    df = pd.DataFrame({"u": users, "k": kinds})
    for u, g in df.groupby("u"):
        c = g["k"].value_counts().to_numpy(np.int64)
        tot = int(c.sum())
        h = np.log2(float(tot)) - float((c * np.log2(c.astype(float))).sum()) / tot
        ref_rows.append(
            {
                "user_id": int(u),
                "n_events": tot,
                "entropy_x1e3": int(np.floor(h * 1000.0 + 0.5)),
            }
        )
    ref = (
        pd.DataFrame(ref_rows)
        .astype({"user_id": "int64", "n_events": "int64", "entropy_x1e3": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    byu = out.set_index("user_id")["entropy_x1e3"]
    assert byu.loc[901] == 0  # single type
    assert byu.loc[902] == 1000  # exact 1 bit
    # 1/2/4/8 mix: H = log2(15) - (0 + 2 + 8 + 24)/15 exactly representable path
    assert byu.loc[903] == int(
        np.floor((np.log2(15.0) - 34.0 / 15.0) * 1000 + 0.5)
    )


def test_keyword_extraction_matches_bruteforce(ray_session, tmp_path):
    """Independent per-doc reference with planted hazards: an exact
    score TIE between two words in one doc (the word-ASC tiebreak
    decides), a doc with fewer than 3 positive-score words, a doc whose
    only word appears in EVERY doc (idf 0 -> no keywords), and repeated
    words (tf > 1)."""
    texts = [
        "alpha beta beta common",        # beta tf=2; tie plant below
        "alpha beta common",             # alpha/beta same df -> same idf
        "gamma gamma gamma common",      # single strong keyword
        "common",                        # only the ubiquitous word -> empty
        "delta epsilon zeta eta common", # 4 distinct rare words, cut at 3
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = T.t_keyword_extraction(str(tmp_path))

    n_docs = float(len(texts))
    words_per_doc = [s.split() for s in texts]
    df = {}
    for ws in words_per_doc:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    idf6 = {w: int(np.floor(np.log(n_docs / c) * 1e6 + 0.5)) for w, c in df.items()}
    rows = []
    for i, ws in enumerate(words_per_doc):
        tf = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            (
                (-tf[w] * idf6[w], w, tf[w], tf[w] * idf6[w])
                for w in tf
                if tf[w] * idf6[w] > 0
            ),
        )[: T.KEYWORD_TOP_K]
        for r, (_, w, tfv, sc) in enumerate(scored, 1):
            rows.append(
                {"doc_id": i, "kw_rank": r, "word": w, "tf": tfv, "score_x1e6": sc}
            )
    ref = pd.DataFrame(rows).astype(
        {
            "doc_id": "int64",
            "kw_rank": "int64",
            "word": "object",
            "tf": "int64",
            "score_x1e6": "int64",
        }
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # doc 3 (only the ubiquitous word) emitted nothing
    assert not (out["doc_id"] == 3).any()
    # doc 1's alpha/beta tie resolved alphabetically
    d1 = out[out["doc_id"] == 1].reset_index(drop=True)
    assert list(d1["word"][:2]) == ["alpha", "beta"]


def test_late_events_audit_matches_bruteforce(ray_session, tmp_path):
    """Arrival order decoupled from event time, with event_ids spanning
    MULTIPLE 50k arrival chunks (the incoming-watermark join path), a hot
    user, ts ties (never late), and a user whose worst lateness crosses a
    chunk boundary (watermark set in chunk 0, violated in chunk 2)."""
    rng = np.random.default_rng(97)
    n = 120_000
    users = rng.integers(0, 200, n)
    users[rng.random(n) < 0.3] = 42  # hot user
    day = 86_400_000_000
    ts = rng.integers(0, 30 * day, n)  # independent of arrival order
    ts[1000:2000] = ts[0:1000]  # arrival ties on ts
    users[1000:2000] = users[0:1000]
    # cross-chunk worst case: user 7777's max ts arrives as event 10 (chunk
    # 0), a far-earlier ts arrives as event 110_000 (chunk 2)
    users[10] = 7777
    ts[10] = 40 * day
    users[110_000] = 7777
    ts[110_000] = 1 * day
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "event_id": pa.array(eid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.ones(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    out = R.q_late_events_audit(str(tmp_path))

    df = pd.DataFrame({"u": users, "ts": ts, "eid": eid}).sort_values("eid")
    ref_rows = []
    for u, g in df.groupby("u"):
        tsv = g["ts"].to_numpy(np.int64)
        wm = np.r_[np.int64(-(2**63)), np.maximum.accumulate(tsv)[:-1]]
        late = (wm > -(2**63)) & (tsv < wm)
        ref_rows.append(
            {
                "user_id": int(u),
                "n_events": len(tsv),
                "n_late": int(late.sum()),
                "max_delay_us": int((wm - tsv)[late].max()) if late.any() else 0,
            }
        )
    ref = (
        pd.DataFrame(ref_rows)
        .astype(
            {
                "user_id": "int64",
                "n_events": "int64",
                "n_late": "int64",
                "max_delay_us": "int64",
            }
        )
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    assert out["n_late"].sum() > 0  # the scenario must exercise lateness
    # the cross-chunk plant: worst delay is 40d-set watermark minus 1d ts
    assert (
        out.set_index("user_id").loc[7777, "max_delay_us"] >= 39 * 86_400_000_000
    )


def _cdc_reference(texts):
    """Independent pure-Python CDC pass: cut AFTER tokens with
    md5-lower-64 % 16 == 0, chunk identity = the joined chunk text."""
    chunks = []  # (doc, chunk_text, n_tok)
    for i, s in enumerate(texts):
        toks = [x for x in s.split(" ") if x]
        cur = []
        for w in toks:
            cur.append(w)
            if (
                int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little") % 16
                == 0
            ):
                chunks.append((i, " ".join(cur), len(cur)))
                cur = []
        if cur:
            chunks.append((i, " ".join(cur), len(cur)))
    from collections import Counter

    occ = Counter(c[1] for c in chunks)
    rows = []
    for i in range(len(texts)):
        mine = [c for c in chunks if c[0] == i]
        dup = [c for c in mine if occ[c[1]] >= 2]
        rows.append(
            {
                "doc_id": i,
                "n_chunks": len(mine),
                "n_dup_chunks": len(dup),
                "n_dup_tokens": sum(c[2] for c in dup),
            }
        )
    return pd.DataFrame(rows).astype(
        {
            "doc_id": "int64",
            "n_chunks": "int64",
            "n_dup_chunks": "int64",
            "n_dup_tokens": "int64",
        }
    )


def test_cdc_dedup_matches_reference_and_shifts(ray_session, tmp_path):
    """Random docs plus the property fixed-width chunking lacks: a long
    shared passage planted at DIFFERENT token offsets in two docs must
    still align to identical chunks (content-defined boundaries are
    position-independent), and an empty doc keeps typed zeros."""
    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(300)]
    shared = " ".join(rng.choice(vocab, 400))
    texts = [
        " ".join(rng.choice(vocab, int(n))) for n in rng.integers(0, 250, 30)
    ]
    texts.append("prefix_one " + shared)
    texts.append(" ".join(rng.choice(vocab, 137)) + " " + shared)  # shifted
    texts.append("")

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    import pdfray.pipelines.textops as T2

    out = T2.t_cdc_dedup(str(tmp_path))
    ref = _cdc_reference(texts)
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # the shifted shared passage really deduped: both planted docs carry
    # substantial duplicated token mass despite different offsets
    a, b = len(texts) - 3, len(texts) - 2
    byd = out.set_index("doc_id")
    assert byd.loc[a, "n_dup_tokens"] > 300
    assert byd.loc[b, "n_dup_tokens"] > 300
    assert byd.loc[len(texts) - 1, "n_chunks"] == 0


def test_linreg_matches_exact_int_bruteforce(ray_session, tmp_path):
    """q_linreg_price_qty vs a Python-arbitrary-precision digest fold with
    the identical IEEE tail — bit-equal doubles.  Plants: a max-price
    group whose in-block Σy² exceeds int64 (the hi/lo-split class: ~25
    rows at $100k already overflow), a constant-x group (vx=0 → NULL
    slope/intercept/r²), and a single-row group."""
    rng = np.random.default_rng(97)
    n = 5000
    flags = np.array(["A", "C"])[rng.integers(0, 2, n)]
    qty = rng.integers(1, 201, n) / 4.0  # 1/64 grid
    price = rng.integers(0, 64_000_000, n) / 640.0  # 1/640 ⊂ 1/6400 grid
    # overflow plant: 300 rows at the $100k ceiling in group A
    price[:300] = 100_000.0
    flags[:300] = "A"
    # constant-x group B
    flags[300:400] = "B"
    qty[300:400] = 7.25
    # single-row group: exactly one 'D' row (vx=0 there too)
    flags[400] = "D"
    t = pa.table(
        {
            "l_returnflag": pa.array(flags.tolist(), pa.string()),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(price),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))

    out = R.q_linreg_price_qty(str(tmp_path))

    rows = []
    for flag in sorted(set(flags.tolist())):
        m = flags == flag
        xi = [int(round(v * 64.0)) for v in qty[m]]
        yi = [int(round(v * 6400.0)) for v in price[m]]
        ng, sx, sy = len(xi), sum(xi), sum(yi)
        sxx = sum(a * a for a in xi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        syy = sum(b * b for b in yi)
        nf, dsx, dsy = float(ng), float(sx), float(sy)
        cov = nf * float(sxy) - dsx * dsy
        vx = nf * float(sxx) - dsx * dsx
        vy = nf * float(syy) - dsy * dsy
        slope = cov / vx * 0.01 if vx != 0.0 else np.nan
        icept = (dsy / 6400.0 - slope * (dsx / 64.0)) / nf if vx != 0.0 else np.nan
        r2 = cov * cov / (vx * vy) if vx * vy != 0.0 else np.nan
        rows.append((flag, ng, slope, icept, r2))
    ref = pd.DataFrame(
        rows, columns=["l_returnflag", "n_lines", "slope", "intercept", "r2"]
    ).astype({"n_lines": "int64"})
    # the overflow plant is real: group A's Σy² does not fit in int64
    assert sum(
        int(round(v * 6400.0)) ** 2 for v in price[flags == "A"]
    ) > np.iinfo(np.int64).max
    assert np.isnan(ref.loc[ref.l_returnflag == "B", "slope"]).all()
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
