"""Multimodal stages: real PNG decode, frame sampling, resize.

Image decode is real (pdfray.core.png); these tests pin decode-backed
features and dims, the Y4M container-index frame sampler, broken-payload
error capture, and the media fixture's golden dims.
"""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from pdfray.core.png import decode_png, encode_png
from pdfray.pipelines.multimodal import (
    FRAME_STRIDE,
    FrameSampler,
    MediaFeatureExtractor,
    Resizer,
)


def _batch(payloads):
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(payloads))]),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _png(w, h, seed=0, channels=3):
    rng = np.random.RandomState(seed)
    return encode_png(rng.randint(0, 256, (h, w, channels), dtype=np.uint8))


def _y4m(frames, colorspace="420jpeg"):
    from pdfray.core.y4m import encode_y4m

    return encode_y4m(frames, colorspace=colorspace)


def _gray_frames(n, w=16, h=12, base=0):
    return [np.full((h, w), (base + i) % 256, np.uint8) for i in range(n)]


def test_frame_sampler_container_index_counts_and_goldens():
    s = FrameSampler()
    out = s(
        _batch(
            [
                _y4m(_gray_frames(1)),
                _y4m(_gray_frames(FRAME_STRIDE)),
                _y4m(_gray_frames(FRAME_STRIDE * 2 + 1), colorspace="444"),
                b"",  # broken: not a Y4M payload
                _y4m(_gray_frames(3))[:-5],  # broken: truncated final frame
            ]
        )
    )
    assert out["n_frames"].to_pylist() == [1, FRAME_STRIDE, FRAME_STRIDE * 2 + 1, 0, 0]
    assert out["n_sampled"].to_pylist() == [1, 1, 3, 0, 0]
    errs = out["error"].to_pylist()
    assert errs[:3] == [None, None, None] and errs[3] and errs[4]
    # golden hash from the PRE-encode arrays — decoder-independent
    want = hashlib.sha1(
        b"".join(f.tobytes() for f in _gray_frames(1))
    ).hexdigest()[:16]
    assert out["frames_hash"][0].as_py() == want


def test_frame_sampler_hash_covers_sampled_frames_only():
    s = FrameSampler()
    frames = _gray_frames(FRAME_STRIDE * 2)
    a = s(_batch([_y4m(frames)]))["frames_hash"][0].as_py()
    # mutating an UNSAMPLED frame must not change the hash
    mut = [f.copy() for f in frames]
    mut[1][0, 0] ^= 0xFF
    b = s(_batch([_y4m(mut)]))["frames_hash"][0].as_py()
    assert a == b
    # mutating a SAMPLED frame (index FRAME_STRIDE) must change it
    mut2 = [f.copy() for f in frames]
    mut2[FRAME_STRIDE][0, 0] ^= 0xFF
    c = s(_batch([_y4m(mut2)]))["frames_hash"][0].as_py()
    assert a != c
    # chroma-plane bytes are never part of the digest: a different
    # colorspace (bigger chroma pad) with identical luma hashes the same
    d = s(_batch([_y4m(frames, colorspace="444")]))["frames_hash"][0].as_py()
    assert a == d


def test_resizer_real_dims_and_fit():
    r = Resizer(max_side=64)
    out = r(_batch([_png(200, 100), _png(30, 20), b"not a png"]))
    assert out["width"].to_pylist() == [200, 30, 0]
    assert out["height"].to_pylist() == [100, 20, 0]
    assert out["out_w"].to_pylist() == [64, 30, 0]
    assert out["out_h"].to_pylist() == [32, 20, 0]


def test_resizer_emitted_payload_decodes_to_fit_dims():
    r = Resizer(max_side=16, emit_payload=True)
    out = r(_batch([_png(100, 40, seed=5)]))
    small = decode_png(out["resized_png"][0].as_py())
    assert (small.width, small.height) == (16, 6)


def test_media_features_real_decode():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (10, 20, 3), dtype=np.uint8)
    payload = encode_png(px)
    out = MediaFeatureExtractor()(_batch([payload]))
    assert out["width"][0].as_py() == 20 and out["height"][0].as_py() == 10
    assert out["error"][0].as_py() is None
    assert out["content_hash"][0].as_py() == hashlib.sha1(payload).hexdigest()
    feat = out["feature"][0].as_py()
    assert len(feat) == 8
    expect = px.astype(np.float64) / 255.0
    assert feat[0] == pytest.approx(expect[:, :, 0].mean(), abs=1e-5)
    assert feat[4] == pytest.approx(expect[:, :, 0].std(), abs=1e-5)
    assert feat[3] == 0.0 and feat[7] == 0.0  # no alpha channel -> padded


def test_media_features_broken_payload_error_column():
    out = MediaFeatureExtractor()(_batch([b"img-bytes", _png(8, 8)]))
    assert out["error"][0].as_py().startswith("PngError")
    assert out["width"][0].as_py() == 0
    assert out["error"][1].as_py() is None
    # strict mode fails fast instead of recording
    with pytest.raises(Exception):
        MediaFeatureExtractor(strict=True)(_batch([b"img-bytes"]))


def test_media_fixture_golden_dims_match_decode():
    from pdfray.core.png import PngError
    from pdfray.sources.fixtures import media_rows

    n = n_broken = 0
    for url, payload, mtype, w, h in media_rows(60):
        n += 1
        try:
            img = decode_png(payload)
            assert (img.width, img.height) == (w, h), url
            assert "broken" not in url
        except PngError:
            assert "broken" in url and (w, h) == (0, 0)
            n_broken += 1
    assert n == 60 and n_broken > 0


def test_ahash_invariant_under_reencode_and_filters():
    """Same pixels through different PNG filter types (and a re-encode of
    the decoded array) must produce the identical aHash — the property
    that makes it a dedup key."""
    import numpy as np

    from pdfray.core.png import decode_png, encode_png
    from pdfray.pipelines.multimodal import ahash64

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    golden = ahash64(px)
    for filt in (0, 1, 2, 3, 4, "adaptive"):
        payload = encode_png(px, filter_type=filt)
        img = decode_png(payload)
        assert ahash64(img.pixels) == golden
    # re-encode of the decoded pixels: still the same image, same hash
    twice = decode_png(encode_png(decode_png(encode_png(px)).pixels))
    assert ahash64(twice.pixels) == golden


def test_image_hash_stage_broken_and_dup_rows(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfray.core.png import encode_png
    from pdfray.pipelines.multimodal import m_image_hash

    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    b = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    rows = {
        "url": [f"u{i}" for i in range(4)],
        # u0/u1: same pixels, different filters -> planted exact dup pair
        "payload": [
            encode_png(a, filter_type=0),
            encode_png(a, filter_type=4),
            encode_png(b),
            b"\x89PNG[garbage",
        ],
        "media_type": ["image"] * 4,
        "width": [24, 24, 24, 0],
        "height": [24, 24, 24, 0],
    }
    d = tmp_path / "media"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "part-00000.parquet"))

    import pdfray.pipelines.multimodal as MM

    orig = MM._media_ds

    def fake_media_ds(sf_dir):
        import ray.data as rd

        return rd.read_parquet(str(d))

    MM._media_ds = fake_media_ds
    try:
        out = m_image_hash("ignored").set_index("url")
    finally:
        MM._media_ds = orig
    assert out.loc["u0", "ahash"] == out.loc["u1", "ahash"] != ""
    assert out.loc["u2", "ahash"] not in ("", out.loc["u0", "ahash"])
    assert not bool(out.loc["u3", "ok"]) and out.loc["u3", "ahash"] == ""


def test_phash_roundtrip_and_brightness_robustness():
    """phash64 is stable through PNG encode/decode (same floats both
    paths) and — unlike aHash is guaranteed to be — invariant under a
    uniform brightness shift (the DC coefficient absorbs it; the 63 AC
    coefficients and their median are unchanged, and the DC bit compares
    against the same shifted median side)."""
    import numpy as np

    from pdfray.core.png import decode_png, encode_png
    from pdfray.pipelines.multimodal import phash64
    from pdfray.sources import fixtures as FX

    k = 3
    w, h, form, _filt, broken = FX.media_geometry(k)
    assert not broken
    px, pal = FX._media_pixels(k, w, h, form)
    if pal is not None:
        px = pal[px]
    golden = phash64(px)
    assert len(golden) == 16 and golden != "0" * 16
    # codec round-trip preserves the hash bit-for-bit
    img = decode_png(encode_png(px))
    assert phash64(img.pixels) == golden
    # uniform brightness shift: all 63 AC coefficients unchanged -> at
    # most the DC bit can move; hamming(golden, shifted) <= 1
    shifted = np.clip(px.astype(np.int64) + 9, 0, 255).astype(px.dtype)
    d = bin(int(golden, 16) ^ int(phash64(shifted), 16)).count("1")
    assert d <= 1


def test_image_neardup_matches_allpairs_truth(ray_session):
    """m_image_neardup's banded-LSH pair generation matches the exhaustive
    all-pairs ground truth computed from the PRE-encode pixel arrays at a
    DIFFERENT scale than the driver oracle pins (sf0.001), and the
    banding never misses: bands = T+1 contiguous slices, so any pair at
    Hamming <= T shares a band verbatim (pigeonhole)."""
    import pandas as pd

    from pdfray.pipelines.multimodal import (
        NEARDUP_BANDS,
        NEARDUP_T,
        _hash_bands,
        ahash64,
        m_image_neardup,
    )
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    sf = "/root/testdata/sf0.001"
    got = m_image_neardup(sf)

    urls, hs = [], []
    for k in range(FX.sf_doc_count(0.001)):
        w, h, form, _filt, broken = FX.media_geometry(k)
        if broken:
            continue
        px, pal = FX._media_pixels(k, w, h, form)
        if pal is not None:
            px = pal[px]
        urls.append(f"https://img.example.org/{form}/{k:08d}.png")
        hs.append(int(ahash64(px), 16))
    a = np.array(hs, np.uint64)
    d = _popcount64(a[:, None] ^ a[None, :])
    ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
    rows = sorted(
        (*sorted((urls[i], urls[j])), int(d[i, j])) for i, j in zip(ia, ib)
    )
    want = pd.DataFrame(rows, columns=["url_a", "url_b", "hamming"])
    want["hamming"] = want["hamming"].astype("int64")
    if len(want) == 0:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=True
        )

    # pigeonhole recall: for any pair of hashes within NEARDUP_T bits,
    # at least one of the NEARDUP_BANDS band keys is identical
    rng = np.random.RandomState(7)
    base = rng.randint(0, 2**63, 200).astype(np.uint64)
    flip = base.copy()
    for i in range(len(flip)):
        for b in rng.choice(64, rng.randint(0, NEARDUP_T + 1), replace=False):
            flip[i] ^= np.uint64(1) << np.uint64(b)
    ba, bb = _hash_bands(base), _hash_bands(flip)
    assert (ba == bb).any(axis=1).all()
    assert NEARDUP_BANDS == NEARDUP_T + 1


def test_audio_neardup_matches_allpairs_truth_and_plants(ray_session):
    """m_audio_neardup matches the exhaustive all-pairs envelope-hash
    truth at a DIFFERENT scale than the driver oracle pins (sf0.001),
    the planted re-mastered copy (k%16==14 of clip k-8) is caught, and
    the fingerprint is exactly gain-invariant (scaling samples by any
    constant leaves the hash bit-identical)."""
    import pandas as pd

    from pdfray.core.wav import WavAudio, decode_wav, envelope_hash64
    from pdfray.pipelines.multimodal import NEARDUP_T, m_audio_neardup
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    sf = "/root/testdata/sf0.001"
    got = m_audio_neardup(sf)

    n = max(20, FX.sf_doc_count(0.001) // 2)
    urls, hs = [], []
    for k in range(0, n, 2):
        if k % 13 in (5, 11):
            continue
        payload, _stats = FX._audio_payload(k)
        urls.append(f"https://av.example.org/audio/{k:08d}.wav")
        hs.append(envelope_hash64(decode_wav(payload)))
    a = np.array(hs, np.uint64)
    d = _popcount64(a[:, None] ^ a[None, :])
    ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
    rows = sorted(
        (*sorted((urls[i], urls[j])), int(d[i, j])) for i, j in zip(ia, ib)
    )
    want = pd.DataFrame(rows, columns=["url_a", "url_b", "hamming"])
    want["hamming"] = want["hamming"].astype("int64")
    if len(want) == 0:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=True
        )
    # the sf0.001 plant: clip 14 duplicates clip 6 (x2 gain + noise)
    pair = got[
        (got["url_a"] == "https://av.example.org/audio/00000006.wav")
        & (got["url_b"] == "https://av.example.org/audio/00000014.wav")
    ]
    assert len(pair) == 1

    # gain invariance: x3 and x17 scaling leave the hash bit-identical
    audio = decode_wav(FX._audio_payload(6)[0])
    base = envelope_hash64(audio)
    for gain in (3, 17):
        scaled = WavAudio(
            samples=(audio.samples.astype(np.int64) * gain).astype(np.int32),
            sample_rate=audio.sample_rate,
        )
        assert envelope_hash64(scaled) == base


def test_video_neardup_matches_allpairs_truth_and_plants(ray_session):
    """m_video_neardup matches the exhaustive pre-encode all-pairs truth
    at sf0.001, the planted re-graded copy (k%16==15 of video k-8, +8
    brightness + noise) is caught, and the fingerprint is exactly
    brightness-shift invariant when no pixel clips (adding c to every
    pixel adds 64c to the 8x8 sample sum, shifting the integer mean by
    exactly c)."""
    import pandas as pd

    from pdfray.pipelines.multimodal import (
        FRAME_STRIDE,
        NEARDUP_T,
        m_video_neardup,
        video_hash64,
    )
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    sf = "/root/testdata/sf0.001"
    got = m_video_neardup(sf)

    n = max(20, FX.sf_doc_count(0.001) // 2)
    urls, hs = [], []
    for k in range(1, n, 2):
        if k % 13 in (5, 11):
            continue
        frames, _cs = FX._video_frames_arrays(k)
        urls.append(f"https://av.example.org/video/{k:08d}.y4m")
        hs.append(
            int(
                video_hash64(
                    frames[i] for i in range(0, len(frames), FRAME_STRIDE)
                ),
                16,
            )
        )
    a = np.array(hs, np.uint64)
    d = _popcount64(a[:, None] ^ a[None, :])
    ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
    rows = sorted(
        (*sorted((urls[i], urls[j])), int(d[i, j])) for i, j in zip(ia, ib)
    )
    want = pd.DataFrame(rows, columns=["url_a", "url_b", "hamming"])
    want["hamming"] = want["hamming"].astype("int64")
    if len(want) == 0:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=True
        )
    # the sf0.001 plant: video 15 duplicates video 7
    pair = got[
        (got["url_a"] == "https://av.example.org/video/00000007.y4m")
        & (got["url_b"] == "https://av.example.org/video/00000015.y4m")
    ]
    assert len(pair) == 1

    # exact brightness invariance: +c on every pixel (int64, no clipping)
    # leaves the hash bit-identical
    frames, _cs = FX._video_frames_arrays(1)
    h0 = video_hash64(iter(frames))
    for c in (7, 100):
        bright = [f.astype(np.int64) + c for f in frames]
        assert video_hash64(iter(bright)) == h0


def test_patch_means_hand_computed_and_edges():
    """patch_means on a constructed gradient: hand-computed integer means,
    partial edge patches dropped, sub-patch images yield an empty grid."""
    import numpy as np

    from pdfray.pipelines.multimodal import PATCH, patch_means, patch_summary

    # 16x20 gray: value = row index -> each 8x8 patch mean = mean of its
    # 8 row values = (r0 + ... + r7) // 8
    px = np.tile(np.arange(16, dtype=np.uint8)[:, None], (1, 20))
    m = patch_means(px)
    assert m.shape == (2, 2)  # 20 // 8 == 2: the 4-col edge strip drops
    assert m.tolist() == [[3, 3], [11, 11]]  # sum(0..7)//8=3, sum(8..15)//8=11
    ny, nx, n, s, hx = patch_summary(px)
    assert (ny, nx, n, s) == (2, 2, 4, 28)
    import hashlib

    assert hx == hashlib.md5(b"3,3,11,11").hexdigest()
    assert patch_means(np.zeros((PATCH - 1, 64), np.uint8)).size == 0
    # RGB luma: integer mean of channels, same grid arithmetic
    rgb = np.stack([px, px, np.zeros_like(px)], axis=2)
    assert patch_means(rgb).tolist() == [[2, 2], [7, 7]]  # (2r)//3 means


def test_patchify_stage_long_format_consistent_with_summary(ray_session):
    """The long per-patch stream must agree with the summary row for every
    image (count, sum, row-major md5), and broken payloads appear only in
    the summary (ok=false) — never as patches."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from pdfray.core.png import encode_png
    from pdfray.pipelines.multimodal import PatchExtractor

    rng = np.random.RandomState(13)
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3-broken", "u4-tiny"]),
            "payload": pa.array(
                [
                    encode_png(rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)),
                    encode_png(rng.randint(0, 256, (9, 17), dtype=np.uint8)),
                    b"not a png",
                    encode_png(rng.randint(0, 256, (4, 4), dtype=np.uint8)),
                ],
                pa.binary(),
            ),
        }
    )
    summary = PatchExtractor()(batch).to_pandas().set_index("url")
    long = PatchExtractor(emit_patches=True)(batch).to_pandas()
    assert not summary.loc["u3-broken", "ok"]
    assert summary.loc["u3-broken", "means_md5"] == ""
    assert summary.loc["u4-tiny", "n_patches"] == 0  # 4x4 < one patch
    assert "u3-broken" not in set(long["url"])
    for u in ("u1", "u2"):
        g = long[long["url"] == u].sort_values(["patch_row", "patch_col"])
        assert len(g) == summary.loc[u, "n_patches"]
        assert g["mean_luma"].sum() == summary.loc[u, "mean_sum"]
        seq = ",".join(str(int(v)) for v in g["mean_luma"])
        assert hashlib.md5(seq.encode()).hexdigest() == summary.loc[u, "means_md5"]
    # u1: 24x32 -> 3x4 grid
    assert (summary.loc["u1", "np_y"], summary.loc["u1", "np_x"]) == (3, 4)
    # u2: 9x17 -> 1x2 grid (edges dropped)
    assert (summary.loc["u2", "np_y"], summary.loc["u2", "np_x"]) == (1, 2)


def test_laplacian_stats_hand_values():
    """Hand-checked variance-of-Laplacian: a FLAT image has zero energy;
    a single bright interior pixel contributes the known kernel response
    (4 at the center, -1 at its 4 neighbors -> n=9 interior, s=0 by
    symmetry... computed explicitly below); images thinner than 3px have
    no interior; RGB lumas ride the integer-mean plane."""
    import numpy as np

    from pdfray.pipelines.multimodal import laplacian_stats

    flat = np.full((5, 7), 9, dtype=np.uint8)
    n, s, ss = laplacian_stats(flat)
    assert (n, s, ss) == (15, 0, 0)
    # single spike at center of 5x5 zeros: interior 3x3; L(center)=4v,
    # its 4 interior neighbors get -v each; corners of interior: 0
    v = 10
    img = np.zeros((5, 5), dtype=np.uint8)
    img[2, 2] = v
    n, s, ss = laplacian_stats(img)
    assert n == 9
    assert s == 4 * v - 4 * v  # +4v center, -v at 4 neighbors
    assert ss == (4 * v) ** 2 + 4 * v * v
    # thin image: no interior
    assert laplacian_stats(np.zeros((2, 9), dtype=np.uint8)) == (0, 0, 0)
    # RGB: luma = channel mean // 3 path must be used (pure gray equals)
    rgb = np.stack([flat, flat, flat], axis=2)
    assert laplacian_stats(rgb) == (15, 0, 0)


def test_sharpness_ranks_blur_below_detail(ray_session):
    """End-to-end on the sf0.001 media fixture: every ok row carries the
    digest identity var == (ss - s²/n)/n, broken rows are NaN, and the
    fixture's structured (gradient/pattern) images score strictly above
    a flat constant would (>=0 always; >0 for any non-constant
    interior)."""
    import numpy as np

    from pdfray.pipelines.multimodal import m_sharpness

    df = m_sharpness("/root/testdata/sf0.001")
    assert len(df) > 0
    ok = df[df.ok]
    bad = df[~df.ok]
    assert (bad.lap_n == 0).all() and bad.sharpness.isna().all()
    for r in ok.itertuples():
        if r.lap_n > 0:
            want = (
                float(r.lap_sumsq)
                - float(r.lap_sum) * float(r.lap_sum) / float(r.lap_n)
            ) / float(r.lap_n)
            assert r.sharpness == want
            assert r.sharpness >= 0.0


def test_image_dup_clusters_vs_truth_and_scale_regime(ray_session, monkeypatch):
    """m_image_dup_clusters matches an independent union-find over the
    near-dup pairs, transitivity holds (every member maps to the
    family's lexicographic min), and the DISTRIBUTED `_cc_min_label`
    regime (forced via CC_DRIVER_MAX_PAIRS=0) produces identical rows.
    sf0.01 is the smallest scale with a natural near-dup family
    (sf0.001 has none — engine and truth agree on empty)."""
    import pandas as pd

    import pdfray.pipelines.textops as T
    from pdfray.pipelines.multimodal import m_image_dup_clusters, m_image_neardup

    assert len(m_image_dup_clusters("/root/testdata/sf0.001")) == 0
    sf = "/root/testdata/sf0.01"
    got = m_image_dup_clusters(sf)
    pairs = m_image_neardup(sf)

    # independent union-find over the (already truth-checked) pairs
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["url_a"], pairs["url_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict = {}
    for u in parent:
        comp.setdefault(find(u), []).append(u)
    rows = []
    for members in comp.values():
        rep = min(members)
        rows.extend((u, rep, len(members)) for u in members)
    want = pd.DataFrame(rows, columns=["url", "cluster", "cluster_size"])
    want["cluster_size"] = want["cluster_size"].astype("int64")
    want = want.sort_values(["cluster", "url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert len(got) > 0  # the fixture really plants dup families

    monkeypatch.setattr(T, "CC_DRIVER_MAX_PAIRS", 0)  # force _cc_min_label
    got_dist = m_image_dup_clusters(sf)
    pd.testing.assert_frame_equal(got_dist, want, check_dtype=True)


@pytest.mark.parametrize("kind", ["audio", "video"])
def test_av_dup_clusters_vs_union_find(ray_session, kind):
    """Audio/video dup families match an independent union-find over
    their own near-dup pairs (the planted re-mastered/re-graded copies
    guarantee nonempty families at sf0.01)."""
    import pandas as pd

    from pdfray.pipelines import multimodal as M

    pairs = getattr(M, f"m_{kind}_neardup")("/root/testdata/sf0.01")
    got = getattr(M, f"m_{kind}_dup_clusters")("/root/testdata/sf0.01")
    assert len(pairs) > 0 and len(got) > 0

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["url_a"], pairs["url_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict = {}
    for u in parent:
        comp.setdefault(find(u), []).append(u)
    rows = []
    for members in comp.values():
        rep = min(members)
        rows.extend((u, rep, len(members)) for u in members)
    want = (
        pd.DataFrame(rows, columns=["url", "cluster", "cluster_size"])
        .astype({"cluster_size": "int64"})
        .sort_values(["cluster", "url"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
