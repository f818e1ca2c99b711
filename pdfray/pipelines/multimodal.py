"""Multimodal binary-column stages: real PNG decode through actor pools.

Image payloads are opaque ``binary`` columns with typed metadata; decode /
featurize / resize run as actor-pool ``map_batches`` stages over small
batches (payloads are large).  Image decode is REAL — the pure-Python PNG
codec in `pdfray.core.png` (zlib inflate + numpy unfilter) — so widths,
heights, and resize outputs are exact and DuckDB-oracle-checkable against
the media fixture's golden columns.  Broken payloads land in the ``error``
column with 0-dims; the stage never raises.

Audio and video decode are REAL too, for the containers a pure-Python
parser can own: WAV (RIFF/PCM — `pdfray.core.wav`) and Y4M (YUV4MPEG2 —
`pdfray.core.y4m`).  Both video stages — the AvDecoder stats pass and the
FrameSampler — seek through the real Y4M frame-offset index and slice
only the sampled frames' Y planes: the same O(sampled) skip-ahead access
a codec-backed sampler gets from a container index.  Compressed codecs
(H.264/AAC/...) genuinely need codec libs this environment lacks; the
container-index seek path itself is real and golden-oracle-checked, so a
codec library drops in at `parse_y4m`'s seam without touching the Ray
plumbing.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..core.png import PngError, decode_png, resize_fit
from .textops import warm_stage

MEDIA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("content_hash", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("error", pa.string()),
    ]
)

N_FEATURES = 8  # per-channel mean + std over RGBA lanes, zero-padded


def _features(pixels: np.ndarray) -> list:
    """Deterministic 8-float feature: per-channel mean and std in [0, 1],
    padded to 4 channels — the decode-side stand-in for an embedding model
    (which would load once per actor in __init__)."""
    px = pixels.astype(np.float64) / 255.0
    if px.ndim == 2:
        px = px[:, :, None]
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    out = np.zeros(N_FEATURES, np.float64)
    out[: len(means)] = means[:4]
    out[4 : 4 + len(stds)] = stds[:4]
    return [float(round(v, 6)) for v in out]


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary image payloads.

    Small ``batch_size`` (payloads are large) and ``concurrency=(min,max)``
    actor pools; a real deployment loads its embedding model here, once per
    actor, next to the decoder."""

    def __init__(self, media_type: str = "image", strict: bool = False):
        self.media_type = media_type
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {name: [] for name in MEDIA_SCHEMA.names}
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            out["url"].append(url)
            out["media_type"].append(self.media_type)
            out["n_bytes"].append(len(payload))
            out["content_hash"].append(hashlib.sha1(payload).hexdigest())
            try:
                img = decode_png(payload)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["feature"].append(_features(img.pixels))
                out["error"].append(None)
            except Exception as ex:
                if self.strict:
                    raise
                out["width"].append(0)
                out["height"].append(0)
                out["feature"].append([])
                out["error"].append(f"{type(ex).__name__}: {ex}")
        return pa.table(out, schema=MEDIA_SCHEMA)


FRAME_STRIDE = 4

RESIZE_MAX = 64


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of a Y4M video
    payload through the REAL container frame-offset index (round 5 —
    replaced the synthetic chunk-math layout): `parse_y4m` walks frame
    headers only, then each sampled frame's Y plane is sliced in place and
    the unsampled frames are never touched — the keyframe-seek access
    pattern a codec-backed sampler gets from its container index.  Emits
    frame counts plus a digest over the sampled planes; broken payloads
    record the typed error and keep the row (never raises)."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.y4m import Y4mError, parse_y4m

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {"url": [], "n_frames": [], "n_sampled": [],
               "frames_hash": [], "error": []}
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            try:
                stream = parse_y4m(payload)
                idx = range(0, stream.n_frames, self.stride)
                h = hashlib.sha1()
                for k in idx:
                    h.update(stream.luma(k).tobytes())
                out["n_frames"].append(stream.n_frames)
                out["n_sampled"].append(len(idx))
                out["frames_hash"].append(h.hexdigest()[:16] if idx else None)
                out["error"].append(None)
            except Y4mError as ex:
                out["n_frames"].append(0)
                out["n_sampled"].append(0)
                out["frames_hash"].append(None)
                out["error"].append(str(ex))
            out["url"].append(url)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "n_sampled": pa.array(out["n_sampled"], pa.int64()),
                "frames_hash": pa.array(out["frames_hash"], pa.string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


class Resizer:
    """Actor-pool stage: decode + aspect-preserving nearest-neighbor fit
    into RESIZE_MAX x RESIZE_MAX (never upscales).  Emits the resized
    payload re-encoded as PNG plus exact dims; broken inputs get 0-dims and
    a null payload (error recorded upstream by MediaFeatureExtractor —
    this stage keeps its output narrow)."""

    def __init__(self, max_side: int = RESIZE_MAX, emit_payload: bool = False):
        self.max_side = max_side
        self.emit_payload = emit_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.png import encode_png

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {"url": [], "width": [], "height": [], "out_w": [], "out_h": []}
        resized = []
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            try:
                img = decode_png(payload)
                small, out_w, out_h = resize_fit(img.pixels, self.max_side)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                if self.emit_payload:
                    resized.append(encode_png(small))
            except Exception:
                out["width"].append(0)
                out["height"].append(0)
                out["out_w"].append(0)
                out["out_h"].append(0)
                if self.emit_payload:
                    resized.append(None)
            out["url"].append(url)
        cols = {
            "url": pa.array(out["url"], pa.string()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "out_w": pa.array(out["out_w"], pa.int32()),
            "out_h": pa.array(out["out_h"], pa.int32()),
        }
        if self.emit_payload:
            cols["resized_png"] = pa.array(resized, pa.binary())
        return pa.table(cols)


AV_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_channels", pa.int64()),
        ("n_samples", pa.int64()),
        ("duration_ms", pa.int64()),
        ("rms_x1e3", pa.int64()),
        ("peak", pa.int64()),
        ("dom_bin", pa.int64()),
        ("dom_hz_x1e3", pa.int64()),
        ("n_bins", pa.int64()),
        ("n_windows", pa.int64()),
        ("n_active_windows", pa.int64()),
        ("n_segments", pa.int64()),
        ("longest_run", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("n_frames", pa.int64()),
        ("n_sampled", pa.int64()),
        ("luma_sum", pa.int64()),
        ("n_pairs", pa.int64()),
        ("n_cuts", pa.int64()),
        ("diff_total", pa.int64()),
        ("error", pa.string()),
    ]
)

_AV_STAT_NAMES = AV_SCHEMA.names[3:-1]


class AvDecoder:
    """Actor-pool stage: REAL audio/video container decode, dispatched on
    magic bytes — WAV via the RIFF/PCM parser, Y4M via the offset-indexed
    frame walk (only sampled Y planes are ever sliced; payload bytes for
    unsampled frames are never touched).  Broken payloads land in ``error``
    with zeroed stats; the stage never raises.  At 100 TB this stage runs
    with small batches (payloads are large) and its output is narrow
    integer stats — the payload column never crosses the shuffle."""

    def __init__(self, strict: bool = False):
        from ..core.y4m import SAMPLE_STRIDE

        self.strict = strict
        self.stride = SAMPLE_STRIDE

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.wav import (
            audio_stats,
            decode_wav,
            segment_stats,
            spectral_stats,
        )
        from ..core.y4m import parse_y4m, sample_stats, scene_stats

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {name: [] for name in AV_SCHEMA.names}
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            out["url"].append(url)
            out["n_bytes"].append(len(payload))
            stats = {}
            try:
                if payload[:4] == b"RIFF":
                    out["media_type"].append("audio")
                    audio = decode_wav(payload)
                    stats = audio_stats(audio)
                    stats.update(spectral_stats(audio))
                    stats.update(segment_stats(audio))
                elif payload[:9] == b"YUV4MPEG2":
                    out["media_type"].append("video")
                    stream = parse_y4m(payload)
                    stats = sample_stats(stream, self.stride)
                    stats.update(scene_stats(stream))
                else:
                    out["media_type"].append("unknown")
                    raise ValueError("unrecognized container magic")
                out["error"].append(None)
            except Exception as ex:
                if self.strict:
                    raise
                out["error"].append(f"{type(ex).__name__}: {ex}")
                stats = {}
            for name in _AV_STAT_NAMES:
                out[name].append(int(stats.get(name, 0)))
        return pa.table(out, schema=AV_SCHEMA)


def _av_ds(sf_dir: str, media_type: str):
    """Pruned read of the AV table: only (url, payload) leave storage, and
    the media_type predicate is pushed to the parquet fragments so the
    other modality's (larger) payloads are row-group-skipped at the read."""
    import pyarrow.compute as _pc
    import ray.data as rd

    from ..sources.fixtures import ensure_av_parquet

    path = ensure_av_parquet(sf_dir)
    return rd.read_parquet(
        path,
        columns=["url", "payload"],
        filter=_pc.field("media_type") == media_type,
    )


def _decode_av(sf_dir: str, media_type: str, cols: list):
    out = _av_ds(sf_dir, media_type).map_batches(
        warm_stage(AvDecoder), batch_format="pyarrow", batch_size=64
    )
    df = out.select_columns(cols).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def m_audio_features(sf_dir: str):
    """Real WAV decode over the AV table: every stat is recomputed from the
    container bytes and equals the fixture's pre-encode golden, so the
    DuckDB oracle is an exact codec round-trip check."""
    return _decode_av(
        sf_dir,
        "audio",
        ["url", "n_bytes", "sample_rate", "n_channels", "n_samples",
         "duration_ms", "rms_x1e3", "peak"],
    )


def m_video_frames(sf_dir: str):
    """Real Y4M frame sampling: dims/frame counts/sampled-luma sums are
    recomputed by offset-indexed plane slicing and oracle-checked against
    the fixture goldens."""
    return _decode_av(
        sf_dir,
        "video",
        ["url", "n_bytes", "width", "height", "n_frames", "n_sampled",
         "luma_sum"],
    )


def m_dominant_freq(sf_dir: str):
    """Spectral feature extraction over the audio table: dominant
    frequency via one rfft per decoded WAV (`core.wav.spectral_stats`) —
    the DSP counterpart of the RMS/peak stats, recomputed from container
    bytes and oracle-checked against the fixture goldens (dom_bin and the
    integer bin→mHz conversion are exact; broken payloads keep zeroed
    stats + a typed error, same contract as m_audio_features)."""
    return _decode_av(
        sf_dir,
        "audio",
        ["url", "n_samples", "dom_bin", "dom_hz_x1e3", "n_bins"],
    )


def m_silence_segments(sf_dir: str):
    """Silence segmentation (the VAD shape) over the audio table: per
    decoded WAV, fixed-window integer energy thresholding + run-length
    stats (`core.wav.segment_stats` — cross-multiplied compare, no
    floats), recomputed from container bytes and oracle-checked against
    the fixture goldens, whose planted exact-silence gaps exercise real
    run boundaries.  Broken payloads keep zeroed stats + a typed error,
    same contract as m_audio_features."""
    return _decode_av(
        sf_dir,
        "audio",
        ["url", "n_windows", "n_active_windows", "n_segments", "longest_run"],
    )


def m_scene_cuts(sf_dir: str):
    """Shot-boundary detection over the video table: consecutive-frame
    absolute luma differences with an integer cut threshold
    (`core.y4m.scene_stats`), recomputed from container bytes and
    oracle-checked against fixture goldens whose planted scene changes
    re-color the whole frame while in-scene motion stays below the
    threshold.  diff_total rides along as the motion-volume feature."""
    return _decode_av(
        sf_dir,
        "video",
        ["url", "n_frames", "n_pairs", "n_cuts", "diff_total"],
    )


def _media_ds(sf_dir: str):
    import ray.data as rd

    from ..sources.fixtures import ensure_media_parquet

    path = ensure_media_parquet(sf_dir)
    return rd.read_parquet(path, columns=["url", "payload"])


def m_frame_sample(sf_dir: str):
    """Every FRAME_STRIDE-th frame of each Y4M video payload, seeked
    through the real container frame-offset index.  The oracle embeds
    PRE-encode golden frame hashes (fixtures._video_frames_arrays — the
    decoder never produced them), so a match certifies the
    container-index seek path end to end, including the planted
    truncated/unsupported-colorspace rows landing as typed errors."""
    out = _av_ds(sf_dir, "video").map_batches(
        warm_stage(FrameSampler), batch_format="pyarrow", batch_size=64
    )
    df = out.select_columns(
        ["url", "n_frames", "n_sampled", "frames_hash"]
    ).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def m_resize(sf_dir: str):
    """Real decode + resize: dims and fit arithmetic are exact, so the
    DuckDB oracle recomputes them from the fixture's golden width/height."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(Resizer), batch_format="pyarrow", batch_size=64
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def m_media_features(sf_dir: str):
    """Decode + featurize the media table.  The driver pulls only the small
    SQL-derivable columns (url, media_type, n_bytes, width, height) — the
    feature vectors stay distributed (at scale the full table is
    write_parquet'd); feature values are covered by unit tests."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(MediaFeatureExtractor),
        batch_format="pyarrow",
        batch_size=64,  # payloads are small-image PNGs; for multi-MB media
        # drop this back down so batch x concurrency fits worker heaps
    )
    df = out.select_columns(["url", "media_type", "n_bytes", "width", "height"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


# ----------------------------------------------------------------------
# perceptual image hashing (aHash) — the image-side dedup fingerprint.


def luma_plane(pixels) -> "np.ndarray":
    """Deterministic luma: channel 0 for gray/gray+alpha, integer mean of
    the first three channels otherwise (no float weights — both the engine
    and the pre-encode golden computation must land on identical ints)."""
    import numpy as np

    arr = np.asarray(pixels)
    if arr.ndim == 2:
        return arr.astype(np.int64)
    if arr.shape[2] <= 2:
        return arr[:, :, 0].astype(np.int64)
    return arr[:, :, :3].astype(np.int64).sum(axis=2) // 3


def ahash64(pixels) -> str:
    """64-bit average hash: 8x8 nearest-neighbor luma samples thresholded
    by their integer mean (strict >), rendered as 16 hex digits.  Every
    step is integer arithmetic, so the hash is bit-identical across the
    decode path and the pre-encode golden path."""
    import numpy as np

    luma = luma_plane(pixels)
    h, w = luma.shape
    ys = (np.arange(8, dtype=np.int64) * h) // 8
    xs = (np.arange(8, dtype=np.int64) * w) // 8
    s = luma[np.ix_(ys, xs)]
    mean = int(s.sum()) // 64
    bits = (s > mean).astype(np.uint64).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return format(v, "016x")


_DCT32 = None


def _dct32_basis():
    """32x32 orthonormal DCT-II basis, built once (float64, deterministic)."""
    import numpy as np

    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n, dtype=np.float64)
        basis = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
        basis *= np.sqrt(2.0 / n)
        basis[0] *= np.sqrt(0.5)
        _DCT32 = basis
    return _DCT32


def phash64(pixels) -> str:
    """64-bit perceptual (DCT) hash: 32x32 nearest-neighbor luma samples
    -> 2D DCT-II -> top-left 8x8 coefficient block thresholded by its
    median, rendered as 16 hex digits.  The float pipeline is the same
    deterministic numpy on the decode path and the pre-encode golden path,
    so equality certifies the codec round-trip bit-for-bit (aHash's
    integer-only scheme, extended to the frequency domain — robust to
    brightness shifts where aHash is not)."""
    import numpy as np

    luma = luma_plane(pixels)
    h, w = luma.shape
    ys = (np.arange(32, dtype=np.int64) * h) // 32
    xs = (np.arange(32, dtype=np.int64) * w) // 32
    s = luma[np.ix_(ys, xs)].astype(np.float64)
    d = _dct32_basis()
    freq = d @ s @ d.T
    block = freq[:8, :8].ravel()
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return format(v, "016x")


class ImageHasher:
    """Actor-pool stage: decode PNG -> aHash.  Broken payloads emit
    ok=false with an empty hash (typed-error contract, row kept)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        oks, hashes = [], []
        for i in range(len(urls)):
            try:
                img = decode_png(payloads[i].as_py() or b"")
                hashes.append(ahash64(img.pixels))
                oks.append(True)
            except Exception:
                hashes.append("")
                oks.append(False)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "ahash": pa.array(hashes, pa.string()),
            }
        )


class PhashHasher:
    """Actor-pool stage: decode PNG -> perceptual DCT hash (phash64)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        oks, hashes = [], []
        for i in range(len(urls)):
            try:
                img = decode_png(payloads[i].as_py() or b"")
                hashes.append(phash64(img.pixels))
                oks.append(True)
            except Exception:
                hashes.append("")
                oks.append(False)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "phash": pa.array(hashes, pa.string()),
            }
        )


def m_phash(sf_dir: str):
    """Perceptual DCT hash per image — REAL decode; oracle = golden hashes
    from the pre-encode pixel arrays (the m_image_hash scheme), so a match
    certifies decode + DCT arithmetic end to end."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(PhashHasher), batch_format="pyarrow", batch_size=64
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def m_image_hash(sf_dir: str):
    """Perceptual hash per image — REAL decode through the pure-Python PNG
    codec; the oracle holds the golden hashes computed from the PRE-encode
    pixel arrays at fixture definition (same independent-path scheme as the
    WAV/Y4M goldens), so an exact match certifies the full codec
    round-trip, not just the hash arithmetic.  Downstream dedup is a plain
    groupby on ``ahash`` (or a Hamming-ball LSH like t_simhash for
    near-dups) — the hash IS the image-side dedup key."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(ImageHasher), batch_format="pyarrow", batch_size=64
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


NEARDUP_T = 8  # max Hamming distance counted as a near-duplicate
NEARDUP_BANDS = 9  # pigeonhole: d <= BANDS-1 leaves >= 1 band untouched


def _hash_bands(h: "np.ndarray", n_bands: int = NEARDUP_BANDS):
    """(rows, bands) int64 band keys from uint64 hashes — contiguous bit
    slices (the t_simhash banding shape).  64/9 bands are 7-8 bits; any
    pair with Hamming distance <= bands-1 shares at least one band
    verbatim, so candidate generation has NO false negatives at
    NEARDUP_T = bands-1."""
    bounds = np.linspace(0, 64, n_bands + 1).astype(np.int64)
    out = np.empty((len(h), n_bands), np.int64)
    for b in range(n_bands):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        out[:, b] = ((h >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)).astype(
            np.int64
        )
    return out


def m_image_neardup(sf_dir: str):
    """Near-duplicate image pairs — perceptual dedup over the media table,
    the image-side composition of the text near-dup family: REAL PNG
    decode -> aHash (64-bit) -> banded LSH candidate generation ->
    exact Hamming verification at distance <= NEARDUP_T.

    Plan: the decode+hash pass is the existing warm `ImageHasher` actor
    stage; each block then explodes its hashes into (band, key) rows and
    ONE keyed exchange (`groupby(band, key).map_groups`) scores each
    bucket's pairs with vectorized XOR+popcount — bucket sizes are
    geometrically small (7-8 bit keys shard each band), candidate pairs
    never exist outside buckets, and banding at bands = T+1 guarantees
    every true pair is generated (pigeonhole).  Pairs dedupe across bands
    by construction of the final distinct pass.  The oracle embeds the
    ALL-PAIRS ground truth computed from the PRE-encode pixel arrays
    (decoder never touched), so a match certifies decode, hash, banding
    recall, and verification together."""
    from .textops import warm_stage as _ws

    hashes = _media_ds(sf_dir).map_batches(
        _ws(ImageHasher), batch_format="pyarrow", batch_size=64
    )
    return _banded_neardup_pairs(hashes)


def _banded_neardup_pairs(hashes):
    """Shared banded-LSH near-dup machinery over a (url, ok, ahash-hex)
    dataset — the m_image_neardup plan body, reused verbatim by
    m_audio_neardup (one keyed exchange, pigeonhole-guaranteed recall at
    Hamming <= NEARDUP_T, vectorized XOR+popcount verify per bucket)."""
    import pandas as pd

    from .simsearch import _popcount64

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("ok"))
        urls = t.column("url")
        hx = np.array(
            [int(s, 16) for s in t.column("ahash").to_pylist()], np.uint64
        )
        bands = _hash_bands(hx)
        n, B = bands.shape
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(B, dtype=np.int64), n)),
                "key": pa.array(bands.ravel()),
                "url": pa.array(
                    np.repeat(np.asarray(urls.to_pylist(), object), B),
                    pa.string(),
                ),
                "h": pa.array(np.repeat(hx, B).astype(np.int64)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "url_a": pd.Series([], dtype=object),
                    "url_b": pd.Series([], dtype=object),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values("url").reset_index(drop=True)
        h = g["h"].to_numpy(np.int64).astype(np.uint64)
        d = _popcount64(h[:, None] ^ h[None, :])
        ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
        urls = g["url"].to_numpy(object)
        return pd.DataFrame(
            {
                "url_a": urls[ia],
                "url_b": urls[ib],
                "hamming": d[ia, ib].astype(np.int64),
            }
        )

    pairs = (
        hashes.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame(
            {
                "url_a": pd.Series([], dtype=object),
                "url_b": pd.Series([], dtype=object),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    pairs = pairs.drop_duplicates(["url_a", "url_b"])
    pairs["hamming"] = pairs["hamming"].astype("int64")
    return pairs.sort_values(["url_a", "url_b"]).reset_index(drop=True)


class AudioEnvHasher:
    """Warm per-worker audio fingerprint stage: real WAV decode ->
    `core.wav.envelope_hash64` (64-bit gain-invariant integer envelope
    hash).  Emits the (url, ok, ahash-hex) schema `_banded_neardup_pairs`
    consumes; broken payloads set ok=False and survive as rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.wav import decode_wav, envelope_hash64

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        ok, hx = [], []
        for i in range(len(urls)):
            try:
                h = envelope_hash64(decode_wav(payloads[i].as_py() or b""))
                ok.append(True)
                hx.append(f"{h:016x}")
            except Exception:
                ok.append(False)
                hx.append("0" * 16)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "ahash": pa.array(hx, pa.string()),
            }
        )


def m_audio_neardup(sf_dir: str):
    """Near-duplicate AUDIO pairs — the audio-side composition of the
    dedup family (text MinHash/simhash, image aHash LSH): real WAV decode
    -> 64-bit gain-invariant envelope fingerprint
    (`core.wav.envelope_hash64`) -> the SAME banded-LSH + exact
    XOR/popcount verify machinery as m_image_neardup
    (`_banded_neardup_pairs`; bands = T+1 so pigeonhole guarantees every
    pair at Hamming <= NEARDUP_T is generated).

    The fixture plants re-mastered copies (x2 gain + light noise, k%16==14
    duplicating clip k-8) whose measured hash distances span 0..T
    including exactly T; gain invariance means the plants are caught BY
    CONSTRUCTION of the fingerprint, not luck.  The oracle embeds the
    ALL-PAIRS ground truth recomputed from the fixture generator's
    round-tripped samples via the same shared hash function — decode,
    fingerprint, banding recall and verification are certified
    together."""
    from .textops import warm_stage as _ws

    hashes = _av_ds(sf_dir, "audio").map_batches(
        _ws(AudioEnvHasher), batch_format="pyarrow", batch_size=64
    )
    return _banded_neardup_pairs(hashes)


def video_hash64(frames_iter) -> str:
    """64-bit video fingerprint: element-wise int64 SUM of the sampled
    luma planes, aHashed.  Shared verbatim by the engine stage (planes
    from the real Y4M frame-offset index) and the oracle generator (the
    PRE-encode frame arrays — decoder never touched).  A pure brightness
    shift +c adds 64c to the 8x8 sample sum, so the integer mean shifts
    by exactly c and every comparison — hence the hash — is unchanged;
    noise and clipping move a few Hamming bits, which the verify
    absorbs."""
    acc = None
    for y in frames_iter:
        y64 = np.asarray(y, dtype=np.int64)
        acc = y64 if acc is None else acc + y64
    if acc is None:
        return "0" * 16
    return ahash64(acc)


class VideoHasher:
    """Warm stage: Y4M parse -> `video_hash64` over every FRAME_STRIDE-th
    luma plane (seeked through the container's frame-offset index — the
    unsampled frames' bytes are never touched).  Emits the (url, ok,
    ahash-hex) schema `_banded_neardup_pairs` consumes; broken payloads
    set ok=False and survive as rows."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.y4m import parse_y4m

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        ok, hx = [], []
        for i in range(len(urls)):
            try:
                stream = parse_y4m(payloads[i].as_py() or b"")
                hx.append(
                    video_hash64(
                        stream.luma(k)
                        for k in range(0, stream.n_frames, self.stride)
                    )
                )
                ok.append(True)
            except Exception:
                ok.append(False)
                hx.append("0" * 16)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "ahash": pa.array(hx, pa.string()),
            }
        )


def m_video_neardup(sf_dir: str):
    """Near-duplicate VIDEO pairs — completing the dedup triad (text
    shingles, image aHash, audio envelope): real Y4M container-index
    decode -> sampled-luma-sum aHash (`video_hash64`, brightness-shift
    invariant by integer-mean construction) -> the SAME banded-LSH +
    XOR/popcount verify machinery (`_banded_neardup_pairs`, pigeonhole
    recall at Hamming <= NEARDUP_T).

    The fixture plants re-graded copies (+8 brightness + light noise,
    k%16==15 duplicating video k-8); the oracle embeds ALL-PAIRS truth
    hashed from the PRE-encode frame arrays — the decoder is never
    touched on the oracle side, so a match certifies the container seek,
    fingerprint, banding recall and verification together."""
    from .textops import warm_stage as _ws

    hashes = _av_ds(sf_dir, "video").map_batches(
        _ws(VideoHasher), batch_format="pyarrow", batch_size=64
    )
    return _banded_neardup_pairs(hashes)


# ----------------------------------------------------------------------
# ViT-style patch extraction — the image-tokenization ingest stage of a
# multimodal training pipeline (Dosovitskiy et al. 2021).  Engine-added.

PATCH = 8  # patch side; full patches only (a ViT ingest resizes first)


def patch_means(pixels, p: int = PATCH) -> "np.ndarray":
    """(ny, nx) int64 grid of per-patch integer mean luma over the FULL
    p×p patches (row-major, partial edge patches dropped — ViT semantics
    assume a resize to a multiple of p upstream).  Pure integer
    arithmetic, so the decode path and the pre-encode golden path land on
    identical values (the ahash64 scheme)."""
    import numpy as np

    luma = luma_plane(pixels)
    h, w = luma.shape
    ny, nx = h // p, w // p
    if ny == 0 or nx == 0:
        return np.zeros((0, 0), np.int64)
    c = luma[: ny * p, : nx * p].reshape(ny, p, nx, p)
    return c.sum(axis=(1, 3)) // (p * p)


def patch_summary(pixels, p: int = PATCH):
    """(np_y, np_x, n_patches, mean_sum, means_md5) for one image — the
    driver-sized certificate of the patch layout; means_md5 digests the
    row-major comma-joined mean sequence."""
    import hashlib

    means = patch_means(pixels, p)
    ny, nx = means.shape
    seq = ",".join(str(int(x)) for x in means.ravel())
    return (
        ny,
        nx,
        ny * nx,
        int(means.sum()),
        hashlib.md5(seq.encode()).hexdigest(),
    )


class PatchExtractor:
    """Actor-pool stage: decode PNG → full-patch grid.  ``emit_patches``
    switches between the long format (one row per patch — what a ViT
    ingest streams onward) and the per-image summary the driver contract
    compares against pre-encode goldens.  Broken payloads emit ok=false
    with empty/zero fields (typed-error contract, row kept; long format
    drops them — no patches exist)."""

    def __init__(self, emit_patches: bool = False):
        self.emit_patches = emit_patches

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        if self.emit_patches:
            out = {"url": [], "patch_row": [], "patch_col": [], "mean_luma": []}
            for i in range(len(urls)):
                try:
                    img = decode_png(payloads[i].as_py() or b"")
                except Exception:
                    continue
                means = patch_means(img.pixels)
                ny, nx = means.shape
                if ny * nx == 0:
                    continue
                ys, xs = np.divmod(np.arange(ny * nx, dtype=np.int64), nx)
                out["url"].extend([urls[i]] * (ny * nx))
                out["patch_row"].extend(int(v) for v in ys)
                out["patch_col"].extend(int(v) for v in xs)
                out["mean_luma"].extend(int(v) for v in means.ravel())
            return pa.table(
                {
                    "url": pa.array(out["url"], pa.string()),
                    "patch_row": pa.array(out["patch_row"], pa.int64()),
                    "patch_col": pa.array(out["patch_col"], pa.int64()),
                    "mean_luma": pa.array(out["mean_luma"], pa.int64()),
                }
            )
        rows = {
            "url": [], "ok": [], "np_y": [], "np_x": [],
            "n_patches": [], "mean_sum": [], "means_md5": [],
        }
        for i in range(len(urls)):
            rows["url"].append(urls[i])
            try:
                img = decode_png(payloads[i].as_py() or b"")
                ny, nx, n, s, h = patch_summary(img.pixels)
                rows["ok"].append(True)
            except Exception:
                ny = nx = n = s = 0
                h = ""
                rows["ok"].append(False)
            rows["np_y"].append(ny)
            rows["np_x"].append(nx)
            rows["n_patches"].append(n)
            rows["mean_sum"].append(s)
            rows["means_md5"].append(h)
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "ok": pa.array(rows["ok"], pa.bool_()),
                "np_y": pa.array(rows["np_y"], pa.int64()),
                "np_x": pa.array(rows["np_x"], pa.int64()),
                "n_patches": pa.array(rows["n_patches"], pa.int64()),
                "mean_sum": pa.array(rows["mean_sum"], pa.int64()),
                "means_md5": pa.array(rows["means_md5"], pa.string()),
            }
        )


def m_patchify(sf_dir: str):
    """Per-image ViT patch-layout summary — REAL decode through the
    pure-Python PNG codec; the oracle embeds golden summaries computed
    from the PRE-encode pixel arrays (the m_image_hash scheme), so a
    match certifies decode + patch arithmetic end to end.  The long
    per-patch stream (`PatchExtractor(emit_patches=True)`) is the actual
    ingest product; at scale each image row fans out to np_y·np_x narrow
    rows inside the worker — nothing wide."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(PatchExtractor), batch_format="pyarrow", batch_size=64
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def laplacian_stats(pixels) -> tuple:
    """Variance-of-Laplacian digests — the classic blur/sharpness metric
    (pinhole: a sharp image has high second-derivative energy).  Returns
    EXACT integers (n, ΣL, ΣL²) over the interior 3x3-Laplacian
    L = 4·g − up − down − left − right of the integer luma plane, so the
    reported variance is the same (ss − s²/n)/n IEEE expression on both
    the decode path and the pre-encode golden path.  Images thinner than
    3 px have no interior: (0, 0, 0)."""
    import numpy as np

    g = luma_plane(pixels)
    h, w = g.shape
    if h < 3 or w < 3:
        return 0, 0, 0
    c = g[1:-1, 1:-1]
    lap = (
        4 * c
        - g[:-2, 1:-1]
        - g[2:, 1:-1]
        - g[1:-1, :-2]
        - g[1:-1, 2:]
    )
    n = int(lap.size)
    s = int(lap.sum())
    ss = int((lap.astype(np.int64) ** 2).sum())
    return n, s, ss


class SharpnessScorer:
    """Actor-pool stage: decode PNG -> variance-of-Laplacian digests.
    Broken payloads emit ok=false with zero digests (typed-error
    contract, row kept)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        oks, ns, ss_, sss = [], [], [], []
        for i in range(len(urls)):
            try:
                img = decode_png(payloads[i].as_py() or b"")
                n, s, ss = laplacian_stats(img.pixels)
                oks.append(True)
            except Exception:
                n, s, ss = 0, 0, 0
                oks.append(False)
            ns.append(n)
            ss_.append(s)
            sss.append(ss)
        sharp = [
            (float(ss) - float(s) * float(s) / float(n)) / float(n)
            if n > 0
            else float("nan")
            for n, s, ss in zip(ns, ss_, sss)
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "lap_n": pa.array(ns, pa.int64()),
                "lap_sum": pa.array(ss_, pa.int64()),
                "lap_sumsq": pa.array(sss, pa.int64()),
                "sharpness": pa.array(sharp, pa.float64()),
            }
        )


def m_sharpness(sf_dir: str):
    """Per-image variance-of-Laplacian sharpness — the blur-filter score a
    multimodal training pipeline thresholds on before spending encoder
    compute; REAL decode through the pure-Python PNG codec, digests exact
    ints, variance the pinned IEEE expression, oracle = golden VALUES
    from the PRE-encode pixel arrays (the m_image_hash scheme — a match
    certifies decode + Laplacian arithmetic end to end)."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(SharpnessScorer), batch_format="pyarrow", batch_size=64
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def m_image_dup_clusters(sf_dir: str):
    """Duplicate-image FAMILIES: connected components over the verified
    near-dup pair graph — the image-side t_dup_components, completing the
    multimodal dedup story from pairs to keep-one-per-family clusters.
    Output: (url, cluster, cluster_size) for every clustered image, the
    cluster id being the family's lexicographically smallest url.

    Plan: pairs come from the banded-LSH + exact-Hamming verify pipeline
    (`m_image_neardup` — pigeonhole recall guarantee); components via a
    driver union-find below `CC_DRIVER_MAX_PAIRS` (the near-dup pair
    table is dup-density-bounded, catalog-order at worst) and via
    `_cc_min_label` (large-star/small-star, O(log n) rounds) on
    md5-derived int64 node ids above it — the SAME two-regime split as
    t_dup_components, so the 100 TB path exists in code.  The oracle
    replays the ALL-PAIRS pre-encode truth graph through a recursive
    min-label reachability walk, certifying decode, hashing, banding
    recall, verification AND clustering end to end."""
    return _dup_clusters(m_image_neardup(sf_dir))


def m_audio_dup_clusters(sf_dir: str):
    """Duplicate-audio families: the same pair->CC composition over the
    gain-invariant envelope-hash near-dup graph (`m_audio_neardup`);
    oracle = the recursive walk over the audio all-pairs truth."""
    return _dup_clusters(m_audio_neardup(sf_dir))


def m_video_dup_clusters(sf_dir: str):
    """Duplicate-video families: the same pair->CC composition over the
    sampled-luma video-hash near-dup graph (`m_video_neardup`); oracle =
    the recursive walk over the video all-pairs truth."""
    return _dup_clusters(m_video_neardup(sf_dir))


def _dup_clusters(pairs):
    """Shared clustering body for the three media dup-cluster operators
    (see m_image_dup_clusters for the full plan notes)."""
    import pandas as pd

    from .textops import CC_DRIVER_MAX_PAIRS, _cc_min_label

    empty = pd.DataFrame(
        {
            "url": pd.Series([], dtype=object),
            "cluster": pd.Series([], dtype=object),
            "cluster_size": pd.Series([], dtype="int64"),
        }
    )
    if len(pairs) == 0:
        return empty

    if len(pairs) <= CC_DRIVER_MAX_PAIRS:
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
        labels = pd.DataFrame(
            {"url": list(parent), "root": [find(u) for u in parent]}
        )
    else:  # scale regime: md5-int ids through the distributed CC
        import ray.data as rd

        def md5_id(u: str) -> int:
            return int(hashlib.md5(u.encode()).hexdigest()[:15], 16)

        id_map = pd.DataFrame(
            {
                "url": pd.concat(
                    [pairs["url_a"], pairs["url_b"]], ignore_index=True
                )
            }
        ).drop_duplicates()
        id_map["nid"] = id_map["url"].map(md5_id).astype("int64")
        e = pairs.merge(
            id_map.rename(columns={"url": "url_a", "nid": "a"}), on="url_a"
        ).merge(id_map.rename(columns={"url": "url_b", "nid": "b"}), on="url_b")
        edges = rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(e["a"].to_numpy(), pa.int64()),
                    "doc_b": pa.array(e["b"].to_numpy(), pa.int64()),
                }
            )
        )
        lab = _cc_min_label(edges).to_pandas()
        labels = id_map.merge(
            lab.rename(columns={"node": "nid", "label": "comp"}), on="nid"
        )
        labels["root"] = labels.groupby("comp")["url"].transform("min")
        labels = labels[["url", "root"]]

    # canonical cluster id: the family's lexicographic minimum url
    rep = labels.groupby("root")["url"].min().rename("cluster")
    labels = labels.merge(rep, left_on="root", right_index=True)
    sizes = labels.groupby("cluster")["url"].size().rename("cluster_size")
    out = labels.merge(sizes, left_on="cluster", right_index=True)
    out = out[["url", "cluster", "cluster_size"]]
    out["cluster_size"] = out["cluster_size"].astype("int64")
    return out.sort_values(["cluster", "url"]).reset_index(drop=True)
