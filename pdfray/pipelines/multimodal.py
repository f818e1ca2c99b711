"""Multimodal binary-column stages: real PNG decode through actor pools.

Image payloads are opaque ``binary`` columns with typed metadata; decode /
featurize / resize run as actor-pool ``map_batches`` stages over small
batches (payloads are large).  Image decode is REAL — the pure-Python PNG
codec in `pdfray.core.png` (zlib inflate + numpy unfilter) — so widths,
heights, and resize outputs are exact and DuckDB-oracle-checkable against
the media fixture's golden columns.  Broken payloads land in the ``error``
column with 0-dims; the stage never raises.

Video/audio codecs remain genuinely absent in this container: FrameSampler
keeps the container-chunk access pattern (fixed-size chunk sampling +
per-frame hashing) with the real-codec seek clearly documented as the
substitution point.
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


FRAME_BYTES = 4096
FRAME_STRIDE = 8

RESIZE_MAX = 64


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th fixed-size chunk of the
    payload as a "frame".  Video container/codec parsing is the one decode
    this container cannot do (no codec libs); a real implementation replaces
    the chunk arithmetic with keyframe seeks via the container index.  The
    access pattern, per-frame hashing, small batches, and bounded per-row
    output are the real Ray-side contract either way."""

    def __init__(self, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {"url": [], "n_chunks": [], "n_frames": [], "frames_hash": []}
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            n_chunks = -(-len(payload) // self.frame_bytes) if payload else 0
            n_frames = -(-n_chunks // self.stride) if n_chunks else 0
            h = hashlib.sha1()
            for k in range(n_frames):
                off = k * self.stride * self.frame_bytes
                h.update(payload[off : off + self.frame_bytes])
            out["url"].append(url)
            out["n_chunks"].append(n_chunks)
            out["n_frames"].append(n_frames)
            out["frames_hash"].append(h.hexdigest()[:16] if n_frames else None)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "n_chunks": pa.array(out["n_chunks"], pa.int64()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "frames_hash": pa.array(out["frames_hash"], pa.string()),
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


def _media_ds(sf_dir: str):
    import ray.data as rd

    from ..sources.fixtures import ensure_media_parquet

    path = ensure_media_parquet(sf_dir)
    return rd.read_parquet(path, columns=["url", "payload"])


def m_frame_sample(sf_dir: str):
    """Frame sampling over media binaries; chunk/frame counts are
    SQL-derivable so the oracle checks the plumbing exactly; per-frame
    hashes are covered by unit tests."""
    out = _media_ds(sf_dir).map_batches(
        warm_stage(FrameSampler), batch_format="pyarrow", batch_size=64
    )
    df = out.select_columns(["url", "n_chunks", "n_frames"]).to_pandas()
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
