"""Multimodal binary-column plumbing: opaque payloads through actor pools.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata.
The decode/feature-extract kernels are STUBBED (no imaging/audio libs in this
container — clearly marked below); the Ray-side plumbing is real and tested:
schema handling, zero-copy binary batches, small ``batch_size`` for large
payloads, actor-pool signature, deterministic output layout.
"""
from __future__ import annotations

import hashlib

import pyarrow as pa

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


def _decode_image_stub(payload: bytes):
    """STUB decode: the real implementation would use an imaging library
    (unavailable in this container).  Returns deterministic fake dimensions
    and an 8-float feature derived from the content hash so the pipeline
    plumbing (schema, batching, ordering) is fully exercised and testable."""
    digest = hashlib.sha1(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize opaque binary payloads.

    Use small ``batch_size`` (payloads are large) and ``concurrency=(min,max)``
    actor pools; a real deployment loads the decoder/model once here."""

    def __init__(self, media_type: str = "image", strict: bool = False):
        self.media_type = media_type
        self.strict = strict
        # real code: self.decoder = load_decoder(media_type)  # once per actor

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
                if self.strict:
                    raise NotImplementedError(
                        "media decode requires an imaging library not present "
                        "in this environment"
                    )
                w, h, feat = _decode_image_stub(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
                out["error"].append(None)
            except Exception as ex:
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
    payload as a "frame".  Video decode is STUBBED (no codec libs in this
    container) — a real implementation seeks keyframes via the container
    index; the chunk arithmetic and per-frame hashing mirror that access
    pattern, so the Ray-side plumbing (small batches, bounded per-row
    output, deterministic layout) is fully exercised."""

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
    """Actor-pool stage: aspect-preserving fit into RESIZE_MAX x RESIZE_MAX.

    The pixel work is STUBBED (dimensions come from the stub decoder); the
    arithmetic, schema, and batch layout are the real contract a decoder
    actor would fill in."""

    def __init__(self, max_side: int = RESIZE_MAX):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload")
        out = {"url": [], "width": [], "height": [], "out_w": [], "out_h": []}
        for i, url in enumerate(urls):
            payload = payloads[i].as_py() or b""
            w, h, _ = _decode_image_stub(payload)
            scale = min(1.0, self.max_side / max(w, h))
            out["url"].append(url)
            out["width"].append(w)
            out["height"].append(h)
            out["out_w"].append(max(1, int(w * scale)))
            out["out_h"].append(max(1, int(h * scale)))
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "out_w": pa.array(out["out_w"], pa.int32()),
                "out_h": pa.array(out["out_h"], pa.int32()),
            }
        )


def _payload_ds(sf_dir: str):
    import ray.data as rd

    from ..sources.fixtures import ensure_corpus_parquet

    path = ensure_corpus_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["url", "html"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"), "payload": t.column("html")})

    return ds.map_batches(rename, batch_format="pyarrow")


def m_frame_sample(sf_dir: str):
    """Frame sampling over corpus binaries; chunk/frame counts are
    SQL-derivable so the oracle checks the plumbing exactly; per-frame
    hashes are covered by unit tests."""
    out = _payload_ds(sf_dir).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )
    df = out.select_columns(["url", "n_chunks", "n_frames"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def m_resize(sf_dir: str):
    """Resize-stage plumbing (stub dims; rows-only — dims derive from the
    stub decoder's content hash, not SQL-expressible)."""
    out = _payload_ds(sf_dir).map_batches(
        Resizer, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def m_media_features(sf_dir: str):
    """Run the (stub-decoded) media pipeline over the PDF corpus binaries —
    payload column plumbing is identical for image/audio bytes."""
    import ray.data as rd

    from ..sources.fixtures import ensure_corpus_parquet

    path = ensure_corpus_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["url", "html"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"), "payload": t.column("html")})

    out = ds.map_batches(rename, batch_format="pyarrow").map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=16,  # large binary payloads -> small batches
        concurrency=(1, 4),
    )
    # project BEFORE collecting: the driver pulls only the three small
    # SQL-derivable columns, never the feature vectors (at scale the full
    # table is write_parquet'd instead).  Hash/feature/stub dimensions are
    # covered by unit tests (duckdb cannot hash blobs).
    df = out.select_columns(["url", "media_type", "n_bytes"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)
