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
