"""Multimodal binary plumbing: stub decode, frame sampling, resize.

The decode kernels are stubs (no imaging/codec libs in the container); these
tests pin the REAL parts — schema, batch handling, chunk arithmetic,
deterministic outputs, and the strict-mode NotImplementedError gate.
"""
import hashlib

import pyarrow as pa
import pytest

from pdfray.pipelines.multimodal import (
    FRAME_BYTES,
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


def test_frame_sampler_chunk_arithmetic():
    s = FrameSampler()
    sizes = [0, 1, FRAME_BYTES, FRAME_BYTES + 1, FRAME_BYTES * FRAME_STRIDE,
             FRAME_BYTES * FRAME_STRIDE * 3 + 5]
    out = s(_batch([b"x" * n for n in sizes]))
    chunks = out["n_chunks"].to_pylist()
    frames = out["n_frames"].to_pylist()
    assert chunks == [-(-n // FRAME_BYTES) if n else 0 for n in sizes]
    assert frames == [-(-c // FRAME_STRIDE) if c else 0 for c in chunks]
    # empty payload -> no hash; others deterministic
    hashes = out["frames_hash"].to_pylist()
    assert hashes[0] is None and all(h is not None for h in hashes[1:])
    again = s(_batch([b"x" * n for n in sizes]))
    assert again["frames_hash"].to_pylist() == hashes


def test_frame_sampler_hash_covers_sampled_frames_only():
    s = FrameSampler()
    base = bytes(range(256)) * (FRAME_BYTES * FRAME_STRIDE * 2 // 256)
    # mutating an UNSAMPLED chunk must not change the hash
    mutated = bytearray(base)
    mutated[FRAME_BYTES * 2] ^= 0xFF  # chunk 2 is not a multiple of stride
    a = s(_batch([base]))["frames_hash"][0].as_py()
    b = s(_batch([bytes(mutated)]))["frames_hash"][0].as_py()
    assert a == b
    # mutating a SAMPLED chunk must change it
    mutated2 = bytearray(base)
    mutated2[0] ^= 0xFF
    c = s(_batch([bytes(mutated2)]))["frames_hash"][0].as_py()
    assert a != c


def test_resizer_aspect_fit():
    r = Resizer(max_side=64)
    out = r(_batch([b"payload-a", b"payload-b", b""]))
    for w, h, ow, oh in zip(
        out["width"].to_pylist(),
        out["height"].to_pylist(),
        out["out_w"].to_pylist(),
        out["out_h"].to_pylist(),
    ):
        assert 1 <= ow <= 64 and 1 <= oh <= 64
        assert max(ow, oh) == 64 or (w <= 64 and h <= 64)
        # aspect preserved within integer truncation
        assert abs(ow / oh - w / h) < 0.1


def test_media_features_strict_mode_gates_missing_decoder():
    strict = MediaFeatureExtractor(strict=True)
    out = strict(_batch([b"img-bytes"]))
    assert out["error"][0].as_py().startswith("NotImplementedError")
    relaxed = MediaFeatureExtractor()
    out2 = relaxed(_batch([b"img-bytes"]))
    assert out2["error"][0].as_py() is None
    assert out2["content_hash"][0].as_py() == hashlib.sha1(b"img-bytes").hexdigest()
    assert len(out2["feature"][0].as_py()) == 8
