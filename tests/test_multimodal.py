"""Multimodal stages: real PNG decode, frame sampling, resize.

Image decode is real (pdfray.core.png); these tests pin decode-backed
features and dims, the chunk arithmetic of the (codec-less) frame sampler,
broken-payload error capture, and the media fixture's golden dims.
"""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from pdfray.core.png import decode_png, encode_png
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


def _png(w, h, seed=0, channels=3):
    rng = np.random.RandomState(seed)
    return encode_png(rng.randint(0, 256, (h, w, channels), dtype=np.uint8))


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
