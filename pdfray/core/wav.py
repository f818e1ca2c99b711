"""Pure-Python WAV (RIFF/PCM) codec — no audio libraries.

Like `pdfray.core.png`, this exists so the multimodal audio stages decode
REAL container bytes instead of chunk arithmetic: a RIFF chunk walk
(`fmt ` + `data`), PCM sample recovery via numpy frombuffer, and an encoder
used only by the deterministic fixtures.  Scope is the dominant archival
form — integer PCM (format tag 1), 8/16/32-bit — anything else raises the
typed `WavError` that the actor stage records per row.

The engine-side brief (not the reference) asks for multimodal decode /
feature-extract stages; the reference has no audio path, so there is no
file:line parity target — behavior is pinned by the fixture round-trip
tests instead.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class WavError(ValueError):
    """Typed decode failure: malformed RIFF structure or unsupported PCM
    envelope — callers record it per row and keep streaming."""


_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


@dataclass
class WavAudio:
    sample_rate: int
    samples: np.ndarray  # shape (n_samples, n_channels), native int dtype

    @property
    def n_channels(self) -> int:
        return int(self.samples.shape[1])

    @property
    def n_samples(self) -> int:
        return int(self.samples.shape[0])


def decode_wav(data: bytes) -> WavAudio:
    """Parse a RIFF/WAVE byte payload into samples.

    Chunk walk (not fixed offsets): real encoders interleave LIST/fact/cue
    chunks before `data`, and chunk sizes are padded to even lengths.  The
    first `fmt ` chunk wins; decoding requires it before `data` (streamed
    writers always satisfy this)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if cid == b"fmt ":
            if size < 16 or body_start + 16 > len(data):
                raise WavError("fmt chunk truncated")
            tag, n_ch, rate, _byte_rate, block_align, bits = struct.unpack_from(
                "<HHIIHH", data, body_start
            )
            if tag != 1:
                raise WavError(f"unsupported format tag {tag} (PCM only)")
            if bits not in _DTYPES:
                raise WavError(f"unsupported bit depth {bits}")
            if n_ch < 1 or rate < 1:
                raise WavError("invalid channel count or sample rate")
            if block_align != n_ch * (bits // 8):
                raise WavError("block align inconsistent with channels/bits")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise WavError("data chunk before fmt chunk")
            n_ch, rate, bits = fmt
            body = data[body_start : body_start + size]
            if len(body) < size:
                raise WavError("data chunk truncated")
            frame_bytes = n_ch * (bits // 8)
            n_frames = len(body) // frame_bytes
            raw = np.frombuffer(body[: n_frames * frame_bytes], _DTYPES[bits])
            return WavAudio(rate, raw.reshape(n_frames, n_ch))
        pos = body_start + size + (size & 1)  # chunks are even-padded
    raise WavError("missing fmt /data chunk" if fmt else "no fmt chunk found")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical-layout writer for fixtures: RIFF(WAVE(fmt ,data)).

    ``samples`` is (n, channels) or (n,) in uint8/int16/int32."""
    if samples.ndim == 1:
        samples = samples[:, None]
    bits = samples.dtype.itemsize * 8
    if bits not in _DTYPES or samples.dtype.kind not in "iu":
        raise WavError(f"unsupported sample dtype {samples.dtype}")
    n_ch = samples.shape[1]
    body = np.ascontiguousarray(samples.astype(_DTYPES[bits], copy=False)).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * (bits // 8),
        n_ch * (bits // 8), bits,
    )
    chunks = b"".join(
        (
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(body)), body,
            b"\x00" if len(body) & 1 else b"",
        )
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_stats(audio: WavAudio) -> dict:
    """Deterministic per-file features used by both the fixture generator
    (pre-encode) and the decode stage (post-decode), so equality is a true
    codec round-trip check: duration, sum-of-squares-derived RMS, and peak
    amplitude.  The square sum runs integer-exact in int64 whenever
    ``n * peak**2`` provably fits; full-scale int32 corpora fall back to
    float64 (fuzz found the int64 overflow: NaN out of sqrt of a wrapped
    negative sum).  Both sides of the round-trip share this function, so
    the fallback stays a deterministic comparison."""
    s = audio.samples.astype(np.int64)
    if audio.samples.dtype == np.uint8:  # 8-bit WAV is unsigned, center it
        s = s - 128
    n = s.size
    peak = int(np.abs(s).max()) if n else 0
    if n:
        if n * peak * peak < 2**62:
            sq_sum = int((s * s).sum())
        else:
            sq_sum = float(np.square(s.astype(np.float64)).sum())
        rms = float(np.sqrt(sq_sum / n))
    else:
        rms = 0.0
    return {
        "sample_rate": audio.sample_rate,
        "n_channels": audio.n_channels,
        "n_samples": audio.n_samples,
        "duration_ms": audio.n_samples * 1000 // audio.sample_rate,
        "rms_x1e3": int(round(rms * 1000)),
        "peak": peak,
    }


def spectral_stats(audio: WavAudio) -> dict:
    """Dominant-frequency features from ONE rfft over the mono mix — the
    spectral counterpart of `audio_stats`, shared by the fixture
    generator and the decode stage so equality stays a codec round-trip
    check.  Channel mixing and DC centering are integer ops; the FFT is
    float64 but only the ARGMAX bin is emitted plus the exact integer
    bin→mHz conversion, so the goldens are stable (the fixtures'
    sawtooth carriers concentrate energy far above the noise floor; an
    exact magnitude tie takes the lowest bin via np.argmax, and DC is
    excluded).  dom_hz_x1e3 = bin · rate · 1000 // n — pure int."""
    s = audio.samples.astype(np.int64)
    if audio.samples.dtype == np.uint8:  # 8-bit WAV is unsigned, center it
        s = s - 128
    mono = s.sum(axis=1)
    n = int(mono.size)
    if n < 2:
        return {"dom_bin": 0, "dom_hz_x1e3": 0, "n_bins": 0}
    mag = np.abs(np.fft.rfft(mono.astype(np.float64)))
    mag[0] = 0.0  # DC carries no pitch
    b = int(np.argmax(mag))
    return {
        "dom_bin": b,
        "dom_hz_x1e3": b * audio.sample_rate * 1000 // n,
        "n_bins": int(mag.size),
    }

SEG_WINDOW = 256          # samples per energy window
SEG_NUM, SEG_DEN = 1, 1024  # activity threshold: mean|s| > full_scale/1024


def segment_stats(audio: WavAudio, window: int = SEG_WINDOW,
                  num: int = SEG_NUM, den: int = SEG_DEN) -> dict:
    """Silence segmentation (the VAD shape) shared by the fixture generator
    and the decode stage, so equality stays a codec round-trip check.  The
    mono |amplitude| stream is summed per fixed window and a window is
    ACTIVE when its mean |s| exceeds full_scale*num/den, compared by
    integer cross-multiplication (sum_abs * den > n_in_window * n_ch *
    full_scale * num) — no division, platform-exact.  The last partial
    window is judged on its own length.  Segments are maximal runs of
    active windows; all outputs are small ints.

    full_scale is the dtype's own ceiling (128 / 32768 / 2^31 after uint8
    centering): the threshold is relative, so 8-bit and 32-bit encodings
    of the same program segment identically."""
    s = audio.samples.astype(np.int64)
    if audio.samples.dtype == np.uint8:
        s = s - 128
        full_scale = 128
    elif audio.samples.dtype == np.int16:
        full_scale = 32768
    else:
        full_scale = 2**31
    n, n_ch = (int(s.shape[0]), int(s.shape[1])) if s.ndim == 2 else (int(s.size), 1)
    if n == 0:
        return {"n_windows": 0, "n_active_windows": 0, "n_segments": 0,
                "longest_run": 0}
    abs_row = np.abs(s).sum(axis=1) if s.ndim == 2 else np.abs(s)
    n_win = (n + window - 1) // window
    pad = n_win * window - n
    padded = np.concatenate([abs_row, np.zeros(pad, np.int64)])
    win_sums = padded.reshape(n_win, window).sum(axis=1)
    win_len = np.full(n_win, window, np.int64)
    if pad:
        win_len[-1] = window - pad
    active = win_sums * den > win_len * n_ch * full_scale * num
    n_active = int(active.sum())
    # run-length: segment starts are active windows not preceded by one
    starts = int(active[0]) + int((active[1:] & ~active[:-1]).sum())
    longest = 0
    if n_active:
        # lengths of runs via cumulative reset trick (vectorized)
        idx = np.flatnonzero(np.diff(np.concatenate(([0], active.view(np.int8), [0]))))
        longest = int((idx[1::2] - idx[::2]).max())
    return {
        "n_windows": n_win,
        "n_active_windows": n_active,
        "n_segments": starts,
        "longest_run": longest,
    }


ENVELOPE_SLICES = 64  # one fingerprint bit per time slice


def envelope_hash64(audio: WavAudio) -> int:
    """64-bit envelope fingerprint for audio near-dup detection, shared
    verbatim by the engine stage and the oracle generator (the
    `audio_stats` round-trip discipline).

    The clip is centered (8-bit WAV is unsigned), mixed down per frame
    (channel sum), truncated to a multiple of 64 frames, and each of the
    64 equal time slices contributes one bit: slice sum-of-|mix| STRICTLY
    above the lower-median slice energy.  Bit i = slice i, LSB first.

    Integer-only (platform-exact) and GAIN-INVARIANT: scaling every
    sample by a constant scales all slice energies and their median
    together, so every comparison — hence the hash — is unchanged.  That
    is the invariance audio dedup needs (re-mastered / re-encoded copies
    at different levels); light additive noise flips at most a few bits,
    which the Hamming verify absorbs."""
    s = audio.samples.astype(np.int64)
    if audio.samples.dtype == np.uint8:
        s = s - 128
    mix = np.abs(s.sum(axis=1))
    n = (len(mix) // ENVELOPE_SLICES) * ENVELOPE_SLICES
    if n == 0:
        return 0
    e = mix[:n].reshape(ENVELOPE_SLICES, -1).sum(axis=1)
    m = int(np.sort(e)[ENVELOPE_SLICES // 2 - 1])  # lower median: integer
    h = 0
    for i, v in enumerate(e.tolist()):
        if v > m:
            h |= 1 << i
    return h
