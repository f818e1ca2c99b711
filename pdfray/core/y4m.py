"""Pure-Python YUV4MPEG2 (.y4m) container codec — no video libraries.

Y4M is the uncompressed interchange format the video toolchain (ffmpeg,
mjpegtools, VP9/AV1 reference encoders) uses between stages: one ASCII
stream header (`YUV4MPEG2 W.. H.. F.. C..\\n`), then `FRAME\\n` + raw
planar YUV per frame.  Because frames are fixed-size, a sampler can walk
the container touching only each frame's ~6-byte header and slice the
k-th frames directly — the same skip-ahead access pattern a codec-backed
sampler gets from a container index, which is exactly what the Ray stage
needs to stay O(sampled) per row.

Engine-side brief (no reference parity target — the reference has no video
path); behavior is pinned by fixture round-trip tests.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class Y4mError(ValueError):
    """Typed decode failure: bad magic, malformed header, or truncated
    frame — callers record it per row and keep streaming."""


# every SAMPLE_STRIDE-th frame is "kept" by the sampling stage; the fixture
# generator computes its goldens with the same constant so the oracle is a
# true round-trip check
SAMPLE_STRIDE = 3

# chroma subsampling -> (x_div, y_div); frame size = Y + 2 * (w/xd * h/yd)
_COLORSPACES = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2), "420paldv": (2, 2),
    "422": (2, 1), "444": (1, 1), "mono": (0, 0),
}


@dataclass
class Y4mStream:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    frame_size: int
    frame_offsets: list  # byte offset of each frame's PAYLOAD (post-header)
    data: bytes

    @property
    def n_frames(self) -> int:
        return len(self.frame_offsets)

    def luma(self, k: int) -> np.ndarray:
        """Y plane of frame k as (h, w) uint8 — slices the payload in place,
        touching none of the other frames."""
        off = self.frame_offsets[k]
        n = self.width * self.height
        plane = self.data[off : off + n]
        if len(plane) < n:
            raise Y4mError(f"frame {k} truncated")
        return np.frombuffer(plane, np.uint8).reshape(self.height, self.width)


def _frame_size(width: int, height: int, colorspace: str) -> int:
    xd, yd = _COLORSPACES[colorspace]
    if xd == 0:
        return width * height
    return width * height + 2 * ((width // xd) * (height // yd))


def parse_y4m(data: bytes) -> Y4mStream:
    """Parse header + index frame offsets WITHOUT touching frame payloads.

    Frame headers may carry per-frame parameters (`FRAME Ixyz\\n`), so the
    walk reads each header line then jumps frame_size bytes — O(n_frames)
    header peeks, zero payload reads."""
    if not data.startswith(b"YUV4MPEG2"):
        raise Y4mError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise Y4mError("unterminated stream header")
    width = height = 0
    fps_num, fps_den = 30, 1
    colorspace = "420jpeg"  # spec default when C is absent
    for param in data[9:nl].split(b" "):
        if not param:
            continue
        tag, val = param[:1], param[1:]
        try:
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"F":
                fps_num, fps_den = (int(x) for x in val.split(b":"))
            elif tag == b"C":
                colorspace = val.decode("ascii")
        except (ValueError, UnicodeDecodeError) as ex:
            raise Y4mError(f"malformed header parameter {param!r}") from ex
    if width <= 0 or height <= 0:
        raise Y4mError("missing/invalid W or H in stream header")
    if colorspace not in _COLORSPACES:
        raise Y4mError(f"unsupported colorspace C{colorspace}")
    if colorspace != "mono" and (width % 2 or height % 2):
        xd, yd = _COLORSPACES[colorspace]
        if (width % xd) or (height % yd):
            raise Y4mError("odd dimensions for subsampled colorspace")
    fsize = _frame_size(width, height, colorspace)
    offsets = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise Y4mError(f"bad frame marker at offset {pos}")
        fnl = data.find(b"\n", pos + 5)
        if fnl < 0:
            raise Y4mError("unterminated frame header")
        payload = fnl + 1
        if payload + fsize > len(data):
            raise Y4mError(f"frame {len(offsets)} truncated")
        offsets.append(payload)
        pos = payload + fsize
    return Y4mStream(
        width, height, fps_num, fps_den, colorspace, fsize, offsets, data
    )


def encode_y4m(
    frames, colorspace: str = "420jpeg", fps=(30, 1), chroma: int = 128
) -> bytes:
    """Fixture writer: luma planes (h, w) uint8 per frame; chroma planes are
    flat ``chroma`` (grayscale content keeps goldens simple and exact)."""
    frames = list(frames)
    if not frames:
        raise Y4mError("need at least one frame")
    h, w = frames[0].shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    chroma_len = _frame_size(w, h, colorspace) - w * h
    cpad = bytes([chroma]) * chroma_len
    parts = [header.encode("ascii")]
    for f in frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise Y4mError("all frames must be uint8 with identical dims")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(f).tobytes())
        parts.append(cpad)
    return b"".join(parts)


def sample_stats(stream: Y4mStream, stride: int) -> dict:
    """Deterministic sampled-frame features shared by the fixture generator
    and the decode stage: every stride-th frame's Y plane is sliced (others
    never touched) and reduced to an integer-exact luma sum."""
    sampled = range(0, stream.n_frames, stride)
    luma_sum = 0
    for k in sampled:
        luma_sum += int(stream.luma(k).astype(np.int64).sum())
    return {
        "width": stream.width,
        "height": stream.height,
        "n_frames": stream.n_frames,
        "n_sampled": len(sampled),
        "luma_sum": luma_sum,
    }

SCENE_THRESH = 64  # a cut = consecutive-frame mean |luma diff| > 64


def scene_stats(stream: Y4mStream, thresh: int = SCENE_THRESH) -> dict:
    """Shot-boundary detection (the scene-cut shape) shared by the fixture
    generator and the decode stage: for every consecutive frame pair the
    absolute luma difference is integer-summed, and a pair is a CUT when
    its mean |diff| exceeds ``thresh``, compared by cross-multiplication
    (diff_sum > n_pixels * thresh) — no floats anywhere, platform-exact.
    diff_total (the summed |diff| across all pairs) rides along as the
    motion-volume feature.  The fixtures plant scene changes whose offset
    re-colors ~the whole frame (mean |diff| well above the threshold)
    while in-scene motion (the moving box + the refreshed noise band)
    stays well below it."""
    nf = stream.n_frames
    if nf < 2:
        return {"n_pairs": 0, "n_cuts": 0, "diff_total": 0}
    n_cuts = 0
    diff_total = 0
    prev = stream.luma(0).astype(np.int64)
    n_pix = prev.size
    for k in range(1, nf):
        cur = stream.luma(k).astype(np.int64)
        d = int(np.abs(cur - prev).sum())
        diff_total += d
        if d > n_pix * thresh:
            n_cuts += 1
        prev = cur
    return {"n_pairs": nf - 1, "n_cuts": n_cuts, "diff_total": diff_total}
