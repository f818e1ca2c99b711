"""Pure-Python PNG codec: zlib inflate + numpy scanline unfilter.

Engine-added multimodal decode kernel (no imaging libraries exist in the
deployment container, and the reference has no raster-image analogue — this
implements the public W3C PNG spec / RFC 2083 directly).  Decode supports
the baseline matrix: bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline filters, non-
interlaced only (Adam7 raises a typed error).  The encoder exists for
deterministic fixture generation and round-trip tests: vectorized filtering
(encode-side filters have no recurrence), fixed zlib level, byte-stable
output.

Filter inversion is where the cost is: Sub is a per-lane cumsum and Up a
row add (both one numpy op per row); Average and Paeth carry a left-to-
right recurrence, so they walk pixel units with small numpy ops across the
unit's byte lanes — still bounded by image width, never by a per-BIT loop.
"""
from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}


class PngError(ValueError):
    """Typed decode failure: corrupt structure, bad CRC, unsupported form."""


@dataclass
class PngImage:
    width: int
    height: int
    bit_depth: int
    color_type: int
    pixels: np.ndarray  # (h, w, channels); uint8, or uint16 for 16-bit depth

    @property
    def channels(self) -> int:
        return self.pixels.shape[2]


def _iter_chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngError("bad signature")
    off = 8
    while True:
        header = data[off : off + 8]
        if len(header) < 8:
            raise PngError("truncated: missing IEND")
        (length,) = struct.unpack(">I", header[:4])
        ctype = header[4:8]
        payload = data[off + 8 : off + 8 + length]
        crc_raw = data[off + 8 + length : off + 12 + length]
        if len(payload) != length or len(crc_raw) != 4:
            raise PngError(f"truncated chunk {ctype!r}")
        (crc,) = struct.unpack(">I", crc_raw)
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise PngError(f"bad crc in {ctype!r}")
        yield ctype, payload
        off += 12 + length
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, height: int, rowbytes: int, fu: int) -> np.ndarray:
    """Invert the per-scanline filters; returns (height, rowbytes) uint8."""
    if len(raw) != height * (rowbytes + 1):
        raise PngError(
            f"decompressed length {len(raw)} != {height}*({rowbytes}+1)"
        )
    arr = np.frombuffer(raw, np.uint8).reshape(height, rowbytes + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int64)
    out = np.empty((height, rowbytes), np.int64)
    prev = np.zeros(rowbytes, np.int64)
    n_units = rowbytes // fu
    for y in range(height):
        f = int(ftypes[y])
        row = rows[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per-lane cumsum inverts the recurrence exactly
            cur = (row.reshape(n_units, fu).cumsum(axis=0) & 0xFF).reshape(-1)
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 3:  # Average: left recurrence -> walk units, vector lanes
            cur = np.empty(rowbytes, np.int64)
            left = np.zeros(fu, np.int64)
            for u in range(n_units):
                s = u * fu
                left = (row[s : s + fu] + ((left + prev[s : s + fu]) >> 1)) & 0xFF
                cur[s : s + fu] = left
        elif f == 4:  # Paeth
            cur = np.empty(rowbytes, np.int64)
            left = np.zeros(fu, np.int64)
            ul = np.zeros(fu, np.int64)
            for u in range(n_units):
                s = u * fu
                up = prev[s : s + fu]
                p = left + up - ul
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (row[s : s + fu] + pred) & 0xFF
                cur[s : s + fu] = left
                ul = up
        else:
            raise PngError(f"unknown filter type {f} on scanline {y}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def _unpack_bits(flat: np.ndarray, height: int, width: int, depth: int) -> np.ndarray:
    """(height, rowbytes) packed sub-byte samples -> (height, width) values."""
    bits = np.unpackbits(flat, axis=1)  # MSB first, per spec
    samples = bits[:, : width * depth].reshape(height, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (samples * weights).sum(axis=2).astype(np.uint8)


def decode_png(data: bytes) -> PngImage:
    """Decode a PNG byte string into a PngImage (pixels as numpy array).

    Palette images are resolved through PLTE (+tRNS alpha when present) to
    RGB/RGBA.  Raises PngError on corrupt or unsupported input.
    """
    ihdr = None
    plte = None
    trns = None
    idat = []
    for ctype, payload in _iter_chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat.append(payload)
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing or malformed IHDR")
    width, height, depth, ctype_n, comp, fmethod, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width == 0 or height == 0:
        raise PngError("zero dimension")
    if comp != 0 or fmethod != 0:
        raise PngError("unknown compression/filter method")
    if interlace == 1:
        raise PngError("Adam7 interlace not supported")
    if interlace != 0:
        raise PngError(f"unknown interlace method {interlace}")
    if ctype_n not in _CHANNELS:
        raise PngError(f"unknown color type {ctype_n}")
    if depth not in _VALID_DEPTHS[ctype_n]:
        raise PngError(f"invalid bit depth {depth} for color type {ctype_n}")
    if not idat:
        raise PngError("no IDAT data")
    channels = _CHANNELS[ctype_n]
    bits_pp = depth * channels
    rowbytes = (width * bits_pp + 7) // 8
    fu = max(1, bits_pp // 8)
    expected = height * (rowbytes + 1)
    if expected > 1 << 31:
        raise PngError(f"image too large: {width}x{height}x{channels}")
    try:
        # cap inflation at the header-derived size: a crafted IDAT cannot
        # expand past the declared raster (+1 byte to detect overrun)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as ex:
        raise PngError(f"IDAT inflate failed: {ex}") from None
    if len(raw) > expected:
        raise PngError("IDAT inflates past the declared raster size")
    flat = _unfilter(raw, height, rowbytes, fu)

    if depth == 16:
        # big-endian 16-bit samples
        px = flat.reshape(height, width * channels, 2).astype(np.uint16)
        pixels = ((px[:, :, 0] << 8) | px[:, :, 1]).reshape(height, width, channels)
    elif depth == 8:
        pixels = flat.reshape(height, width, channels)
    else:  # 1/2/4-bit gray or palette indices, one channel
        pixels = _unpack_bits(flat, height, width, depth)[:, :, None]

    if ctype_n == 3:
        if plte is None or len(plte) % 3:
            raise PngError("palette image without valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = pixels[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise PngError("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            pixels = np.dstack([rgb, alpha[idx]])
        else:
            pixels = rgb
    return PngImage(width, height, depth, ctype_n, np.ascontiguousarray(pixels))


# ----------------------------------------------------------------------
# encoder (fixtures / round-trip tests) — encode-side filters have no
# recurrence, so every filter is one vectorized expression per row

def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _filter_row(raw: np.ndarray, prev: np.ndarray, fu: int, ftype: int) -> np.ndarray:
    left = np.zeros_like(raw)
    left[fu:] = raw[:-fu]
    if ftype == 0:
        return raw.copy()
    if ftype == 1:
        return (raw - left) & 0xFF
    if ftype == 2:
        return (raw - prev) & 0xFF
    if ftype == 3:
        return (raw - ((left + prev) >> 1)) & 0xFF
    if ftype == 4:
        ul = np.zeros_like(prev)
        ul[fu:] = prev[:-fu]
        p = left + prev - ul
        pa = np.abs(p - left)
        pb = np.abs(p - prev)
        pc = np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
        return (raw - pred) & 0xFF
    raise ValueError(f"unknown filter type {ftype}")


def encode_png(
    pixels: np.ndarray,
    *,
    palette: np.ndarray = None,
    filter_type="adaptive",
    level: int = 9,
) -> bytes:
    """Encode a uint8 pixel array as a non-interlaced 8-bit PNG.

    Shapes: (h, w) or (h, w, 1) gray; (h, w, 2) gray+alpha; (h, w, 3) RGB;
    (h, w, 4) RGBA.  With ``palette`` (n<=256 x 3 uint8), pixels are indices
    (h, w) and a PLTE chunk is written.  ``filter_type``: 0-4 fixed, or
    "adaptive" (per-row minimum-sum-of-abs heuristic, deterministic).
    Output is byte-stable for identical inputs (fixed zlib level/strategy).
    """
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    if palette is not None:
        if channels != 1:
            raise ValueError("palette encoding needs index pixels (h, w)")
        ctype = 3
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    fu = channels
    flat = px.reshape(h, w * channels).astype(np.int64)
    prev = np.zeros(w * channels, np.int64)
    lines = []
    for y in range(h):
        raw = flat[y]
        if filter_type == "adaptive":
            best = None
            best_f = 0
            for f in range(5):
                cand = _filter_row(raw, prev, fu, f)
                score = int(np.minimum(cand, 256 - cand).sum())  # signed-abs heuristic
                if best is None or score < best[0]:
                    best = (score, cand)
                    best_f = f
            filt = best[1]
            fsel = best_f
        else:
            fsel = int(filter_type)
            filt = _filter_row(raw, prev, fu, fsel)
        lines.append(bytes([fsel]) + filt.astype(np.uint8).tobytes())
        prev = raw
    body = zlib.compress(b"".join(lines), level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes()))
    out.append(_chunk(b"IDAT", body))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def resize_fit(pixels: np.ndarray, max_side: int):
    """Deterministic nearest-neighbor fit into max_side x max_side
    (aspect-preserving, never upscales).  Returns (resized, out_w, out_h)."""
    h, w = pixels.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    out_w = max(1, int(w * scale))
    out_h = max(1, int(h * scale))
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return pixels[yi][:, xi], out_w, out_h
