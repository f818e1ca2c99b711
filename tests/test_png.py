"""Pure-Python PNG codec: round-trips, filter coverage, real files, errors."""
import struct
import zlib

import numpy as np
import pytest

from pdfray.core.png import PngError, decode_png, encode_png, resize_fit

REAL_PNGS = [
    # (path, width, height, color_type) — system files, headers verified
    ("/usr/share/gitweb/static/git-logo.png", 72, 27, 3),
    ("/usr/share/doc/python3/_static/file.png", 16, 16, 6),
    ("/usr/share/doc/python3-pip/html/topics/deps.png", 556, 376, 6),
    ("/usr/share/doc/nodejs/osx_installer_logo.png", 180, 361, 3),
]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "adaptive"])
def test_roundtrip_every_form_and_filter(channels, filter_type):
    rng = np.random.RandomState(channels * 10 + (5 if filter_type == "adaptive" else filter_type))
    px = rng.randint(0, 256, (17, 23, channels), dtype=np.uint8)
    dec = decode_png(encode_png(px, filter_type=filter_type))
    assert dec.width == 23 and dec.height == 17
    assert (dec.pixels == px).all()


def test_roundtrip_gradient_compresses_and_survives():
    g = np.linspace(0, 255, 120 * 80).reshape(80, 120).astype(np.uint8)
    px = np.dstack([g, 255 - g, g // 2])
    data = encode_png(px)
    assert len(data) < px.nbytes // 4  # filters + deflate actually compress
    assert (decode_png(data).pixels == px).all()


def test_roundtrip_palette_with_lookup():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (9, 13), dtype=np.uint8)
    dec = decode_png(encode_png(idx, palette=pal))
    assert dec.color_type == 3
    assert (dec.pixels == pal[idx]).all()


def test_encode_deterministic():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (12, 12, 3), dtype=np.uint8)
    assert encode_png(px) == encode_png(px)


def test_decode_real_system_files():
    for path, w, h, ctype in REAL_PNGS:
        img = decode_png(open(path, "rb").read())
        assert (img.width, img.height, img.color_type) == (w, h, ctype)
        assert img.pixels.shape[0] == h and img.pixels.shape[1] == w
        assert img.pixels.dtype == np.uint8


def test_decode_subbyte_depths():
    # hand-built 1-bit gray 8x2: rows 0b10110010, 0b01001101
    rows = bytes([0, 0b10110010, 0, 0b01001101])
    ihdr = struct.pack(">IIBBBBB", 8, 2, 1, 0, 0, 0, 0)
    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF
        )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.bit_depth == 1
    assert img.pixels[:, :, 0].tolist() == [
        [1, 0, 1, 1, 0, 0, 1, 0],
        [0, 1, 0, 0, 1, 1, 0, 1],
    ]


def test_decode_16bit_roundtrip_via_handbuilt():
    # 16-bit gray 3x1 with big-endian samples 0x0102 0x0304 0xFFFE
    raw = b"\x00" + bytes([1, 2, 3, 4, 0xFF, 0xFE])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 16, 0, 0, 0, 0)
    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF
        )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.pixels.dtype == np.uint16
    assert img.pixels[0, :, 0].tolist() == [0x0102, 0x0304, 0xFFFE]


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[:40], "truncated"),
        (lambda d: d[:50] + bytes([d[50] ^ 0xFF]) + d[51:], "crc"),
    ],
)
def test_decode_typed_errors(mutate, msg):
    px = np.zeros((8, 8), np.uint8)
    data = mutate(encode_png(px))
    with pytest.raises(PngError):
        decode_png(data)


def test_decode_interlace_unsupported():
    px = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_png(px))
    data[16 + 12] = 1  # interlace byte in IHDR data
    body = bytes(data[16:29])
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    fixed = bytes(data[:29]) + crc + bytes(data[33:])
    with pytest.raises(PngError, match="interlace"):
        decode_png(fixed)


def test_resize_fit_dims_and_content():
    g = np.arange(200 * 100, dtype=np.int64).reshape(100, 200) % 256
    px = g.astype(np.uint8)
    small, ow, oh = resize_fit(px, 64)
    assert (ow, oh) == (64, 32)
    assert small.shape == (32, 64)
    # nearest-neighbor: every output pixel exists in the source
    assert small[0, 0] == px[0, 0]
    # no upscale
    same, ow2, oh2 = resize_fit(px[:10, :10], 64)
    assert (ow2, oh2) == (10, 10) and (same == px[:10, :10]).all()


def test_decode_rejects_zlib_bomb_and_giant_dims():
    """A crafted IDAT cannot inflate past the header-declared raster, and
    absurd declared dimensions are rejected before any allocation."""
    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF
        )

    # declares 2x2 gray but the IDAT inflates to 1 MB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (1 << 20))
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="inflates past"):
        decode_png(data)

    giant = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 6, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", giant)
        + chunk(b"IDAT", zlib.compress(b"x")) + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="too large"):
        decode_png(data)
