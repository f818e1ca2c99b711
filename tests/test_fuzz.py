"""Property-based robustness: the extractor records, never raises.

At crawl scale every malformed byte pattern eventually arrives; the per-row
contract is the reference's catch-and-record discipline — a document-level
``error`` string, never an exception out of the UDF.
"""
import random
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdfray.core.extract import extract_document
from pdfray.sources import fixtures

FUZZ_SETTINGS = dict(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(data=st.binary(min_size=0, max_size=4096))
@settings(**FUZZ_SETTINGS)
def test_arbitrary_bytes_never_raise(data):
    result = extract_document(data)
    assert result.text is not None  # may be "", but never raises


@given(
    data=st.binary(min_size=0, max_size=2048),
    version=st.sampled_from([b"%PDF-1.4\n", b"%PDF-1.7\n"]),
)
@settings(**FUZZ_SETTINGS)
def test_pdf_prefixed_garbage_never_raises(data, version):
    result = extract_document(version + data)
    assert result.text is not None


@given(seed=st.integers(0, 2**32 - 1), n_mutations=st.integers(1, 24))
@settings(**FUZZ_SETTINGS)
def test_mutated_valid_documents_never_raise(seed, n_mutations):
    """Bit/byte mutations of valid documents: the hardest corruption class —
    structure that is almost right (bad offsets, clipped keywords, flipped
    lengths)."""
    rng = random.Random(seed)
    name, builder = fixtures.doc_class(seed % 100)
    data = builder(random.Random(seed), fixtures.LANGS[seed % 4])[0]
    mutated = bytearray(data)
    for _ in range(n_mutations):
        kind = rng.randrange(3)
        pos = rng.randrange(len(mutated))
        if kind == 0:
            mutated[pos] = rng.randrange(256)
        elif kind == 1:
            del mutated[pos]
        else:
            mutated.insert(pos, rng.randrange(256))
    result = extract_document(bytes(mutated), working_buffer_size=10_000_000)
    assert result.text is not None


@given(payload=st.binary(min_size=0, max_size=512))
@settings(**FUZZ_SETTINGS)
def test_random_content_streams_never_raise(payload):
    """Arbitrary bytes as a page content stream: the interpreter must record
    per-content errors, not raise."""
    from pdfray.sources.pdfwriter import PdfBuilder

    b = PdfBuilder()
    cid = b.add_stream(payload)
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    result = extract_document(b.finish_classic(cat))
    assert result.text is not None


@given(payload=st.binary(min_size=1, max_size=300))
@settings(**FUZZ_SETTINGS)
def test_flate_roundtrip_and_corrupt_flate(payload):
    from pdfray.core.lexer import PdfLexer
    from pdfray.core.model import PdfStreamError

    compressed = zlib.compress(payload)
    head = f"<</Length {len(compressed)}/Filter/FlateDecode>>stream\n".encode()
    lx = PdfLexer(head + compressed + b"\nendstream\nQ ")
    d = lx.get_next_token()
    lx.fill_stream_from_dict(d)
    assert bytes(lx.stream) == payload

    # corrupting the deflate body must produce a recorded-style error
    bad = bytearray(compressed)
    bad[len(bad) // 2] ^= 0xFF
    head = f"<</Length {len(bad)}/Filter/FlateDecode>>stream\n".encode()
    lx = PdfLexer(head + bytes(bad) + b"\nendstream\nQ ")
    d = lx.get_next_token()
    try:
        lx.fill_stream_from_dict(d)
    except (PdfStreamError, Exception):
        pass  # any exception type is fine at lexer level; extract() records it


@given(seed=st.integers(0, 2**32 - 1), n_mutations=st.integers(1, 24))
@settings(**FUZZ_SETTINGS)
def test_xref_repair_never_hangs_or_crashes(seed, n_mutations):
    """The repair FSM on mutated documents: terminates, returns bytes, and
    only ever raises the reference's documented generation ValueError."""
    from pdfray.sources.xref_repair import repair_document

    rng = random.Random(seed)
    name, builder = fixtures.doc_class(seed % 100)
    data = builder(random.Random(seed), fixtures.LANGS[seed % 4])[0]
    mutated = bytearray(data)
    for _ in range(n_mutations):
        kind = rng.randrange(3)
        pos = rng.randrange(len(mutated))
        if kind == 0:
            mutated[pos] = rng.randrange(256)
        elif kind == 1:
            del mutated[pos]
        else:
            mutated.insert(pos, rng.randrange(256))
    try:
        out = repair_document(bytes(mutated))
        assert isinstance(out, bytes)
    except ValueError as ex:
        # the reference's two documented throws: generation != 0, dup key
        assert "should be 0" in str(ex) or "same key" in str(ex)


# ----------------------------------------------------------------------
# PNG decoder robustness: decode_png raises ONLY PngError (the multimodal
# stages catch-and-record); any other exception type is a bug.

def _png_decode_contract(data: bytes):
    from pdfray.core.png import PngError, decode_png

    try:
        img = decode_png(data)
        assert img.width > 0 and img.height > 0
        assert img.pixels.shape[0] == img.height
    except PngError:
        pass  # the one allowed failure mode


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_png_arbitrary_bytes_raise_only_pngerror(data):
    _png_decode_contract(data)


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_png_signature_prefixed_garbage(data):
    _png_decode_contract(b"\x89PNG\r\n\x1a\n" + data)


@given(seed=st.integers(0, 2**32 - 1), n_mutations=st.integers(1, 24))
@settings(**FUZZ_SETTINGS)
def test_png_mutated_valid_images(seed, n_mutations):
    """Byte-flip a VALID encoded image: structure mostly intact, so the
    decoder walks deep into chunk/inflate/unfilter paths before failing."""
    import numpy as np

    from pdfray.core.png import encode_png

    rng = random.Random(seed)
    np_rng = np.random.RandomState(seed & 0xFFFF)
    channels = rng.choice([1, 2, 3, 4])
    px = np_rng.randint(0, 256, (rng.randint(1, 24), rng.randint(1, 24), channels))
    data = bytearray(encode_png(px.astype("uint8"), filter_type=rng.randint(0, 4)))
    for _ in range(n_mutations):
        data[rng.randrange(len(data))] = rng.randrange(256)
    _png_decode_contract(bytes(data))


@given(seed=st.integers(0, 2**32 - 1))
@settings(**FUZZ_SETTINGS)
def test_png_truncations(seed):
    import numpy as np

    from pdfray.core.png import encode_png

    rng = random.Random(seed)
    np_rng = np.random.RandomState(seed & 0xFFFF)
    px = np_rng.randint(0, 256, (8, 8, 3)).astype("uint8")
    data = encode_png(px)
    _png_decode_contract(data[: rng.randrange(len(data))])


# ----------------------------------------------------------------------
# AV codec robustness (same contract as PNG): decode_wav raises ONLY
# WavError, parse_y4m/sample_stats raise ONLY Y4mError, and the AvDecoder
# stage never raises at all — it records per row.  Success cases must
# return structurally sane values (the stage multiplies/divides them).

def _wav_decode_contract(data: bytes):
    from pdfray.core.wav import WavError, audio_stats, decode_wav

    try:
        a = decode_wav(data)
    except WavError:
        return
    assert a.sample_rate >= 1 and a.n_channels >= 1
    assert a.samples.shape == (a.n_samples, a.n_channels)
    stats = audio_stats(a)
    assert stats["duration_ms"] >= 0 and stats["peak"] >= 0


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_wav_arbitrary_bytes_raise_only_waverror(data):
    _wav_decode_contract(data)


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_wav_riff_prefixed_garbage(data):
    _wav_decode_contract(b"RIFF" + data)
    _wav_decode_contract(b"RIFF\xff\xff\xff\xffWAVE" + data)


@given(seed=st.integers(0, 2**32 - 1), n_mutations=st.integers(1, 16))
@settings(**FUZZ_SETTINGS)
def test_wav_mutated_valid_payloads(seed, n_mutations):
    """Byte-flip a VALID encoding so the chunk walk runs deep: mutated
    size fields, fmt params and padding all stay inside the contract."""
    import numpy as np

    from pdfray.core.wav import encode_wav

    rng = random.Random(seed)
    np_rng = np.random.RandomState(seed & 0xFFFF)
    dtype = rng.choice([np.uint8, np.int16, np.int32])
    info = np.iinfo(dtype)
    s = np_rng.randint(
        info.min, int(info.max) + 1, (rng.randint(1, 64), rng.randint(1, 3))
    ).astype(dtype)
    data = bytearray(encode_wav(s, rng.choice([8000, 44100])))
    for _ in range(n_mutations):
        data[rng.randrange(len(data))] = rng.randrange(256)
    _wav_decode_contract(bytes(data))


@given(seed=st.integers(0, 2**32 - 1))
@settings(**FUZZ_SETTINGS)
def test_wav_truncations(seed):
    import numpy as np

    from pdfray.core.wav import encode_wav

    rng = random.Random(seed)
    s = np.arange(120, dtype=np.int16).reshape(60, 2)
    data = encode_wav(s, 16000)
    _wav_decode_contract(data[: rng.randrange(len(data))])


def _y4m_contract(data: bytes):
    from pdfray.core.y4m import SAMPLE_STRIDE, Y4mError, parse_y4m, sample_stats

    try:
        stream = parse_y4m(data)
    except Y4mError:
        return
    assert stream.width > 0 and stream.height > 0
    # parse validated every frame's payload extent, so sampling never fails
    stats = sample_stats(stream, SAMPLE_STRIDE)
    assert stats["n_sampled"] <= stats["n_frames"]
    assert stats["luma_sum"] >= 0


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_y4m_arbitrary_bytes_raise_only_y4merror(data):
    _y4m_contract(data)


@given(data=st.binary(min_size=0, max_size=2048))
@settings(**FUZZ_SETTINGS)
def test_y4m_magic_prefixed_garbage(data):
    _y4m_contract(b"YUV4MPEG2 " + data)
    _y4m_contract(b"YUV4MPEG2 W4 H4 F30:1 Cmono\n" + data)


@given(seed=st.integers(0, 2**32 - 1), n_mutations=st.integers(1, 16))
@settings(**FUZZ_SETTINGS)
def test_y4m_mutated_valid_streams(seed, n_mutations):
    """Byte-flips hit the ASCII header (dims, colorspace, fps) as often as
    frame payloads — both the header parser and the frame walk get depth."""
    import numpy as np

    from pdfray.core.y4m import encode_y4m

    rng = random.Random(seed)
    np_rng = np.random.RandomState(seed & 0xFFFF)
    h, w = rng.choice([(4, 4), (4, 6), (8, 2)])
    frames = [
        np_rng.randint(0, 256, (h, w)).astype("uint8")
        for _ in range(rng.randint(1, 7))
    ]
    cs = rng.choice(["mono", "420jpeg", "422", "444"])
    data = bytearray(encode_y4m(frames, colorspace=cs))
    for _ in range(n_mutations):
        data[rng.randrange(len(data))] = rng.randrange(256)
    _y4m_contract(bytes(data))


@given(seed=st.integers(0, 2**32 - 1))
@settings(**FUZZ_SETTINGS)
def test_y4m_truncations(seed):
    import numpy as np

    from pdfray.core.y4m import encode_y4m

    rng = random.Random(seed)
    frames = [np.full((4, 4), k, dtype="uint8") for k in range(5)]
    data = encode_y4m(frames)
    _y4m_contract(data[: rng.randrange(len(data))])


@given(payloads=st.lists(st.binary(min_size=0, max_size=512), min_size=1, max_size=8))
@settings(**FUZZ_SETTINGS)
def test_av_decoder_stage_never_raises(payloads):
    """The Ray stage contract on arbitrary payload batches: stable schema,
    one output row per input row, garbage recorded in ``error``."""
    import pyarrow as pa

    from pdfray.pipelines.multimodal import AV_SCHEMA, AvDecoder

    batch = pa.table(
        {
            "url": [f"u{i}" for i in range(len(payloads))],
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = AvDecoder()(batch)
    assert out.schema.equals(AV_SCHEMA)
    assert out.num_rows == len(payloads)


from zlib import error as zlib_error


def test_warc_parser_fuzz_no_hangs_typed_errors():
    """Mutated/truncated/corrupt WARC inputs either parse or raise a typed
    ValueError — never hang, never return malformed rows."""
    import random

    from pdfray.sources.warc import build_warc, iter_warc_records, warc_to_rows

    rng = random.Random(99)
    base = build_warc(
        [
            ("https://x/a", b"payload-a" * 20, "response"),
            ("https://x/b", b"payload-b" * 10, "resource"),
            ("https://x/i", b"info", "warcinfo"),
        ]
    )
    assert len(warc_to_rows(base)) == 2
    for trial in range(300):
        data = bytearray(base)
        op = rng.randrange(4)
        if op == 0:  # byte flips
            for _ in range(rng.randrange(1, 6)):
                i = rng.randrange(len(data))
                data[i] ^= 1 << rng.randrange(8)
        elif op == 1:  # truncation
            data = data[: rng.randrange(len(data))]
        elif op == 2:  # junk injection
            i = rng.randrange(len(data))
            data[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 32)))
        else:  # corrupt the gzip variant
            data = bytearray(
                build_warc([("https://x/g", b"gz" * 50, "response")], gzip_members=True)
            )
            for _ in range(rng.randrange(1, 4)):
                i = rng.randrange(2, len(data))
                data[i] ^= 0xFF
        try:
            rows = warc_to_rows(bytes(data))
        except (ValueError, zlib_error):
            continue
        for url, html in rows:
            assert isinstance(url, str) and isinstance(html, (bytes, bytearray))
    # header block must terminate
    import pytest as _pytest

    with _pytest.raises(ValueError):
        list(iter_warc_records(b"WARC/1.0\r\nContent-Length: 5\r\nno-terminator"))


def test_bpe_apply_fuzz_terminates_and_bounds():
    """Random unicode words under random merge tables: application always
    terminates with 1 <= n_symbols <= len(word) + 1."""
    import random

    from pdfray.pipelines.textops import bpe_apply_to_word, bpe_train_merges

    rng = random.Random(7)
    alphabet = "abcdeé😀𝔘 x"
    for trial in range(200):
        w = "".join(
            rng.choice(alphabet.replace(" ", "")) for _ in range(rng.randrange(1, 12))
        )
        vocab = {w: rng.randrange(1, 9)}
        for _ in range(rng.randrange(0, 5)):
            vocab["".join(rng.choice("abcde") for _ in range(rng.randrange(1, 6)))] = (
                rng.randrange(1, 9)
            )
        merges = bpe_train_merges(vocab, rng.randrange(0, 8))
        ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
        n = bpe_apply_to_word(w, ranks)
        assert 1 <= n <= len(w) + 1


@settings(max_examples=200, deadline=None)
@given(
    body=st.binary(max_size=4096),
    cuts=st.lists(st.integers(min_value=1, max_value=512), max_size=20),
    ext=st.booleans(),
)
def test_http_dechunk_roundtrip(body, cuts, ext):
    """Property: any body split at arbitrary chunk sizes (with or without
    chunk extensions) de-chunks back byte-identically, and trailers after
    the 0-chunk are discarded."""
    from pdfray.sources.warc import _dechunk

    out, pos = [], 0
    for c in cuts:
        if pos >= len(body):
            break
        piece = body[pos : pos + c]
        pos += len(piece)
        size = f"{len(piece):x}" + ("; ext=1" if ext else "")
        out.append(size.encode() + b"\r\n" + piece + b"\r\n")
    if pos < len(body):
        out.append(f"{len(body) - pos:x}".encode() + b"\r\n" + body[pos:] + b"\r\n")
    out.append(b"0\r\nX-Trailer: ignored\r\n\r\n")
    assert _dechunk(b"".join(out)) == body


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=256))
def test_http_dechunk_rejects_garbage_not_hangs(data):
    """Garbage never hangs or returns silently-wrong bytes: anything that
    is not valid chunked framing raises ValueError (a well-formed prefix
    that happens to parse is fine — that's HTTP's own ambiguity)."""
    from pdfray.sources.warc import _dechunk

    try:
        _dechunk(data)
    except ValueError:
        pass
