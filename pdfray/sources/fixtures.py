"""Deterministic synthetic PDF corpus with golden expected text.

Generates the driver-contract input table ``(url, warc_ts, html, text, lang)``
(BASELINE.json input_hint): ``html`` carries synthesized PDF bytes, ``text``
the golden extracted text computed *analytically* from the op program that
produced the bytes (mirroring the documented interpreter semantics, not by
running the extractor — so tests are a genuine oracle).

Coverage matrix (FIXTURES.md §2): simple 40%, multifrag 15%, flate 15%,
xrefstream 10%, fonts 10%, quirks 5%, encrypted 5%, plus a handful of huge
and broken rows.  All synthesis is seeded; no wall clock, no external data.
"""
from __future__ import annotations

import datetime
import random
import zlib
from typing import Optional

from ..core.encodings_tables import MAC_ROMAN, STANDARD, WIN_ANSI
from .pdfwriter import Encryption, PdfBuilder

SEED = 42
NL = "\n"
DELIM = "|"

# bump when generation logic changes so /tmp caches can never go stale
FIXTURE_VERSION = 12

LANGS = ("en", "de", "fr", "es")

SNIPPETS = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "hello world from the extraction engine",
        "pack my box with five dozen liquor jugs",
        "a stitch in time saves nine",
    ],
    "de": [
        "über den Wolken grüßt das Mädchen",
        "schöne Bäume im Wald von Köln",
        "größere Straßen führen zur Brücke",
        "zwölf Boxkämpfer jagen Viktor quer",
    ],
    "fr": [
        "déjà vu près du café français",
        "un été à la montagne enneigée",
        "le garçon mange une crêpe sucrée",
        "voilà une île très élégante",
    ],
    "es": [
        "mañana el señor come jamón",
        "el niño pequeño juega fútbol",
        "la canción española es muy rápida",
        "azúcar y limón en el café",
    ],
}

_INVERSE_CACHE: dict = {}


def inverse_table(table) -> dict:
    key = id(table)
    inv = _INVERSE_CACHE.get(key)
    if inv is None:
        inv = {}
        for code in range(32, 256):
            ch = table[code]
            if ch != "￿" and ch not in inv:
                inv[ch] = code
        _INVERSE_CACHE[key] = inv
    return inv


ENCODING_TABLES = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    None: STANDARD,  # Type1 default
}


def encode_text(text: str, encoding_name: Optional[str]) -> bytes:
    inv = inverse_table(ENCODING_TABLES[encoding_name])
    try:
        return bytes(inv[ch] for ch in text)
    except KeyError as ex:
        raise ValueError(f"char {ex} not encodable in {encoding_name}") from ex


def encodable(text: str, encoding_name: Optional[str]) -> bool:
    inv = inverse_table(ENCODING_TABLES[encoding_name])
    return all(ch in inv for ch in text)


# ----------------------------------------------------------------------
# op programs: fragments = [[op, ...], ...]; each inner list is one BT..ET


def expected_text(fragments: list, delim: str = DELIM, nl: str = NL) -> str:
    """Analytic model of the interpreter semantics (PdfContent.cs:97-187)."""
    text: Optional[str] = None
    last_offset = None
    for frag in fragments:
        for op in frag:
            kind = op[0]
            if kind in ("Td", "TD", "T*"):
                text = (text or "") + nl
            elif kind == "Tm":
                offset = op[6]
                if last_offset != offset:
                    last_offset = offset
                    if text is not None:
                        text += nl
            elif kind in ("Tj", "'"):
                text = (text or "") + op[1] + delim
            elif kind == '"':
                text = (text or "") + op[3] + delim
            elif kind == "TJ":
                s = "".join(p for p in op[1] if isinstance(p, str))
                text = (text or "") + s + delim
            # Tf and others contribute no text
    return text or ""


def render_content(fragments: list, encoding_name: Optional[str], builder: PdfBuilder,
                   pre_ops: str = "") -> bytes:
    """Render an op program to content-stream bytes (encoding golden text)."""
    parts = [pre_ops] if pre_ops else []
    for frag in fragments:
        parts.append("BT")
        for op in frag:
            kind = op[0]
            if kind == "Tf":
                parts.append(f"/{op[1]} {op[2]} Tf")
            elif kind == "Td":
                parts.append(f"{op[1]} {op[2]} Td")
            elif kind == "TD":
                parts.append(f"{op[1]} {op[2]} TD")
            elif kind == "T*":
                parts.append("T*")
            elif kind == "Tm":
                parts.append(" ".join(str(x) for x in op[1:7]) + " Tm")
            elif kind == "Tj":
                enc = encode_text(op[1], encoding_name)
                parts.append(builder.literal_string(enc) + " Tj")
            elif kind == "TjHex":
                parts.append("<" + op[1] + "> Tj")
            elif kind == "'":
                enc = encode_text(op[1], encoding_name)
                parts.append(builder.literal_string(enc) + " '")
            elif kind == '"':
                enc = encode_text(op[3], encoding_name)
                parts.append(f"{op[1]} {op[2]} " + builder.literal_string(enc) + ' "')
            elif kind == "TJ":
                arr = []
                for p in op[1]:
                    if isinstance(p, str):
                        arr.append(builder.literal_string(encode_text(p, encoding_name)))
                    else:
                        arr.append(str(p))
                parts.append("[" + " ".join(arr) + "] TJ")
            elif kind == "TL":
                parts.append(f"{op[1]} TL")
        parts.append("ET")
    return " ".join(parts).encode("latin-1")


def _font_body(encoding_name: Optional[str], base: str = "Helvetica") -> str:
    body = f"<</Type/Font/Subtype/Type1/BaseFont/{base}"
    if encoding_name:
        body += f"/Encoding/{encoding_name}"
    return body + ">>"


def _simple_fragments(rng: random.Random, lang: str, encoding_name) -> list:
    texts = [t for t in SNIPPETS[lang] if encodable(t, encoding_name)]
    text = rng.choice(texts)
    return [[("Tf", "F1", 12), ("Td", 100, 700), ("Tj", text)]]


# ----------------------------------------------------------------------
# document classes


def build_simple(rng: random.Random, lang: str) -> tuple:
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content)
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    info = b.add(f"<</Title (doc {rng.randrange(10_000)})/Producer (pdfray fixtures)>>")
    data = b.finish_classic(cat, info=info, file_id_hex="AB" * 16)
    return data, expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def build_multifrag(rng: random.Random, lang: str) -> tuple:
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    texts = [t for t in SNIPPETS[lang] if encodable(t, encoding_name)]
    t1, t2, t3 = rng.choice(texts), rng.choice(texts), rng.choice(texts)
    y1, y2 = rng.randrange(600, 700), rng.randrange(400, 500)
    frags = [
        [
            ("Tf", "F1", 11),
            ("Tm", 1, 0, 0, 1, 50, y1),
            ("TJ", [t1, -120, t2[:8]]),
            ("TD", 0, -14),
            ("'", t2),
        ],
        [
            ("Tf", "F1", 11),
            ("Tm", 1, 0, 0, 1, 50, y1),  # same offset -> no newline
            ("Tj", t3),
            ("T*",),
            ("'", t1),
            ("Tm", 1, 0, 0, 1, 50, y2),  # new offset -> newline
            ("Tj", t2),
        ],
    ]
    b = PdfBuilder()
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content)
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat, file_id_hex="CD" * 16)
    return data, expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def build_flate(rng: random.Random, lang: str) -> tuple:
    """FlateDecode streams + nested Pages tree (M10, M12, M15)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    fid = b.add(_font_body(encoding_name))
    n_pages = rng.randrange(2, 5)
    all_frags = []
    page_ids = []
    root_pages = b.reserve()
    inner_pages = b.reserve()
    for k in range(n_pages):
        frags = _simple_fragments(rng, lang, encoding_name)
        all_frags.extend(frags)
        content = render_content(frags, encoding_name, b)
        cid = b.add_stream(content, flate=True)
        parent = inner_pages if k < 2 else root_pages
        pid = b.add(
            f"<</Type/Page/Parent {parent} 0 R/Contents {cid} 0 R"
            f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
        )
        page_ids.append(pid)
    inner_kids = " ".join(f"{p} 0 R" for p in page_ids[:2])
    b.add(f"<</Type/Pages/Parent {root_pages} 0 R/Kids[{inner_kids}]/Count 2>>",
          obj_num=inner_pages)
    outer_kids = f"{inner_pages} 0 R " + " ".join(f"{p} 0 R" for p in page_ids[2:])
    b.add(f"<</Type/Pages/Kids[{outer_kids}]/Count {n_pages}>>", obj_num=root_pages)
    cat = b.add(f"<</Type/Catalog/Pages {root_pages} 0 R>>")
    data = b.finish_classic(cat)
    return data, expected_text(all_frags), {"pdf_version": "1.4", "n_pages": n_pages}


def build_xrefstream(rng: random.Random, lang: str) -> tuple:
    """PDF-1.5 xref stream + object streams holding the structure (M5, M11, M13)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder(version="1.5")
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content, flate=True)
    # structure objects live compressed inside an object stream
    fid = b.reserve()
    pid = b.reserve()
    pages_id = b.reserve()
    cat = b.reserve()
    members = [
        (fid, _font_body(encoding_name)),
        (
            pid,
            f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
            f"/Resources<</Font<</F1 {fid} 0 R>>>>>>",
        ),
        (pages_id, f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>"),
        (cat, f"<</Type/Catalog/Pages {pages_id} 0 R>>"),
    ]
    _, mapping = b.add_object_stream(members)
    data = b.finish_xref_stream(cat, compressed=mapping)
    return data, expected_text(frags), {"pdf_version": "1.5", "n_pages": 1}


# analytic /Differences + ToUnicode table model (PdfFont.cs:62-99 semantics)
def _fonts_class_table() -> list:
    table = list(STANDARD)
    # /Differences [65 /Zcaron /notdefinedglyph /adieresis 0x80 /uni20AC]
    table[65] = "Ž"
    # 66 AND 67 skipped: a failed glyph-name entry consumes two code slots
    # (C# increments charIndex in the try and again in the catch,
    # PdfFont.cs:80-90)
    table[68] = "ä"
    table[0x80] = "€"
    # ToUnicode bfchar: <01> -> <0041>, <02> -> <00660066> (ligature ff)
    table[0x01] = "A"
    table[0x02] = "ﬀ"
    # bfrange <10> <12> <0061> -> a, b, c
    table[0x10] = "a"
    table[0x11] = "b"
    table[0x12] = "c"
    return table


def build_fonts(rng: random.Random, lang: str) -> tuple:
    """/Differences + /ToUnicode CMaps + hex strings + ligature CIDs (F3-F5, M21)."""
    b = PdfBuilder()
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "11 dict begin\n"
        "begincmap\n"
        "/CMapName /Adobe-Identity-UCS def\n"
        "/CMapType 2 def\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        "2 beginbfchar\n<01> <0041>\n<02> <00660066>\nendbfchar\n"
        "1 beginbfrange\n<10> <12> <0061>\nendbfrange\n"
        "endcmap\nend\nend"
    )
    cmap_id = b.add_stream(cmap.encode("latin-1"))
    fid = b.add(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding/Differences"
        "[65 /Zcaron /notdefinedglyph /adieresis 128 /uni20AC]>>"
        f"/ToUnicode {cmap_id} 0 R>>"
    )
    table = _fonts_class_table()
    # hex-string Tj over codes 41,42,43,80,01,02,10,11,12
    codes = [0x41, 0x42, 0x43, 0x80, 0x01, 0x02, 0x10, 0x11, 0x12]
    hexstr = "".join(f"{c:02X}" for c in codes)
    mapped = "".join(table[c] for c in codes)
    frags = [[("Tf", "F1", 12), ("Td", 72, 700), ("TjHex", hexstr)]]
    golden = NL + mapped + DELIM
    content = render_content(frags, None, b)
    cid = b.add_stream(content)
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    return data, golden, {"pdf_version": "1.4", "n_pages": 1}


def build_quirks(rng: random.Random, lang: str) -> tuple:
    """Junk prefix, wrong /Length, CR-only stream EOL, dup dict keys, comments,
    inline images, clipping, /Prev incremental update (M3, M6, M9, M14)."""
    encoding_name = "WinAnsiEncoding"
    junk = b"BT 231.57 45.49 Td (ignored junk before header) Tj ET\n"
    b = PdfBuilder(junk_prefix=junk)
    texts = [t for t in SNIPPETS[lang] if encodable(t, encoding_name)]
    t1 = rng.choice(texts)
    frags = [[("Tf", "F1", 12), ("Td", 100, 700), ("Tj", t1)]]
    # inline image + clipping region before BT; % comment in the page dict
    pre = "q BI /W 4 /H 4 /BPC 8 ID \x01\x02\x03)\x04( EI Q 322.8 648.48 31.92 44.64 re W n"
    content = render_content(frags, encoding_name, b, pre_ops=pre)
    wrong_len = max(1, len(content) - rng.randrange(3, 9))  # endstream rescue path
    cid = b.add_stream(content, length_override=wrong_len, eol=b"\r")
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page%comment inside dict\n/Parent {pages_id} 0 R"
        f"/Contents {cid} 0 R/Rotate 0/Rotate 0"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    rev1 = b.finish_classic(cat, free_entry_quirk=True)
    # incremental update: replace the content stream; newest xref wins (M6)
    t2 = rng.choice(texts)
    frags2 = [[("Tf", "F1", 12), ("Td", 100, 700), ("Tj", t2)]]
    sx = rev1.rfind(b"startxref")
    prev_xref = int(rev1[sx + len(b"startxref") :].split()[0])
    b2 = _IncrementalBuilder(rev1)
    content2 = render_content(frags2, encoding_name, b2)
    b2.add_stream(content2, obj_num=cid)
    data = b2.finish_classic(cat, prev=prev_xref)
    return data, expected_text(frags2), {"pdf_version": "1.4", "n_pages": 1}


class _IncrementalBuilder(PdfBuilder):
    """Appends a second revision to an existing document (quirks /Prev chain)."""

    def __init__(self, base: bytes):
        self.buf = bytearray(base)
        self.addrs = {}
        self._next = 1000  # unused; updated objects pass obj_num explicitly
        self.encryption = None
        self.encrypt_obj_num = None


def build_encrypted(rng: random.Random, lang: str) -> tuple:
    """RC4 standard security V=2/R=3, empty user password (C1-C8)."""
    enc = Encryption(user_password="", owner_password="own" + str(rng.randrange(100)))
    encoding_name = "WinAnsiEncoding"
    b = PdfBuilder(encryption=enc)
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content)  # RC4-encrypted by the builder
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    info_id = b.reserve()
    title = b.literal_string(b"secret title", obj_num_for_encryption=info_id)
    b.add(f"<</Title {title}>>", obj_num=info_id)
    b.add_encrypt_dict()
    data = b.finish_classic(cat, info=info_id)
    return data, expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def _image_xobject(b: PdfBuilder, rng: random.Random, image_kb: int) -> int:
    """Incompressible image XObject stream — realistic PDF byte weight.

    The content stream never draws it, so golden text is unaffected; the
    lexer still has to carry the object through xref/stream handling, which
    is exactly the byte cost a scanned/image-heavy PDF imposes."""
    payload = rng.randbytes(image_kb * 1024)
    side = max(1, int((image_kb * 1024 / 3) ** 0.5))
    return b.add_stream(
        payload,
        dict_extra=(
            f"/Type/XObject/Subtype/Image/Width {side}/Height {side}"
            "/ColorSpace/DeviceRGB/BitsPerComponent 8"
        ),
    )


def build_huge(
    rng: random.Random, lang: str, n_pages: int = 24, image_kb: int = 0
) -> tuple:
    """Multi-MB multi-page documents for the skew-routing path.

    ``image_kb`` > 0 attaches one incompressible image XObject of that size
    per page — bench corpora use this to give the huge class a genuinely
    multi-megabyte tail (real PDFs are dominated by image bytes, not text)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    page_ids = []
    all_frags = []
    texts = [t for t in SNIPPETS[lang] if encodable(t, encoding_name)]
    for _ in range(n_pages):
        frag = [("Tf", "F1", 10), ("Td", 72, 760)]
        for line in range(rng.randrange(30, 60)):
            frag.append(("Tj", rng.choice(texts) + f" line {line}"))
            frag.append(("T*",))
        frags = [frag]
        all_frags.extend(frags)
        content = render_content(frags, encoding_name, b)
        cid = b.add_stream(content, flate=True)
        resources = f"<</Font<</F1 {fid} 0 R>>"
        if image_kb > 0:
            xid = _image_xobject(b, rng, image_kb)
            resources += f"/XObject<</Im0 {xid} 0 R>>"
        resources += ">>"
        pid = b.add(
            f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
            f"/Resources{resources}>>"
        )
        page_ids.append(pid)
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    b.add(f"<</Type/Pages/Kids[{kids}]/Count {n_pages}>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    return data, expected_text(all_frags), {"pdf_version": "1.4", "n_pages": n_pages}


def build_medium(rng: random.Random, lang: str) -> tuple:
    """~50-150 KB multi-page documents: the realistic mid-weight of a web
    corpus (text pages + one shared image XObject)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    fid = b.add(_font_body(encoding_name))
    xid = _image_xobject(b, rng, rng.randrange(40, 110))
    pages_id = b.reserve()
    page_ids = []
    all_frags = []
    texts = [t for t in SNIPPETS[lang] if encodable(t, encoding_name)]
    n_pages = rng.randrange(6, 14)
    for _ in range(n_pages):
        frag = [("Tf", "F1", 11), ("Td", 72, 740)]
        for line in range(rng.randrange(10, 25)):
            frag.append(("Tj", rng.choice(texts)))
            frag.append(("T*",))
        frags = [frag]
        all_frags.extend(frags)
        content = render_content(frags, encoding_name, b)
        cid = b.add_stream(content, flate=True)
        pid = b.add(
            f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
            f"/Resources<</Font<</F1 {fid} 0 R>>/XObject<</Im0 {xid} 0 R>>>>>>"
        )
        page_ids.append(pid)
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    b.add(f"<</Type/Pages/Kids[{kids}]/Count {n_pages}>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    return data, expected_text(all_frags), {"pdf_version": "1.4", "n_pages": n_pages}


def build_linearized(rng: random.Random, lang: str) -> tuple:
    """Linearized-layout fallback (M3): linearization dict first, no %%EOF —
    the parser must find the xref by scanning forward from the dictionary."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    b.add("<</Linearized 1/O 5/L 4113/N 1/T 3896>>")
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content)  # uncompressed: body must not contain 'xref'
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    eof = data.rfind(b"%%EOF")
    return data[:eof], expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def build_metadata(rng: random.Random, lang: str) -> tuple:
    """Root -> /Metadata XML stream (M16)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    cid = b.add_stream(content)
    fid = b.add(_font_body(encoding_name))
    xml = (
        '<?xpacket begin=""?><x:xmpmeta xmlns:x="adobe:ns:meta/">'
        f"<dc:title>doc {rng.randrange(1000)}</dc:title></x:xmpmeta>"
    )
    meta_id = b.add_stream(
        xml.encode("latin-1"), dict_extra="/Type/Metadata/Subtype/XML"
    )
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(
        f"<</Type/Catalog/Pages {pages_id} 0 R/Metadata {meta_id} 0 R>>"
    )
    data = b.finish_classic(cat)
    return data, expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def build_asciihex(rng: random.Random, lang: str) -> tuple:
    """ASCIIHexDecode content stream (engine extension per the target scope)."""
    encoding_name = rng.choice(["WinAnsiEncoding", "MacRomanEncoding"])
    b = PdfBuilder()
    frags = _simple_fragments(rng, lang, encoding_name)
    content = render_content(frags, encoding_name, b)
    hex_lines = content.hex().upper()
    # break into lines (whitespace must be tolerated) and end with EOD '>'
    payload = "\n".join(
        hex_lines[i : i + 64] for i in range(0, len(hex_lines), 64)
    ) + ">"
    cid = b.add_stream(payload.encode("latin-1"), dict_extra="/Filter/ASCIIHexDecode")
    fid = b.add(_font_body(encoding_name))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    return data, expected_text(frags), {"pdf_version": "1.4", "n_pages": 1}


def build_broken(rng: random.Random, lang: str) -> tuple:
    """Truncated / garbage / non-PDF payloads: extractor records, never raises."""
    kind = rng.randrange(3)
    if kind == 0:
        # 60% truncation keeps the %PDF-1.4 header (version still reads)
        # but severs the trailing xref, so no pages resolve
        data, _, _ = build_simple(rng, lang)
        data = data[: int(len(data) * 0.6)]
        version = "1.4"
    elif kind == 1:
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(200, 900)))
        version = None
    else:
        data = (
            b"<html><head><title>not a pdf</title></head>"
            b"<body><p>plain web page payload</p></body></html>"
        )
        version = None
    return data, "", {"pdf_version": version, "n_pages": 0}


CLASS_BUILDERS = [
    ("simple", build_simple, 24),
    ("multifrag", build_multifrag, 14),
    ("flate", build_flate, 12),
    ("xrefstream", build_xrefstream, 10),
    ("fonts", build_fonts, 10),
    ("medium", build_medium, 9),
    ("quirks", build_quirks, 5),
    ("encrypted", build_encrypted, 5),
    ("linearized", build_linearized, 3),
    ("metadata", build_metadata, 4),
    ("asciihex", build_asciihex, 4),
]
_WEIGHTED = []
for _name, _fn, _w in CLASS_BUILDERS:
    _WEIGHTED.extend([(_name, _fn)] * _w)
# deterministic interleave so small corpora still cover every class
random.Random(7).shuffle(_WEIGHTED)


def doc_class(index: int) -> tuple:
    return _WEIGHTED[index % len(_WEIGHTED)]


EPOCH = datetime.datetime(2026, 1, 1)


def generate_rows(
    n_docs: int,
    n_huge: int = 2,
    n_broken: int = 3,
    seed: int = SEED,
    huge_pages: int = 24,
    huge_image_kb: int = 0,
):
    """Yield (url, warc_ts, html, text, lang, pdf_version, n_pages) tuples
    deterministically.  pdf_version/n_pages are analytic golden columns
    (what a correct parse must report), enabling independent DuckDB oracles
    over structure, not just text."""
    i = 0
    for k in range(n_docs):
        name, fn = doc_class(k)
        rng = random.Random((seed << 20) ^ k)
        lang = LANGS[k % len(LANGS)]
        data, golden, meta = fn(rng, lang)
        yield (
            f"https://example.org/{name}/{k:08d}.pdf",
            EPOCH + datetime.timedelta(seconds=i),
            data,
            golden,
            lang,
            meta["pdf_version"],
            meta["n_pages"],
        )
        i += 1
    for k in range(n_huge):
        rng = random.Random((seed << 21) ^ k)
        lang = LANGS[k % len(LANGS)]
        if k % 6 == 5 and huge_image_kb:
            # every sixth huge doc is a GIANT (~8 MB): above the skew-pool
            # threshold, so bench corpora genuinely exercise stage-B routing
            pages, img = huge_pages * 2, huge_image_kb * 2 + 10
        else:
            pages, img = huge_pages, huge_image_kb
        data, golden, meta = build_huge(rng, lang, n_pages=pages, image_kb=img)
        yield (
            f"https://example.org/huge/{k:08d}.pdf",
            EPOCH + datetime.timedelta(seconds=i),
            data,
            golden,
            lang,
            meta["pdf_version"],
            meta["n_pages"],
        )
        i += 1
    for k in range(n_broken):
        rng = random.Random((seed << 22) ^ k)
        lang = LANGS[k % len(LANGS)]
        data, golden, meta = build_broken(rng, lang)
        yield (
            f"https://example.org/broken/{k:08d}.pdf",
            EPOCH + datetime.timedelta(seconds=i),
            data,
            golden,
            lang,
            meta["pdf_version"],
            meta["n_pages"],
        )
        i += 1


def corpus_table(
    n_docs: int,
    n_huge: int = 2,
    n_broken: int = 3,
    seed: int = SEED,
    huge_pages: int = 24,
    huge_image_kb: int = 0,
):
    """Build the corpus as a pyarrow Table: the input_hint schema plus the
    analytic golden columns (pdf_version, n_pages, partition_id)."""
    import pyarrow as pa

    urls, tss, htmls, texts, langs, versions, pages = [], [], [], [], [], [], []
    for url, ts, html, text, lang, version, n_pages in generate_rows(
        n_docs, n_huge, n_broken, seed, huge_pages, huge_image_kb
    ):
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        versions.append(version)
        pages.append(n_pages)

    # golden partition ids use the engine's canonical url-hash helper so the
    # driver can oracle the partition rollup end-to-end
    from ..pipelines.extraction import DEFAULT_NUM_PARTITIONS, url_partition_ids

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "pdf_version": pa.array(versions, pa.string()),
            "n_pages": pa.array(pages, pa.int32()),
            "partition_id": pa.array(
                url_partition_ids(urls, DEFAULT_NUM_PARTITIONS), pa.int32()
            ),
        }
    )


def sf_doc_count(sf: float) -> int:
    """Corpus size by scale factor: sf0.001 -> 60, sf0.01 -> 600, sf0.1 -> 6000."""
    return max(20, int(60_000 * sf))


# ----------------------------------------------------------------------
# media fixture: deterministic PNG payloads with golden decode dimensions
# (width/height are what a CORRECT decode must report; 0/0 for the planted
# broken rows) — gives the multimodal decode stages an exact DuckDB oracle.

def _media_pixels(k: int, w: int, h: int, form: str):
    """Deterministic pixel content per index: structured gradients mixed with
    seeded noise, exercising every color form the decoder supports."""
    import numpy as np

    rng = __import__("numpy").random.RandomState((SEED << 16) ^ k)
    gx = (np.arange(w, dtype=np.int64) * 255 // max(1, w - 1)).astype(np.uint8)
    gy = (np.arange(h, dtype=np.int64) * 255 // max(1, h - 1)).astype(np.uint8)
    grad = np.add.outer(gy // 2, gx // 2).astype(np.uint8)
    noise = rng.randint(0, 256, (h, w), dtype=np.uint8)
    base = np.where((np.add.outer(gy // 32, gx // 32) % 2) == 0, grad, noise)
    if form == "gray":
        return base, None
    if form == "ga":
        return np.dstack([base, 255 - grad]), None
    if form == "rgb":
        return np.dstack([base, grad, noise]), None
    if form == "rgba":
        return np.dstack([base, grad, noise, np.maximum(grad, 32)]), None
    # palette: <=32 entries, deterministic
    pal = rng.randint(0, 256, (32, 3), dtype=np.uint8)
    idx = (base % 32).astype(np.uint8)
    return idx, pal


_MEDIA_FORMS = ("gray", "ga", "rgb", "rgba", "palette")
_MEDIA_FILTERS = (0, 1, 2, 3, 4, "adaptive")


def media_geometry(k: int):
    """THE per-index media-row spec: (w, h, form, filter, broken).  Shared
    by the encode path (`media_rows`) and the pre-encode golden path
    (`__ray_entry__._image_hash_oracle`) so a fixture change can never
    leave the oracle deriving stale geometry."""
    w = 8 + (k * 7) % 113
    h = 8 + (k * 11) % 97
    form = _MEDIA_FORMS[k % len(_MEDIA_FORMS)]
    filt = _MEDIA_FILTERS[k % len(_MEDIA_FILTERS)]
    broken = k % 13 in (5, 11)
    return w, h, form, filt, broken


def media_rows(n_images: int, seed: int = SEED):
    """Yield (url, payload, media_type, width, height) deterministically.

    Every 13th±  row is a planted broken payload (truncated / unsupported
    interlace flag with a VALID crc) whose golden dims are 0/0 — decode
    stages must catch, record the typed error, and keep the row."""
    import struct
    import zlib as _zlib

    from ..core.png import encode_png

    for k in range(n_images):
        w, h, form, filt, _broken = media_geometry(k)
        px, pal = _media_pixels(k, w, h, form)
        payload = encode_png(px, palette=pal, filter_type=filt)
        name = form
        width, height = w, h
        if k % 13 == 5:  # truncated mid-IDAT
            payload = payload[: max(16, len(payload) // 2)]
            name, width, height = "broken", 0, 0
        elif k % 13 == 11:  # interlace byte flipped, crc recomputed (valid
            # structure, unsupported Adam7 form — the typed-error path)
            ihdr = bytearray(payload[8:33])
            ihdr[20] = 1  # interlace flag: last byte of the 13-byte IHDR data
            body = bytes(ihdr[8:-4])
            crc = struct.pack(">I", _zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
            payload = payload[:16] + body + crc + payload[33:]
            name, width, height = "broken", 0, 0
        yield (
            f"https://img.example.org/{name}/{k:08d}.png",
            payload,
            "image",
            width,
            height,
        )


def media_table(n_images: int, seed: int = SEED):
    import pyarrow as pa

    urls, payloads, types, widths, heights = [], [], [], [], []
    for url, payload, mtype, w, h in media_rows(n_images, seed):
        urls.append(url)
        payloads.append(payload)
        types.append(mtype)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def media_parquet_path(sf_name: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    import os

    return os.path.join(cache_root, f"v{FIXTURE_VERSION}", sf_name, "media_png")


def ensure_media_parquet(sf_dir: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    """Materialize the sharded media table for a testdata sf dir (cached,
    deterministic; same atomic-rename discipline as the corpus)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.001
    out_path = media_parquet_path(sf_name, cache_root)
    if os.path.isdir(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    table = media_table(sf_doc_count(sf))
    tmp = tempfile.mkdtemp(prefix=".tmp-", dir=os.path.dirname(out_path))
    for s, lo in enumerate(range(0, len(table), _SHARD_ROWS)):
        pq.write_table(
            table.slice(lo, _SHARD_ROWS),
            os.path.join(tmp, f"part-{s:05d}.parquet"),
            row_group_size=256,
        )
    try:
        os.replace(tmp, out_path)
    except OSError:
        import shutil

        if not os.path.isdir(out_path):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out_path


_SHARD_ROWS = 512


# ----------------------------------------------------------------------
# audio/video fixture: REAL WAV (RIFF/PCM) and Y4M (YUV4MPEG2) payloads with
# golden decode stats computed from the pre-encode samples/frames — so the
# decode stages' output is an exact codec round-trip check, DuckDB-oracle
# style, just like the PNG media table above.

def _audio_wave(k: int):
    """PRE-quantization waveform of audio fixture ``k``: integer sawtooth
    carrier + seeded noise (pure integer ops — no libm, so goldens are
    platform-exact), with k%3 planted EXACT-silence gaps so the
    segmentation golden (`segment_stats`) exercises real run boundaries.
    Returns (wave int64 (n, n_ch), rate)."""
    import numpy as np

    rng = np.random.RandomState((SEED << 16) ^ (0xA0D10 + k))
    rate = (8000, 16000, 22050, 44100)[k % 4]
    n_ch = 1 + (k % 2)
    n = 800 + (k * 37) % 2400
    period = 20 + (k % 50)
    saw = ((np.arange(n) % period) * (2000 // period)).astype(np.int64) - 1000
    wave = saw[:, None] + rng.randint(-400, 400, (n, n_ch))
    gap_len = n // 8 + 16
    for g in range(k % 3):  # planted silence gaps (0..2 per file)
        start = (k * 131 + g * 577) % max(1, n - gap_len)
        wave[start : start + gap_len] = 0
    return wave, rate


def _audio_payload(k: int):
    """Deterministic PCM payload + golden decode stats (see `_audio_wave`).

    k % 16 == 14 rows are planted NEAR-DUPLICATES of clip k-8 (an even,
    never-broken, non-dup index): the base waveform at x2 gain plus light
    seeded noise, encoded at the BASE clip's bit depth — the re-mastered
    re-encode class the gain-invariant envelope fingerprint
    (`core.wav.envelope_hash64`) must catch."""
    import numpy as np

    from ..core.wav import (
        audio_stats,
        decode_wav,
        encode_wav,
        segment_stats,
        spectral_stats,
    )

    wave, rate = _audio_wave(k)
    dtype_pick = k % 5
    if k % 16 == 14:  # near-dup plant: x2 gain + light noise on clip k-8
        wave, rate = _audio_wave(k - 8)
        rng2 = np.random.RandomState((SEED << 16) ^ (0xD0B00 + k))
        # +-300 spreads planted-pair Hamming across 0..NEARDUP_T incl. the
        # exact threshold (measured over the first 8 plants)
        wave = wave * 2 + rng2.randint(-300, 300, wave.shape)
        dtype_pick = (k - 8) % 5
    if dtype_pick == 3:  # 8-bit unsigned
        samples = ((wave // 16) + 128).clip(0, 255).astype(np.uint8)
    elif dtype_pick == 4:  # 32-bit
        samples = (wave * 65536).astype(np.int32)
    else:  # 16-bit (the dominant archival form)
        samples = wave.clip(-32768, 32767).astype(np.int16)
    payload = encode_wav(samples, rate)
    audio = decode_wav(payload)
    stats = audio_stats(audio)
    stats.update(spectral_stats(audio))
    stats.update(segment_stats(audio))
    return payload, stats


def _video_frames_arrays(k: int):
    """PRE-encode luma frame arrays of video fixture row ``k`` (gradient
    luma with a moving bright box and a seeded noise band, cycling dims /
    frame counts / colorspaces).  Shared by the payload encoder below and
    the frame-sample oracle builder, which hashes these arrays directly so
    the engine's container-index decode path is certified against goldens
    the decoder never produced.

    k % 16 == 15 rows are planted NEAR-DUPLICATES of video k-8 (an odd,
    never-recursive index): the base frames brightness-shifted +8 with
    light seeded noise — the re-encode/re-grade class the video aHash
    fingerprint (`multimodal.video_hash64`) must catch (a pure brightness
    shift leaves the hash bit-identical; the noise and clipping move it a
    few Hamming bits)."""
    import numpy as np

    if k % 16 == 15:  # near-dup plant: +8 brightness + light noise on k-8
        base, cs = _video_frames_arrays(k - 8)
        rng2 = np.random.RandomState((SEED << 16) ^ (0xB1DE0 + k))
        frames = [
            np.clip(
                f.astype(np.int64) + 8 + rng2.randint(-4, 5, f.shape), 0, 255
            ).astype(np.uint8)
            for f in base
        ]
        return frames, cs

    rng = np.random.RandomState((SEED << 16) ^ (0x51DE0 + k))
    w = 16 + 2 * ((k * 5) % 25)   # 16..64, even
    h = 16 + 2 * ((k * 7) % 17)   # 16..48, even
    nf = 4 + (k % 9)              # 4..12 frames
    cs = ("420jpeg", "422", "444", "mono")[k % 4]
    # k-dependent oriented gradient: direction, frequency and phase vary
    # per video, so the STATIC background is visually distinct per clip
    # (a shared flat ramp made every 8x8-sampled fingerprint collide —
    # measured: 92k "natural" near-dup pairs at sf0.1 before this)
    ax, ay = 1 + (k % 7), 1 + ((k * 3) % 5)
    gx = np.arange(w, dtype=np.int64) * ax * 200 // max(1, w - 1)
    gy = np.arange(h, dtype=np.int64) * ay * 200 // max(1, h - 1)
    base = ((np.add.outer(gy, gx) + k * 37) % 200).astype(np.uint8)
    frames = []
    scene_len = 3 + (k % 3)  # planted scene changes every 3..5 frames
    for f in range(nf):
        fr = base.copy()
        # in-scene motion is a 1-px toggle (a modulo drift would wrap the
        # box across the frame and spike the in-scene luma diff above the
        # scene-cut threshold on small frames)
        x0 = k % max(1, w - 9) + (f % 2)
        y0 = (k * 3) % max(1, h - 9) + ((f // 2) % 2)
        fr[y0 : y0 + 8, x0 : x0 + 8] = 255
        fr[: max(1, h // 8), :] = rng.randint(0, 256, (max(1, h // 8), w),
                                              dtype=np.uint8)
        # scene change: re-color the whole frame by +111 mod 256 per scene
        # (|diff| per pixel is 111 or 145, far above the cut threshold;
        # in-scene motion — box + refreshed noise band — stays far below)
        fr = ((fr.astype(np.int64) + 111 * (f // scene_len)) % 256).astype(
            np.uint8
        )
        frames.append(fr)
    return frames, cs


def _video_payload(k: int):
    """Deterministic Y4M content (see `_video_frames_arrays`)."""
    from ..core.y4m import (
        SAMPLE_STRIDE,
        encode_y4m,
        parse_y4m,
        sample_stats,
        scene_stats,
    )

    frames, cs = _video_frames_arrays(k)
    payload = encode_y4m(frames, colorspace=cs, fps=(24 + (k % 7), 1))
    stream = parse_y4m(payload)
    stats = sample_stats(stream, SAMPLE_STRIDE)
    stats.update(scene_stats(stream))
    return payload, stats


_AV_ZERO = {
    "sample_rate": 0, "n_channels": 0, "n_samples": 0, "duration_ms": 0,
    "rms_x1e3": 0, "peak": 0, "dom_bin": 0, "dom_hz_x1e3": 0, "n_bins": 0,
    "n_windows": 0, "n_active_windows": 0, "n_segments": 0, "longest_run": 0,
    "width": 0, "height": 0, "n_frames": 0,
    "n_sampled": 0, "luma_sum": 0, "n_pairs": 0, "n_cuts": 0, "diff_total": 0,
}

_AV_COLS = tuple(_AV_ZERO)


def av_rows(n_rows: int, seed: int = SEED):
    """Yield (url, payload, media_type, *goldens) deterministically;
    audio/video alternate.  Every 13th±  row is planted broken — truncated
    (k%13==5) or structurally valid with an unsupported envelope (k%13==11:
    float-PCM format tag / unknown colorspace) — with all-zero goldens; the
    decode stage must record the typed error and keep the row."""
    import re
    import struct

    for k in range(n_rows):
        kind = "audio" if k % 2 == 0 else "video"
        if kind == "audio":
            payload, stats = _audio_payload(k)
            ext = "wav"
        else:
            payload, stats = _video_payload(k)
            ext = "y4m"
        name = kind
        golden = dict(_AV_ZERO)
        golden.update(stats)
        if k % 13 == 5:  # truncated mid-payload
            payload = payload[: max(12, len(payload) * 2 // 3)]
            name, golden = "broken", dict(_AV_ZERO)
        elif k % 13 == 11:  # structurally valid, unsupported envelope
            if kind == "audio":  # format tag 1 (PCM) -> 3 (IEEE float)
                payload = payload[:20] + struct.pack("<H", 3) + payload[22:]
            else:  # colorspace the parser doesn't know
                payload = re.sub(rb"C\S+", b"C999", payload, count=1)
            name, golden = "broken", dict(_AV_ZERO)
        yield (
            f"https://av.example.org/{name}/{k:08d}.{ext}",
            payload,
            kind,
            golden,
        )


def av_table(n_rows: int, seed: int = SEED):
    import pyarrow as pa

    cols = {"url": [], "payload": [], "media_type": []}
    cols.update({c: [] for c in _AV_COLS})
    for url, payload, kind, golden in av_rows(n_rows, seed):
        cols["url"].append(url)
        cols["payload"].append(payload)
        cols["media_type"].append(kind)
        for c in _AV_COLS:
            cols[c].append(golden[c])
    arrays = {
        "url": pa.array(cols["url"], pa.string()),
        "payload": pa.array(cols["payload"], pa.binary()),
        "media_type": pa.array(cols["media_type"], pa.string()),
    }
    for c in _AV_COLS:
        arrays[c] = pa.array(cols[c], pa.int64())
    return pa.table(arrays)


def av_parquet_path(sf_name: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    import os

    return os.path.join(cache_root, f"v{FIXTURE_VERSION}", sf_name, "media_av")


def ensure_av_parquet(sf_dir: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    """Materialize the sharded audio/video table for a testdata sf dir
    (cached, deterministic, same atomic-rename discipline as the corpus).
    Row count is half the corpus count — AV payloads are ~10x PNG size."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.001
    out_path = av_parquet_path(sf_name, cache_root)
    if os.path.isdir(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    table = av_table(max(20, sf_doc_count(sf) // 2))
    tmp = tempfile.mkdtemp(prefix=".tmp-", dir=os.path.dirname(out_path))
    for s, lo in enumerate(range(0, len(table), _SHARD_ROWS)):
        pq.write_table(
            table.slice(lo, _SHARD_ROWS),
            os.path.join(tmp, f"part-{s:05d}.parquet"),
            row_group_size=256,
        )
    try:
        os.replace(tmp, out_path)
    except OSError:
        import shutil

        if not os.path.isdir(out_path):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out_path


def fixture_parquet_path(sf_name: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    """Deterministic, version-stamped cache DIRECTORY for a corpus: multiple
    part-*.parquet shards (Ray's parquet reader parallelizes per file, so a
    single monolithic file would serialize the read stage)."""
    import os

    return os.path.join(cache_root, f"v{FIXTURE_VERSION}", sf_name, "documents_pdf")


def corpus_files(path: str) -> list:
    """Sorted parquet files for a corpus path (shard dir or single file)."""
    import os

    if os.path.isdir(path):
        return [
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        ]
    return [path]


def ensure_corpus_parquet(sf_dir: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    """Materialize the sharded corpus for a testdata sf dir; cached,
    deterministic.  Returns the shard directory (every consumer — Ray,
    pyarrow, DuckDB — reads directories/globs natively)."""
    import os
    import pyarrow.parquet as pq

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.001
    out_path = fixture_parquet_path(sf_name, cache_root)
    if os.path.isdir(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    n = sf_doc_count(sf)
    n_huge = max(1, n // 500)
    # bench-scale corpora get a genuinely multi-MB skew tail (60 pages with
    # ~50 KB of image bytes each ≈ 3 MB/doc) so the huge-document pool does
    # real work; test-scale corpora stay small and fast
    huge_pages = 24 if sf < 0.01 else 60
    huge_image_kb = 0 if sf < 0.01 else 50
    table = corpus_table(
        n, n_huge=n_huge, n_broken=3, huge_pages=huge_pages, huge_image_kb=huge_image_kb
    )
    # unique temp dir per writer: concurrent first-time callers (pytest and
    # check_oracles are a documented workflow pair) must not share a .tmp
    # path, and os.replace onto an existing DIRECTORY raises — whichever
    # writer loses the rename race discards its copy (content is
    # deterministic, so the winner's output is identical)
    import tempfile

    tmp = tempfile.mkdtemp(prefix=".tmp-", dir=os.path.dirname(out_path))
    for s, lo in enumerate(range(0, len(table), _SHARD_ROWS)):
        pq.write_table(
            table.slice(lo, _SHARD_ROWS),
            os.path.join(tmp, f"part-{s:05d}.parquet"),
            row_group_size=256,
        )
    try:
        os.replace(tmp, out_path)
    except OSError:
        import shutil

        if not os.path.isdir(out_path):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out_path


def warc_segments_path(sf_name: str, cache_root: str = "/tmp/pdfray_fixtures") -> str:
    import os

    return os.path.join(cache_root, f"v{FIXTURE_VERSION}", sf_name, "segments_warc")


def ensure_warc_segments(
    sf_dir: str, cache_root: str = "/tmp/pdfray_fixtures", docs_per_segment: int = 128
) -> str:
    """Materialize the SAME golden corpus as Common-Crawl-style .warc.gz
    segment files (cached, atomic rename): each document becomes a WARC
    response record wrapping the PDF bytes, so the WARC ingest path can be
    driver-checked byte-for-byte against the parquet goldens."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from .warc import build_warc

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_path = warc_segments_path(sf_name, cache_root)
    if os.path.isdir(out_path):
        return out_path
    corpus = ensure_corpus_parquet(sf_dir, cache_root)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".tmp-", dir=os.path.dirname(out_path))
    seg = 0
    for f in corpus_files(corpus):
        t = pq.read_table(f, columns=["url", "html"])
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        for lo in range(0, len(urls), docs_per_segment):
            recs = [
                (u, h, "response")
                for u, h in zip(
                    urls[lo : lo + docs_per_segment],
                    htmls[lo : lo + docs_per_segment],
                )
            ]
            with open(os.path.join(tmp, f"seg-{seg:05d}.warc.gz"), "wb") as fh:
                fh.write(build_warc(recs, gzip_members=True))
            seg += 1
    try:
        os.replace(tmp, out_path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_path
