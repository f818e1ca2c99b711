"""Crypto scalar functions: RC4 vectors, password pad, algorithm round trips."""
import pytest

from pdfray.core import crypt


def test_rc4_known_vectors():
    # public RC4 test vectors (RFC 6229 family)
    assert crypt.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert crypt.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert crypt.rc4(b"Secret", b"Attack at dawn").hex() == "45a01f645fc35b383552544b9bf5"


def test_rc4_symmetric_and_inplace():
    key = b"\x01\x02\x03\x04\x05"
    data = bytes(range(64))
    enc = crypt.rc4(key, data)
    assert crypt.rc4(key, enc) == data
    buf = bytearray(b"xx" + data + b"yy")
    crypt.rc4_inplace(key, buf, 2, len(data))
    assert bytes(buf[2:-2]) == enc
    assert buf[:2] == b"xx" and buf[-2:] == b"yy"


def test_pad_password():
    padded = crypt.pad_password("")
    assert padded == crypt.PADDING
    padded = crypt.pad_password("abc")
    assert padded[:3] == b"abc" and padded[3:] == crypt.PADDING[3:]
    with pytest.raises(NotImplementedError):
        crypt.pad_password("pässword")  # non-ASCII rejected like the reference


def test_user_password_round_trip():
    """Writer-side Algorithm 3/5 produce entries the reader authenticates."""
    from pdfray.sources.pdfwriter import Encryption

    enc = Encryption(user_password="", owner_password="owner7")
    padded = crypt.pad_password("")
    key = crypt.compute_encryption_key(
        padded, enc.o_entry, enc.permission, enc.file_id, enc.length_bits // 8
    )
    assert key == enc.key
    assert crypt.authenticate_user_password(padded, key, enc.file_id, enc.u_entry)
    # wrong password must fail
    padded_bad = crypt.pad_password("nope")
    key_bad = crypt.compute_encryption_key(
        padded_bad, enc.o_entry, enc.permission, enc.file_id, enc.length_bits // 8
    )
    assert not crypt.authenticate_user_password(padded_bad, key_bad, enc.file_id, enc.u_entry)


def test_object_key_lengths():
    key5 = b"\x01" * 5
    assert len(crypt.object_encryption_key(key5, 7, 0)) == 10  # 5+5 < 16
    key16 = b"\x02" * 16
    assert len(crypt.object_encryption_key(key16, 7, 0)) == 16  # capped at 16


def test_wrong_user_password_hits_reference_notimplemented_gap():
    """A document whose user password doesn't authenticate falls through to
    owner-password auth, which the reference leaves unimplemented
    (Tokeniser.cs:810-864 NotImplementedException) — this engine reproduces
    the gap as a recorded per-row error, never a crash."""
    import random

    from pdfray.core.extract import extract_document
    from pdfray.sources.fixtures import SNIPPETS, render_content, _font_body
    from pdfray.sources.pdfwriter import Encryption, PdfBuilder

    enc = Encryption(user_password="right", owner_password="own")
    b = PdfBuilder(encryption=enc)
    frags = [[("Tf", "F1", 12), ("Td", 100, 700), ("Tj", SNIPPETS["en"][0])]]
    content = render_content(frags, "WinAnsiEncoding", b)
    cid = b.add_stream(content)
    fid = b.add(_font_body("WinAnsiEncoding"))
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    b.add_encrypt_dict()
    data = b.finish_classic(cat)

    ok = extract_document(data, password="right")
    assert ok.error is None and ok.text

    bad = extract_document(data, password="wrong")
    assert bad.error is not None
    assert "owner password authentication is not implemented" in bad.error
    assert bad.text == ""
