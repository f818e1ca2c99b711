"""Golden lexer corpus — port of the reference's TokeniserTest.

The byte corpus covers every token class and edge form
(`PdfParserTest/TokeniserTest.cs:13-128`): bool, int/decimal edge forms
(+.2, 34., -0), names, literal/hex strings incl. nesting and escaped
brackets, comments (incl. inside arrays), nested dicts, streams with and
without FlateDecode and with an indirect /Length, null, obj/endobj wrapping
and N G R references.  Expected strings are re-derived for this engine's
repr; numeric values are additionally asserted raw.
"""
import zlib
from decimal import Decimal

from pdfray.core.lexer import PdfLexer
from pdfray.core.model import (
    ArrayToken,
    BoolToken,
    DictionaryToken,
    NameToken,
    NullToken,
    NumberToken,
    RefToken,
    StringToken,
)


def make_lexer(text: str, extra: bytes = b"") -> PdfLexer:
    # trailing 'Q' stops the number/ref lookahead without matching any token
    return PdfLexer(text.encode("latin-1") + extra + b"\nQ ")


def toks(lexer: PdfLexer, n: int):
    return [lexer.get_next_token() for _ in range(n)]


def test_bools():
    lx = make_lexer("false\ntrue false\n")
    t = toks(lx, 3)
    assert [x.value for x in t] == [False, True, False]
    assert t[0].to_repr() == "false"


def test_integers():
    lx = make_lexer("1 -2 00 +987654321\n")
    t = toks(lx, 4)
    assert [x.ivalue for x in t] == [1, -2, 0, 987654321]
    assert [x.to_repr() for x in t] == ["1", "-2", "0", "987654321"]


def test_decimals():
    # expected reprs mirror TokeniserTest.cs:29-37 (C# decimal formatting)
    lx = make_lexer("+123.4 34.5 34. +.2 .1 0.0 -.002 -3.62\n")
    t = toks(lx, 8)
    assert [x.to_repr() for x in t] == [
        "123.4", "34.5", "34", "0.2", "0.1", "0", "-0.002", "-3.62",
    ]
    # '34.' keeps integer form (divider<=10); '0.0' does not (two-digit scale)
    assert t[2].ivalue == 34
    assert t[5].ivalue is None
    assert t[3].decimal == Decimal("0.2")
    assert t[6].decimal == Decimal("-0.002")


def test_names():
    lx = make_lexer("/name /n \n")
    t = toks(lx, 2)
    assert [x.value for x in t] == ["name", "n"]


def test_strings_adjacent_and_spaced():
    lx = make_lexer("(string)<112233445566778899AABCCDDEEFF>()<>\n")
    t = toks(lx, 4)
    assert t[0].value == "string"
    assert t[1].value == "<112233445566778899AABCCDDEEFF>"
    assert t[1].hex_bytes is None  # odd digit count
    assert t[2].value == ""
    assert t[3].value == "<>"
    assert t[3].hex_bytes == b""

    lx = make_lexer(" (string) <112233445566778899AABBCCDDEEFF> ( ) < > \n")
    t = toks(lx, 4)
    assert t[1].hex_bytes == bytes.fromhex("112233445566778899AABBCCDDEEFF")
    assert t[2].value == " "
    assert t[3].value == "< >"


def test_string_multiline_nested_escaped():
    lx = make_lexer(
        "(a string can be\r\n on 2 lines or more) (a string can contain ()matched brackets)\n"
    )
    t = toks(lx, 2)
    assert t[0].value == "a string can be\r\n on 2 lines or more"
    assert t[1].value == "a string can contain ()matched brackets"

    # escapes are stored raw at token level (Token.cs:219-222)
    lx = make_lexer("(a string with one open \\( bracket) (one closing \\) bracket)\n")
    t = toks(lx, 2)
    assert t[0].value == "a string with one open \\( bracket"
    assert t[1].value == "one closing \\) bracket"


def test_comments():
    lx = make_lexer("1%comment\n2\n")
    assert [x.ivalue for x in toks(lx, 2)] == [1, 2]
    lx = make_lexer("1 %comment \n%comment\n % comment \n 2\n")
    assert [x.ivalue for x in toks(lx, 2)] == [1, 2]


def test_arrays():
    for text in (
        " [ /someName false -0 (string) ] [ [ (array in array) ] true ] \n",
        "[/someName false -0(string)][[(array in array)]true]\n",
    ):
        lx = make_lexer(text)
        a1, a2 = toks(lx, 2)
        assert isinstance(a1, ArrayToken) and len(a1) == 4
        assert a1[0].value == "someName"
        assert a1[1].value is False
        assert a1[2].ivalue == 0
        assert a1[3].value == "string"
        assert isinstance(a2[0], ArrayToken)
        assert a2[0][0].value == "array in array"
        assert a2[1].value is True


def test_array_comments():
    lx = make_lexer("[/someName%\n]\n")
    a = lx.get_next_token()
    assert len(a) == 1 and a[0].value == "someName"
    lx = make_lexer("[ /someName % comment \n /anotherName]\n")
    a = lx.get_next_token()
    assert [x.value for x in a] == ["someName", "anotherName"]


def test_dicts():
    for text in (" << /Name1 123 >> \n", "<</Name1 124>>\n"):
        lx = make_lexer(text)
        d = lx.get_next_token()
        assert isinstance(d, DictionaryToken)
        assert d["Name1"].ivalue in (123, 124)
        assert not d.is_stream

    lx = make_lexer(
        "<< /Name1 125 /Name2 [ (string) (array) 126 ] /Name3 "
        "<< /subName1 127 /subName2 true >> /Name4 (another string) /Name5 <112233EE> >>\n"
    )
    d = lx.get_next_token()
    assert d["Name1"].ivalue == 125
    assert [t.value if isinstance(t, StringToken) else t.ivalue for t in d["Name2"]] == [
        "string", "array", 126,
    ]
    assert d["Name3"]["subName1"].ivalue == 127
    assert d["Name3"]["subName2"].value is True
    assert d["Name4"].value == "another string"
    assert d["Name5"].hex_bytes == bytes.fromhex("112233EE")


def test_dict_compact():
    lx = make_lexer(
        "<</Name1 223/Name2[(string)(array)224]/Name3<</subName1 225/subName2 true>>"
        "/Name4(another string)/Name5<222233EE>>>\n"
    )
    d = lx.get_next_token()
    assert d["Name1"].ivalue == 223
    assert d["Name3"]["subName1"].ivalue == 225
    assert d["Name5"].hex_bytes == bytes.fromhex("222233EE")


def test_stream_plain():
    text = "<</Length 17>>\r\nstream\r\n01234567890123456\r\nendstream\r\n"
    lx = make_lexer(text)
    d = lx.get_next_token()
    assert d.is_stream and d.stream_length == 17
    data = lx.data[d.stream_start : d.stream_start + d.stream_length]
    assert bytes(data) == b"01234567890123456"


def test_stream_flate():
    payload = b"flate encoded data!"
    compressed = zlib.compress(payload)
    head = f"<< /Length {len(compressed)} /Filter [ /FlateDecode ] >>\r\nstream\r\n".encode()
    lx = PdfLexer(head + compressed + b"\r\nendstream\r\n")
    d = lx.get_next_token()
    assert d.is_stream and d.stream_length == len(compressed)
    lx.fill_stream_from_dict(d)
    assert bytes(lx.stream) == payload


def test_null():
    lx = make_lexer("null\n")
    assert isinstance(lx.get_next_token(), NullToken)


def test_objects_and_refs():
    lx = make_lexer(" 1  0  obj \r\n(a string) \r\nendobj\n")
    t = lx.get_next_token()
    assert isinstance(t, StringToken) and t.value == "a string" and t.obj_id == (1, 0)
    assert t.to_repr() == '"a string" obj 1 0'

    lx = make_lexer("2  1 obj(a string2)endobj\n")
    t = lx.get_next_token()
    assert t.value == "a string2" and t.obj_id == (2, 1)

    lx = make_lexer("3  2 R\n")
    t = lx.get_next_token()
    assert isinstance(t, RefToken) and t.obj_id == (3, 2)


def test_stream_indirect_length_repair():
    # /Length held by a not-yet-resolvable ref -> brute endstream scan derives 8
    lx = make_lexer(
        "7 0 obj <</Length 8 0 R>>stream\n12345678\nendstream endobj 8 0 obj 9 endobj\n"
    )
    d = lx.get_next_token()
    assert isinstance(d, DictionaryToken) and d.obj_id == (7, 0)
    assert d.stream_length == 8
    assert bytes(lx.data[d.stream_start : d.stream_start + 8]) == b"12345678"
    n = lx.get_next_token()
    assert n.ivalue == 9 and n.obj_id == (8, 0)


def test_duplicate_dict_keys_merge_to_array():
    # Token.cs:473-480 bug-compat
    lx = make_lexer("<</K 1/K 2/K 3>>\n")
    d = lx.get_next_token()
    arr = d["K"]
    assert isinstance(arr, ArrayToken)
    assert [t.ivalue for t in arr] == [1, 2, 3]
