"""Unit tests for the font-encoding module: ToUnicode CMap parsing (both
bfrange forms, code widths), AGL glyph-name resolution, and decoder
fallback order."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.kernels.pdf_fonts import (
    FontDecoder,
    glyph_to_char,
    parse_tounicode,
)


def test_bfchar_and_width():
    data = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar\n<41> <0058>\n<42> <00590059>\nendbfchar"
    )
    width, cmap = parse_tounicode(data)
    assert width == 1
    assert cmap[0x41] == "X"
    assert cmap[0x42] == "YY"  # ligature-style multi-unit destination


def test_bfrange_incrementing():
    data = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange\n<0001> <0003> <0041>\nendbfrange"
    )
    width, cmap = parse_tounicode(data)
    assert width == 2
    assert (cmap[1], cmap[2], cmap[3]) == ("A", "B", "C")


def test_bfrange_array_destination():
    data = b"1 beginbfrange\n<0005> <0007> [<0061> <00E9> <20AC>]\nendbfrange"
    width, cmap = parse_tounicode(data)
    assert (cmap[5], cmap[6], cmap[7]) == ("a", "é", "€")


def test_bfrange_surrogate_pair_destination():
    data = b"1 beginbfchar\n<0001> <D83DDE00>\nendbfchar"  # 😀 as UTF-16BE
    _, cmap = parse_tounicode(data)
    assert cmap[1] == "\U0001f600"


def test_malformed_cmap_is_total():
    for junk in (b"", b"beginbfchar <zz> <qq> endbfchar", b"\x00\xff" * 50):
        width, cmap = parse_tounicode(junk)
        assert width in (1, 2) and isinstance(cmap, dict)


def test_glyph_names():
    assert glyph_to_char("a") == "a"
    assert glyph_to_char("space") == " "
    assert glyph_to_char("eacute") == "é"
    assert glyph_to_char("germandbls") == "ß"
    assert glyph_to_char("Euro") == "€"
    assert glyph_to_char("uni0041") == "A"
    assert glyph_to_char("u01F600") == "\U0001f600"
    assert glyph_to_char("notarealglyphname") is None


def test_decoder_priority_and_fallback():
    dec = FontDecoder(1, cmap={0x41: "Z"}, diffs={0x42: "Q"})
    # cmap wins over diffs wins over latin-1 passthrough
    assert dec.decode(b"ABC") == "ZQC"
    assert dec.decode(b"\xe9") == "\xe9"  # latin-1 passthrough


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_parse_tounicode_total(data):
    width, cmap = parse_tounicode(data)
    assert width in (1, 2)


def test_base_encodings():
    from pdf_extraction_spark.kernels.pdf_fonts import build_font_decoder

    resolve = lambda v: v
    win = build_font_decoder({"Subtype": "Type1", "Encoding": "WinAnsiEncoding"},
                             resolve, None)
    assert win is not None
    # cp1252 0x80-0x9F region: Euro, curly quotes, em dash
    assert win.decode(b"\x80 \x93x\x94 \x97") == "€ “x” —"
    assert win.decode(b"caf\xe9") == "café"  # high range matches latin-1

    mac = build_font_decoder(
        {"Subtype": "Type1", "Encoding": {"BaseEncoding": "MacRomanEncoding"}},
        resolve, None)
    assert mac is not None
    assert mac.decode(b"caf\x8e") == "café"  # mac_roman 0x8E = e-acute

    # Differences override the base encoding
    both = build_font_decoder(
        {"Subtype": "Type1",
         "Encoding": {"BaseEncoding": "WinAnsiEncoding", "Differences": [0x80, "A"]}},
        resolve, None)
    assert both.decode(b"\x80\x93") == "A“"


def test_winansi_roundtrip_via_spliced_font():
    """Integration: a simple-font PDF whose font object names
    /MacRomanEncoding must decode high bytes through mac_roman."""
    from pdf_extraction_spark.kernels.pdf_extract import extract_pdf
    from pdf_extraction_spark.kernels.pdf_write import build_pdf

    pdf = build_pdf("PLACEHOLDER")
    pdf = pdf.replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /MacRomanEncoding >>",
    )
    pdf = pdf.replace(b"PLACEHOLDER", b"caf\x8e pie")  # same byte length
    # splices shifted the xref offsets; break startxref so the parser takes
    # its object-scan fallback (exercised elsewhere) instead
    pdf = pdf.replace(b"startxref", b"startxre_")
    out = extract_pdf(pdf)
    assert "café pie" in out["text"]


def test_fast2_unmapped_surrogate_pair_matches_per_code_path():
    """A 2-byte-code show string containing unmapped high+low surrogate
    code units must decode per-code (two U+FFFD), not pair into one astral
    char through the utf-16-be fast path."""
    from pdf_extraction_spark.kernels.pdf_fonts import FontDecoder

    dec = FontDecoder(code_width=2, cmap={0x0041: "A"})
    assert dec._fast2  # map touches no surrogates: fast path armed
    b = b"\x00\x41\xd8\x01\xdc\x37\x00\x41"  # A, <high><low>, A
    assert dec.decode(b) == "A��A"
