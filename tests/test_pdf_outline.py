"""PDF /Outlines (bookmark tree) extraction — the get_toc() surface of the
reference's PyMuPDF stack (advanced_layout_extractor.py uses fitz documents;
doc.get_toc() is the public form of §12.3.3 outline walking)."""

from pdf_extraction_spark.kernels import pdf_write
from pdf_extraction_spark.kernels.pdf_extract import (
    extract_pdf,
    extract_pdf_outline,
)

OUTLINE = [
    (1, "Intro", 0),
    (2, "Background", 0),
    (2, "Scope (a)", 1),
    (3, "Deep \\ one", 1),
    (1, "Methods", 1),
]
TWO_PAGES = "alpha beta gamma delta " * 250  # > 54 lines -> 2 pages
WANT = [{"level": lv, "title": t, "page": p} for lv, t, p in OUTLINE]


def test_outline_roundtrip_across_layout_variants():
    for kw in (
        {},
        {"compress": True},
        {"xref_stream": True},
        {"objstm": True},
        {"columns": 2},
        {"rotate": 90},
        {"encoding": "type0"},
    ):
        pdf = pdf_write.build_pdf(TWO_PAGES, outline=OUTLINE, **kw)
        assert extract_pdf_outline(pdf) == WANT, kw


def test_outline_titles_decrypt_under_standard_handler():
    for kw in (
        {"encrypt": "aes-128"},
        {"encrypt": "rc4-40"},
        {"encrypt": "rc4-128", "compress": True},
        {"encrypt": "aes-128", "objstm": True},  # container-covered strings
    ):
        pdf = pdf_write.build_pdf(TWO_PAGES, outline=OUTLINE, **kw)
        assert extract_pdf_outline(pdf) == WANT, kw


def test_outline_does_not_change_extracted_text():
    plain = extract_pdf(pdf_write.build_pdf(TWO_PAGES))
    with_ol = extract_pdf(pdf_write.build_pdf(TWO_PAGES, outline=OUTLINE))
    assert with_ol["error"] is None
    assert with_ol["text"] == plain["text"]


def test_no_outline_yields_empty():
    assert extract_pdf_outline(pdf_write.build_pdf("x y z")) == []
    assert extract_pdf_outline(b"not a pdf at all") == []
    assert extract_pdf_outline(pdf_write.build_truncated_pdf("words here")) == []


def test_dest_page_clamped_to_document():
    pdf = pdf_write.build_pdf("one two three", outline=[(1, "T", 7)])
    assert extract_pdf_outline(pdf) == [{"level": 1, "title": "T", "page": 0}]


def test_sibling_cycle_terminates():
    """A corrupt /Next pointing back at an earlier sibling must not loop."""
    pdf = pdf_write.build_pdf("one two three", outline=[(1, "AA", 0), (1, "BB", 0)])
    # items are plain text (uncompressed dict objects): rewriting BB's /Prev
    # into /Next (same byte length -> xref offsets stay valid) makes
    # AA -> BB -> AA
    patched = pdf.replace(b"(BB) /Parent", b"(BB) /Parent", 1)
    i = patched.find(b"(BB)")
    assert i != -1
    j = patched.find(b"/Prev", i)
    assert j != -1
    patched = patched[:j] + b"/Next" + patched[j + 5 :]
    got = extract_pdf_outline(patched)
    # bounded: each node visited once
    assert [x["title"] for x in got] == ["AA", "BB"]


def test_named_destinations_resolve_through_name_tree():
    """/Dest as a name STRING resolved via the catalog /Names → /Dests tree
    (§7.7.4): interior /Kids nodes (n > 2 splits into two leaves), string
    keys decrypted under the standard handler, ObjStm packing."""
    for kw in (
        {},
        {"compress": True},
        {"objstm": True},
        {"encrypt": "aes-128"},
        {"encrypt": "rc4-128", "xref_stream": True},
    ):
        pdf = pdf_write.build_pdf(TWO_PAGES, outline=OUTLINE,
                                  outline_named=True, **kw)
        assert extract_pdf_outline(pdf) == WANT, kw


def test_named_destination_single_leaf_and_missing_name():
    two = OUTLINE[:2]
    pdf = pdf_write.build_pdf(TWO_PAGES, outline=two, outline_named=True)
    assert extract_pdf_outline(pdf) == WANT[:2]
    # a dangling name (tree key rewritten, same length) degrades to page -1
    broken = pdf.replace(b"(d1) [", b"(dX) [", 1)
    got = extract_pdf_outline(broken)
    assert got[0]["page"] == 0 and got[1]["page"] == -1


def test_attachments_roundtrip_across_variants():
    """Embedded files (§7.11.4): /Names /EmbeddedFiles tree → Filespec →
    /EF stream, across compression/ObjStm/encryption and coexisting with
    named-dest /Names entries. Binary payloads survive byte-identically."""
    from pdf_extraction_spark.kernels.pdf_extract import (
        extract_pdf_attachments,
    )

    atts = [("data.csv", b"a,b\n1,2\n"), ("notes (v2).txt", b"hello \x00world")]
    text = "alpha beta gamma " * 50
    for kw in (
        {},
        {"compress": True},
        {"objstm": True},
        {"encrypt": "aes-128"},
        {"encrypt": "rc4-40", "xref_stream": True},
        {"outline": [(1, "T", 0)], "outline_named": True},
    ):
        pdf = pdf_write.build_pdf(text, attachments=atts, **kw)
        got = extract_pdf_attachments(pdf)
        assert [(g["filename"], g["data"]) for g in got] == atts, kw
        assert got[0]["size"] == len(atts[0][1])
    assert extract_pdf_attachments(pdf_write.build_pdf(text)) == []
    assert extract_pdf_attachments(b"junk") == []


def test_acroform_fields_roundtrip():
    """AcroForm /Fields → (dotted name, /FT, /V) across layout/crypt
    variants; special characters in names/values survive."""
    from pdf_extraction_spark.kernels.pdf_extract import (
        extract_pdf_form_fields,
    )

    fields = [("customer_name", "Ada Lovelace"), ("amount (net)", "1,234.50")]
    text = "alpha beta " * 40
    for kw in ({}, {"compress": True}, {"objstm": True},
               {"encrypt": "aes-128"}, {"attachments": [("a.txt", b"x")]}):
        pdf = pdf_write.build_pdf(text, acroform=fields, **kw)
        got = extract_pdf_form_fields(pdf)
        assert [(g["name"], g["value"]) for g in got] == fields, kw
        assert got[0]["field_type"] == "Tx"
    assert extract_pdf_form_fields(pdf_write.build_pdf(text)) == []
    assert extract_pdf_form_fields(b"garbage") == []


def test_named_dest_tree_lexicographic_past_ten_items():
    """Review finding: name-tree keys were emitted in NUMERIC order, so
    n > 10 leaves were unsorted ("d10" < "d2" lexicographically) and
    /Limits wrong per §7.7.4. Keys must now be globally sorted across both
    leaves with limits = each leaf's first/last key — and the n <= 10
    layout must be byte-for-byte what the numeric order produced."""
    import re

    items = [(1, "t%d" % i, 0) for i in range(12)]
    pdf = pdf_write.build_pdf("body text", outline=items, outline_named=True)
    assert [o["title"] for o in extract_pdf_outline(pdf)] == [
        "t%d" % i for i in range(12)
    ]
    raw = pdf.decode("latin-1")
    leaves = re.findall(
        r"/Limits \[\((d\d+)\) \((d\d+)\)\] /Names \[(.*?)\] >>", raw
    )
    assert len(leaves) == 2
    allkeys = []
    for lo, hi, body in leaves:
        keys = re.findall(r"\((d\d+)\) \[", body)
        assert keys == sorted(keys)
        assert (lo, hi) == (keys[0], keys[-1])
        allkeys += keys
    assert allkeys == sorted(allkeys) and len(allkeys) == 12


def test_objstm_outline_past_256_packed_objects():
    """Review finding: the xref-stream index column was hard-coded to one
    byte, so an ObjStm packing > 256 dict objects raised OverflowError.
    The /W third field now widens (and stays 1 byte below the threshold,
    keeping every existing fixture byte-identical)."""
    items = [(1, "t%d" % i, 0) for i in range(300)]
    pdf = pdf_write.build_pdf("hello world", objstm=True, outline=items)
    assert b"/W [1 4 2]" in pdf
    got = extract_pdf_outline(pdf)
    assert [o["title"] for o in got] == ["t%d" % i for i in range(300)]
    assert "hello world" in extract_pdf(pdf)["text"]
    small = pdf_write.build_pdf("hello world", objstm=True, outline=items[:5])
    assert b"/W [1 4 1]" in small
