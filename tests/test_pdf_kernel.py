"""Unit + property tests for the pure PDF writer/parser pair."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.kernels.pdf_extract import extract_pdf
from pdf_extraction_spark.kernels.pdf_write import build_pdf, build_truncated_pdf, wrap_words

TEXT = (
    "the fast key order sort table scan merge part window small hash scan join "
    "order batch batch batch stream spark window window dup " * 6
).strip()


def test_single_column_roundtrip():
    r = extract_pdf(build_pdf(TEXT))
    assert r["text"] == TEXT
    assert r["error"] is None
    assert [s[0] for s in r["spans"]] == ["paragraph"]


def test_title_classified():
    r = extract_pdf(build_pdf(TEXT, title="My Grand Title"))
    assert r["text"] == "My Grand Title\n\n" + TEXT
    assert r["spans"][0][0] == "title"


def test_two_column_reading_order():
    r = extract_pdf(build_pdf(TEXT, columns=2))
    assert r["text"] == TEXT


def test_flate_and_xref_stream():
    r = extract_pdf(build_pdf(TEXT, compress=True, xref_stream=True))
    assert r["text"] == TEXT
    assert r["error"] is None


def test_multipage_roundtrip():
    long = ("alpha beta gamma delta epsilon zeta eta theta " * 200).strip()
    r = extract_pdf(build_pdf(long))
    assert r["text"] == long


def test_grid_table_detected():
    rows = [["name", "value"], ["alpha", "one"], ["beta", "two"]]
    r = extract_pdf(build_pdf("", table_rows=rows))
    assert all(s[0] == "table" for s in r["spans"])
    assert r["text"] == "name value\n\nalpha one\n\nbeta two"


def test_truncated_degrades():
    r = extract_pdf(build_truncated_pdf(TEXT))
    assert isinstance(r["text"], str)  # no crash; partial output allowed


def test_span_offsets_and_bbox():
    r = extract_pdf(build_pdf(TEXT, title="T Heading Line"))
    for (elem, page, s, e, bbox) in r["spans"]:
        assert r["text"][s:e]
        assert len(bbox) == 4
        assert all(0.0 <= v <= 1.0 for v in bbox)


def test_wrap_words_rejoin_identity():
    for width in (10, 34, 60, 200):
        assert " ".join(wrap_words(TEXT, width)) == TEXT


@given(st.binary(max_size=3000))
@settings(max_examples=100, deadline=None)
def test_totality_random_bytes(payload):
    r = extract_pdf(b"%PDF-1.5\n" + payload)
    assert isinstance(r["text"], str)


@given(
    st.lists(
        st.text(alphabet="abcdefghij ()\\", min_size=1, max_size=12).map(str.strip).filter(bool),
        min_size=1,
        max_size=120,
    ),
    st.sampled_from([1, 2]),
    st.booleans(),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(words, columns, compress, xref_stream):
    text = " ".join(words)
    pdf = build_pdf(text, columns=columns, compress=compress, xref_stream=xref_stream)
    r = extract_pdf(pdf)
    assert r["text"] == text
