"""Property-based tests (SURVEY.md §5 item 3): extraction is total (never
raises), offsets are in-bounds, and spans exactly tile the text — for
arbitrary, including hostile, inputs. Pure-kernel tests, no Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.kernels.dispatch import extract_document
from pdf_extraction_spark.kernels.html_extract import extract_html
from pdf_extraction_spark.kernels.pdf_extract import extract_pdf
from pdf_extraction_spark.sources.warc import parse_warc_bytes

RESULT_KEYS = {"text", "spans", "n_elements", "method", "error", "links",
               "headings", "meta"}


def check_result_shape(res):
    assert set(res.keys()) == RESULT_KEYS
    assert isinstance(res["text"], str)
    assert res["n_elements"] == len(res["spans"])
    blocks = res["text"].split("\n\n") if res["text"] else []
    assert len(blocks) == len(res["spans"])
    for (etype, page, start, end, bbox, conf, level, parent), blk in zip(res["spans"], blocks):
        assert 0 <= start <= end <= len(res["text"])
        assert res["text"][start:end] == blk
        assert isinstance(page, int) and len(bbox) == 4


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_dispatch_total_on_random_bytes(payload):
    check_result_shape(extract_document(payload))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=4096))
def test_html_total_on_random_text(text):
    check_result_shape(extract_html(text))


# tag-soup generator: random nestings of real tags, unbalanced on purpose
_tags = st.sampled_from(
    ["p", "div", "main", "nav", "h1", "h2", "li", "td", "a", "table",
     "figure", "script", "style", "aside", "footer", "span", "br"]
)
_frag = st.one_of(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
    _tags.map(lambda t: f"<{t}>"),
    _tags.map(lambda t: f"</{t}>"),
    _tags.map(lambda t: f"<{t} class='x'"),  # unterminated tag
    st.sampled_from(["<!--", "-->", "&amp;", "&bogus;", "<!DOCTYPE html>", "<![CDATA[x]]>"]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_frag, max_size=60).map("".join))
def test_html_total_on_tag_soup(soup):
    check_result_shape(extract_html(soup))


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_total_on_garbage_after_magic(tail):
    res = extract_pdf(b"%PDF-1.7\n" + tail)
    check_result_shape(res)
    assert res["method"] == "pdf"


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_warc_parser_total(data):
    rows = parse_warc_bytes(b"WARC/1.0\r\n" + data)
    assert isinstance(rows, list)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_warc_parser_total_on_corrupt_gzip(data):
    rows = parse_warc_bytes(b"\x1f\x8b" + data)
    assert isinstance(rows, list)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=6000))
@settings(max_examples=120, deadline=None)
def test_recursive_chunks_invariants(text):
    """Recursive separator chunker (reference splitter semantics,
    complete_multimodal_rag_evaluation.py:33-48): chunks are in-bounds
    contiguous substrings within size, cover the text, overlap bounded."""
    from pdf_extraction_spark.kernels.chunking import (
        CHUNK_OVERLAP, CHUNK_SIZE, recursive_chunks,
    )

    ch = recursive_chunks(text)
    if not text:
        assert ch == []
        return
    assert ch[0][0] == 0 and ch[-1][1] == len(text)
    for a, b in ch:
        assert 0 <= a < b <= len(text) or (a, b) == (0, len(text))
        assert b - a <= CHUNK_SIZE
    for (a1, b1), (a2, b2) in zip(ch, ch[1:]):
        assert a1 < a2 <= b1          # ordered, no gaps
        assert b1 - a2 <= CHUNK_OVERLAP


# table-soup generator: table markup with random spans, unbalanced on purpose
_tbl_frag = st.one_of(
    st.text(alphabet="ab ", max_size=8),
    st.sampled_from(["<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
                     "<th>", "</th>"]),
    st.integers(min_value=0, max_value=2000).map(
        lambda n: f"<td colspan={n}>"
    ),
    st.integers(min_value=0, max_value=2000).map(
        lambda n: f"<td rowspan='{n}'>"
    ),
    st.sampled_from(["<td colspan=abc>", "<table><table>", "</td></td>"]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_tbl_frag, max_size=80).map("".join))
def test_table_grid_invariants_on_soup(soup):
    """extract_html_tables is total, and every emitted grid is coherent:
    unique (row, col) anchors, non-negative positions, spans within the
    clamp, anchors inside the reported grid bounds."""
    from pdf_extraction_spark.kernels.html_extract import extract_html_tables

    tables = extract_html_tables(soup)
    assert isinstance(tables, list)
    for t in tables:
        anchors = set()
        assert t["n_rows"] >= 1 and t["n_cols"] >= 1
        for c in t["cells"]:
            key = (c["row"], c["col"])
            assert key not in anchors
            anchors.add(key)
            assert 0 <= c["row"] < t["n_rows"]
            assert 0 <= c["col"] < t["n_cols"]
            assert 1 <= c["rowspan"] <= 1000
            assert 1 <= c["colspan"] <= 1000


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_outline_total_on_garbage(tail):
    from pdf_extraction_spark.kernels.pdf_extract import extract_pdf_outline

    out = extract_pdf_outline(b"%PDF-1.5\n" + tail)
    assert isinstance(out, list)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_source_parsers_total_on_garbage(data):
    """sitemap / feed / robots parsers are total and shape-stable on
    arbitrary bytes."""
    from pdf_extraction_spark.kernels.robots import is_allowed, parse_robots
    from pdf_extraction_spark.sources.feeds import parse_feed
    from pdf_extraction_spark.sources.sitemap import parse_sitemap

    sm = parse_sitemap(data)
    assert set(sm) == {"kind", "entries"} and isinstance(sm["entries"], list)
    fd = parse_feed(data)
    assert set(fd) == {"kind", "title", "entries"}
    rb = parse_robots(data)
    assert set(rb) == {"groups", "crawl_delay", "sitemaps"}
    assert isinstance(is_allowed(rb, "bot", "/x"), bool)


_rb_frag = st.one_of(
    st.sampled_from(["User-agent: *", "User-agent: a", "Disallow: /x",
                     "Allow: /x/y", "Disallow:", "Crawl-delay: 1",
                     "Sitemap: https://x/s.xml", "# comment", "junk line",
                     "Disallow: /*.pdf$", "Allow: /tmp*/x"]),
    st.text(alphabet="abc:/*$ ", max_size=20),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_rb_frag, max_size=30).map("\n".join),
       st.text(alphabet="/abcxyz.*", max_size=30))
def test_robots_matcher_total_on_rule_soup(robots, path):
    from pdf_extraction_spark.kernels.robots import is_allowed, parse_robots

    assert isinstance(is_allowed(parse_robots(robots), "bot", path), bool)
