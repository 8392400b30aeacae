"""HTML <table> → (row, col) cell-grid decomposition (the HTML twin of the
PDF ruled-grid path; reference parity: pdf_vector_utils.py:169-192 builds the
same row/col matrix from detected boundaries)."""

from pdf_extraction_spark.kernels.html_extract import (
    extract_html,
    extract_html_tables,
)


def _grid(tables, idx=0):
    return {(c["row"], c["col"]): c for c in tables[idx]["cells"]}


def test_plain_grid():
    t = extract_html_tables(
        "<table><tr><th>a</th><th>b</th></tr><tr><td>c</td><td>d</td></tr></table>"
    )
    assert len(t) == 1
    assert t[0]["n_rows"] == 2 and t[0]["n_cols"] == 2
    g = _grid(t)
    assert g[(0, 0)]["text"] == "a" and g[(0, 0)]["header"]
    assert g[(1, 1)]["text"] == "d" and not g[(1, 1)]["header"]


def test_rowspan_slides_later_rows():
    t = extract_html_tables(
        "<table><tr><td rowspan=2>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    )
    g = _grid(t)
    # c slides right past the slot claimed by a's rowspan
    assert g[(1, 1)]["text"] == "c"
    assert (1, 0) not in g
    assert g[(0, 0)]["rowspan"] == 2


def test_colspan_advances_cursor():
    t = extract_html_tables(
        "<table><tr><td colspan=2>a</td><td>b</td></tr></table>"
    )
    g = _grid(t)
    assert g[(0, 2)]["text"] == "b"
    assert t[0]["n_cols"] == 3


def test_combined_spans_whatwg_example():
    # 3x3 with a 2x2 block in the top-left
    t = extract_html_tables(
        "<table>"
        "<tr><td rowspan=2 colspan=2>big</td><td>r0</td></tr>"
        "<tr><td>r1</td></tr>"
        "<tr><td>x</td><td>y</td><td>z</td></tr>"
        "</table>"
    )
    g = _grid(t)
    assert g[(0, 2)]["text"] == "r0"
    assert g[(1, 2)]["text"] == "r1"
    assert [g[(2, c)]["text"] for c in range(3)] == ["x", "y", "z"]


def test_rowspan_clips_at_last_row():
    t = extract_html_tables(
        "<table><tr><td rowspan=99>a</td><td>b</td></tr></table>"
    )
    assert _grid(t)[(0, 0)]["rowspan"] == 1
    assert t[0]["n_rows"] == 1


def test_span_attr_clamped_and_lenient():
    t = extract_html_tables(
        '<table><tr><td colspan="abc">a</td><td colspan="0">b</td>'
        '<td colspan="5000">c</td></tr></table>'
    )
    g = _grid(t)
    assert g[(0, 0)]["colspan"] == 1
    assert g[(0, 1)]["colspan"] == 1
    assert g[(0, 2)]["colspan"] == 1000


def test_implied_cell_and_row_closes():
    # no </td>/</tr> anywhere — the next <td>/<tr> implies the close
    t = extract_html_tables(
        "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    )
    g = _grid(t)
    assert g[(0, 1)]["text"] == "b" and g[(1, 0)]["text"] == "c"
    assert t[0]["n_rows"] == 2


def test_unclosed_table_flushed_at_eof():
    t = extract_html_tables("<table><tr><td>a</td><td>b")
    assert _grid(t)[(0, 1)]["text"] == "b"


def test_nested_table_independent_and_document_order():
    t = extract_html_tables(
        "<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>"
    )
    assert len(t) == 2
    # open-tag order: outer first even though inner closes first
    assert _grid(t, 0)[(0, 0)]["text"] == "outer"
    assert _grid(t, 1)[(0, 0)]["text"] == "inner"
    assert t[0]["table_idx"] == 0 and t[1]["table_idx"] == 1


def test_dropped_subtree_text_excluded():
    t = extract_html_tables(
        "<table><tr><td>keep<script>var x=1;</script></td></tr></table>"
    )
    assert _grid(t)[(0, 0)]["text"] == "keep"


def test_chrome_flag_and_empty_tables_skipped():
    t = extract_html_tables(
        "<nav><table><tr><td>menu</td></tr></table></nav>"
        "<table></table>"
        "<table><tr><td>body</td></tr></table>"
    )
    assert len(t) == 2
    assert t[0]["chrome"] is True and t[1]["chrome"] is False
    assert t[1]["cells"][0]["text"] == "body"


def test_whitespace_normalized_in_cells():
    t = extract_html_tables("<table><tr><td>  a \n  b\t</td></tr></table>")
    assert _grid(t)[(0, 0)]["text"] == "a b"


def test_main_content_extraction_unchanged_by_capture():
    html = (
        "<html><body><main><p>A paragraph of real content long enough to"
        " clear the minimum block gate.</p>"
        "<table><tr><td>cellone</td><td>celltwo</td></tr></table>"
        "</main></body></html>"
    )
    res = extract_html(html)
    assert res["error"] is None
    assert "A paragraph of real content" in res["text"]


def test_malformed_never_raises():
    for payload in (b"<table><td", b"<table><tr><td colspan>", b"\xff\xfe junk",
                    "<table>" * 50):
        assert isinstance(extract_html_tables(payload), list)
