"""Part-level attribution of suite mismatches (VERDICT r4 item 7).

The driver compares suite queries as one frame; on a hash mismatch the
suite name alone doesn't say WHICH of its 8-13 parts drifted.
``tools/check_oracles.attribute_parts`` bisects the already-collected rows
by the ``part`` column — these tests force mismatches and assert the right
part (and only that part) is named.
"""

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "check_oracles",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "check_oracles.py",
)
check_oracles = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracles)

COLS = ["part", "k", "v_str", "v_num"]


def _rows(part, n, offset=0):
    return [(part, f"key{i}|col", f"val{i + offset}", None) for i in range(n)]


def test_forced_value_mismatch_names_only_the_drifted_part():
    spark_rows = _rows("pricing_summary", 3) + _rows("band_join", 2) + _rows("top_orders", 4)
    oracle_rows = _rows("pricing_summary", 3) + _rows("band_join", 2, offset=7) + _rows("top_orders", 4)
    bad = check_oracles.attribute_parts(COLS, spark_rows, COLS, oracle_rows)
    assert [(p, na, nb, heq) for p, na, nb, heq in bad] == [("band_join", 2, 2, False)]


def test_forced_rowcount_mismatch_reports_counts():
    spark_rows = _rows("pdf_toc", 5) + _rows("html_toc", 3)
    oracle_rows = _rows("pdf_toc", 4) + _rows("html_toc", 3)
    bad = check_oracles.attribute_parts(COLS, spark_rows, COLS, oracle_rows)
    assert bad == [("pdf_toc", 5, 4, False)]


def test_part_missing_entirely_on_one_side():
    spark_rows = _rows("sitemap_urls", 2)
    oracle_rows = _rows("sitemap_urls", 2) + _rows("robots_allowed", 3)
    bad = check_oracles.attribute_parts(COLS, spark_rows, COLS, oracle_rows)
    assert bad == [("robots_allowed", 0, 3, False)]


def test_matching_suites_attribute_nothing():
    rows = _rows("feed_entries", 4) + _rows("meta_refresh", 2)
    assert check_oracles.attribute_parts(COLS, rows, COLS, list(rows)) == []


def test_non_suite_results_return_none():
    cols = ["url", "extracted_text"]
    rows = [("u1", "t1")]
    assert check_oracles.attribute_parts(cols, rows, cols, rows) is None


def test_row_order_insensitive():
    spark_rows = _rows("warc_http_meta", 4)
    oracle_rows = list(reversed(spark_rows))
    assert check_oracles.attribute_parts(COLS, spark_rows, COLS, oracle_rows) == []
