"""Spark-vs-oracle parity on sub-K-word documents (review finding).

The synthetic-fixture builders index the first K split words of each
document (``w[3]`` etc.); before the ``first_words`` pad guard a short
document raised IndexError inside the Arrow batch — killing the whole
Spark job — while the DuckDB oracle silently NULL-propagated and kept
emitting rows. Both sides now pad with ``'pad'`` (Python) /
``coalesce(w[i], 'pad')`` (SQL); every patched builder must produce
row-identical output against its oracle over a corpus of 1..4-word
documents that the driver testdata never contains.
"""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_spark.operators import docmeta, elements, links, textops
from pdf_extraction_spark.operators.common import first_words

TEXTS = ["solo", "two words", "three little words", "now four words here"]


@pytest.fixture(scope="module")
def short_sf(tmp_path_factory):
    sf = tmp_path_factory.mktemp("shortdocs") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(TEXTS))),
            "text": TEXTS,
            "lang": ["en"] * len(TEXTS),
            "source": [f"src{i}" for i in range(len(TEXTS))],
            "n_chars": [len(t) for t in TEXTS],
        }),
        sf / "documents.parquet",
    )
    return str(sf)


def test_first_words_pads_and_truncates():
    assert first_words("a b c", 2) == ["a", "b"]
    assert first_words("a", 4) == ["a", "pad", "pad", "pad"]
    assert first_words("", 2) == ["", "pad"]


PAIRS = [
    (docmeta.q_pdf_toc, docmeta.SQL_PDF_TOC),
    (docmeta.q_html_toc, docmeta.SQL_HTML_TOC),
    (docmeta.q_jsonld_meta, docmeta.SQL_JSONLD_META),
    (docmeta.q_opengraph_cards, docmeta.SQL_OPENGRAPH_CARDS),
    (docmeta.q_pdf_attachments, docmeta.SQL_PDF_ATTACHMENTS),
    (docmeta.q_pdf_form_fields, docmeta.SQL_PDF_FORM_FIELDS),
    (links.q_image_alt_pairs, links.SQL_IMAGE_ALT_PAIRS),
    (links.q_sitemap_urls, links.SQL_SITEMAP_URLS),
    (links.q_robots_allowed, links.SQL_ROBOTS_ALLOWED),
    (links.q_feed_entries, links.SQL_FEED_ENTRIES),
    (textops.q_normalize_text, textops.SQL_NORMALIZE_TEXT),
    (elements.q_table_cells, elements.SQL_TABLE_CELLS),
    (elements.q_html_table_cells, elements.SQL_HTML_TABLE_CELLS),
]


@pytest.mark.parametrize("fn,sql", PAIRS, ids=[p[0].__name__ for p in PAIRS])
def test_short_doc_parity(spark, short_sf, fn, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{short_sf}/documents.parquet')"
    )
    srows = sorted(
        tuple(r) for r in fn(spark, short_sf).collect()
    )
    orows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == orows, set(srows) ^ set(orows)
    assert srows, fn.__name__  # the fixture must actually emit rows
