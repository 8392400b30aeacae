"""Sitemap XML source: total parse of urlset/sitemapindex payloads and the
executor-side Spark reader."""

import gzip

from pdf_extraction_spark.sources.sitemap import parse_sitemap, read_sitemaps

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://x.y/a</loc><lastmod>2025-01-02</lastmod><priority>0.8</priority></url>
<url><loc><![CDATA[https://x.y/b?q=1&amp;r=2]]></loc><changefreq>daily</changefreq></url>
<url><loc></loc></url>
<url><loc>https://x.y/c</loc><priority>abc</priority></url>
</urlset>"""


def test_urlset_fields_cdata_entities_and_junk_priority():
    r = parse_sitemap(XML)
    assert r["kind"] == "urlset"
    locs = [e["loc"] for e in r["entries"]]
    assert locs == ["https://x.y/a", "https://x.y/b?q=1&r=2", "https://x.y/c"]
    assert r["entries"][0]["priority"] == 0.8
    assert r["entries"][1]["changefreq"] == "daily"
    assert r["entries"][2]["priority"] is None  # junk priority degrades


def test_nested_entity_not_double_unescaped():
    # '&amp;lt;' is a LITERAL '&lt;' in the URL; decoding &amp; first used
    # to turn it into '<' (double-unescape). Order now matches feeds.py.
    r = parse_sitemap(
        "<urlset><url><loc>https://x.y/?q=&amp;lt;tag&amp;gt;</loc></url>"
        "<url><loc>https://x.y/?a=1&amp;b=2</loc></url></urlset>"
    )
    assert [e["loc"] for e in r["entries"]] == [
        "https://x.y/?q=&lt;tag&gt;",
        "https://x.y/?a=1&b=2",
    ]


def test_sitemapindex_and_gzip_and_garbage():
    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://x.y/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://x.y/s2.xml</loc></sitemap></sitemapindex>"
    )
    assert idx["kind"] == "sitemapindex"
    assert [e["loc"] for e in idx["entries"]] == [
        "https://x.y/s1.xml", "https://x.y/s2.xml"]
    assert parse_sitemap(gzip.compress(XML.encode()))["entries"][0]["loc"] == "https://x.y/a"
    assert parse_sitemap(b"\x1f\x8bcorrupt") == {"kind": "unknown", "entries": []}
    assert parse_sitemap(b"") == {"kind": "unknown", "entries": []}
    assert parse_sitemap("<urlset><url><loc>https://x.y/trunc")["entries"] == []


def test_read_sitemaps_on_executors(spark, tmp_path):
    p1 = tmp_path / "a.xml"
    p2 = tmp_path / "b.xml.gz"
    p1.write_text(XML)
    p2.write_bytes(gzip.compress(
        b"<urlset><url><loc>https://z.w/only</loc></url></urlset>"))
    df = read_sitemaps(spark, [str(p1), str(p2)])
    rows = df.collect()
    assert len(rows) == 4
    by_loc = {r["loc"]: r for r in rows}
    assert by_loc["https://x.y/a"]["priority"] == 0.8
    assert by_loc["https://z.w/only"]["kind"] == "urlset"
