"""RSS 2.0 / Atom feed source."""

import gzip

from pdf_extraction_spark.sources.feeds import parse_feed, read_feeds

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>My Blog</title>
<item><title>Post &amp; One</title><link>https://b.example/p1</link>
<pubDate>Mon, 06 Jan 2025 10:00:00 GMT</pubDate><guid>p1</guid></item>
<item><title><![CDATA[Second <post>]]></title><link>https://b.example/p2</link></item>
<item><description>no link no title - skipped</description></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>A Feed</title>
<entry><title>E1</title><link rel="alternate" href="https://a.example/e1"/>
<updated>2025-02-01T00:00:00Z</updated><id>urn:e1</id></entry>
</feed>"""


def test_rss_entries_cdata_entities():
    r = parse_feed(RSS)
    assert r["kind"] == "rss" and r["title"] == "My Blog"
    assert [e["link"] for e in r["entries"]] == [
        "https://b.example/p1", "https://b.example/p2"]
    assert r["entries"][0]["title"] == "Post & One"
    assert r["entries"][0]["published"] == "Mon, 06 Jan 2025 10:00:00 GMT"
    assert r["entries"][0]["entry_id"] == "p1"
    assert r["entries"][1]["title"] == "Second <post>"


def test_atom_href_links_and_dates():
    a = parse_feed(ATOM)
    assert a["kind"] == "atom" and a["title"] == "A Feed"
    e = a["entries"][0]
    assert e["link"] == "https://a.example/e1"
    assert e["published"] == "2025-02-01T00:00:00Z"
    assert e["entry_id"] == "urn:e1"


def test_total_on_garbage():
    assert parse_feed(b"\x1f\x8bbad") == {
        "kind": "unknown", "title": None, "entries": []}
    assert parse_feed("")["entries"] == []
    assert parse_feed("<rss><channel><item><title>cut off")["entries"] == []
    assert parse_feed(gzip.compress(RSS.encode()))["entries"][0]["entry_id"] == "p1"


def test_read_feeds_on_executors(spark, tmp_path):
    p1 = tmp_path / "a.xml"
    p2 = tmp_path / "b.xml"
    p1.write_text(RSS)
    p2.write_text(ATOM)
    rows = read_feeds(spark, [str(p1), str(p2)]).collect()
    assert len(rows) == 3
    by_link = {r["link"]: r for r in rows}
    assert by_link["https://a.example/e1"]["kind"] == "atom"
    assert by_link["https://b.example/p1"]["feed_title"] == "My Blog"


def test_nested_entities_not_double_unescaped():
    """'&amp;lt;' is the literal text '&lt;' — decoding &amp; first used
    to turn it into '<' (review finding; same table in sitemap.py)."""
    from pdf_extraction_spark.sources.feeds import parse_feed
    from pdf_extraction_spark.sources.sitemap import parse_sitemap

    feed = (
        "<rss><channel><item><title>Use &amp;lt;table&amp;gt; tags</title>"
        "<link>https://x/a</link></item></channel></rss>"
    )
    entry = parse_feed(feed)["entries"][0]
    assert entry["title"] == "Use &lt;table&gt; tags"
    sm = parse_sitemap(
        "<urlset><url><loc>https://x/?q=a&amp;amp;b</loc></url></urlset>"
    )
    assert sm["entries"][0]["loc"] == "https://x/?q=a&amp;b"


def test_atom_entry_link_prefers_alternate_over_replies():
    """RFC 4287: rel='alternate' (or no rel) is the article link; Blogger
    lists rel='replies'/'self' links first (review finding)."""
    from pdf_extraction_spark.sources.feeds import parse_feed

    feed = (
        "<feed><entry><title>post</title>"
        "<link rel='replies' href='https://x/comments'/>"
        "<link rel='self' href='https://x/self'/>"
        "<link rel='alternate' href='https://x/post'/>"
        "</entry><entry><title>bare</title>"
        "<link rel='edit' href='https://x/edit'/>"
        "<link href='https://x/norel'/>"
        "</entry></feed>"
    )
    entries = parse_feed(feed)["entries"]
    assert entries[0]["link"] == "https://x/post"
    assert entries[1]["link"] == "https://x/norel"
