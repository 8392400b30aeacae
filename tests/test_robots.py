"""robots.txt parsing + RFC 9309 matching."""

from pdf_extraction_spark.kernels.robots import is_allowed, parse_robots

ROBOTS = """
# policy
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Crawl-delay: 2.5

User-agent: badbot
User-agent: worsebot
Disallow: /

User-agent: goodbot
Disallow:

Sitemap: https://x.y/sitemap.xml
"""


def test_groups_delays_sitemaps():
    r = parse_robots(ROBOTS)
    assert r["sitemaps"] == ["https://x.y/sitemap.xml"]
    assert r["crawl_delay"]["*"] == 2.5
    assert set(r["groups"]) == {"*", "badbot", "worsebot", "goodbot"}


def test_longest_match_allow_wins():
    r = parse_robots(ROBOTS)
    assert is_allowed(r, "anybot", "/public/a")
    assert not is_allowed(r, "anybot", "/private/secret")
    assert is_allowed(r, "anybot", "/private/ok.html")


def test_agent_groups_and_empty_disallow():
    r = parse_robots(ROBOTS)
    assert not is_allowed(r, "BadBot", "/anything")  # case-insensitive
    assert not is_allowed(r, "worsebot", "/x")       # stacked agents share rules
    assert is_allowed(r, "goodbot", "/private/secret")  # empty Disallow


def test_wildcards_and_anchors():
    r = parse_robots(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\nAllow: /tmp1/xy"
    )
    assert not is_allowed(r, "b", "/doc.pdf")
    assert is_allowed(r, "b", "/doc.pdfx")   # $ anchors the end
    assert not is_allowed(r, "b", "/tmp9/x")
    assert is_allowed(r, "b", "/tmp1/xy")    # longer allow beats wildcard


def test_total_on_garbage_and_missing_groups():
    assert is_allowed({"groups": {}}, "b", "/") is True
    assert parse_robots(b"\xff\xfe\x00junk")["groups"] == {}
    assert parse_robots("")["sitemaps"] == []
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /\nUser-agent: *\nAllow: /")["groups"]["*"] == [
        ("allow", "/")
    ]


def test_anchored_wildcard_matches_at_end():
    """Review finding: leftmost-matching the final segment made '/*.php$'
    miss '/a.php.php' — the disallow was silently ignored."""
    from pdf_extraction_spark.kernels.robots import is_allowed, parse_robots

    rules = parse_robots("User-agent: *\nDisallow: /*.php$")
    assert not is_allowed(rules, "bot", "/a.php")
    assert not is_allowed(rules, "bot", "/a.php.php")   # recurring segment
    assert is_allowed(rules, "bot", "/a.php?x=1")       # not at end
    # consecutive wildcards are zero-width, not consume-to-end
    r2 = parse_robots("User-agent: *\nDisallow: /a**b")
    assert not is_allowed(r2, "bot", "/axb")
    # final-segment end anchor composes with middle segments
    r3 = parse_robots("User-agent: *\nDisallow: /*b*bc$")
    assert not is_allowed(r3, "bot", "/xbzbc")
    assert is_allowed(r3, "bot", "/xbzbcd")


def test_bom_prefixed_robots_parses():
    """Review finding: a UTF-8 BOM corrupted the first 'user-agent' key and
    dropped the whole group — every path on a disallow-all site allowed."""
    from pdf_extraction_spark.kernels.robots import is_allowed, parse_robots

    rules = parse_robots(b"\xef\xbb\xbfUser-agent: *\nDisallow: /")
    assert not is_allowed(rules, "bot", "/anything")
    rules2 = parse_robots("﻿User-agent: *\nDisallow: /x")
    assert not is_allowed(rules2, "bot", "/x/y")
