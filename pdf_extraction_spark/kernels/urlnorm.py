"""Outlink URL resolution + normalization (RFC 3986, stdlib only).

Webtext pipelines need canonical outlink targets for crawl frontiers,
link-graph features, and URL-level dedup. The reference has no link
extraction at all (its inputs are local files); this follows the crawler
conventions Common-Crawl-style corpora use:

* resolve relative references against the page URL (``urllib.parse.urljoin``
  implements the RFC 3986 merge/remove-dot-segments algorithm);
* keep only http(s) targets — ``javascript:``, ``mailto:``, ``data:``,
  ``tel:`` and friends are not fetchable documents;
* normalize scheme/host case, drop fragments and default ports, ensure a
  non-empty path.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_KEEP_SCHEMES = ("http", "https")
_DEFAULT_PORTS = {"http": 80, "https": 443}


def resolve_link(base_url: str, href: str) -> str | None:
    """Absolute, normalized target of ``href`` found on ``base_url``;
    None when the target is not a fetchable http(s) document."""
    href = (href or "").strip()
    if not href or href.startswith("#"):
        return None
    try:
        absolute = urljoin(base_url, href)
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _KEEP_SCHEMES or not parts.hostname:
        return None
    host = parts.hostname.lower()
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        host = "%s:%d" % (host, port)
    return urlunsplit((scheme, host, parts.path or "/", parts.query, ""))
