"""Payload dispatch: sniff the binary payload and route to the right kernel.

The reference selects its pipeline by file extension / CLI flag
(hybrid_docling_gpt4_processor.py:664-675); at corpus scale we sniff the
``html`` binary column instead (SURVEY.md S1): ``%PDF-`` magic → PDF kernel,
else HTML kernel. Total — never raises.
"""

from __future__ import annotations

from .html_extract import extract_html
from .pdf_extract import extract_pdf

PDF_MAGIC = b"%PDF-"

# Bytes that mark non-textual payloads; a high ratio ⇒ binary junk, not HTML.
_NONTEXT = bytes(b for b in range(0x20) if b not in (0x09, 0x0A, 0x0D))


_WS_BYTES = b" \t\n\r\x0b\x0c"  # exactly bytes.lstrip()'s whitespace set
_GUNZIP_CAP = 256 << 20  # 256 MiB inflated: far above any real web page


def _binary_ratio(sample) -> float:
    if not isinstance(sample, bytes):
        # zero-copy Arrow path hands a memoryview: the ≤4 KiB gate-window
        # copy + C translate is ~4x cheaper than a numpy LUT pass at these
        # sizes (measured; frombuffer/fancy-index overhead dominates)
        sample = bytes(sample)
    if not sample:
        return 0.0
    # single pass: drop the junk bytes, compare lengths (identical count to
    # summing per-byte .count() but 29x less scanning)
    junk = len(sample) - len(sample.translate(None, _NONTEXT))
    # ESC opening an ISO-2022 shift (\x1b$ or \x1b() is TEXT, not junk: an
    # ISO-2022-JP page that alternates ASCII and JIS word-by-word is ~13%
    # ESC bytes and tripped this gate before reaching the charset sniff.
    # Real binary junk pays the discount on only 2/256 of its ESC bytes.
    if junk:
        junk -= sample.count(b"\x1b$") + sample.count(b"\x1b(")
    return junk / len(sample)


def extract_document(payload) -> dict:
    """Extract one document (``bytes``, ``memoryview`` from the zero-copy
    Arrow batch path, or ``str``); returns the common record shape
    ``{text, spans, n_elements, method, error}``."""
    if payload is None:
        return {"text": "", "spans": [], "n_elements": 0, "method": "empty", "error": "null payload", "links": [], "headings": [], "meta": {}}
    if isinstance(payload, str):
        payload = payload.encode("utf-8", errors="replace")
    # transparently unwrap a payload that arrived still gzip-compressed
    # (crawl plumbing that didn't decode Content-Encoding); bad gzip falls
    # through to the binary-ratio gate below
    if payload[:2] == b"\x1f\x8b":
        import gzip
        import io

        try:
            # streamed with a hard cap: gzip.decompress of a ~1 MB bomb can
            # allocate tens of GB before any except clause sees it — at
            # corpus scale that is an executor OOM, not a row error
            with gzip.GzipFile(fileobj=io.BytesIO(bytes(payload))) as gz:
                inflated = gz.read(_GUNZIP_CAP + 1)
            if len(inflated) <= _GUNZIP_CAP:
                payload = inflated
            # over the cap: keep the compressed bytes — the binary-ratio
            # gate below classifies them as a binary payload with an error
        except Exception:
            pass
    # sniff without copying the payload (lstrip() would duplicate every doc)
    i = 0
    n = len(payload)
    while i < n and payload[i] in _WS_BYTES:
        i += 1
    head = bytes(payload[i : i + 8])
    if head.startswith(PDF_MAGIC):
        # the PDF object layer works on bytes (find/regex/slices throughout)
        return extract_pdf(payload if isinstance(payload, bytes) else bytes(payload))
    if _binary_ratio(payload[:4096]) > 0.10:
        return {"text": "", "spans": [], "n_elements": 0, "method": "binary",
                "error": "non-text payload (binary-ratio gate)", "links": [],
                "headings": [],
                "meta": {}}
    return extract_html(payload)
