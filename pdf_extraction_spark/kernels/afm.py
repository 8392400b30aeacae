"""Core-font glyph metrics (Adobe Helvetica AFM widths, public data).

Real PDF producers position text runs by true glyph metrics; viewers use
the same metrics to advance the text cursor between consecutive show ops.
This module is the single metrics source shared by the fixture writer
(:mod:`pdf_write`, which positions split-run fragments at their metric
offsets) and the extractor (:mod:`pdf_extract`/:mod:`pdf_fonts`, which
advance the text matrix by them) — so the byte-identical goldens pin the
whole advance pipeline: width summation, /1000 scaling, Tc/Tw/Tz handling
and per-code /Widths//W lookup.

Widths are glyph-space units (1/1000 em) from the Adobe base-14 Helvetica
AFM, which Adobe publishes freely. Characters outside the table fall back
to the width of their NFD base character (accented Latin in real Helvetica
keeps the base letter's advance), then to :data:`DEFAULT_WIDTH`.
"""

from __future__ import annotations

import unicodedata

DEFAULT_WIDTH = 556

# Helvetica.afm character widths, ASCII 32-126
_ASCII = (
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
)

HELVETICA_WIDTHS: dict[str, int] = {
    chr(32 + i): w for i, w in enumerate(_ASCII)
}
HELVETICA_WIDTHS.update({
    " ": 278,   # nbspace = space
    "•": 350,   # bullet (the list-item marker fixtures emit)
    "–": 556, "—": 1000,  # en/em dash
    "‘": 222, "’": 222, "“": 333, "”": 333,
    "°": 400, "·": 278, "×": 584, "÷": 584,
    "ß": 611, "æ": 889, "Æ": 1000,
    "ø": 611, "Ø": 778,
})

_cache: dict[str, int] = {}


def char_width(ch: str) -> int:
    """Glyph-space width (1/1000 em) of one character in Helvetica."""
    w = HELVETICA_WIDTHS.get(ch)
    if w is not None:
        return w
    w = _cache.get(ch)
    if w is None:
        base = unicodedata.normalize("NFD", ch)[0]
        w = HELVETICA_WIDTHS.get(base, DEFAULT_WIDTH)
        _cache[ch] = w
    return w


def text_units(s: str) -> int:
    """Total glyph-space advance of a string (no Tc/Tw), units of 1/1000."""
    return sum(map(char_width, s))
