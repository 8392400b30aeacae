"""Deterministic minimal PDF writer for fixture corpora.

Generates small, valid PDF payloads (FIXTURES.md "PDF payload variants")
entirely from stdlib: classic xref tables or cross-reference streams,
uncompressed or FlateDecode content streams, single- or two-column layouts,
optional oversized title line and ruled table grids. The companion parser
(:mod:`pdf_extract`) must reconstruct the original text byte-identically in
reading order.

This replaces the reference pipeline's dependence on ad-hoc local PDFs
(advanced_layout_extractor.py:1165) with seeded synthetic documents.
"""

from __future__ import annotations

import math
import re
import struct
import zlib

from . import afm

PAGE_W = 612.0
PAGE_H = 792.0
MARGIN = 72.0
BODY_SIZE = 10.0
TITLE_SIZE = 18.0
LEADING = 12.0
LINE_CHARS = 60          # max chars per wrapped line (single column)
COL_LINE_CHARS = 34      # max chars per wrapped line (two-column)
COL2_X = 320.0
LINES_PER_COL = 54


def _esc(s: str) -> str:
    """Escape a literal PDF string; non-ASCII bytes as octal escapes."""
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ord(ch) < 32 or ord(ch) > 126:
            for b in ch.encode("utf-8"):
                out.append("\\%03o" % b)
        else:
            out.append(ch)
    return "".join(out)


def _enc_literal(s: str) -> str:
    """Default string token: literal (…) with UTF-8 octal escapes."""
    return "(" + _esc(s) + ")"


def _show_plain(enc):
    """Show-op builder: one string token + ``Tj``."""
    return lambda s: enc(s) + " Tj"


def _emit_plain(show):
    """Line emitter: one BT block, one show op."""
    return lambda size, x, y, text: (
        "BT /F1 %g Tf %g %g Td %s ET" % (size, x, y, show(text))
    )


def _emit_split(enc, tw_applies: bool, metrics=afm.HELVETICA):
    """Line emitter for the split-run layout real producers emit (style
    changes, shaping boundaries): each line becomes two fragments flowing
    inside one BT block — the viewer advances between them by glyph
    metrics — plus a third fragment positioned absolutely at the metric
    offset the writer computes from the same public Helvetica AFM table the
    extractor uses (:mod:`afm`). Every 4th line adds Tc char spacing, every
    other 4th Tw word spacing (1-byte-code encodings only, per spec), so
    byte-identical extraction pins the full §9.4.4 displacement formula.
    """

    def emit(size: float, x: float, y: float, text: str) -> str:
        if len(text) < 9:
            return "BT /F1 %g Tf %g %g Td %s Tj ET" % (size, x, y, enc(text))
        i, j = len(text) // 3, 2 * len(text) // 3
        f1, f2, f3 = text[:i], text[i:j], text[j:]
        h = len(text) % 4
        tc = 0.25 if h == 1 else 0.0
        tw = 1.5 if (h == 2 and tw_applies) else 0.0
        pre = f1 + f2
        adv = metrics.text_units(pre) / 1000.0 * size
        adv += len(pre) * tc + pre.count(" ") * tw
        ops = "BT /F1 %g Tf %g %g Td " % (size, x, y)
        if tc:
            ops += "%g Tc " % tc
        if tw:
            ops += "%g Tw " % tw
        ops += "%s Tj %s Tj ET" % (enc(f1), enc(f2))
        if tc or tw:
            ops += " 0 Tc 0 Tw"
        ops += " BT /F1 %g Tf %g %g Td %s Tj ET" % (size, x + adv, y, enc(f3))
        return ops

    return emit


def _show_kerned(enc):
    """Show-op builder for the kerned-word layout real producers emit for
    justified text (and subset fonts whose space glyph was never embedded):
    words go into one ``TJ`` array separated by negative kern offsets in
    glyph-space thousandths — the space character never appears in any
    string token. The parser must read each qualifying kern back as exactly
    one space (pdf_extract.KERN_SPACE_TJ)."""

    def show(s: str) -> str:
        words = s.split(" ")
        if len(words) < 2:
            return enc(s) + " Tj"
        parts = [enc(words[0])]
        for w in words[1:]:
            # -250..-350: all past the space threshold, deterministic mix
            parts.append("%d" % -(250 + (len(w) % 3) * 50))
            parts.append(enc(w))
        return "[" + " ".join(parts) + "] TJ"

    return show


# display->content affine inverses for the /Rotate fixture variants; the
# content MediaBox is landscape (PAGE_H x PAGE_W) for 90/270 so the page
# DISPLAYS as the standard portrait layout after rotation
_ROT_INV = {
    90: (0.0, 1.0, -1.0, 0.0, PAGE_H, 0.0),
    180: (-1.0, 0.0, 0.0, -1.0, PAGE_W, PAGE_H),
    270: (0.0, -1.0, 1.0, 0.0, 0.0, PAGE_W),
}
# Form-XObject fixture frame: page content lives in a form-local space
# shifted by this offset and is placed back by the form's /Matrix — the
# extractor must compose the matrix into the CTM to recover display
# coordinates (LaTeX/stamping-tool layout).
FORM_DX, FORM_DY = 48.0, -36.0
_TD_OP = re.compile(r"Tf ([\d.]+) ([\d.]+) Td")
_ML_OP = re.compile(r"([\d.]+) ([\d.]+) (m|l)\b")
_CM_OP = re.compile(r"q ([\d.]+) 0 0 ([\d.]+) ([\d.]+) ([\d.]+) cm")
# a (…) literal string token — the writer escapes every interior paren, so
# one alternation of "non-special byte or escape pair" spans the literal
_LIT_TOK = re.compile(r"\((?:[^\\()]|\\.)*\)")


def _sub_ops(pattern: re.Pattern, repl, ops: str) -> str:
    """``pattern.sub`` applied OUTSIDE (…) string literals only: shown text
    matching an operator shape (e.g. "12 34 m" inside a paragraph) must not
    be rewritten as page geometry. Hex strings need no exclusion — none of
    the op regexes can match inside pure-hex content."""
    if "(" not in ops:
        return pattern.sub(repl, ops)
    out, pos = [], 0
    for m in _LIT_TOK.finditer(ops):
        out.append(pattern.sub(repl, ops[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(pattern.sub(repl, ops[pos:]))
    return "".join(out)


def _map_page_ops(page_ops: str, affine: tuple) -> str:
    """Re-express display-space content ops through an affine inverse (used
    for /Rotate pages and Form-XObject local frames): Td translations become
    full Tm matrices, path points and image-placement CTMs are mapped
    through the same transform. Substitutions skip (…) literals so document
    TEXT that happens to look like "12 34 m" survives byte-identically."""
    a, b, c, d, e, f = affine

    def pt(x: float, y: float) -> tuple[float, float]:
        return a * x + c * y + e, b * x + d * y + f

    def td(m: re.Match) -> str:
        x, y = pt(float(m.group(1)), float(m.group(2)))
        return "Tf %g %g %g %g %g %g Tm" % (a, b, c, d, x, y)

    def ml(m: re.Match) -> str:
        x, y = pt(float(m.group(1)), float(m.group(2)))
        return "%g %g %s" % (x, y, m.group(3))

    def cm(m: re.Match) -> str:
        sx, sy = float(m.group(1)), float(m.group(2))
        ex, ey = float(m.group(3)), float(m.group(4))
        ca, cb, cc, cd = sx * a, sx * b, sy * c, sy * d
        cex, cey = pt(ex, ey)
        return "q %g %g %g %g %g %g cm" % (ca, cb, cc, cd, cex, cey)

    out = _sub_ops(_TD_OP, td, page_ops)
    out = _sub_ops(_CM_OP, cm, out)
    return _sub_ops(_ML_OP, ml, out)


class _Type0Encoder:
    """Subset-font emulation (the layout most modern producers emit): every
    distinct character gets a 2-byte glyph code in first-seen-sorted order,
    text shows as hex strings, and a /ToUnicode CMap (bfrange for contiguous
    runs, bfchar for strays) carries the way back to Unicode. The companion
    parser must reverse it byte-identically (pdf_fonts.parse_tounicode)."""

    def __init__(self, charset: set[str], metrics: afm.Metrics = afm.HELVETICA):
        # code 0 is conventionally .notdef; start at 1
        self.code = {ch: i + 1 for i, ch in enumerate(sorted(charset))}
        # the family whose AFM advances the layout engine positions runs
        # by; declared /W widths MUST come from the same table or split-run
        # gap inference drifts (sf1 scale-up found the Helvetica hard-code:
        # Courier x differences x split_runs first co-occurs at doc_id
        # 35409+, beyond every small-sf corpus)
        self.metrics = metrics

    def show(self, s: str) -> str:
        return "<" + "".join("%04X" % self.code[ch] for ch in s) + ">"

    def cmap_bytes(self) -> bytes:
        """Minimal ToUnicode CMap with both bfrange and bfchar sections."""
        items = sorted((c, ch) for ch, c in self.code.items())
        ranges: list[tuple[int, int, str]] = []  # (lo_code, hi_code, lo_char)
        chars: list[tuple[int, str]] = []
        i = 0
        while i < len(items):
            j = i
            while (
                j + 1 < len(items)
                and items[j + 1][0] == items[j][0] + 1
                and ord(items[j + 1][1]) == ord(items[j][1]) + 1
                and ord(items[j][1]) < 0xFFFF  # keep bfrange in the BMP
            ):
                j += 1
            if j > i:
                ranges.append((items[i][0], items[j][0], items[i][1]))
            else:
                chars.append(items[i])
            i = j + 1
        out = [
            b"/CIDInit /ProcSet findresource begin",
            b"12 dict begin begincmap",
            b"/CMapName /Adobe-Identity-UCS def /CMapType 2 def",
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange",
        ]
        for batch_start in range(0, len(ranges), 100):
            batch = ranges[batch_start : batch_start + 100]
            out.append(b"%d beginbfrange" % len(batch))
            for lo, hi, ch in batch:
                out.append(
                    b"<%04X> <%04X> <%s>" % (lo, hi, ch.encode("utf-16-be").hex().upper().encode())
                )
            out.append(b"endbfrange")
        for batch_start in range(0, len(chars), 100):
            batch = chars[batch_start : batch_start + 100]
            out.append(b"%d beginbfchar" % len(batch))
            for c, ch in batch:
                out.append(
                    b"<%04X> <%s>" % (c, ch.encode("utf-16-be").hex().upper().encode())
                )
            out.append(b"endbfchar")
        out += [b"endcmap CMapName currentdict /CMap defineresource pop end end"]
        return b"\n".join(out)

    def _w_array(self) -> str:
        """Real per-CID metrics (/W, array form) from the shared AFM table:
        codes are 1..N in sorted-charset order. One definition for BOTH the
        ToUnicode and the FontFile2 lane — the round-5 sf1 run already
        caught one declared-vs-layout width drift; don't reopen the class."""
        return " ".join(
            "%d" % self.metrics.char_width(ch)
            for ch, _ in sorted(self.code.items(), key=lambda kv: kv[1])
        )

    def font_objects(self, next_free: int):
        """(object-3 body, extra objects) for :func:`_assemble`."""
        desc, tounico = next_free, next_free + 1
        cmap = self.cmap_bytes()
        obj3 = (
            "<< /Type /Font /Subtype /Type0 /BaseFont /SUBSET+Synth "
            "/Encoding /Identity-H /DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>"
            % (desc, tounico)
        ).encode()
        warr = self._w_array()
        extra = {
            desc: (
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SUBSET+Synth "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 1000 "
                b"/W [1 [" + warr.encode() + b"]] >>"
            ),
            tounico: (
                b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
            ),
        }
        return obj3, extra


def _ttf_pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _ttf_checksum(b: bytes) -> int:
    b = _ttf_pad4(b)
    return sum(
        int.from_bytes(b[i : i + 4], "big") for i in range(0, len(b), 4)
    ) & 0xFFFFFFFF


def _cmap_format4(cps_gids: list[tuple[int, int]]) -> bytes:
    """Format-4 cmap subtable over sorted BMP (codepoint, gid) pairs.
    Segments are maximal runs where both advance by 1, so idDelta alone
    carries the mapping (idRangeOffset stays 0 throughout)."""
    segs: list[tuple[int, int, int]] = []  # (startCode, endCode, idDelta)
    i = 0
    while i < len(cps_gids):
        j = i
        while (
            j + 1 < len(cps_gids)
            and cps_gids[j + 1][0] == cps_gids[j][0] + 1
            and cps_gids[j + 1][1] == cps_gids[j][1] + 1
        ):
            j += 1
        cp0, g0 = cps_gids[i]
        segs.append((cp0, cps_gids[j][0], (g0 - cp0) & 0xFFFF))
        i = j + 1
    segs.append((0xFFFF, 0xFFFF, 1))  # required terminator maps FFFF->0
    n = len(segs)
    if 16 + 8 * n > 0xFFFF:
        # the subtable length and segCountX2 fields are uint16: a charset
        # of >8189 non-contiguous BMP runs cannot be a format-4 table —
        # raise like _DifferencesEncoder so callers fall back to plain
        # Type0 instead of dying in struct.pack
        raise ValueError("charset too fragmented for a format-4 cmap")
    sel = max(0, int(math.log2(n)))
    search = 2 ** sel * 2
    head = struct.pack(
        ">7H", 4, 16 + 8 * n, 0, 2 * n, search, sel, 2 * n - search
    )
    ends = struct.pack(">%dH" % n, *(s[1] for s in segs))
    starts = struct.pack(">%dH" % n, *(s[0] for s in segs))
    deltas = struct.pack(">%dH" % n, *(s[2] for s in segs))
    iros = b"\x00\x00" * n
    return head + ends + b"\x00\x00" + starts + deltas + iros


def _cmap_format12(cps_gids: list[tuple[int, int]]) -> bytes:
    groups: list[tuple[int, int, int]] = []
    i = 0
    while i < len(cps_gids):
        j = i
        while (
            j + 1 < len(cps_gids)
            and cps_gids[j + 1][0] == cps_gids[j][0] + 1
            and cps_gids[j + 1][1] == cps_gids[j][1] + 1
        ):
            j += 1
        groups.append((cps_gids[i][0], cps_gids[j][0], cps_gids[i][1]))
        i = j + 1
    body = b"".join(struct.pack(">3I", *g) for g in groups)
    return struct.pack(">HHIII", 12, 0, 16 + len(body), 0, len(groups)) + body


def build_subset_ttf(char_to_gid: dict[str, int]) -> bytes:
    """Deterministic minimal TrueType font program: sfnt directory with
    real checksums over ``head`` / ``maxp`` / ``cmap``, where cmap carries a
    (3,1) format-4 subtable (plus a (3,10) format-12 one when the charset
    leaves the BMP). Glyph outlines are irrelevant to text extraction, so
    none are emitted — exactly the part a parser must NOT depend on."""
    pairs = sorted((ord(ch), gid) for ch, gid in char_to_gid.items())
    bmp = [(cp, g) for cp, g in pairs if cp < 0xFFFF]
    astral = len(bmp) != len(pairs)
    subs: list[tuple[int, int, bytes]] = [(3, 1, _cmap_format4(bmp))]
    if astral:
        subs.append((3, 10, _cmap_format12(pairs)))
    hdr = struct.pack(">HH", 0, len(subs))
    recs = b""
    off = 4 + 8 * len(subs)
    bodies = b""
    for plat, enc, body in subs:
        recs += struct.pack(">HHI", plat, enc, off)
        off += len(body)
        bodies += body
    cmap = hdr + recs + bodies
    n_glyphs = max(char_to_gid.values(), default=0) + 1
    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0x00010000, 0, 0x5F0F3CF5,  # version, rev, csAdj, magic
        0, 1000,                                 # flags, unitsPerEm
        0, 0,                                    # created, modified
        0, 0, 1000, 1000,                        # xMin yMin xMax yMax
        0, 8,                                    # macStyle, lowestRecPPEM
        2, 0, 0,                                 # directionHint, locFmt, glyphFmt
    )
    maxp = struct.pack(">IH", 0x00005000, n_glyphs)  # version 0.5
    tables = sorted([(b"cmap", cmap), (b"head", head), (b"maxp", maxp)])
    n = len(tables)
    sel = int(math.log2(n))
    search = 2 ** sel * 16
    out = struct.pack(">IHHHH", 0x00010000, n, search, sel, n * 16 - search)
    data_off = 12 + 16 * n
    dir_entries = b""
    payload = b""
    for tag, body in tables:
        dir_entries += struct.pack(
            ">4sIII", tag, _ttf_checksum(body), data_off + len(payload), len(body)
        )
        payload += _ttf_pad4(body)
    return out + dir_entries + payload


class _Type0TTFEncoder(_Type0Encoder):
    """Identity-H subset font carrying NO /ToUnicode: the way back to
    Unicode exists only inside the embedded FontFile2's own ``cmap`` table
    (codepoint → gid, which the Identity mapping makes codepoint → code).
    The parser must walk DescendantFonts → FontDescriptor → FontFile2 and
    invert that table (pdf_fonts.parse_ttf_cmap) — VERDICT r4 item 4."""

    def __init__(self, charset, metrics: "afm.Metrics" = None):  # type: ignore[assignment]
        if metrics is None:
            metrics = afm.HELVETICA
        super().__init__(charset, metrics=metrics)
        # build the font program NOW so an over-fragmented charset raises
        # ValueError at construction, where build_pdf's fallback can catch
        # it — not later inside font_objects
        self._ttf = build_subset_ttf(self.code)

    def font_objects(self, next_free: int):
        desc, fdesc, ffile = next_free, next_free + 1, next_free + 2
        obj3 = (
            "<< /Type /Font /Subtype /Type0 /BaseFont /SUBSET+SynthTTF "
            "/Encoding /Identity-H /DescendantFonts [%d 0 R] >>" % desc
        ).encode()
        warr = self._w_array()
        ttf = self._ttf
        extra = {
            desc: (
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SUBSET+SynthTTF "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 1000 "
                b"/W [1 [" + warr.encode() + b"]] "
                b"/FontDescriptor %d 0 R >>" % fdesc
            ),
            fdesc: (
                b"<< /Type /FontDescriptor /FontName /SUBSET+SynthTTF "
                b"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 "
                b"/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 "
                b"/FontFile2 %d 0 R >>" % ffile
            ),
            ffile: (
                b"<< /Length %d /Length1 %d >>\nstream\n" % (len(ttf), len(ttf))
                + ttf + b"\nendstream"
            ),
        }
        return obj3, extra


# fixed named-glyph remaps for the /Differences variant (AGL names that are
# NOT single characters, so the parser's glyph table is really exercised)
_DIFF_FIXED = [("a", "a"), ("e", "e"), ("o", "o"), ("s", "s"), ("t", "t"),
               ("A", "uni0041")]
_DIFF_BASE = 128


class _DifferencesEncoder:
    """Simple-font /Encoding /Differences emulation: a handful of letters
    plus every non-ASCII character are remapped to codes >= 128 with glyph
    names (letter names and uniXXXX); remaining bytes stay ASCII. Documents
    whose non-ASCII charset overflows the 128 available codes raise
    ValueError (callers fall back to another encoding)."""

    def __init__(self, charset: set[str], metrics: afm.Metrics = afm.HELVETICA):
        self.metrics = metrics  # must match the layout engine's family
        self.code: dict[str, int] = {}
        names: list[tuple[int, str]] = []
        nxt = _DIFF_BASE
        for ch, name in _DIFF_FIXED:
            self.code[ch] = nxt
            names.append((nxt, name))
            nxt += 1
        for ch in sorted(c for c in charset if ord(c) > 126):
            if ch in self.code:
                continue
            if nxt > 255:
                raise ValueError("charset too large for a Differences remap")
            cp = ord(ch)
            name = "uni%04X" % cp if cp <= 0xFFFF else "u%06X" % cp
            self.code[ch] = nxt
            names.append((nxt, name))
            nxt += 1
        # contiguous from _DIFF_BASE: one leading code, then bare names
        self._names = names
        self._diff_array = "[%d %s]" % (
            _DIFF_BASE,
            " ".join("/" + n for _, n in names),
        )

    def show(self, s: str) -> str:
        out = []
        for ch in s:
            c = self.code.get(ch)
            if c is not None:
                out.append("\\%03o" % c)
            elif ch in "\\()":
                out.append("\\" + ch)
            elif 32 <= ord(ch) <= 126:
                out.append(ch)
            else:
                out.append("\\%03o" % ord(ch))  # control chars, never emitted
        return "(" + "".join(out) + ")"

    def _widths_entry(self) -> tuple[int, str]:
        # explicit /Widths covering ASCII passthrough and the remap range,
        # from the shared AFM table (remapped codes get the mapped char's
        # real metric)
        by_code = {c: ch for ch, c in self.code.items()}
        last = max([126] + list(by_code))
        widths = " ".join(
            "%d" % self.metrics.char_width(by_code.get(c, chr(c) if c <= 126 else " "))
            for c in range(32, last + 1)
        )
        return last, widths

    def font_objects(self, next_free: int):
        last, widths = self._widths_entry()
        obj3 = (
            "<< /Type /Font /Subtype /Type1 /BaseFont /%s "
            "/FirstChar 32 /LastChar %d /Widths [%s] "
            "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            "/Differences %s >> >>"
            % (self.metrics.name, last, widths, self._diff_array)
        ).encode()
        return obj3, {}


class _Type1BuiltinEncoder(_DifferencesEncoder):
    """Simple Type1 font whose remap table lives ONLY in the embedded
    FontFile program's built-in /Encoding vector: the font dict carries NO
    /Encoding, no /Differences and no /ToUnicode, so the parser's only way
    back to the remapped characters is reading the cleartext Type1 header
    and resolving its ``dup <code> /<name> put`` glyph names
    (pdf_fonts.parse_type1_encoding — VERDICT r4 "missing" item 2, the
    Type1 twin of the round-5 FontFile2 lane)."""

    def _type1_program(self) -> bytes:
        head = "\n".join(
            [
                "%!FontType1-1.0: SUBSET+SynthT1 001.001",
                "/FontName /SUBSET+SynthT1 def",
                "/PaintType 0 def",
                "/FontType 1 def",
                "/FontMatrix [0.001 0 0 0.001 0 0] readonly def",
                "/FontBBox {0 0 1000 1000} readonly def",
                "/Encoding 256 array",
                "0 1 255 {1 index exch /.notdef put} for",
            ]
            + ["dup %d /%s put" % (c, n) for c, n in self._names]
            + ["readonly def", "currentdict end", "currentfile eexec", ""]
        ).encode("ascii")
        # deterministic filler standing in for the eexec-encrypted private
        # area (charstrings are irrelevant to text extraction), then the
        # standard 512-zero + cleartomark trailer
        private = bytes((i * 37 + 11) & 0xFF for i in range(256))
        trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
        self._lengths = (len(head), len(private), len(trailer))
        return head + private + trailer

    def font_objects(self, next_free: int):
        last, widths = self._widths_entry()
        fdesc, ffile = next_free, next_free + 1
        t1 = self._type1_program()
        l1, l2, l3 = self._lengths
        obj3 = (
            "<< /Type /Font /Subtype /Type1 /BaseFont /SUBSET+SynthT1 "
            "/FirstChar 32 /LastChar %d /Widths [%s] "
            "/FontDescriptor %d 0 R >>" % (last, widths, fdesc)
        ).encode()
        extra = {
            fdesc: (
                b"<< /Type /FontDescriptor /FontName /SUBSET+SynthT1 "
                b"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 "
                b"/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 "
                b"/FontFile %d 0 R >>" % ffile
            ),
            ffile: (
                b"<< /Length %d /Length1 %d /Length2 %d /Length3 %d >>\nstream\n"
                % (len(t1), l1, l2, l3)
                + t1
                + b"\nendstream"
            ),
        }
        return obj3, extra


def build_bare_cff(names: list[tuple[int, str]]) -> bytes:
    """Minimal bare CFF (Type1C) font program whose built-in Encoding
    (format 0) and charset (format 0) carry the code→glyph-name remap —
    the binary twin of the cleartext Type1 ``/Encoding`` vector. Glyph
    names present in the CFF standard-strings table use their standard
    SID; the rest (uniXXXX) go through the String INDEX. CharStrings are
    one ``endchar`` per glyph (irrelevant to text extraction)."""
    from .pdf_fonts import _CFF_STD_STRINGS

    std = {n: i for i, n in enumerate(_CFF_STD_STRINGS)}
    customs: list[bytes] = []
    sids: list[int] = []
    for _, n in names:
        if n in std:
            sids.append(std[n])
        else:
            sids.append(391 + len(customs))
            customs.append(n.encode("ascii"))

    def index(items: list[bytes]) -> bytes:
        if not items:
            return struct.pack(">H", 0)
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        return (struct.pack(">HB", len(items), 2)
                + b"".join(struct.pack(">H", o) for o in offs)
                + b"".join(items))

    name_idx = index([b"SUBSET+SynthCFF"])
    string_idx = index(customs)
    gsubr_idx = index([])
    charstrings = index([b"\x0e"] * (1 + len(names)))  # GID0 + one per remap
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    encoding = b"\x00" + bytes([len(names)]) + bytes(c for c, _ in names)

    def op29(v: int, op: int) -> bytes:  # fixed-width operand: layout
        return b"\x1d" + struct.pack(">i", v) + bytes([op])  # solves in one pass

    top_idx_len = 2 + 1 + 2 * 2 + 3 * 6  # count offSize offsets[2] dict
    header = bytes([1, 0, 4, 2])
    pre = (len(header) + len(name_idx) + top_idx_len
           + len(string_idx) + len(gsubr_idx))
    cs_off = pre
    enc_off = cs_off + len(charset)
    top_idx = index([op29(cs_off, 15) + op29(enc_off, 16)
                     + op29(enc_off + len(encoding), 17)])
    assert len(top_idx) == top_idx_len
    return (header + name_idx + top_idx + string_idx + gsubr_idx
            + charset + encoding + charstrings)


class _Type1CEncoder(_DifferencesEncoder):
    """Simple font whose remap lives ONLY in an embedded bare-CFF (Type1C)
    program's binary Encoding + charset (/FontFile3, no font-dict
    /Encoding, no /Differences, no /ToUnicode): the parser must walk the
    CFF INDEX structures (pdf_fonts.parse_cff_encoding) — the compact twin
    of ``type1-builtin``."""

    _FF3_SUBTYPE = b"/Type1C"

    def _build_program(self) -> bytes:
        return build_bare_cff(self._names)

    def font_objects(self, next_free: int):
        last, widths = self._widths_entry()
        fdesc, ffile = next_free, next_free + 1
        prog = self._build_program()
        obj3 = (
            "<< /Type /Font /Subtype /Type1 /BaseFont /SUBSET+SynthCFF "
            "/FirstChar 32 /LastChar %d /Widths [%s] "
            "/FontDescriptor %d 0 R >>" % (last, widths, fdesc)
        ).encode()
        extra = {
            fdesc: (
                b"<< /Type /FontDescriptor /FontName /SUBSET+SynthCFF "
                b"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 "
                b"/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 "
                b"/FontFile3 %d 0 R >>" % ffile
            ),
            ffile: (
                b"<< /Subtype " + self._FF3_SUBTYPE
                + b" /Length %d >>\nstream\n" % len(prog)
                + prog
                + b"\nendstream"
            ),
        }
        return obj3, extra


def build_otf_cff(names: list[tuple[int, str]]) -> bytes:
    """``build_bare_cff``'s program wrapped in a minimal OTTO sfnt: a real
    table directory (correct offset/length/checksum for one ``CFF ``
    entry) is all a /FontFile3 /OpenType consumer walks to reach the CFF —
    rasterization tables are irrelevant to text extraction and omitted."""
    cff = build_bare_cff(names)
    header = b"OTTO" + struct.pack(">HHHH", 1, 16, 0, 0)
    off = 12 + 16  # header + one directory entry
    padded = cff + b"\x00" * ((-len(cff)) % 4)
    csum = sum(
        int.from_bytes(padded[j : j + 4], "big") for j in range(0, len(padded), 4)
    ) & 0xFFFFFFFF
    entry = b"CFF " + struct.pack(">III", csum, off, len(cff))
    return header + entry + padded


class _OtfCffEncoder(_Type1CEncoder):
    """The same CFF-carried remap wrapped in an sfnt (/FontFile3
    /Subtype /OpenType — PDF 32000-1 Table 126): the parser must walk the
    sfnt directory to the ``CFF `` table before the Type1C read."""

    _FF3_SUBTYPE = b"/OpenType"

    def _build_program(self) -> bytes:
        return build_otf_cff(self._names)


def wrap_words(text: str, width: int) -> list[str]:
    """Greedy word wrap; deterministic; splits only on single spaces so that
    joining the lines back with " " reproduces the input byte-identically."""
    words = text.split(" ")
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur and n + add > width:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def _content_single(
    lines: list[str], title: str | None, show=None, emit=None
) -> list[str]:
    """One content stream per page, single column top-down."""
    emit = emit or _emit_plain(show or _show_plain(_enc_literal))
    pages: list[str] = []
    ops: list[str] = []
    y = PAGE_H - MARGIN
    if title is not None:
        ops.append(emit(TITLE_SIZE, MARGIN, y, title))
        y -= 2 * LEADING
    for ln in lines:
        if y < MARGIN:
            pages.append("\n".join(ops))
            ops = []
            y = PAGE_H - MARGIN
        ops.append(emit(BODY_SIZE, MARGIN, y, ln))
        y -= LEADING
    if ops:
        pages.append("\n".join(ops))
    return pages


def _content_two_col(
    lines: list[str], title: str | None, show=None, emit=None
) -> list[str]:
    """Two columns per page: fill left column top-down, then right."""
    emit = emit or _emit_plain(show or _show_plain(_enc_literal))
    pages: list[str] = []
    i = 0
    first = True
    while i < len(lines) or (first and title is not None):
        ops: list[str] = []
        top = PAGE_H - MARGIN
        if first and title is not None:
            ops.append(emit(TITLE_SIZE, MARGIN, top, title))
            top -= 2 * LEADING
        first = False
        for x in (MARGIN, COL2_X):
            y = top
            while i < len(lines) and y >= MARGIN:
                ops.append(emit(BODY_SIZE, x, y, lines[i]))
                y -= LEADING
                i += 1
        pages.append("\n".join(ops))
    return pages


def _content_table(rows: list[list[str]], show=None) -> str:
    show = show or _show_plain(_enc_literal)
    """A ruled grid (lines + rects, as in pdf_vector_utils.py:38-90) with
    cell text — exercises the parser's grid detection."""
    nrows, ncols = len(rows), max(len(r) for r in rows)
    x0, y1 = MARGIN, PAGE_H - MARGIN
    cw, rh = 120.0, 24.0
    x1, y0 = x0 + ncols * cw, y1 - nrows * rh
    ops = ["0.5 w"]
    for r in range(nrows + 1):
        y = y1 - r * rh
        ops.append("%g %g m %g %g l S" % (x0, y, x1, y))
    for c in range(ncols + 1):
        x = x0 + c * cw
        ops.append("%g %g m %g %g l S" % (x, y0, x, y1))
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            tx = x0 + c * cw + 4
            ty = y1 - r * rh - 16
            ops.append("BT /F1 %g Tf %g %g Td %s ET" % (BODY_SIZE, tx, ty, show(cell)))
    return "\n".join(ops)


def _pdf_str_tok(s: str, owner: int, encryptor, objstm: bool) -> str:
    """Literal-or-encrypted string token: the standard handler encrypts ALL
    strings with the owning object's key, except inside an ObjStm whose
    container stream is encrypted wholesale (§7.5.7)."""
    if encryptor is not None and not objstm:
        # UTF-8, matching the unencrypted lane's bytes: the parser's
        # _pdf_text decodes UTF-8-if-valid, so non-Latin-1 titles/URIs/Info
        # survive encryption instead of collapsing to '?' (latin-1 replace)
        cipher = encryptor.encrypt(owner, 0, s.encode("utf-8"))
        return "<%s>" % cipher.hex().upper()
    return "(%s)" % (s.replace("\\", r"\\").replace("(", r"\(")
                     .replace(")", r"\)"))


def _outline_objects(
    base: int, items: list, npages: int, encryptor, objstm: bool,
    named: bool = False,
) -> dict[int, bytes]:
    """Emit a /Outlines tree (§12.3.3) from flat ``(level, title, page_idx)``
    rows: root at object ``base``, item i at ``base+1+i``. All nodes open
    (positive /Count). Titles are per-object encrypted under the standard
    handler — except when ObjStm-packed, where the container stream covers
    them (same rule as /Info and URI strings).

    With ``named=True`` every item's /Dest is a name STRING resolved
    through a catalog /Names → /Dests name tree (§7.7.4) emitted after the
    items — root at ``base+1+n`` with two leaf /Kids when n > 2 (so the
    interior-node walk is exercised), else a single leaf. Name strings are
    per-object encrypted like any other string."""
    n = len(items)
    levels = [max(1, int(it[0])) for it in items]
    parent = [None] * n
    first_child: list = [None] * n
    last_child: list = [None] * n
    prev: list = [None] * n
    nxt: list = [None] * n
    root_kids: list[int] = []
    stack: list[int] = []
    for i in range(n):
        while stack and levels[stack[-1]] >= levels[i]:
            stack.pop()
        if stack:
            p = stack[-1]
            parent[i] = p
            if first_child[p] is None:
                first_child[p] = i
            else:
                prev[i] = last_child[p]
                nxt[last_child[p]] = i
            last_child[p] = i
        else:
            if root_kids:
                prev[i] = root_kids[-1]
                nxt[root_kids[-1]] = i
            root_kids.append(i)
        stack.append(i)
    desc = [0] * n  # open descendant count (/Count, positive = open)
    for i in reversed(range(n)):
        if parent[i] is not None:
            desc[parent[i]] += 1 + desc[i]

    def num(i: int) -> int:
        return base + 1 + i

    def _str_tok(s: str, owner: int) -> str:
        return _pdf_str_tok(s, owner, encryptor, objstm)

    objs: dict[int, bytes] = {}
    objs[base] = (
        "<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
        % (num(root_kids[0]), num(root_kids[-1]), n)
    ).encode()
    for i, (lvl, title, pg) in enumerate(items):
        tok = _str_tok(str(title), num(i))
        page_obj = 4 + 2 * max(0, min(int(pg), npages - 1))
        dest = (
            "/Dest %s" % _str_tok("d%d" % i, num(i))
            if named
            else "/Dest [%d 0 R /XYZ 0 %g 0]" % (page_obj, PAGE_H)
        )
        parts = [
            "/Title %s" % tok,
            "/Parent %d 0 R" % (num(parent[i]) if parent[i] is not None else base),
            dest,
        ]
        if prev[i] is not None:
            parts.append("/Prev %d 0 R" % num(prev[i]))
        if nxt[i] is not None:
            parts.append("/Next %d 0 R" % num(nxt[i]))
        if first_child[i] is not None:
            parts.append("/First %d 0 R" % num(first_child[i]))
            parts.append("/Last %d 0 R" % num(last_child[i]))
            parts.append("/Count %d" % desc[i])
        objs[num(i)] = ("<< %s >>" % " ".join(parts)).encode()
    if named:
        # name tree: §7.7.4 requires keys LEXICOGRAPHICALLY sorted across
        # the whole tree, so sort the item ids by their key string ("d10" <
        # "d2") and split the SORTED order into leaves — for n <= 10 this
        # is the numeric order, byte-identical to the pre-fix layout
        def dest_arr(i: int) -> str:
            pg = 4 + 2 * max(0, min(int(items[i][2]), npages - 1))
            return "[%d 0 R /XYZ 0 %g 0]" % (pg, PAGE_H)

        order = sorted(range(n), key=lambda i: "d%d" % i)
        ndroot = base + 1 + n
        if n > 2:
            half = n // 2
            leaves = [(ndroot + 1, order[:half]), (ndroot + 2, order[half:])]
            objs[ndroot] = (
                "<< /Kids [%d 0 R %d 0 R] >>" % (ndroot + 1, ndroot + 2)
            ).encode()
            for onum, rng in leaves:
                pairs = " ".join(
                    "%s %s" % (_str_tok("d%d" % i, onum), dest_arr(i))
                    for i in rng
                )
                lim = "/Limits [%s %s]" % (
                    _str_tok("d%d" % rng[0], onum),
                    _str_tok("d%d" % rng[-1], onum),
                )
                objs[onum] = ("<< %s /Names [%s] >>" % (lim, pairs)).encode()
        else:
            pairs = " ".join(
                "%s %s" % (_str_tok("d%d" % i, ndroot), dest_arr(i))
                for i in order
            )
            objs[ndroot] = ("<< /Names [%s] >>" % pairs).encode()
    return objs


def _assemble(
    page_streams: list[str], compress: bool, xref_stream: bool,
    with_image: bool = False, objstm: bool = False, make_font=None,
    encryptor=None, rotate: int = 0, form_xobject: bool = False,
    links: list[str] | None = None, info: dict | None = None,
    outline: list | None = None, outline_named: bool = False,
    attachments: list | None = None, acroform: list | None = None,
    base_font: str = "Helvetica",
    image_fmt: str = "gray", image_dims: tuple = (4, 4),
) -> bytes:
    """Assemble objects + xref. Classic xref table or a cross-reference
    stream (PDF 1.5) depending on ``xref_stream``. ``with_image`` adds a
    tiny /Subtype /Image XObject as /Im1 in every page's resources.
    ``objstm`` (implies ``xref_stream``) packs every dict-only object
    (catalog, page tree, font, page dicts) into one /Type /ObjStm container
    with type-2 xref entries — the layout most modern PDF producers emit."""
    npages = len(page_streams)
    # object numbering: 1 Catalog, 2 Pages, 3 Font, then per page (Page,
    # Contents), then optionally the image XObject
    objs: dict[int, bytes] = {}
    kids = " ".join("%d 0 R" % (4 + 2 * i) for i in range(npages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if rotate:
        # inheritable attributes live on the Pages NODE, not the page dicts
        # (exercises the parser's /Parent-chain attribute walk); 90/270
        # content boxes are landscape so the page displays portrait
        bw, bh = (PAGE_H, PAGE_W) if rotate in (90, 270) else (PAGE_W, PAGE_H)
        objs[2] = (
            "<< /Type /Pages /Kids [%s] /Count %d /MediaBox [0 0 %g %g] "
            "/Rotate %d >>" % (kids, npages, bw, bh, rotate)
        ).encode()
    else:
        objs[2] = ("<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, npages)).encode()
    # no /Widths on purpose: unembedded-width core fonts make the
    # extractor advance by the family AFM table selected via /BaseFont
    objs[3] = ("<< /Type /Font /Subtype /Type1 /BaseFont /%s >>"
               % base_font).encode()
    img_num = 4 + 2 * npages
    if make_font is not None:
        obj3, extra = make_font(img_num + (1 if with_image else 0))
        objs[3] = obj3
        objs.update(extra)
    res_extra = ""
    if with_image:
        iw, ih = image_dims
        if image_fmt == "jpeg":
            # DCTDecode: the stream bytes ARE a JPEG; the reader must parse
            # the SOF header for intrinsic dims (VERDICT r4 item 5)
            from .containers import build_jpeg

            pixels = build_jpeg(iw, ih)
            filt = " /Filter /DCTDecode /ColorSpace /DeviceRGB"
        else:
            pixels = bytes(i % 256 for i in range(iw * ih))  # gray ramp
            filt = " /ColorSpace /DeviceGray"
        objs[img_num] = (
            ("<< /Type /XObject /Subtype /Image /Width %d /Height %d%s "
             "/BitsPerComponent 8 /Length %d >>" % (iw, ih, filt, len(pixels))).encode()
            + b"\nstream\n" + pixels + b"\nendstream"
        )
        res_extra = " /XObject << /Im1 %d 0 R >>" % img_num
    form_base = max(max(objs), 3 + 2 * npages) + 1 if form_xobject else 0
    annot_base = 0
    annots_entry = ""
    if links:
        # /Link annotations with /URI actions on page 1 (§12.5.6.5)
        annot_base = max(max(objs), 3 + 2 * npages) + (npages if form_xobject else 0) + 1
        for k, uri in enumerate(links):
            tok = _pdf_str_tok(uri, annot_base + k, encryptor, objstm)
            objs[annot_base + k] = (
                "<< /Type /Annot /Subtype /Link /Rect [72 %g 240 %g] "
                "/Border [0 0 0] /A << /S /URI /URI %s >> >>"
                % (40.0 + 14 * k, 52.0 + 14 * k, tok)
            ).encode()
        annots_entry = " /Annots [%s]" % " ".join(
            "%d 0 R" % (annot_base + k) for k in range(len(links))
        )

    def _stream_obj(body: str, head_extra: str = "") -> bytes:
        data = body.encode("latin-1")
        if compress:
            data = zlib.compress(data, 6)
            head = b"<< %s/Length %d /Filter /FlateDecode >>" % (
                head_extra.encode(), len(data))
        else:
            head = b"<< %s/Length %d >>" % (head_extra.encode(), len(data))
        return head + b"\nstream\n" + data + b"\nendstream"

    for i, stream in enumerate(page_streams):
        pg, ct = 4 + 2 * i, 5 + 2 * i
        mbox = "" if rotate else " /MediaBox [0 0 %g %g]" % (PAGE_W, PAGE_H)
        page_res = res_extra
        if form_xobject:
            fx = form_base + i
            # the page's XObject dict points at the form; the image (if any)
            # moves inside the form's own resources, where its Do now runs
            page_res = " /XObject << /Fx1 %d 0 R >>" % fx
            bw, bh = (PAGE_H, PAGE_W) if rotate in (90, 270) else (PAGE_W, PAGE_H)
            objs[fx] = _stream_obj(
                stream,
                "/Type /XObject /Subtype /Form /BBox [%g %g %g %g] "
                "/Matrix [1 0 0 1 %g %g] "
                "/Resources << /Font << /F1 3 0 R >>%s >> "
                % (-FORM_DX, -FORM_DY, bw - FORM_DX, bh - FORM_DY,
                   FORM_DX, FORM_DY, res_extra),
            )
            stream = "/Fx1 Do"
        objs[pg] = (
            "<< /Type /Page /Parent 2 0 R%s%s "
            "/Resources << /Font << /F1 3 0 R >>%s >> /Contents %d 0 R >>"
            % (mbox, annots_entry if i == 0 else "", page_res, ct)
        ).encode()
        objs[ct] = _stream_obj(stream)

    names_entries: list[bytes] = []
    cat_extra = b""
    if outline:
        out_base = max(list(objs) + [3 + 2 * npages]) + 1
        objs.update(
            _outline_objects(out_base, outline, npages, encryptor, objstm,
                             named=outline_named)
        )
        cat_extra += b" /Outlines %d 0 R" % out_base
        if outline_named:
            names_entries.append(
                b"/Dests %d 0 R" % (out_base + 1 + len(outline))
            )
    if attachments:
        # /Names /EmbeddedFiles tree (§7.11.4): filespec dict + /EF stream
        # per attachment, one leaf node; stream payloads ride the normal
        # compression/encryption passes below
        att_base = max(list(objs) + [3 + 2 * npages]) + 1
        pairs = []
        for k, (fname, fdata) in enumerate(attachments):
            fs_num = att_base + 2 * k
            ef_num = att_base + 2 * k + 1
            objs[fs_num] = (
                "<< /Type /Filespec /F %s /EF << /F %d 0 R >> >>"
                % (_pdf_str_tok(fname, fs_num, encryptor, objstm), ef_num)
            ).encode()
            objs[ef_num] = (
                b"<< /Type /EmbeddedFile /Params << /Size %d >> /Length %d >>"
                % (len(fdata), len(fdata))
                + b"\nstream\n" + fdata + b"\nendstream"
            )
            pairs.append((fname, fs_num))
        tree_num = att_base + 2 * len(attachments)
        body = " ".join(
            "%s %d 0 R" % (_pdf_str_tok(nm, tree_num, encryptor, objstm), fs)
            for nm, fs in sorted(pairs)
        )
        objs[tree_num] = ("<< /Names [%s] >>" % body).encode()
        names_entries.append(b"/EmbeddedFiles %d 0 R" % tree_num)
    if acroform:
        # AcroForm text fields (§12.7): one terminal field dict per
        # (name, value); strings ride the per-object encryption rule
        fb = max(list(objs) + [3 + 2 * npages]) + 1
        refs = []
        for k, (fname, fval) in enumerate(acroform):
            fn = fb + 1 + k
            objs[fn] = (
                "<< /FT /Tx /T %s /V %s >>"
                % (_pdf_str_tok(fname, fn, encryptor, objstm),
                   _pdf_str_tok(fval, fn, encryptor, objstm))
            ).encode()
            refs.append("%d 0 R" % fn)
        objs[fb] = ("<< /Fields [%s] >>" % " ".join(refs)).encode()
        cat_extra += b" /AcroForm %d 0 R" % fb
    if names_entries:
        cat_extra += b" /Names << " + b" ".join(names_entries) + b" >>"
    if cat_extra:
        objs[1] = b"<< /Type /Catalog /Pages 2 0 R" + cat_extra + b" >>"

    info_num = None
    if info:
        # trailer /Info document-information dictionary (§14.3.3); strings
        # encrypted per the standard handler — except when the dict is
        # packed into an ObjStm below, whose container stream is encrypted
        # wholesale instead
        info_num = max(list(objs) + [3 + 2 * npages]) + 1

        # under objstm the dict is always packed (the packer keys on the
        # exact b"\nstream\n" marker) and the container encryption covers
        # its strings; otherwise encrypt them individually — _pdf_str_tok
        # applies exactly that rule
        objs[info_num] = ("<< %s >>" % " ".join(
            "/%s %s" % (k, _pdf_str_tok(str(v), info_num, encryptor, objstm))
            for k, v in sorted(info.items())
        )).encode()

    packed: dict[int, int] = {}  # obj num -> index within the ObjStm
    if objstm:
        xref_stream = True
        # dict-only objects go into the container; stream objects cannot
        dict_nums = sorted(n for n, b in objs.items() if b"\nstream\n" not in b)
        body = bytearray()
        header = []
        for idx, n in enumerate(dict_nums):
            header.append(b"%d %d" % (n, len(body)))
            body += objs.pop(n) + b"\n"
            packed[n] = idx
        head_bytes = b" ".join(header) + b"\n"
        payload = zlib.compress(bytes(head_bytes + body), 6)
        container = max(list(objs) + dict_nums) + 1
        objs[container] = (
            b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode /Length %d >>"
            % (len(dict_nums), len(head_bytes), len(payload))
            + b"\nstream\n" + payload + b"\nendstream"
        )
        objstm_num = container

    enc_num = None
    if encryptor is not None:
        # encrypt every stream object's payload (per-object key, after any
        # ObjStm packing so the container stream is covered too) and patch
        # its /Length. The /Encrypt dict itself is added afterwards as a
        # direct object — it is never encrypted nor packed (the reader needs
        # it before any key exists).
        import re as _re

        for num in sorted(objs):
            b = objs[num]
            i = b.find(b"\nstream\n")
            if i == -1:
                continue
            head, rest = b[:i], b[i + 8 :]
            j = rest.rfind(b"\nendstream")
            data = encryptor.encrypt(num, 0, rest[:j])
            head = _re.sub(rb"/Length \d+", b"/Length %d" % len(data), head, count=1)
            objs[num] = head + b"\nstream\n" + data + b"\nendstream"
        enc_num = max(list(objs) + list(packed)) + 1
        objs[enc_num] = encryptor.encrypt_dict_body()

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num
        buf += objs[num]
        buf += b"\nendobj\n"

    maxnum = max(list(objs) + list(packed))
    enc_trailer = b""
    if info_num is not None:
        enc_trailer += b" /Info %d 0 R" % info_num
    if enc_num is not None:
        enc_trailer += b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            enc_num,
            encryptor.id0.hex().upper().encode(),
            encryptor.id0.hex().upper().encode(),
        )
    if not xref_stream:
        xref_off = len(buf)
        buf += b"xref\n0 %d\n" % (maxnum + 1)
        buf += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            buf += b"%010d 00000 n \n" % offsets.get(num, 0)
        buf += b"trailer\n<< /Size %d /Root 1 0 R%s >>\n" % (maxnum + 1, enc_trailer)
        buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    else:
        xnum = maxnum + 1
        xref_off = len(buf)
        # W = [1 4 w3]: type, offset-or-container, gen-or-index — the third
        # field widens with the largest ObjStm index so containers packing
        # >256 dict objects emit a valid table instead of OverflowError
        # (1 byte, the historical layout, whenever indexes fit)
        w3 = max(1, (max(packed.values(), default=0).bit_length() + 7) // 8)
        rows = [b"\x00" + (0).to_bytes(4, "big") + (0xFF).to_bytes(w3, "big")]
        for num in range(1, maxnum + 1):
            if num in packed:  # type 2: (container obj, index within it)
                rows.append(
                    b"\x02" + objstm_num.to_bytes(4, "big")
                    + packed[num].to_bytes(w3, "big")
                )
            else:
                rows.append(
                    b"\x01" + offsets.get(num, 0).to_bytes(4, "big")
                    + (0).to_bytes(w3, "big")
                )
        rows.append(b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(w3, "big"))
        data = zlib.compress(b"".join(rows), 6)
        head = (
            b"<< /Type /XRef /Size %d /W [1 4 %d] /Root 1 0 R%s /Filter /FlateDecode /Length %d >>"
            % (xnum + 1, w3, enc_trailer, len(data))
        )
        buf += b"%d 0 obj\n" % xnum
        buf += head + b"\nstream\n" + data + b"\nendstream\nendobj\n"
        buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


# extras geometry: header/footer inside the chrome bands
# (HEADER_Y/792 ≈ 0.96 > 0.93; FOOTER_Y/792 ≈ 0.038 < 0.06), figure in the
# right margin with its caption 5 pts below (inside the 5% proximity margin)
HEADER_Y = 760.0
FOOTER_Y = 30.0
FIG_X, FIG_Y, FIG_W, FIG_H = 380.0, 560.0, 160.0, 100.0


def _content_extras(
    header: str | None, footer: str | None, caption: str | None,
    figure: bool, table_rows: list[list[str]] | None, show=None,
    inline_figure: bool = False,
) -> list[str]:
    show = show or _show_plain(_enc_literal)
    ops: list[str] = []
    if header:
        ops.append("BT /F1 %g Tf %g %g Td %s ET" % (BODY_SIZE, MARGIN, HEADER_Y, show(header)))
    if footer:
        ops.append("BT /F1 %g Tf %g %g Td %s ET" % (BODY_SIZE, MARGIN, FOOTER_Y, show(footer)))
    if inline_figure:
        # BI..ID..EI inline image (§8.9.7): same 4x4 gray ramp, painted at
        # the same CTM as the XObject figure — extraction must not differ
        pixels = "".join(chr(i) for i in range(16))
        ops.append(
            "q %g 0 0 %g %g %g cm BI /W 4 /H 4 /BPC 8 /CS /G ID %s EI Q"
            % (FIG_W, FIG_H, FIG_X, FIG_Y, pixels)
        )
    elif figure:
        ops.append("q %g 0 0 %g %g %g cm /Im1 Do Q" % (FIG_W, FIG_H, FIG_X, FIG_Y))
    if caption:
        if figure or inline_figure:
            cx, cy = FIG_X, FIG_Y - 15.0
        elif table_rows is not None:
            cx, cy = MARGIN, (PAGE_H - MARGIN) - len(table_rows) * 24.0 - 15.0
        else:
            cx, cy = MARGIN, FIG_Y - 15.0
        ops.append("BT /F1 %g Tf %g %g Td %s ET" % (BODY_SIZE, cx, cy, show(caption)))
    return ops


def build_pdf(
    text: str,
    columns: int = 1,
    title: str | None = None,
    compress: bool = False,
    xref_stream: bool = False,
    objstm: bool = False,
    table_rows: list[list[str]] | None = None,
    header: str | None = None,
    footer: str | None = None,
    caption: str | None = None,
    figure: bool = False,
    image_fmt: str = "gray",
    image_dims: tuple = (4, 4),
    list_items: list[str] | None = None,
    equations: list[str] | None = None,
    references: list[str] | None = None,
    inline_figure: bool = False,
    encoding: str = "simple",
    encrypt: str | None = None,
    tj_kerning: bool = False,
    rotate: int = 0,
    form_xobject: bool = False,
    split_runs: bool = False,
    links: list[str] | None = None,
    info: dict | None = None,
    outline: list | None = None,
    outline_named: bool = False,
    attachments: list | None = None,
    acroform: list | None = None,
    base_font: str = "Helvetica",
) -> bytes:
    """Build one deterministic PDF.

    ``text`` is wrapped on single spaces; the parser's reading-order
    reconstruction must return it byte-identically (title, if given, becomes
    a separate leading TITLE block). Extras exercise the full element
    taxonomy: ``header``/``footer`` land in the positional chrome bands,
    ``figure`` paints a tiny image XObject via ``cm``+``Do``, ``caption``
    sits within the 5% proximity margin of the figure or table, and
    ``list_items`` render as bullet lines in the body flow.

    ``encoding`` picks the font/text-encoding variant (VERDICT r2 item 1):

    * ``simple`` — Type1 font, literal strings with UTF-8 octal escapes;
    * ``type0``  — Identity-H subset-font emulation: 2-byte glyph codes in
      hex strings, mapped back only by the /ToUnicode CMap;
    * ``type0-ttf`` — Identity-H with NO /ToUnicode: an embedded FontFile2
      subset-TTF whose own ``cmap`` table is the only way back to Unicode
      (VERDICT r4 item 4);
    * ``differences`` — Type1 with /Encoding /Differences remapping letters
      and all non-ASCII chars to codes >= 128 with AGL glyph names;
    * ``type1-builtin`` — the same remap, but carried ONLY by the embedded
      Type1 program's built-in ``/Encoding`` vector (no font-dict /Encoding,
      no /ToUnicode): the parser must read the cleartext FontFile header
      (VERDICT r4 "missing" item 2);
    * ``type1c`` — the remap carried ONLY by an embedded bare-CFF program's
      binary Encoding + charset (/FontFile3 /Type1C): the parser must walk
      the CFF INDEX structures.

    * ``type1c-otf`` — the same CFF remap wrapped in an OTTO sfnt
      (/FontFile3 /OpenType): the parser must walk the sfnt table
      directory to the ``CFF `` table first.

    ``encrypt`` applies the standard security handler with EMPTY user/owner
    passwords: ``rc4-40``, ``rc4-128``, or ``aes-128`` (VERDICT r2 item 6).

    ``tj_kerning`` emits every multi-word line as a ``TJ`` array whose word
    gaps are negative kern offsets instead of space glyphs (justified /
    space-glyph-less subset-font layout); composes with every ``encoding``.

    ``rotate`` (90/180/270) writes a scanned-style rotated page: content in
    the rotated coordinate frame (rotation Tm matrices, mapped path/cm ops)
    with the inheritable /Rotate + /MediaBox on the Pages node, displaying —
    and extracting — exactly like the unrotated document.

    ``split_runs`` splits every body/title line into three fragments the
    way real producers do at style/shaping boundaries: two flow inside one
    BT block (the viewer advances between them by glyph metrics), the third
    is positioned absolutely at the metric offset computed from the shared
    public Helvetica AFM table (:mod:`afm`), with deterministic Tc/Tw
    spacing mixed in — so byte-identical extraction requires the parser to
    reproduce the spec §9.4.4 advance formula over explicit /Widths, CID
    /W arrays, or builtin metrics. Supersedes ``tj_kerning`` on body lines.

    ``form_xobject`` moves every page's painting into a /Subtype /Form
    XObject invoked by a one-op ``/Fx1 Do`` contents stream: content ops in
    a form-local frame shifted by (FORM_DX, FORM_DY), restored by the
    form's /Matrix, with the form carrying its own /Resources (the layout
    LaTeX and stamping tools emit). Composes with ``rotate`` and every
    ``encoding``; extraction must be byte-identical to the plain build.
    """
    body = wrap_words(text, COL_LINE_CHARS if columns == 2 else LINE_CHARS) if text else []
    if list_items:
        body = body + ["• " + it for it in list_items]
    if equations:
        body = body + list(equations)
    if references:
        body = body + ["[%d] %s" % (i + 1, r) for i, r in enumerate(references)]
    enc = _enc_literal
    make_font = None
    if encoding != "simple":
        shown: list[str] = list(body)
        for s in (title, header, footer, caption):
            if s:
                shown.append(s)
        for row in table_rows or []:
            shown.extend(row)
        charset = set("".join(shown))
        family = afm.metrics_for(base_font)
        if encoding == "type0":
            encoder = _Type0Encoder(charset, metrics=family)
        elif encoding == "type0-ttf":
            try:
                encoder = _Type0TTFEncoder(charset, metrics=family)
            except ValueError:
                # charset too fragmented for a format-4 cmap (>8189 BMP
                # runs): real producers ship a ToUnicode CMap instead
                encoder = _Type0Encoder(charset, metrics=family)
        else:
            cls = {"type1-builtin": _Type1BuiltinEncoder,
                   "type1c": _Type1CEncoder,
                   "type1c-otf": _OtfCffEncoder}.get(encoding, _DifferencesEncoder)
            try:
                encoder = cls(charset, metrics=family)
            except ValueError:
                # charset too rich for 128 remap codes (e.g. CJK-heavy
                # documents): the Type0 layout is what real producers use
                encoder = _Type0Encoder(charset, metrics=family)
        enc = encoder.show
        make_font = encoder.font_objects
    show = _show_kerned(enc) if tj_kerning else _show_plain(enc)
    # split_runs supersedes tj_kerning for body lines (the fixtures exercise
    # one show-op layout per line); Tw only ever applies to 1-byte code 32,
    # so 2-byte Type0 shows must not carry it — including the silent
    # differences→type0 charset-overflow fallback above
    two_byte = encoding != "simple" and isinstance(encoder, _Type0Encoder)
    emit = (_emit_split(enc, tw_applies=not two_byte,
                        metrics=afm.metrics_for(base_font))
            if split_runs else None)
    if table_rows is not None:
        pages = [_content_table(table_rows, show)]
    elif columns == 2:
        pages = _content_two_col(body, title, show, emit=emit)
    else:
        pages = _content_single(body, title, show, emit=emit)
    extras = _content_extras(header, footer, caption, figure, table_rows,
                             show, inline_figure=inline_figure)
    if extras:
        if not pages:
            pages = [""]
        pages[0] = (pages[0] + "\n" if pages[0] else pages[0]) + "\n".join(extras)
    if rotate or form_xobject:
        inv = _ROT_INV.get(rotate, (1.0, 0.0, 0.0, 1.0, 0.0, 0.0))
        if form_xobject:
            # compose the form-local shift into the display->content inverse
            # so the ops are regex-mapped exactly once
            inv = (inv[0], inv[1], inv[2], inv[3],
                   inv[4] - FORM_DX, inv[5] - FORM_DY)
        pages = [_map_page_ops(pg, inv) for pg in pages]
    encryptor = None
    if encrypt is not None:
        import hashlib

        from .pdf_crypt import StandardEncryptor

        # deterministic /ID: fixtures must be byte-reproducible
        id0 = hashlib.md5("\n".join(pages).encode("latin-1", "replace")).digest()
        encryptor = StandardEncryptor(encrypt, id0)
    return _assemble(
        pages, compress=compress, xref_stream=xref_stream, with_image=figure,
        objstm=objstm, make_font=make_font, encryptor=encryptor, rotate=rotate,
        form_xobject=form_xobject, links=links, info=info, outline=outline,
        outline_named=outline_named, attachments=attachments,
        acroform=acroform, base_font=base_font,
        image_fmt=image_fmt, image_dims=image_dims,
    )


def build_truncated_pdf(text: str) -> bytes:
    """Malformed variant: valid prefix, hard-truncated mid-file."""
    full = build_pdf(text)
    return full[: max(40, len(full) // 2)]
