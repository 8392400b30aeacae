"""Unit + property tests for the pure HTML extraction kernel."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.corpus import ARTICLE_PREFIX, ARTICLE_SUFFIX, render_article
from pdf_extraction_spark.kernels.html_extract import extract_html

ARTICLE = """<!DOCTYPE html><html><body>
<header><nav><a href='/'>Home</a> <a href='/a'>About</a></nav></header>
<main>
<h1>The Article Title</h1>
<p>First paragraph with enough characters to count as content here.</p>
<p>Second paragraph also long enough to be considered main content.</p>
<ul><li>item one is listed</li><li>item two is listed</li></ul>
<table><tr><td>cell alpha data</td><td>cell beta data</td></tr></table>
<figure><img src='x.png'><figcaption>Figure 1: a caption</figcaption></figure>
</main>
<aside><a href='/1'>rel one</a><a href='/2'>rel two</a></aside>
<footer>Copyright 2026 SiteName</footer>
</body></html>"""


def test_main_content_and_types():
    r = extract_html(ARTICLE)
    types = [s[0] for s in r["spans"]]
    assert types == [
        "title", "paragraph", "paragraph", "list", "list", "table", "table", "caption",
    ]
    assert r["text"].startswith("The Article Title\n\nFirst paragraph")
    assert "Home" not in r["text"]          # nav stripped
    assert "Copyright" not in r["text"]     # footer stripped
    assert "rel one" not in r["text"]       # aside stripped


def test_span_offsets_roundtrip():
    r = extract_html(ARTICLE)
    blocks = r["text"].split("\n\n")
    assert len(blocks) == len(r["spans"])
    for (elem, page, s, e, bbox, conf, level, parent), blk in zip(r["spans"], blocks):
        assert r["text"][s:e] == blk
        assert page == 0
        assert parent == -1 or 0 <= parent < len(r["spans"])


def test_template_roundtrip_exact():
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    html = ARTICLE_PREFIX + body + ARTICLE_SUFFIX
    assert extract_html(html.encode())["text"] == body


def test_link_farm_stripped():
    html = (
        "<body><main><p>"
        + "real content paragraph with plenty of words to keep around here"
        + "</p></main>"
        + "<div class='related'><a href='/x'>x</a><a href='/y'>y</a></div></body>"
    )
    r = extract_html(html)
    assert "real content" in r["text"]
    assert "x" not in r["text"].split()


def test_entities_and_multibyte():
    html = "<main><p>&amp; entity &lt;test&gt; multibyte 한국어 텍스트 블록</p></main>"
    r = extract_html(html)
    assert r["text"] == "& entity <test> multibyte 한국어 텍스트 블록"


def test_scripts_styles_comments_dropped():
    html = ("<main><script>var boilerplate_script_content = 1;</script>"
            "<!-- hidden comment text --><style>p{color:red}</style>"
            "<p>visible paragraph content stays in the output here</p></main>")
    r = extract_html(html)
    assert r["text"] == "visible paragraph content stays in the output here"


def test_variants_nonempty():
    for v in range(1, 6):
        html = render_article("A Title Here", ["one two three four five six seven eight nine ten"], v)
        r = extract_html(html)
        assert r["error"] is None
        assert "one two three" in r["text"]


def test_malformed_total():
    assert extract_html(b"")["text"] == ""
    assert extract_html(b"\x00\xff\xfegarbage<<<")["n_elements"] >= 0
    r = extract_html("<div><p>abc def ghi jkl mno pqr")
    assert r["text"] == "abc def ghi jkl mno pqr"


@given(st.binary(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_totality_random_bytes(payload):
    r = extract_html(payload)
    assert isinstance(r["text"], str)
    for (_, _, s, e, *_rest) in r["spans"]:
        assert 0 <= s <= e <= len(r["text"])


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000))
@settings(max_examples=150, deadline=None)
def test_totality_random_text(payload):
    r = extract_html(payload)
    assert isinstance(r["text"], str)
    # spans tile the text with "\n\n" separators
    blocks = r["text"].split("\n\n") if r["text"] else []
    assert len(blocks) == len(r["spans"])


def test_charset_meta_euc_kr():
    from pdf_extraction_spark.kernels.html_extract import detect_charset, extract_html

    body = "<html><head><meta charset='euc-kr'></head><body><main><p>한국어 본문 텍스트 블록입니다 여기 더 많은 텍스트</p></main></body></html>"
    payload = body.encode("euc-kr")
    # the WHATWG Encoding Standard's euc-kr IS windows-949 (UHC), a strict
    # superset — declared labels route through the table, not codecs.lookup
    assert detect_charset(payload) == "cp949"
    res = extract_html(payload)
    assert "한국어 본문 텍스트" in res["text"]
    assert res["error"] is None


def test_charset_utf16_bom():
    from pdf_extraction_spark.kernels.html_extract import detect_charset, extract_html

    body = "<html><body><main><p>utf sixteen little endian body text block here</p></main></body></html>"
    payload = b"\xff\xfe" + body.encode("utf-16-le")
    # the BOM-consuming codec, not utf-16-le (which would leak U+FEFF)
    assert detect_charset(payload) == "utf-16"
    res = extract_html(payload)
    assert "utf sixteen little endian" in res["text"]
    assert "﻿" not in res["text"]


def test_charset_bom_never_leaks_zwnbsp():
    from pdf_extraction_spark.kernels.html_extract import extract_html

    body = "<html><body><main><p>bom leak check body text block goes right here</p></main></body></html>"
    for enc, bom in [
        ("utf-16-le", b"\xff\xfe"),
        ("utf-16-be", b"\xfe\xff"),
        ("utf-32-le", b"\xff\xfe\x00\x00"),
        ("utf-32-be", b"\x00\x00\xfe\xff"),
        ("utf-8", b"\xef\xbb\xbf"),
    ]:
        res = extract_html(bom + body.encode(enc))
        assert "﻿" not in res["text"], enc
        assert "bom leak check" in res["text"], enc


def test_charset_bogus_name_falls_back():
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    payload = b"<meta charset='no-such-enc'><p>x</p>"
    assert detect_charset(payload) == "utf-8"


def test_charset_undeclared_cp1252_sniff():
    """WHATWG legacy default: no BOM, no <meta charset>, invalid-UTF-8 bytes
    ⇒ windows-1252, not utf-8/replace mojibake."""
    from pdf_extraction_spark.kernels.html_extract import detect_charset, extract_html

    body = "<html><body><main><p>café crème — déjà vu € naïve body text</p></main></body></html>"
    payload = body.encode("cp1252")
    assert detect_charset(payload) == "windows-1252"
    res = extract_html(payload)
    assert "café crème — déjà vu € naïve" in res["text"]
    assert "�" not in res["text"]


def test_charset_undeclared_valid_utf8_stays_utf8():
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    payload = "<html><body><p>déjà vu €</p></body></html>".encode("utf-8")
    assert detect_charset(payload) == "utf-8"


_KO_PAGE = ("<html><body><main><p>데이터 분석과 추출은 문서의 표와 그림 그리고 "
            "수식과 제목 단락 목록을 다룬다 한국어 텍스트 예시 페이지</p></main>"
            "</body></html>")
_JA_PAGE = ("<html><body><main><p>これは日本語のテキストですカタカナも含まれて"
            "いますデータ解析と抽出の例文</p></main></body></html>")
_ZH_PAGE = ("<html><body><main><p>这是一段中文文本用于测试字符编码检测数据分析"
            "提取文档表格图片公式标题段落列表</p></main></body></html>")


def test_charset_undeclared_cjk_probe():
    """Undeclared EUC-KR / Shift-JIS / GBK pages (no BOM, no meta) must
    detect via the byte-pattern probe and decode mojibake-free — the r4
    residue: they previously fell through to cp1252 (VERDICT r4 item 3)."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    for page, codec in [(_KO_PAGE, "cp949"), (_JA_PAGE, "cp932"),
                        (_ZH_PAGE, "gbk")]:
        payload = page.encode(codec)
        assert detect_charset(payload) == codec
        assert decode_payload(payload) == page
        # memoryview path (zero-copy Arrow batches)
        assert decode_payload(memoryview(payload)) == page


_JA_EUC_HIRA = ("<html><body><main><p>こんにちは、きょうはいいてんきですね。"
                "さくらがさいています。ありがとうございます。</p><p>わたしは"
                "にほんごをべんきょうしています。これはてすとのぺえじです。"
                "</p></main></body></html>")
_JA_EUC_KANJI = ("<html><body><main><p>東京都は日本の首都であり、政治経済の"
                 "中心地である。人口は約一千四百万人に達する。</p><p>昨日は"
                 "会議に出席し、新製品の開発計画について議論を行った。</p>"
                 "</main></body></html>")


def test_charset_undeclared_euc_jp_probe():
    """Undeclared EUC-JP pages must probe as euc_jp — the round-5 residue:
    a hiragana-heavy page used to MISROUTE to cp949 (EUC-JP kana rows
    0xA4/0xA5 strictly decode as Hangul compatibility jamo, which the core
    class counts as Hangul and the KS X 1001 syllable sub-gate — written
    over syllables only — waved through vacuously), while a kanji-heavy
    page fell all the way to cp1252 mojibake."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    for page in (_JA_EUC_HIRA, _JA_EUC_KANJI):
        payload = page.encode("euc-jp")
        assert detect_charset(payload) == "euc_jp"
        assert decode_payload(payload) == page
        assert decode_payload(memoryview(payload)) == page


def test_charset_undeclared_iso2022_jp_sniff():
    """Undeclared ISO-2022-JP is pure 7-bit (escape-shifted JIS), so it
    passes the strict-UTF-8 probe and used to surface as literal '$B…'
    escape soup; the sniff must catch it on the UTF-8 SUCCESS path, and
    the dispatcher's binary-ratio gate must not count the shift ESCs as
    junk bytes (word-by-word ASCII/JIS switching is ~13% ESC)."""
    from pdf_extraction_spark.kernels.dispatch import extract_document
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    for page in (_JA_EUC_HIRA, _JA_EUC_KANJI):
        payload = page.encode("iso-2022-jp")
        assert detect_charset(payload) == "iso2022_jp_ext"
        assert decode_payload(payload) == page
        assert decode_payload(memoryview(payload)) == page
        res = extract_document(payload)
        assert res["method"] == "html" and "$B" not in res["text"]


def test_charset_quoted_iso2022_escape_stays_utf8():
    """A valid UTF-8 page QUOTING the shift sequence (a code sample about
    the encoding) must stay on the UTF-8 lane: the following ASCII decodes
    as kanji soup under the probe and fails the kana-fraction gate."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    page = ("<html><body><p>The shift sequence <code>\x1b$B</code> switches "
            "to JIS X 0208 mode in ISO-2022-JP encoded mail.</p>"
            "</body></html>")
    payload = page.encode("utf-8")
    assert detect_charset(payload) == "utf-8"
    assert decode_payload(payload) == page


def test_charset_iso2022_jp_truncated_shift_degrades():
    """A payload cut mid-shift-sequence or mid-JIS-pair never raises."""
    from pdf_extraction_spark.kernels.html_extract import decode_payload

    full = _JA_EUC_KANJI.encode("iso-2022-jp")
    for cut in (len(full) - 1, len(full) - 3, 40, 17, 2):
        assert isinstance(decode_payload(full[:cut]), str)


def test_charset_declared_iso2022_jp_label():
    """Declared iso-2022-jp labels route through the _ext codec (the
    WHATWG decoder speaks ESC ( I half-width katakana, plain iso2022_jp
    does not)."""
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    payload = (b"<html><head><meta charset='iso-2022-jp'></head>"
               b"<body><p>x</p></body></html>")
    assert detect_charset(payload) == "iso2022_jp_ext"


def test_charset_cp949_rejects_jamo_majority():
    """The cp949 rung itself must reject a compatibility-jamo-majority
    decode even when probed directly (defense in depth below the ladder
    ordering): real Korean core is Hangul SYLLABLES."""
    from pdf_extraction_spark.kernels.html_extract import (
        _CJK_PROBE_CANDIDATES, _probe_one)

    cp949 = next(c for c in _CJK_PROBE_CANDIDATES if c[0] == "cp949")
    payload = _JA_EUC_HIRA.encode("euc-jp")
    # strictly cp949-decodable (all EUC-zone pairs) yet jamo, not Korean
    assert payload.decode("cp949")
    assert _probe_one(payload, cp949) is None


_JA_SJIS_KANJI = ("<html><body><main><p>東京都議会議員選挙結果速報。自由民主党、"
                  "立憲民主党、公明党、共産党各党派議席数確定。</p><p>経済産業省"
                  "発表統計資料集計方法変更影響分析報告書概要。</p></main>"
                  "</body></html>")


def test_charset_undeclared_sjis_kanji_probe():
    """The nearly-kana-free SJIS residual (documented tail through late
    r5): a kanji-heavy Shift-JIS page fails the cp932 rung's KANA gate and
    its pairs strict-decode on the gbk rung into hanzi mojibake (東京都…
    → 丄棫寷…). The 0x81-0x9F lead shape must give cp932 a hanzi-gated try
    first — and must NOT trigger on GB2312/Big5/EUC-KR/EUC-JP bytes."""
    from pdf_extraction_spark.kernels.html_extract import (
        _sjis_shaped, decode_payload, detect_charset)

    payload = _JA_SJIS_KANJI.encode("cp932")
    assert _sjis_shaped(payload)
    assert detect_charset(payload) == "cp932"
    assert decode_payload(payload) == _JA_SJIS_KANJI
    assert decode_payload(memoryview(payload)) == _JA_SJIS_KANJI
    # shape never fires on the EUC-zone family or latin bytes
    for page, codec in [(_ZH_PAGE, "gbk"), (_KO_PAGE, "cp949"),
                        (_JA_EUC_KANJI, "euc-jp")]:
        assert not _sjis_shaped(page.encode(codec))
    assert not _sjis_shaped("café crème déjà vu naïve façade".encode("cp1252"))


def test_charset_halfwidth_kana_euc_jp_probe():
    """A half-width-katakana-only EUC-JP page (legacy terminal text) is
    SJIS-shaped — its 0x8E SS2 shifts land in the 0x81-0x9F lead range —
    and used to mojibake (pre-tier: cp1252 fallthrough; post-tier: cp932
    kanji). The 0x8E-dominance sub-check must route it to euc_jp; a
    half-width SJIS page (single bytes, no 0x8E pairs) stays the
    documented fallthrough tail."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    txt = "ﾃﾞｰﾀﾌﾞﾝｾｷ ﾁｭｳｼｭﾂ ﾌﾞﾝｼｮ ﾋｮｳ ｽｳｼｷ ﾀﾞｲﾓｸ ﾀﾞﾝﾗｸ ﾓｸﾛｸ ﾃｽﾄ ﾍﾟｰｼﾞ"
    page = f"<html><body><p>{txt}</p></body></html>"
    payload = page.encode("euc-jp")
    assert detect_charset(payload) == "euc_jp"
    assert decode_payload(payload) == page
    assert decode_payload(memoryview(payload)) == page


def test_charset_undeclared_sjis_mixed_kana_probe():
    """The shaped rung's core class is kana∪kanji: a realistic terse-news
    page at ~30% kana / ~62% kanji fails BOTH the 1/3-kana gate and a
    kanji-only 2/3 core gate (repro'd: misrouted to gbk), but real
    Japanese prose is exactly this mix — the union admits it."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    page = ("<html><body><p>東京都議会は昨日、新年度予算案を可決した。"
            "総額は過去最大となり、子育て支援策の拡充が柱である。"
            "知事は記者会見で意義を強調した。</p></body></html>")
    payload = page.encode("cp932")
    assert detect_charset(payload) == "cp932"
    assert decode_payload(payload) == page


def test_charset_euc_jp_truncated_pair_degrades():
    """A payload cut mid-EUC-JP-pair must never raise; decode stays total."""
    from pdf_extraction_spark.kernels.html_extract import decode_payload

    full = _JA_EUC_KANJI.encode("euc-jp")
    for cut in (len(full) - 1, len(full) - 2, 37, 8, 1):
        assert isinstance(decode_payload(full[:cut]), str)


def test_charset_cjk_probe_precedence():
    """BOM and declared meta always beat the probe; valid UTF-8 never
    reaches it."""
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    # UTF-8 Korean stays UTF-8 (probe must not even be consulted)
    assert detect_charset(_KO_PAGE.encode("utf-8")) == "utf-8"
    # declared gbk label wins even if the bytes would also probe as cp949
    declared = ("<html><head><meta charset='gb2312'></head><body><p>"
                "中文文本测试页面编码声明优先</p></body></html>")
    assert detect_charset(declared.encode("gbk")) == "gbk"
    # BOM beats everything
    assert detect_charset(b"\xef\xbb\xbf" + _KO_PAGE.encode("utf-8")) == "utf-8-sig"


def test_charset_cjk_probe_cp1252_no_flip():
    """cp1252 pages must NOT flip to a CJK codec: realistic accents are
    isolated high bytes (invalid as a lone lead), and a repeated accent
    pair fails the distinct-core floor."""
    from pdf_extraction_spark.kernels.html_extract import (
        decode_payload, detect_charset)

    pages = [
        "<html><body><p>café crème — déjà vu € naïve ±façade héros</p></body></html>",
        "<html><body><p>Überraschung größer — schön für München</p></body></html>",
        "<html><body><p>" + "±ç" * 40 + " plain ascii words</p></body></html>",
        # ALL accents mid-word (accent+letter IS a valid GBK pair, so the
        # fraction/distinct floors alone would flip this page — only the
        # adjacent-high-pair structural gate saves it; found by hypothesis)
        "<html><body><p>Müller Böhm Jürgen Köln Würde schöne Mädchen Tür</p></body></html>",
        "<html><body><p>aàa bâb cäc dåd eæe fçf gèg héh</p></body></html>",
    ]
    for page in pages:
        payload = page.encode("cp1252")
        assert detect_charset(payload) == "windows-1252", page[:40]
        assert decode_payload(payload) == page


def test_charset_cjk_probe_truncated_pair_degrades():
    """A payload cut mid-multibyte-pair must never raise; decode stays
    total (either the probe still accepts a strict-decodable prefix or it
    falls back to the cp1252 path)."""
    from pdf_extraction_spark.kernels.html_extract import decode_payload

    full = _KO_PAGE.encode("cp949")
    for cut in (len(full) - 1, len(full) - 2, 37, 8, 1):
        out = decode_payload(full[:cut])
        assert isinstance(out, str)


def test_charset_declared_latin1_is_whatwg_cp1252():
    """The Encoding Standard folds iso-8859-1/ascii labels into windows-1252:
    0x80 must decode as € (cp1252), not U+0080 (Python's iso-8859-1)."""
    from pdf_extraction_spark.kernels.html_extract import detect_charset, extract_html

    body = b"<html><head><meta charset='iso-8859-1'></head><body><main><p>price \x80 99 with legacy euro byte text</p></main></body></html>"
    assert detect_charset(body) == "windows-1252"
    res = extract_html(body)
    assert "price € 99" in res["text"]


def test_charset_bom_beats_meta_declaration():
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    body = "<html><head><meta charset='iso-8859-1'></head><body><p>x</p></body></html>"
    payload = b"\xef\xbb\xbf" + body.encode("utf-8")
    assert detect_charset(payload) == "utf-8-sig"


def test_charset_cp1252_undefined_bytes_map_to_c1():
    """Bytes 81/8D/8F/90/9D are undefined in Python's cp1252 codec but map
    to C1 controls in the WHATWG table — decode must be total, no U+FFFD."""
    from pdf_extraction_spark.kernels.html_extract import _decode_cp1252

    assert _decode_cp1252(b"\x80\x81\x8d\x8f\x90\x9d\x9f") == "€\x81\x8d\x8f\x90\x9dŸ"
    # full-range totality
    assert len(_decode_cp1252(bytes(range(256)))) == 256


def test_rcdata_elements_never_tokenize_their_bodies():
    """HTML5 RCDATA: markup-looking text inside <title>/<textarea> is text,
    not tags — it must neither leak into content nor corrupt the open-tag
    stack (a stray '</head>' inside a title must not pop the real head)."""
    r = extract_html(
        b"<html><body><textarea>not <p>a paragraph</p></textarea>"
        b"<p>actual body text</p></body></html>"
    )
    assert r["text"] == "actual body text"
    r = extract_html(
        b"<html><head><title>see </head> for</title></head>"
        b"<body><p>only this content stays</p></body></html>"
    )
    assert r["text"] == "only this content stays"


def test_gzipped_payload_is_unwrapped_at_dispatch():
    import gzip

    from pdf_extraction_spark.kernels.dispatch import extract_document

    doc = b"<html><body><p>still compressed when it landed in the table</p></body></html>"
    r = extract_document(gzip.compress(doc, mtime=0))
    assert r["method"] == "html"
    assert r["text"] == "still compressed when it landed in the table"
    # corrupt gzip: total, classified binary by the ratio gate
    r2 = extract_document(b"\x1f\x8b\x08" + b"\x00\xff" * 64)
    assert r2["method"] == "binary" and isinstance(r2["text"], str)


def test_anchor_links_collected():
    """<a href> anchors come back in document order with anchor text and
    the chrome (boilerplate-region) flag."""
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<main><p>See <a href='/doc/2'>the next doc</a> and "
        "<a href='https://other.example.org/x?q=1#frag'>external</a>.</p>"
        "</main></body></html>"
    )
    r = extract_html(html)
    assert r["links"] == [
        {"href": "/", "text": "Home", "chrome": True, "nofollow": False},
        {"href": "/doc/2", "text": "the next doc", "chrome": False,
         "nofollow": False},
        {"href": "https://other.example.org/x?q=1#frag", "text": "external",
         "chrome": False, "nofollow": False},
    ]


def test_anchor_links_malformed_and_hrefless():
    """Unclosed anchors still flush; <a> without href contributes nothing;
    extraction text is unaffected by link collection."""
    r = extract_html(
        "<p>surrounding prose keeps the block below the link-density gate "
        "<a name='x'>plain</a> <a href='/y'>dangling</p>")
    assert [l["href"] for l in r["links"]] == ["/y"]
    assert "plain" in r["text"] and "dangling" in r["text"]


def test_resolve_link_normalization():
    from pdf_extraction_spark.kernels.urlnorm import resolve_link

    base = "https://h.example.com/a/b"
    assert resolve_link(base, "../c") == "https://h.example.com/c"
    assert resolve_link(base, "//other.com/z") == "https://other.com/z"
    assert resolve_link(base, "HTTP://UP.COM:80/P?q#f") == "http://up.com/P?q"
    assert resolve_link(base, "https://x.com:8443/p") == "https://x.com:8443/p"
    for bad in ("javascript:void(0)", "mailto:x@y.z", "#frag", "", "data:,x"):
        assert resolve_link(base, bad) is None


def test_head_title_and_meta():
    """Head <title> (RCDATA, entity-unescaped, first wins) and <meta>
    name/content pairs surface as document metadata without contributing
    main-content text."""
    html = (
        "<html><head><title>My &amp; Title</title>"
        "<meta name='robots' content='noindex, nofollow'>"
        "<meta name='author' content='A. Writer'/>"
        "<meta property='og:title' content='OG'></head>"
        "<body><main><p>body words only here</p></main></body></html>"
    )
    r = extract_html(html)
    assert r["meta"] == {"title": "My & Title", "author": "A. Writer",
                         "robots": "noindex, nofollow", "base": None,
                         "canonical": None, "refresh_delay": None,
                         "refresh_url": None}
    assert "Title" not in r["text"]


def test_base_href_captured():
    """<base href> surfaces in meta (first wins) for link resolution."""
    html = ("<html><head><base href='https://cdn.example.net/sub/'>"
            "<base href='https://ignored.example/'></head>"
            "<body><main><p>content body words</p></main></body></html>")
    r = extract_html(html)
    assert r["meta"]["base"] == "https://cdn.example.net/sub/"
    r2 = extract_html("<p>no base here at all words</p>")
    assert r2["meta"]["base"] is None


def test_anchor_rel_nofollow_flag():
    from pdf_extraction_spark.kernels.html_extract import extract_html

    res = extract_html(
        "<body><a href='/x' rel='nofollow noopener'>a</a>"
        "<a href='/y' rel='NOFOLLOW'>b</a>"
        "<a href='/z' rel='noopener'>c</a><a href='/w'>d</a></body>"
    )
    flags = {l["href"]: l["nofollow"] for l in res["links"]}
    assert flags == {"/x": True, "/y": True, "/z": False, "/w": False}


def test_link_rel_canonical_first_wins():
    from pdf_extraction_spark.kernels.html_extract import extract_html

    res = extract_html(
        "<head><link rel='stylesheet' href='/s.css'>"
        "<link rel='canonical' href='/one'>"
        "<link rel='canonical' href='/two'></head><body><p>x</p></body>"
    )
    assert res["meta"]["canonical"] == "/one"


def test_no_canonical_is_none():
    from pdf_extraction_spark.kernels.html_extract import extract_html

    assert extract_html("<body><p>x</p></body>")["meta"]["canonical"] is None


def test_headings_outline_levels_and_gates():
    """h1-h6 blocks surface as a (level, text) outline; chrome headings and
    link-farm headings are gated out like any title block."""
    r = extract_html(
        "<body><header><h1>Site Banner</h1></header><main>"
        "<h1>Top</h1><p>long enough paragraph body text right here ok</p>"
        "<h2>Sub one</h2><h3>Deeper</h3><h2>Sub two</h2></main></body>"
    )
    assert r["headings"] == [(1, "Top"), (2, "Sub one"), (3, "Deeper"),
                             (2, "Sub two")]
    assert extract_html("<p>no headings at all</p>")["headings"] == []


def test_meta_refresh_parsed_and_null_on_junk():
    r = extract_html(
        "<head><meta http-equiv='refresh' content='3;url=/n'></head>"
        "<body><p>x</p></body>"
    )
    assert (r["meta"]["refresh_delay"], r["meta"]["refresh_url"]) == (3, "/n")
    r2 = extract_html(
        "<head><meta http-equiv='refresh' content='not a delay'></head>"
        "<body><p>x</p></body>"
    )
    assert r2["meta"]["refresh_url"] is None and r2["meta"]["refresh_delay"] is None


def test_image_assets_collected():
    from pdf_extraction_spark.kernels.html_extract import extract_html_assets

    a = extract_html_assets(
        "<body><nav><img src='/logo.png' alt='Site  Logo'></nav>"
        "<main><img src='fig1.jpg' alt='A  diagram'><img src='' alt='x'>"
        "<script>var i='<img src=fake.png>';</script>"
        "<img src='plain.gif'></main></body>"
    )
    assert a == [
        {"src": "/logo.png", "alt": "Site Logo", "chrome": True, "srcset": []},
        {"src": "fig1.jpg", "alt": "A diagram", "chrome": False, "srcset": []},
        {"src": "plain.gif", "alt": "", "chrome": False, "srcset": []},
    ]
    assert extract_html_assets(b"\xff\xfejunk") == []


def test_jsonld_blocks_parsed_flattened_and_total():
    from pdf_extraction_spark.kernels.html_extract import extract_jsonld

    h = (
        "<head>"
        "<script type='application/ld+json'>"
        '{"@type":"NewsArticle","headline":"Big News"}</script>'
        "<script type='application/ld+json'>"
        '[{"@type":"Product","name":"X"},{"@type":"Offer"}]</script>'
        "<script type='application/ld+json'>"
        '{"@graph":[{"@type":"WebSite"},{"@type":"Organization"}]}</script>'
        "<script type='application/ld+json'>{broken</script>"
        "<script>var x = 1;</script>"
        "</head><body><p>body text stays unaffected here ok</p></body>"
    )
    types = [o.get("@type") for o in extract_jsonld(h)]
    assert types == ["NewsArticle", "Product", "Offer", "WebSite",
                     "Organization"]
    assert extract_html(h)["text"] == "body text stays unaffected here ok"
    assert extract_jsonld(b"\x00garbage") == []


def test_img_srcset_candidates():
    from pdf_extraction_spark.kernels.html_extract import extract_html_assets

    a = extract_html_assets(
        "<main><img src='a.jpg' srcset='a-1x.jpg 1x, a-2x.jpg 2x,a-3x.jpg 3x'>"
        "<img srcset='only.jpg 480w'></main>"
    )
    assert a[0]["srcset"] == [("a-1x.jpg", "1x"), ("a-2x.jpg", "2x"),
                              ("a-3x.jpg", "3x")]
    assert a[1]["src"] is None and a[1]["srcset"] == [("only.jpg", "480w")]


def test_meta_map_first_wins_and_title():
    from pdf_extraction_spark.kernels.html_extract import extract_meta_map

    m = extract_meta_map(
        "<head><title>Page T</title>"
        "<meta property='og:title' content='OG One'>"
        "<meta property='og:title' content='OG Two'>"
        "<meta name='description' content=' spaced   out '></head>"
    )
    assert m["og:title"] == "OG One"        # first occurrence wins
    assert m["description"] == "spaced out"  # normalized
    assert m["title"] == "Page T"
    assert extract_meta_map(b"\xff\xfejunk") == {} or isinstance(
        extract_meta_map(b"\xff\xfejunk"), dict)


def test_feed_autodiscovery_links():
    from pdf_extraction_spark.kernels.html_extract import extract_feed_links

    f = extract_feed_links(
        "<head><link rel='canonical' href='/c'>"
        "<link rel='alternate' type='application/rss+xml' href='/feed.xml'"
        " title='Main  Feed'>"
        "<link rel='alternate' type='application/atom+xml' href='/atom.xml'>"
        "<link rel='alternate' type='text/html' href='/mobile'>"
        "<link rel='stylesheet' href='/s.css'></head>"
    )
    assert f == [
        {"href": "/feed.xml", "kind": "rss", "title": "Main Feed"},
        {"href": "/atom.xml", "kind": "atom", "title": ""},
    ]
    assert extract_feed_links(b"\x00junk") == []


def test_omitted_head_close_does_not_swallow_body():
    """Review finding: </head> is optional per the HTML spec, but the head's
    drop scope stayed open and swallowed the whole document. A body-content
    tag now implicitly closes an open <head>; real drop subtrees (svg,
    iframe) keep dropping."""
    from pdf_extraction_spark.kernels.html_extract import extract_html

    r = extract_html(b"<html><head><title>T</title><body>"
                     b"<p>Hello world from the body of this page today</p>"
                     b"</body></html>")
    assert "Hello world" in r["text"]
    r = extract_html(b'<html><head><meta charset="utf-8">'
                     b"<p>straight into content here we go today</p></html>")
    assert "straight into content" in r["text"]
    r = extract_html(b"<html><head><title>T</title></head><body>"
                     b"<svg><p>inside svg dropped</p></svg>"
                     b"<p>kept body paragraph content here</p></body></html>")
    assert "inside svg" not in r["text"]
    assert "kept body paragraph" in r["text"]


def test_non_text_charset_labels_are_ignored():
    """Review finding: codecs.lookup accepts bytes-to-bytes transforms
    (base64, hex, zlib, rot13), so a page declaring one blew up the decode
    and extracted empty. WHATWG: unrecognized labels are ignored and
    detection continues (UTF-8 probe / CJK ladder / cp1252 default)."""
    from pdf_extraction_spark.kernels.html_extract import extract_html

    for lab in ("base64", "hex", "zlib_codec", "rot13", "quopri_codec",
                "bogus-enc"):
        b = (f'<html><head><meta charset="{lab}"></head><body>'
             f"<p>plain ascii page body with words</p></body></html>").encode()
        r = extract_html(b)
        assert "plain ascii page body" in r["text"] and r["error"] is None, lab
    # real declared codecs still honored
    b = ('<html><head><meta charset="euc-kr"></head><body>'
         "<p>한국어 본문 내용입니다 좋아요</p></body></html>").encode("euc-kr")
    assert "한국어 본문" in extract_html(b)["text"]


def test_all_chrome_page_fallback():
    """Review finding: the _CHROME_TAGS contract says chrome blocks survive
    when the page has no other content at all, but _classify dropped them
    unconditionally — splash/landing pages extracted empty. The fallback
    types blocks by their outermost chrome container on the weaker 0.6
    confidence base; any real content still suppresses chrome entirely."""
    from pdf_extraction_spark.kernels.html_extract import extract_html

    r = extract_html(
        b"<html><body><header><h1>Acme Launch</h1></header><footer>"
        b"<p>Contact us at the office for more information today</p>"
        b"</footer></body></html>")
    assert "Acme Launch" in r["text"] and "Contact us" in r["text"]
    kinds = {s[0] for s in r["spans"]}
    assert "footer" in kinds and "header" in kinds
    assert all(s[5] <= 0.6 for s in r["spans"])  # fallback confidence base
    r2 = extract_html(
        b"<html><body><header><h1>Acme Launch</h1></header>"
        b"<p>Real main body content paragraph sits here with words</p>"
        b"</body></html>")
    assert "Acme Launch" not in r2["text"]
    assert "Real main body" in r2["text"]
    # an all-nav link farm still extracts empty (gates apply in fallback)
    links = "".join(f'<a href="/p{i}">item {i}</a> ' for i in range(20))
    r3 = extract_html(f"<html><body><nav>{links}</nav></body></html>".encode())
    assert r3["text"] == ""


def test_charset_prescan_skips_comments():
    """Review finding: the meta-charset prescan matched inside <!-- -->
    comments, so a commented-out declaration hijacked the decode. WHATWG
    prescan skips comments (an unterminated one swallows the rest of the
    window); a real meta after a comment still wins."""
    from pdf_extraction_spark.kernels.html_extract import detect_charset

    b = (b'<html><head><!-- <meta charset="euc-kr"> --></head>'
         b"<body><p>plain ascii words</p></body></html>")
    assert detect_charset(b) == "utf-8"
    b = b'<html><head><!-- oops <meta charset="euc-kr"></head><body><p>x</p>'
    assert detect_charset(b) == "utf-8"
    b = (b'<html><head><!-- c --><meta charset="windows-1252"></head>'
         b"<body>\xe9</body></html>")
    assert detect_charset(b) == "windows-1252"


def test_nested_bare_anchor_keeps_outer_link_text():
    """Review finding: href-less <a> pushed nothing but every </a> popped,
    so a nested bare anchor closed the enclosing link early and truncated
    its anchor text. Bare anchors now push a sentinel whose text folds
    back into the enclosing link."""
    from pdf_extraction_spark.kernels.html_extract import extract_html

    r = extract_html(b'<html><body><p><a href="/x">X <a>inner words</a>'
                     b" Y tail</a> after</p></body></html>")
    link = next(l for l in r["links"] if l["href"] == "/x")
    assert "inner words" in link["text"] and "Y tail" in link["text"]
    r = extract_html(b"<html><body><p><a>named anchor</a> plain text"
                     b" continues here today</p></body></html>")
    assert all(l["href"] for l in r["links"])


def test_jsonld_type_with_parameters():
    """Review finding: a MIME type parameter ('application/ld+json;
    charset=utf-8', legal per RFC 2045) failed the exact-match test and
    the block was skipped."""
    from pdf_extraction_spark.kernels.html_extract import extract_jsonld

    out = extract_jsonld(
        b"<html><head><script type='application/ld+json; charset=utf-8'>"
        b'{"@type":"Article","headline":"H"}</script></head>'
        b"<body><p>body content paragraph here</p></body></html>")
    assert out and out[0].get("@type") == "Article"
