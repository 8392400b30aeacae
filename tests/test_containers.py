"""Media-container header codec tests: builder→parser roundtrips, corrupt
degradation, and totality on junk (VERDICT r2 item 3 — the r2 decode path
raised NotImplementedError on real PNG/JPEG/RIFF bytes)."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.kernels import containers


def _meta(fmt="corrupt", w=-1, h=-1, sr=-1, ch=-1, dur=-1):
    return {
        "fmt": fmt, "width": w, "height": h,
        "sample_rate": sr, "channels": ch, "duration_ms": dur,
    }


@pytest.mark.parametrize("w,h", [(1, 1), (16, 117), (640, 480), (65535, 3)])
def test_png_roundtrip(w, h):
    meta = containers.decode_container(containers.build_png(w, h))
    assert meta == _meta("png", w, h)


@pytest.mark.parametrize("w,h", [(1, 1), (16, 117), (1920, 1080)])
def test_jpeg_roundtrip(w, h):
    meta = containers.decode_container(containers.build_jpeg(w, h))
    assert meta == _meta("jpeg", w, h)


@pytest.mark.parametrize("sr,ch", [(8000, 1), (44100, 2), (48000, 6)])
def test_wav_roundtrip(sr, ch):
    meta = containers.decode_container(containers.build_wav(sr, ch))
    assert meta == _meta("wav", sr=sr, ch=ch)


@pytest.mark.parametrize("w,h", [(1, 1), (16, 117), (320, 200), (65535, 3)])
def test_gif_roundtrip(w, h):
    meta = containers.decode_container(containers.build_gif(w, h))
    assert meta == _meta("gif", w, h)


@pytest.mark.parametrize("w,h,dur", [(1, 1, 1), (320, 240, 5000), (1920, 1080, 3_600_000)])
def test_mp4_roundtrip(w, h, dur):
    meta = containers.decode_container(containers.build_mp4(w, h, dur))
    assert meta == _meta("mp4", w, h, dur=dur)


def test_payload_sizes_dimension_independent():
    assert len(containers.build_png(1, 1)) == len(containers.build_png(9999, 2))
    assert len(containers.build_jpeg(1, 1)) == len(containers.build_jpeg(9999, 2))
    assert len(containers.build_wav(8000, 1)) == len(containers.build_wav(48000, 1))
    assert len(containers.build_gif(1, 1)) == len(containers.build_gif(9999, 2))
    assert len(containers.build_mp4(1, 1, 1)) == len(containers.build_mp4(1920, 1080, 10**7))
    # wav grows 8 bytes per extra channel (2-byte samples x 4 frames)
    assert len(containers.build_wav(8000, 2)) == containers.WAV_BYTES + 8


def test_png_bad_crc_is_corrupt():
    png = bytearray(containers.build_png(10, 10))
    png[20] ^= 0xFF  # flip a width byte without fixing the CRC
    assert containers.decode_container(bytes(png))["fmt"] == "corrupt"


def test_jpeg_missing_sof_is_corrupt():
    jpg = containers.build_jpeg(10, 10).replace(b"\xff\xc0", b"\xff\xfe")
    assert containers.decode_container(jpg)["fmt"] == "corrupt"


def test_riff_non_wave_is_corrupt():
    avi = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    assert containers.decode_container(avi)["fmt"] == "corrupt"


def test_non_container_raises():
    with pytest.raises(ValueError):
        containers.decode_container(b"plain text payload")


def test_mp4_truncated_moov_is_corrupt():
    mp4 = containers.build_mp4(320, 240, 1000)
    assert containers.decode_container(mp4[:40])["fmt"] == "corrupt"


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=64))
def test_parser_total_on_junk_after_signature(tail):
    """Truncated/garbage bytes after any container signature must degrade to
    'corrupt', never raise."""
    for sig in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"RIFF",
                b"GIF89a", b"\x00\x00\x00\x14ftyp"):
        meta = containers.decode_container(sig + tail)
        assert meta["fmt"] in ("png", "jpeg", "wav", "gif", "mp4", "corrupt")


def test_webp_lossy_lossless_and_extended():
    from pdf_extraction_spark.kernels.containers import build_webp, decode_container
    import struct

    for w, h in ((64, 48), (1, 1), (16383, 16383)):
        for lossless in (False, True):
            d = decode_container(build_webp(w, h, lossless=lossless))
            assert d["fmt"] == "webp"
            assert (d["width"], d["height"]) == (w, h), (w, h, lossless)
    # VP8X extended-format chunk (24-bit w-1/h-1)
    body = b"\x00\x00\x00\x00" + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    d = decode_container(payload)
    assert (d["fmt"], d["width"], d["height"]) == ("webp", 640, 480)
    # truncation degrades to corrupt, never raises
    assert decode_container(build_webp(64, 48)[:14])["fmt"] == "corrupt"


def test_jpeg_fill_bytes_before_marker():
    """Review finding: 0xFF fill/padding bytes before a marker (ISO 10918-1
    B.1.1.2) read a bogus segment length and skipped past the real SOF."""
    jpg = containers.build_jpeg(320, 240)
    # splice two fill bytes right after SOI, before the first real marker
    padded = jpg[:2] + b"\xff\xff" + jpg[2:]
    assert containers.decode_container(padded) == _meta("jpeg", 320, 240)


def test_bmff_largesize_and_to_eof_boxes():
    """Review finding: size==1 (64-bit largesize) and size==0 (box-to-EOF)
    boxes stopped the walk, so the standard big-mdat layout (ftyp, mdat
    with largesize, moov) reported corrupt for a valid video."""
    mp4 = containers.build_mp4(640, 360, 2500)
    # locate moov and rebuild: ftyp + largesize-mdat + original moov
    at = mp4.find(b"moov") - 4
    ftyp, moov = mp4[:at], mp4[at:]
    mdat_payload = b"\x00" * 32
    mdat = (struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload)
    meta = containers.decode_container(ftyp + mdat + moov)
    assert meta == _meta("mp4", 640, 360, dur=2500)
    # box-to-EOF: a size-0 free box at the tail must not be 'corrupt'
    meta2 = containers.decode_container(
        mp4 + struct.pack(">I", 0) + b"free" + b"\x00" * 8)
    assert meta2 == _meta("mp4", 640, 360, dur=2500)


def test_dispatch_gunzip_cap_blocks_bombs():
    """Review finding: unbounded gzip.decompress let a small bomb allocate
    the full plaintext before any except clause could run. The streamed
    read caps inflation; over-cap payloads degrade to the binary gate."""
    import gzip

    from pdf_extraction_spark.kernels import dispatch

    # normal gzipped HTML still unwraps transparently
    page = b"<html><body><p>hello gzip world</p></body></html>"
    res = dispatch.extract_document(gzip.compress(page))
    assert res["method"] == "html" and "hello gzip world" in res["text"]
    # a payload inflating past the cap is NOT inflated (monkeypatch the cap
    # so the test stays tiny); the compressed bytes hit the binary gate
    old = dispatch._GUNZIP_CAP
    dispatch._GUNZIP_CAP = 1024
    try:
        bomb = gzip.compress(b"\x00" * 100_000)
        res = dispatch.extract_document(bomb)
        assert res["method"] == "binary" and res["error"]
    finally:
        dispatch._GUNZIP_CAP = old
