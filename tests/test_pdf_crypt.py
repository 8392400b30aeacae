"""Encrypted-PDF tests (VERDICT r2 item 6): empty-user-password RC4-40/128
and AES-128 documents must decrypt and extract byte-identically; documents
needing a real password must still degrade to error='encrypted'."""

import functools

import pytest

from pdf_extraction_spark.kernels import pdf_crypt
from pdf_extraction_spark.kernels.crypto import (
    AES128,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    rc4,
)
from pdf_extraction_spark.kernels.pdf_extract import extract_pdf, extract_table_cells
from pdf_extraction_spark.kernels.pdf_write import build_pdf

TEXT = "Secret contents revealed only through empty-password decryption. Zürich café!"


def test_aes_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = AES128(key).encrypt_block(pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert AES128(key).decrypt_block(ct) == pt


def test_rc4_vector():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"


def test_cbc_roundtrip_and_padding_errors():
    key = b"0123456789abcdef"
    data = b"x" * 37
    assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, bytes(16), data)) == data
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, b"short")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, bytes(48))  # zero padding byte is invalid


@pytest.mark.parametrize("cipher", ["rc4-40", "rc4-128", "aes-128"])
@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"compress": True, "xref_stream": True},
        {"compress": True, "xref_stream": True, "objstm": True},
        {"encoding": "type0", "compress": True},
    ],
)
def test_encrypted_roundtrip(cipher, kw):
    pdf = build_pdf(TEXT, title="Locked Döc", encrypt=cipher, **kw)
    assert b"Secret contents" not in pdf  # ciphertext only
    out = extract_pdf(pdf)
    assert out["error"] is None
    assert out["text"] == "Locked Döc\n\n" + TEXT


def test_encrypted_table_cells():
    rows = [["alpha", "one"], ["beta", "two"]]
    pdf = build_pdf("", table_rows=rows, encrypt="aes-128")
    tables = extract_table_cells(pdf)
    assert len(tables) == 1
    got = {(c["row"], c["col"]): c["text"] for c in tables[0]["cells"]}
    assert got == {(0, 0): "alpha", (0, 1): "one", (1, 0): "beta", (1, 1): "two"}


def test_real_password_still_fails_closed(monkeypatch):
    """A document whose user password is NOT empty must keep degrading to
    error='encrypted' — never emit ciphertext as text."""
    monkeypatch.setattr(
        pdf_crypt,
        "StandardEncryptor",
        functools.partial(pdf_crypt.StandardEncryptor, user_pwd=b"secret"),
    )
    pdf = build_pdf(TEXT, encrypt="rc4-128")
    out = extract_pdf(pdf)
    assert out["error"] == "encrypted"
    assert out["text"] == "" and out["n_elements"] == 0


def test_unsupported_handler_fails_closed():
    pdf = build_pdf(TEXT, encrypt="rc4-128")
    pdf = pdf.replace(b"/Filter /Standard", b"/Filter /MySecret")
    out = extract_pdf(pdf)
    assert out["error"] == "encrypted" and out["text"] == ""
