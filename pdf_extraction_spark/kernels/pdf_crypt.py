"""PDF standard security handler (PDF 32000-1 §7.6.3): empty-user-password
decryption for RC4-40/128 (/V 1-2, /R 2-3) and AES-128 (/V 4 /R 4, /CFM
/V2 or /AESV2), plus the writer side used to build encrypted fixtures.

VERDICT r2 item 6 — the r2 kernel surfaced `error='encrypted'` for every
/Encrypt document; most encrypted PDFs in the wild have an EMPTY user
password (permissions-only encryption) and are readable by the reference
via PyMuPDF. This module derives the file key from the empty password
(algorithm 2), verifies it against /U (algorithms 4/5), and decrypts
strings and streams with per-object keys (algorithm 1). Wrong/required
passwords still fail closed: :func:`open_decryptor` raises
PasswordRequired and the extractor degrades to error='encrypted'.
"""

from __future__ import annotations

import hashlib
import struct

from .crypto import aes_cbc_decrypt, aes_cbc_encrypt, rc4

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class PasswordRequired(Exception):
    """A non-empty user password is required to open the document."""


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + _PAD)[:32]


def _file_key(user_pwd: bytes, o: bytes, p: int, id0: bytes, rev: int,
              key_len: int, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(user_pwd))
    h.update(o[:32])
    # /P is a signed 32-bit value, but several real producers store the
    # unsigned form (e.g. 4294963392 for -3904) — masking accepts both
    # without changing the hashed little-endian bytes
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if rev >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def _compute_o(owner_pwd: bytes, user_pwd: bytes, rev: int, key_len: int) -> bytes:
    """Algorithm 3: the /O value."""
    key = hashlib.md5(_pad_password(owner_pwd or user_pwd)).digest()
    if rev >= 3:
        for _ in range(50):
            # Algorithm 3 step (c): re-hash only the first key_len bytes
            # (coincides with the full digest when key_len == 16)
            key = hashlib.md5(key[:key_len]).digest()
    key = key[:key_len]
    o = rc4(key, _pad_password(user_pwd))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _compute_u(file_key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R>=3): the /U value."""
    if rev == 2:
        return rc4(file_key, _PAD)
    u = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # 16 arbitrary padding bytes per spec


class StandardDecryptor:
    """Per-object decryption once the file key is verified.

    Streams and strings carry independent ciphers (/StmF vs /StrF crypt
    filters, PDF 32000-1 §7.6.5): a /V 4 document may legally declare
    ``/StmF /Identity`` (plaintext streams) while strings stay encrypted,
    or vice versa — 'identity' is a pass-through, never a cipher pass.
    ``cipher``/``string_cipher`` ∈ {'identity', 'rc4', 'aes'}.
    """

    def __init__(self, file_key: bytes, aes: bool | str,
                 string_cipher: str | None = None):
        self.file_key = file_key
        if isinstance(aes, bool):  # legacy /V 1-2 form: one cipher for both
            aes = "aes" if aes else "rc4"
        self.stream_cipher = aes
        self.string_cipher = string_cipher if string_cipher is not None else aes

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        h = hashlib.md5()
        h.update(self.file_key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", gen)[:2])
        if aes:
            h.update(b"sAlT")
        return h.digest()[: min(len(self.file_key) + 5, 16)]

    def _apply(self, cipher: str, num: int, gen: int, data: bytes) -> bytes:
        if cipher == "identity":
            return data
        key = self._object_key(num, gen, cipher == "aes")
        if cipher == "aes":
            try:
                return aes_cbc_decrypt(key, data)
            except ValueError:
                return b""
        return rc4(key, data)

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        """Stream-bytes decryption (/StmF cipher)."""
        return self._apply(self.stream_cipher, num, gen, data)

    def decrypt_string(self, num: int, gen: int, data: bytes) -> bytes:
        """String decryption (/StrF cipher)."""
        return self._apply(self.string_cipher, num, gen, data)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        key = self._object_key(num, gen, self.stream_cipher == "aes")
        if self.stream_cipher == "aes":
            # deterministic IV derived from the object number: fixtures must
            # be reproducible; uniqueness per object is what CBC needs here
            iv = hashlib.md5(b"iv:%d:%d" % (num, gen)).digest()
            return aes_cbc_encrypt(key, iv, data)
        return rc4(key, data)


def open_decryptor(enc: dict, id0: bytes, resolve=lambda v: v) -> StandardDecryptor:
    """Build a :class:`StandardDecryptor` from a trailer /Encrypt dict with
    the EMPTY user password. Raises PasswordRequired if the document needs a
    real password, ValueError for unsupported handlers."""
    if str(resolve(enc.get("Filter", ""))) != "Standard":
        raise ValueError("unsupported security handler")
    v = int(resolve(enc.get("V", 0)) or 0)
    r = int(resolve(enc.get("R", 2)) or 2)
    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise ValueError(f"unsupported /V {v} /R {r}")
    o = resolve(enc.get("O"))
    u = resolve(enc.get("U"))
    if not isinstance(o, bytes) or not isinstance(u, bytes):
        raise ValueError("missing /O or /U")
    p = int(resolve(enc.get("P", -1)))
    key_len = int(resolve(enc.get("Length", 40)) or 40) // 8 if v >= 2 else 5
    stream_cipher = string_cipher = "rc4"
    encrypt_metadata = resolve(enc.get("EncryptMetadata", True))
    if v == 4:
        # /StmF and /StrF name the crypt filters for streams and strings
        # independently; both default to Identity (pass-through) per spec.
        # A named filter MUST resolve through /CF — fail closed otherwise
        # rather than guessing a cipher and shredding plaintext.
        cf = resolve(enc.get("CF")) or {}

        def _cipher(which: str) -> str:
            name = str(resolve(enc.get(which, "Identity")))
            if name == "Identity":
                return "identity"
            cfd = resolve(cf.get(name)) if isinstance(cf, dict) else None
            if not isinstance(cfd, dict):
                raise ValueError(f"/{which} {name} has no /CF entry")
            cfm = str(resolve(cfd.get("CFM", "None")))
            if cfm == "AESV2":
                return "aes"
            if cfm == "V2":
                # the crypt filter's own /Length (in BYTES per spec example,
                # though some producers write bits) beats the top-level
                # default — without it a 128-bit V2 filter derived a 40-bit
                # key and readable documents degraded to 'encrypted'
                nonlocal key_len
                cl = resolve(cfd.get("Length"))
                if cl:
                    cl = int(cl)
                    key_len = cl // 8 if cl >= 40 else cl
                return "rc4"
            raise ValueError(f"unsupported /CFM {cfm}")

        stream_cipher = _cipher("StmF")
        string_cipher = _cipher("StrF")
        if "aes" in (stream_cipher, string_cipher):
            key_len = 16
    key = _file_key(b"", o, p, id0, r, key_len,
                    encrypt_metadata=bool(encrypt_metadata))
    expect_u = _compute_u(key, id0, r)
    ok = expect_u[:16] == u[:16] if r >= 3 else expect_u == u[:32]
    if not ok:
        raise PasswordRequired("empty user password rejected")
    return StandardDecryptor(key, stream_cipher, string_cipher)


# -- writer side ----------------------------------------------------------------------


class StandardEncryptor:
    """Fixture-side standard security handler with empty user/owner
    passwords. ``cipher`` ∈ {'rc4-40', 'rc4-128', 'aes-128'}."""

    def __init__(self, cipher: str, id0: bytes, p: int = -44,
                 user_pwd: bytes = b""):
        self.cipher = cipher
        self.id0 = id0
        self.p = p
        if cipher == "rc4-40":
            self.v, self.r, key_len, self.aes = 1, 2, 5, False
        elif cipher == "rc4-128":
            self.v, self.r, key_len, self.aes = 2, 3, 16, False
        elif cipher == "aes-128":
            self.v, self.r, key_len, self.aes = 4, 4, 16, True
        else:
            raise ValueError(f"unknown cipher {cipher}")
        self.o = _compute_o(b"", user_pwd, self.r, key_len)
        self.key = _file_key(user_pwd, self.o, self.p, id0, self.r, key_len)
        self.u = _compute_u(self.key, id0, self.r)
        self._dec = StandardDecryptor(self.key, self.aes)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        return self._dec.encrypt(num, gen, data)

    def encrypt_dict_body(self) -> bytes:
        def hexstr(b: bytes) -> str:
            return "<" + b.hex().upper() + ">"

        base = "/Filter /Standard /V %d /R %d /P %d /O %s /U %s" % (
            self.v, self.r, self.p, hexstr(self.o), hexstr(self.u[:32]),
        )
        if self.v == 2:
            base += " /Length 128"
        if self.v == 4:
            base += (
                " /Length 128 /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        return ("<< %s >>" % base).encode()
