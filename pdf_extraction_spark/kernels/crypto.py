"""Pure-stdlib primitives for PDF standard-security-handler decryption:
RC4 and AES-128-CBC (FIPS-197 / PDF 32000-1 §7.6.2-3).

No third-party crypto libraries exist in this container, and the goal is
READING encrypted-but-open documents (empty user password — common in the
wild, readable by the reference via PyMuPDF), so a compact from-scratch
implementation is appropriate. The AES tables are generated from the
GF(2^8) arithmetic rather than transcribed, and the FIPS-197 appendix C
vector is pinned in tests/test_pdf_crypt.py.
"""

from __future__ import annotations

# -- RC4 ------------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# -- AES-128 --------------------------------------------------------------------------
# tables generated from GF(2^8) with the AES polynomial 0x11B

_EXP = [0] * 510
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _EXP[_i + 255] = _x
    _LOG[_x] = _i
    _x ^= (_x << 1) ^ (0x11B if _x & 0x80 else 0)  # multiply by 3 (generator)


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(b: int, n: int) -> int:
    return ((b << n) | (b >> (8 - n))) & 0xFF


_SBOX = [0] * 256
_INV_SBOX = [0] * 256
for _a in range(256):
    _inv = _EXP[255 - _LOG[_a]] if _a else 0
    _s = _inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2) ^ _rotl8(_inv, 3) ^ _rotl8(_inv, 4) ^ 0x63
    _SBOX[_a] = _s
    _INV_SBOX[_s] = _a

_RCON = [0x01]
for _i in range(9):
    _RCON.append(_gmul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule → 11 round keys of 16 bytes (column-major words)."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[r * 4 : r * 4 + 4], []) for r in range(11)]


def _add_round_key(state: list[int], rk: list[int]):
    for i in range(16):
        state[i] ^= rk[i]


def _shift_rows(s: list[int], inv: bool):
    # state is column-major: s[c*4 + r]
    for r in range(1, 4):
        row = [s[c * 4 + r] for c in range(4)]
        k = -r if inv else r
        row = row[k:] + row[:k]
        for c in range(4):
            s[c * 4 + r] = row[c]


def _mix_columns(s: list[int], inv: bool):
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    for c in range(4):
        col = s[c * 4 : c * 4 + 4]
        for r in range(4):
            s[c * 4 + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )


class AES128:
    def __init__(self, key: bytes):
        if len(key) != 16:
            raise ValueError("AES-128 key must be 16 bytes")
        self._rk = _expand_key(key)

    def encrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        _add_round_key(s, self._rk[0])
        for rnd in range(1, 10):
            s = [_SBOX[b] for b in s]
            _shift_rows(s, inv=False)
            _mix_columns(s, inv=False)
            _add_round_key(s, self._rk[rnd])
        s = [_SBOX[b] for b in s]
        _shift_rows(s, inv=False)
        _add_round_key(s, self._rk[10])
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        _add_round_key(s, self._rk[10])
        for rnd in range(9, 0, -1):
            _shift_rows(s, inv=True)
            s = [_INV_SBOX[b] for b in s]
            _add_round_key(s, self._rk[rnd])
            _mix_columns(s, inv=True)
        _shift_rows(s, inv=True)
        s = [_INV_SBOX[b] for b in s]
        _add_round_key(s, self._rk[0])
        return bytes(s)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PKCS#5-padded CBC encrypt; returns iv + ciphertext (the PDF layout)."""
    aes = AES128(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(block)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`: data is iv + ciphertext. Raises
    ValueError on malformed length or padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad CBC data length")
    aes = AES128(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(aes.decrypt_block(block), prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad CBC padding")
    return bytes(out[:-pad])
