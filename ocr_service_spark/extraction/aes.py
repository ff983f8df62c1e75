"""Minimal from-scratch AES-128/192/256 + CBC (FIPS-197 / SP 800-38A,
public specifications).

Exists for PDF standard-security crypt filters (AESV2/AESV3 —
pdf_text.py): the reference opens AES-encrypted PDFs through pdfium;
this sandbox has no crypto libraries, and the cipher is small enough
to express directly. Tables are derived programmatically from the
GF(2^8) arithmetic rather than pasted, and the implementation is
validated against the FIPS-197 appendix vectors in
tests/test_pdf_aes.py. Not constant-time — fine for decrypting
already-public document bytes, not for key handling services.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse in GF(2^8) via exp/log tables (generator 3)
    exp, log = [0] * 512, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # multiply by generator 0x03
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        # affine transform
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[i] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = words[i - 1]
        if i % nk == 0:
            temp = bytes(_SBOX[b] for b in temp[1:] + temp[:1])
            temp = bytes([temp[0] ^ _RCON[i // nk - 1]]) + temp[1:]
        elif nk > 6 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], temp)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


# state is a 16-byte column-major block, as in the spec


def _shift_rows(s: bytearray, inv: bool) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        k = (-r) % 4 if inv else r
        row = row[k:] + row[:k]
        for c in range(4):
            s[r + 4 * c] = row[c]


def _mix_columns(s: bytearray, inv: bool) -> None:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            s[4 * c + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )


def _add_round_key(s: bytearray, rk: bytes) -> None:
    for i in range(16):
        s[i] ^= rk[i]


def encrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, key_schedule[0])
    for rnd in range(1, len(key_schedule) - 1):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s, inv=False)
        _mix_columns(s, inv=False)
        _add_round_key(s, key_schedule[rnd])
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s, inv=False)
    _add_round_key(s, key_schedule[-1])
    return bytes(s)


def decrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, key_schedule[-1])
    for rnd in range(len(key_schedule) - 2, 0, -1):
        _shift_rows(s, inv=True)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_round_key(s, key_schedule[rnd])
        _mix_columns(s, inv=True)
    _shift_rows(s, inv=True)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    _add_round_key(s, key_schedule[0])
    return bytes(s)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; PKCS#7 padding stripped leniently (malformed
    padding returns the raw plaintext — PDF viewers are permissive)."""
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(ks, block), prev))
        prev = block
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16 and all(b == n for b in out[-n:]):
            del out[-n:]
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt (used by the PDF R6 hardened hash and by test
    fixture construction)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(ks, block)
        out += prev
    return bytes(out)
