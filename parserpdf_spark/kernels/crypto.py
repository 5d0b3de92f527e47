"""RC4 and AES from scratch (pure python, public specifications).

The PDF standard security handler (kernels/pdf_crypt.py) needs RC4
(PDF revisions 2-4) and AES-CBC (AESV2/AESV3, and the R6 key-derivation
hash of PDF 2.0).  No crypto library ships in this container beyond
hashlib, so both ciphers are implemented from their public specs:

- RC4: the well-known KSA + PRGA stream cipher (public description,
  e.g. RFC 6229 which also supplies the test vectors used in tests).
- AES-128/192/256: FIPS-197 — S-box generated from the GF(2^8)
  multiplicative inverse + affine map at import (not a pasted table),
  key expansion, encrypt and decrypt block functions, CBC mode with
  and without padding.

This is DECRYPTION of documents the caller is entitled to open (the
empty-user-password case every consumer PDF reader handles silently) —
not a password cracker: one password attempt per file, supplied by the
caller.
"""

from __future__ import annotations


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    if klen == 0:
        raise ValueError("empty RC4 key")
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197).  Tables derived at import from first principles.
# ---------------------------------------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses in GF(2^8) via exp/log tables (gen 3)
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    exp[255] = exp[0]
    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        b = inv
        res = 0x63
        for shift in (0, 1, 2, 3, 4):
            res ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        sbox[i] = res
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
for _ in range(13):
    _RCON.append(_gf_mul(_RCON[-1], 2))

_MUL2 = [_gf_mul(i, 2) for i in range(256)]
_MUL3 = [_gf_mul(i, 3) for i in range(256)]
_MUL9 = [_gf_mul(i, 9) for i in range(256)]
_MULB = [_gf_mul(i, 0x0B) for i in range(256)]
_MULD = [_gf_mul(i, 0x0D) for i in range(256)]
_MULE = [_gf_mul(i, 0x0E) for i in range(256)]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = list(words[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            temp = [_SBOX[b] for b in temp]
        words.append([w ^ t for w, t in zip(words[i - nk], temp)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


# state layout: column-major (state[4*c + r] = byte r of column c),
# matching the FIPS-197 in/out byte order directly


def _shift_rows(s: list[int], inverse: bool) -> list[int]:
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            src_c = (c + r) % 4 if not inverse else (c - r) % 4
            out[4 * c + r] = s[4 * src_c + r]
    return out


def _mix_columns(s: list[int]) -> list[int]:
    out = [0] * 16
    for c in range(4):
        a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
        out[4 * c + 0] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3
        out[4 * c + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3
        out[4 * c + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3]
        out[4 * c + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]
    return out


def _inv_mix_columns(s: list[int]) -> list[int]:
    out = [0] * 16
    for c in range(4):
        a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
        out[4 * c + 0] = _MULE[a0] ^ _MULB[a1] ^ _MULD[a2] ^ _MUL9[a3]
        out[4 * c + 1] = _MUL9[a0] ^ _MULE[a1] ^ _MULB[a2] ^ _MULD[a3]
        out[4 * c + 2] = _MULD[a0] ^ _MUL9[a1] ^ _MULE[a2] ^ _MULB[a3]
        out[4 * c + 3] = _MULB[a0] ^ _MULD[a1] ^ _MUL9[a2] ^ _MULE[a3]
    return out


def aes_encrypt_block(block: bytes, key: bytes) -> bytes:
    return _encrypt_block_rks(block, _expand_key(key))


def _encrypt_block_rks(block: bytes, rks: list[list[int]]) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    s = list(block)
    nr = len(rks) - 1
    _add_round_key(s, rks[0])
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inverse=False)
        s = _mix_columns(s)
        _add_round_key(s, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inverse=False)
    _add_round_key(s, rks[nr])
    return bytes(s)


def aes_decrypt_block(block: bytes, key: bytes) -> bytes:
    return _decrypt_block_rks(block, _expand_key(key))


def _decrypt_block_rks(block: bytes, rks: list[list[int]]) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    s = list(block)
    nr = len(rks) - 1
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
        _add_round_key(s, rks[rnd])
        s = _inv_mix_columns(s)
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes | None = None,
                    unpad: bool = True) -> bytes:
    """AES-CBC decrypt.  With ``iv=None`` the first 16 bytes of data
    are the IV (the PDF AESV2/AESV3 string/stream layout); ``unpad``
    strips PKCS#7."""
    if iv is None:
        if len(data) < 16:
            raise ValueError("AES-CBC data shorter than its IV")
        iv, data = data[:16], data[16:]
    if len(data) % 16:
        raise ValueError("AES-CBC data not block-aligned")
    out = bytearray()
    prev = iv
    rks = _expand_key(key)  # ONCE per call, not per block
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        dec = _decrypt_block_rks(blk, rks)
        out += bytes(d ^ p for d, p in zip(dec, prev))
        prev = blk
    if unpad:
        if not out:
            return b""
        pad = out[-1]
        if pad < 1 or pad > 16 or pad > len(out):
            raise ValueError("bad AES-CBC padding")
        del out[-pad:]
    return bytes(out)


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes,
                    pad: bool = True) -> bytes:
    """AES-CBC encrypt (PKCS#7 when ``pad``); returns ciphertext
    WITHOUT the IV prefix (callers that need the PDF layout prepend
    it)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded AES-CBC data must be block-aligned")
    out = bytearray()
    prev = iv
    rks = _expand_key(key)  # ONCE per call, not per block
    for i in range(0, len(data), 16):
        blk = bytes(d ^ p for d, p in zip(data[i : i + 16], prev))
        enc = _encrypt_block_rks(blk, rks)
        out += enc
        prev = enc
    return bytes(out)
