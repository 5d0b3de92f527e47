"""FLAC decoder from scratch (stdlib + numpy, public FLAC format spec
— RFC 9639).

The WAV tier covers raw PCM; FLAC is the dominant LOSSLESS compressed
audio format in curated corpora, and unlike MP3/AAC it is fully
algorithmic: fixed/LPC linear prediction + Rice-coded residuals, no
psychoacoustic model and no historical Huffman tables to transcribe —
so it meets this repo's bar for honest from-scratch implementation.

- **decode_flac**: STREAMINFO + metadata-block walk, frame sync and
  header (blocksize/rate/channel/bps codes incl. end-of-header
  values), UTF-8-coded frame numbers, subframe types constant /
  verbatim / fixed (orders 0-4) / LPC (any order), wasted bits,
  Rice/Rice2 residual partitions with raw-bits escape, stereo
  decorrelation (L/S, R/S, M/S).  Output is (sample_rate, mono int16
  array) — stereo downmixes, other bit depths rescale — matching the
  WAV tier's contract.  Frame CRCs are NOT verified (decoding does not
  need them, and verifying would make a memorized polynomial
  load-bearing); structural inconsistencies raise ValueError.
- **encode_flac**: a verbatim-and-fixed-predictor writer for round-trip
  testing with known samples (lossless, so round-trips are exact).

Subset limits (raise): >2 channels, sample sizes outside 8/12/16/20/24
bits.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("implausible FLAC unary run")
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nbits // 8


def _utf8_number(bits: _Bits) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    """Residual section → blocksize-order values."""
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    n_parts = 1 << porder
    if blocksize % n_parts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(n_parts):
        count = blocksize // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zig = (q << param) | r
                out.append((zig >> 1) ^ -(zig & 1))
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:  # constant
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif ftype == 1:  # verbatim
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # fixed, order 0-4
        order = ftype - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _rice_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _rice_residual(bits, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((pred >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
              11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def decode_flac(payload: bytes):
    """FLAC bytes → (sample_rate, mono int16 array) — the WAV tier's
    contract (stereo downmixes, other depths rescale to int16)."""
    data = bytes(payload)
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("short STREAMINFO")
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC without STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if rate == 0:
        raise ValueError("FLAC sample rate 0")
    if channels > 2:
        raise ValueError(f"{channels}-channel FLAC outside the subset")
    if bps not in (8, 12, 16, 20, 24):
        raise ValueError(f"FLAC sample size {bps} outside the subset")
    if total > 1 << 36 or total * max(channels, 1) > 1 << 28:
        raise ValueError("implausible FLAC stream length")

    bits = _Bits(data, pos)
    left: list[int] = []
    right: list[int] = []
    while bits.byte_pos() < len(data) and (total == 0 or len(left) < total):
        bits.align()
        # frame sync: 14 bits 0b11111111111110
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        bits.read(1)  # reserved
        _utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            bits.read(8)
        elif rate_code in (13, 14):
            bits.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        if bps_code == 3:
            raise ValueError("reserved FLAC frame bps code")
        if bps_code == 7:
            raise ValueError("32-bit FLAC outside the subset")
        fbps = _BPS_CODE.get(bps_code, bps)  # 0 → STREAMINFO bps
        bits.read(8)  # header CRC-8 (not verified; see module docstring)

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch > 2:
                raise ValueError("multichannel FLAC frame outside subset")
            subs = [_subframe(bits, blocksize, fbps)
                    for _ in range(n_ch)]
            ch0 = subs[0]
            ch1 = subs[1] if n_ch == 2 else None
        elif ch_code == 8:  # left/side
            l = _subframe(bits, blocksize, fbps)
            sdiff = _subframe(bits, blocksize, fbps + 1)
            ch0 = l
            ch1 = [a - b for a, b in zip(l, sdiff)]
        elif ch_code == 9:  # right/side
            sdiff = _subframe(bits, blocksize, fbps + 1)
            r = _subframe(bits, blocksize, fbps)
            ch0 = [a + b for a, b in zip(r, sdiff)]
            ch1 = r
        elif ch_code == 10:  # mid/side
            mid = _subframe(bits, blocksize, fbps)
            sdiff = _subframe(bits, blocksize, fbps + 1)
            ch0, ch1 = [], []
            for m, sd in zip(mid, sdiff):
                m2 = (m << 1) | (sd & 1)
                ch0.append((m2 + sd) >> 1)
                ch1.append((m2 - sd) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        bits.align()
        bits.read(16)  # frame CRC-16 (not verified)
        left.extend(ch0)
        if ch1 is not None:
            right.extend(ch1)
        if len(left) > 1 << 28:
            raise ValueError("FLAC output overruns sanity bound")

    if total and len(left) > total:
        left = left[: int(total)]
        right = right[: int(total)]
    a = np.array(left, dtype=np.int64)
    if right:
        b = np.array(right[: len(a)], dtype=np.int64)
        a = (a + b) // 2  # downmix
    if bps > 16:
        a >>= bps - 16
    elif bps < 16:
        a <<= 16 - bps
    return rate, np.clip(a, -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# Encoder (verbatim / fixed-order-2 subframes) — exists for round-trip
# testing with known samples; lossless, so equality is exact.
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def encode_flac(samples, sample_rate: int = 16000,
                fixed: bool = False, blocksize: int = 4096) -> bytes:
    """Mono int16 samples → FLAC bytes (verbatim subframes, or fixed
    order-2 prediction with Rice residuals when ``fixed``)."""
    arr = np.asarray(samples, dtype=np.int16)
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)   # 1 channel
    si.write(15, 5)  # 16 bps
    si.write(len(arr), 36)
    si.out += bytes(16)  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(si.out))[1:] + si.out

    for fno, start in enumerate(range(0, len(arr), blocksize)):
        block = [int(v) for v in arr[start : start + blocksize]]
        bw = _BitW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(7, 4)           # 16-bit blocksize-1 follows
        bw.write(0, 4)           # rate from STREAMINFO
        bw.write(0, 4)           # 1 channel
        bw.write(4, 3)           # 16 bps
        bw.write(0, 1)
        # UTF-8 frame number (support 2 ranges for tests)
        if fno < 0x80:
            bw.write(fno, 8)
        else:
            bw.write(0xC0 | (fno >> 6), 8)
            bw.write(0x80 | (fno & 0x3F), 8)
        bw.write(len(block) - 1, 16)
        bw.write(0, 8)           # header CRC-8 placeholder (unverified)
        bw.write(0, 1)
        if not fixed or len(block) <= 2:
            bw.write(1, 6)       # verbatim
            bw.write(0, 1)
            for v in block:
                bw.write(v & 0xFFFF, 16)
        else:
            bw.write(10, 6)      # fixed, order 2
            bw.write(0, 1)
            for v in block[:2]:
                bw.write(v & 0xFFFF, 16)
            resid = [block[i] - (2 * block[i - 1] - block[i - 2])
                     for i in range(2, len(block))]
            bw.write(0, 2)       # rice method 0
            bw.write(0, 4)       # partition order 0
            param = 6
            bw.write(param, 4)
            for r in resid:
                zig = (r << 1) if r >= 0 else ((-r) << 1) - 1
                q, rem = zig >> param, zig & ((1 << param) - 1)
                if q > 1 << 20:
                    raise ValueError("residual too large for test encoder")
                for _ in range(q):
                    bw.write(0, 1)
                bw.write(1, 1)
                bw.write(rem, param)
        bw.align()
        bw.write(0, 16)          # frame CRC-16 placeholder (unverified)
        out += bw.out
    return bytes(out)
