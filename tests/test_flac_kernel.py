"""From-scratch FLAC decoder (kernels/flac.py): exact lossless
round-trips through the test encoder (verbatim + fixed-order-2 Rice
frames), hand-built LPC and stereo-decorrelation streams, and subset
gates.  The LPC/stereo arms are constructed bit-by-bit in the test from
the spec layout, independent of the encoder."""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.flac import (  # noqa: E402
    _BitW,
    decode_flac,
    encode_flac,
)


def test_verbatim_and_fixed_roundtrip_exact():
    rng = np.random.default_rng(61)
    clip = rng.integers(-2000, 2000, size=10000, dtype=np.int16)
    r, s = decode_flac(encode_flac(clip, 22050))
    assert r == 22050 and np.array_equal(s, clip)
    t = np.arange(9000)
    smooth = (1500 * np.sin(t / 50) + 300 * np.sin(t / 7)).astype(np.int16)
    _, s = decode_flac(encode_flac(smooth, 16000, fixed=True))
    assert np.array_equal(s, smooth)
    # multi-frame with frame numbers past the 1-byte UTF-8 range
    _, s = decode_flac(encode_flac(smooth, 16000, fixed=True, blocksize=64))
    assert np.array_equal(s, smooth)


def _streaminfo(n, rate=8000, channels=1, bps=16):
    si = _BitW()
    si.write(16, 16)
    si.write(16, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.out += bytes(16)
    import struct

    return (b"fLaC" + bytes([0x80])
            + struct.pack(">I", len(si.out))[1:] + bytes(si.out))


def _frame_header(bw, blocksize, ch_code):
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)       # 16-bit blocksize-1 follows
    bw.write(0, 4)       # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(4, 3)       # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)       # frame number 0
    bw.write(blocksize - 1, 16)
    bw.write(0, 8)       # CRC-8 (unverified)


def test_lpc_subframe_hand_built():
    """LPC order-1, coef 1, shift 0: s[i] = s[i-1] + residual — the
    stream is built bit-by-bit from the spec layout here, so the
    decoder's LPC path is tested independently of the encoder."""
    samples = [100, 103, 101, 108, 90, 95, 95, 120]
    resid = [samples[i] - samples[i - 1] for i in range(1, len(samples))]
    bw = _BitW()
    _frame_header(bw, len(samples), 0)  # mono
    bw.write(0, 1)
    bw.write(32, 6)      # LPC order 1 (type 31+order)
    bw.write(0, 1)       # no wasted bits
    bw.write(samples[0] & 0xFFFF, 16)   # warm-up
    bw.write(14, 4)      # precision-1 = 14 → 15 bits
    bw.write(0, 5)       # shift 0
    bw.write(1, 15)      # coefficient = 1
    bw.write(0, 2)       # rice method 0
    bw.write(0, 4)       # partition order 0
    bw.write(5, 4)       # rice param
    for r in resid:
        zig = (r << 1) if r >= 0 else ((-r) << 1) - 1
        for _ in range(zig >> 5):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(zig & 31, 5)
    bw.align()
    bw.write(0, 16)
    _, s = decode_flac(_streaminfo(len(samples)) + bytes(bw.out))
    assert list(s) == samples


def test_stereo_decorrelation_mid_side():
    """Mid/side frame built by hand: decode must reconstruct L/R and
    downmix (L+R)//2 per the module contract."""
    L = [100, 120, -50, 7]
    R = [80, 121, -60, 9]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    side = [l - r for l, r in zip(L, R)]
    bw = _BitW()
    _frame_header(bw, 4, 10)  # mid/side
    for vals, bits in ((mid, 16), (side, 17)):
        bw.write(0, 1)
        bw.write(1, 6)   # verbatim
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << bits) - 1), bits)
    bw.align()
    bw.write(0, 16)
    data = _streaminfo(4, channels=2) + bytes(bw.out)
    _, s = decode_flac(data)
    assert list(s) == [(l + r) // 2 for l, r in zip(L, R)]


def test_subset_gates_and_fuzz_seed():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"plain bytes")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + bytes(40))
    # 3-channel STREAMINFO is outside the subset
    with pytest.raises(ValueError, match="channel"):
        decode_flac(_streaminfo(4, channels=3))


@settings(max_examples=25, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200),
       cut=st.integers(min_value=4, max_value=200))
def test_flac_decoder_never_crashes_uncontrolled(junk, cut):
    clip = np.arange(-50, 50, dtype=np.int16)
    valid = encode_flac(clip, 8000)
    for data in (junk, b"fLaC" + junk, valid[:cut],
                 valid[:30] + junk + valid[30:]):
        try:
            decode_flac(data)
        except ValueError:
            pass


def test_audio_dispatch_flac():
    from parserpdf_spark.operators.multimodal import decode_audio_auto

    clip = np.arange(-100, 100, dtype=np.int16)
    r, s = decode_audio_auto(encode_flac(clip, 12000))
    assert r == 12000 and np.array_equal(s, clip)
    with pytest.raises(ValueError, match="magic"):
        decode_audio_auto(b"\x00\x01")


def test_reserved_and_32bit_frame_bps_codes_raise():
    """bps code 3 is reserved and 7 means 32-bit (outside the subset) —
    both must raise instead of silently reading at the STREAMINFO width
    (review finding: misaligned bitstream → garbage samples)."""
    good = encode_flac(np.arange(16, dtype=np.int16), 8000)
    at = good.find(b"\xff\xf8", 4)
    for code in (3, 7):
        patched = bytearray(good)
        patched[at + 3] = (patched[at + 3] & 0b10001111) | (code << 4)
        with pytest.raises(ValueError):
            decode_flac(bytes(patched))
