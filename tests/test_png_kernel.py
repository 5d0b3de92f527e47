"""From-scratch PNG codec (kernels/png.py): exact lossless round-trips,
all five row filters inverted against forward-filtered bytes computed
independently in the test, indexed/alpha color types, chunk-level gates
(CRC, interlace, truncation), and the docx media-part payload path."""

import os
import struct
import sys
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.png import (  # noqa: E402
    _SIG,
    _chunk,
    decode_png,
    encode_png,
)


def test_rgb_and_gray_roundtrip_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    w, h, out = decode_png(encode_png(img))
    assert (w, h) == (31, 23) and np.array_equal(out, img)
    g = rng.integers(0, 256, size=(12, 17), dtype=np.uint8)
    _, _, outg = decode_png(encode_png(g))
    assert np.array_equal(outg[:, :, 0], g)
    assert np.array_equal(outg[:, :, 0], outg[:, :, 2])


def _forward_filter(rows_rgb: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG filters FORWARD (independent reference) so decode must
    invert them."""
    h, w, _ = rows_rgb.shape
    bpp = 3
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y, ft in enumerate(ftypes):
        row = rows_rgb[y].reshape(-1).astype(np.int32)
        enc = row.copy()
        if ft == 1:
            for x in range(w * bpp - 1, bpp - 1, -1):
                enc[x] = (row[x] - row[x - bpp]) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            for x in range(w * bpp):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) % 256
        elif ft == 4:
            for x in range(w * bpp):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                enc[x] = (row[x] - pred) % 256
        out.append(ft)
        out += bytes(enc.astype(np.uint8))
        prev = row
    return bytes(out)


def test_all_five_filters_invert():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 9, 8, 8, 2, 0, 0, 0)
    raw = _forward_filter(img, [0, 1, 2, 3, 4, 4, 3, 1])
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert np.array_equal(out, img)


def test_indexed_and_alpha_color_types():
    rng = np.random.default_rng(7)
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(5, 6), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", plte.tobytes())
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert np.array_equal(out, plte[idx])

    rgba = rng.integers(0, 256, size=(8, 6, 4), dtype=np.uint8)
    raw2 = b"".join(b"\x00" + rgba[y].tobytes() for y in range(8))
    png2 = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 8, 8, 6, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw2)) + _chunk(b"IEND", b""))
    _, _, out2 = decode_png(png2)
    a = rgba[..., 3:4].astype(np.float64) / 255
    want = np.clip((rgba[..., :3] * a + 255 * (1 - a)).round(),
                   0, 255).astype(np.uint8)
    assert np.array_equal(out2, want)


def test_chunk_level_gates():
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    good = encode_png(img)
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"plain bytes")
    with pytest.raises(ValueError, match="IEND|truncated"):
        decode_png(good[:-20])
    depth4 = (_SIG
              + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        decode_png(depth4)


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300),
       cut=st.integers(min_value=8, max_value=120))
def test_png_decoder_never_crashes_uncontrolled(junk, cut):
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    valid = encode_png(img)
    for data in (junk, _SIG + junk, valid[:cut],
                 valid[:30] + junk + valid[30:]):
        try:
            decode_png(data)
        except ValueError:
            pass


def test_docx_media_png_decodes_to_known_gradient():
    """The committed docx fixture's word/media part is now a REAL PNG:
    through the files_to_media bridge contract (file_media_rows) and
    decode_image_auto, it yields the generator's gradient — recomputed
    here independently."""
    from parserpdf_spark.operators.multimodal import decode_image_auto
    from parserpdf_spark.sources.files import file_media_rows

    path = os.path.join(REPO, "fixtures", "files_corpus", "doc_1.docx")
    with open(path, "rb") as fh:
        rows = file_media_rows(path, fh.read())
    assert [r["media_ref"] for r in rows] == ["media/figure1.png"]
    w, h, rgb = decode_image_auto(rows[0]["payload"])
    assert (w, h) == (8, 8)
    yy, xx = np.mgrid[0:8, 0:8]
    want = np.stack([(xx * 255) // 7, (yy * 255) // 7,
                     np.full((8, 8), 1 % 251)], axis=-1).astype(np.uint8)
    assert np.array_equal(rgb, want)


def test_adam7_interlaced_rgb_exact():
    """Adam7: the test slices the image into the seven passes itself
    (independent construction); decode must scatter them back exactly."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, xs, ys in passes:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 13, 11, 8, 2, 0, 0, 1))
           + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert np.array_equal(out, img)


def test_16bit_depth_keeps_high_byte():
    rng = np.random.default_rng(10)
    img16 = rng.integers(0, 65536, size=(5, 7, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes()
                   for y in range(5))
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 16, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))


def test_trns_transparency_palette_and_gray_key():
    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(4, 5), dtype=np.uint8)
    trns = bytes([0, 128, 255, 255])
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", plte.tobytes()) + _chunk(b"tRNS", trns)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    a = (np.array([0, 128, 255, 255])[idx] / 255.0)[..., None]
    want = np.clip((plte[idx] * a + 255 * (1 - a)).round(),
                   0, 255).astype(np.uint8)
    assert np.array_equal(out, want)

    g = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    g[1, 2] = 77
    rawg = b"".join(b"\x00" + g[y].tobytes() for y in range(4))
    pngg = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + _chunk(b"tRNS", struct.pack(">H", 77))
            + _chunk(b"IDAT", zlib.compress(rawg)) + _chunk(b"IEND", b""))
    _, _, outg = decode_png(pngg)
    wantg = g.copy()
    wantg[g == 77] = 255
    assert np.array_equal(outg[:, :, 0], wantg)


def test_png_bomb_is_bounded():
    """A tiny IDAT that inflates far past the declared image size must
    raise, not allocate (zip-bomb guard)."""
    bomb = zlib.compress(bytes(50_000_000), 9)  # ~48 KB → 50 MB
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates|IDAT"):
        decode_png(png)
    huge = (_SIG + _chunk(b"IHDR",
                          struct.pack(">IIBBBBB", 1 << 19, 1 << 19, 8, 2, 0, 0, 0))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="implausible"):
        decode_png(huge)


def test_tall_narrow_interlaced_png_decodes():
    """Adam7 raw data carries ~1.875·h filter bytes; the bounded-inflate
    limit must budget them (review finding: a valid 2x100 interlaced
    image was rejected as a bomb)."""
    rng = np.random.default_rng(33)
    h, w = 100, 2
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, xs, ys in passes:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert np.array_equal(out[:, :, 0], img)


def test_16bit_trns_color_key_compares_full_precision():
    """High-byte-only key matching whitened up to 256^3 wrong colors
    (review finding): a pixel sharing only the key's high bytes must
    survive."""
    img16 = np.full((2, 2, 3), 0x1234, dtype=np.uint16)
    img16[0, 0] = [0x1200, 0x1200, 0x1200]
    raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes()
                   for y in range(2))
    png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
           + _chunk(b"tRNS", struct.pack(">HHH", 0x1234, 0x1234, 0x1234))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    _, _, out = decode_png(png)
    assert out[0, 0, 0] == 0x12          # NOT whitened
    assert (out[1, 1] == 255).all()      # exact key match whitened
