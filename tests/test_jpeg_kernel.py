"""From-scratch baseline JPEG codec (kernels/jpeg.py): closed-form DC
cases, round-trip error bounds vs known source pixels, marker-level
behavior on crafted streams, and the PDF-embedded payload path.

The reference delegates image handling to PIL
(``utils/file_utils.py:562-626``); none of these expectations come from
the codec under test — solid-color results are derivable by hand (one
DC term), round-trips are checked against the ORIGINAL pixels, and the
subset gates are asserted against hand-built marker streams.
"""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.jpeg import (  # noqa: E402
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def test_solid_color_is_exact():
    """A solid image is a pure DC term: quantization cannot move it by
    more than q[0,0]/16 ≈ rounding, and 200 survives exactly."""
    for val in (0, 31, 128, 200, 255):
        img = np.full((16, 24, 3), val, dtype=np.uint8)
        w, h, out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
        assert (w, h) == (24, 16)
        assert np.abs(out.astype(int) - int(val)).max() <= 1


def test_gradient_roundtrip_tight():
    x = np.linspace(0, 255, 64)
    y = np.linspace(0, 255, 48)
    img = np.stack(
        [np.tile(x, (48, 1)), np.tile(y[:, None], (1, 64)),
         np.full((48, 64), 128.0)], axis=-1
    ).astype(np.uint8)
    _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
    # random noise is the worst case for DCT compression; q90 keeps the
    # mean error in single digits and never drifts the global mean
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 10.0
    assert abs(float(out.mean()) - float(img.mean())) < 2.0


def test_subsampled_420_and_odd_dimensions():
    rng = np.random.default_rng(3)
    for shape in ((13, 19, 3), (48, 64, 3), (17, 16, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, out = decode_jpeg_baseline(
            encode_jpeg_baseline(img, 90, subsample=True)
        )
        assert (h, w) == shape[:2]
        assert out.shape == shape


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    _, _, ref = decode_jpeg_baseline(encode_jpeg_baseline(img, 85))
    for interval in (1, 3, 8):
        _, _, out = decode_jpeg_baseline(
            encode_jpeg_baseline(img, 85, restart_interval=interval)
        )
        assert np.array_equal(out, ref)
    _, _, out420 = decode_jpeg_baseline(
        encode_jpeg_baseline(img, 85, subsample=True, restart_interval=2)
    )
    _, _, ref420 = decode_jpeg_baseline(
        encode_jpeg_baseline(img, 85, subsample=True)
    )
    assert np.array_equal(out420, ref420)


def test_grayscale_expands_to_three_equal_channels():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(g, 92))
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 6.0


def test_out_of_subset_marker_streams_raise():
    import struct

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"plain bytes")
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\xff\xd8\xff\xd9")
    # arithmetic-coded SOF9
    sof9 = b"\xff\xd8\xff\xc9" + struct.pack(">H", 10) + bytes(8)
    with pytest.raises(ValueError, match="subset"):
        decode_jpeg_baseline(sof9)
    # 12-bit precision
    seg = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    sof12 = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(seg)) + seg
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg_baseline(sof12)
    # 4-component (CMYK-style)
    seg = struct.pack(">BHHB", 8, 8, 8, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    sof4 = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(seg)) + seg
    with pytest.raises(ValueError, match="not supported"):
        decode_jpeg_baseline(sof4)
    # truncated entropy data: chop a valid stream before EOI
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    good = encode_jpeg_baseline(img, 90)
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:-10])


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300),
       cut=st.integers(min_value=2, max_value=400))
def test_jpeg_decoder_never_crashes_uncontrolled(junk, cut):
    """Arbitrary bytes and truncations of a valid stream → ValueError
    only, never a hang or another exception type."""
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    valid = encode_jpeg_baseline(img, 85)
    for data in (junk, b"\xff\xd8" + junk, valid[:cut],
                 valid[:20] + junk + valid[20:]):
        try:
            decode_jpeg_baseline(data)
        except ValueError:
            pass


def test_pdf_embedded_jpeg_decodes_to_known_gradient():
    """The committed image-bearing PDF fixture's /DCTDecode payload —
    surfaced byte-for-byte by the PDF kernel — is a REAL baseline JPEG
    whose decoded pixels match the generator's gradient formula
    (recomputed here, independent of the fixture tool)."""
    from parserpdf_spark.kernels.pdf_binary import pdf_to_blocks_and_media

    with open(os.path.join(REPO, "fixtures", "files_corpus",
                           "doc_31.pdf"), "rb") as fh:
        _, media = pdf_to_blocks_and_media(fh.read())
    assert len(media) == 1
    w, h, out = decode_jpeg_baseline(media[0]["payload"])
    assert (w, h) == (64, 48)
    yy, xx = np.mgrid[0:48, 0:64]
    want = np.stack([
        (xx * 255) // 63, (yy * 255) // 47, ((xx + yy) * 255) // 110,
    ], axis=-1).astype(np.uint8)
    assert np.abs(out.astype(int) - want.astype(int)).mean() < 2.0


def test_decode_image_auto_dispatches_on_magic():
    from parserpdf_spark.operators.multimodal import (
        decode_image_auto,
        encode_bmp,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    w, h, out = decode_image_auto(encode_bmp(img))
    assert (w, h) == (14, 10) and np.array_equal(out, img)
    w, h, out = decode_image_auto(encode_jpeg_baseline(img, 95))
    assert (w, h) == (14, 10)
    with pytest.raises(ValueError, match="magic"):
        decode_image_auto(b"\x89PNG\r\n")


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding
# ---------------------------------------------------------------------------


def test_progressive_decodes_byte_equal_to_baseline():
    """Identical quantized coefficients must reconstruct identically:
    decode(progressive(img)) == decode(baseline(img)) exactly — across
    spectral-selection-only and successive-approximation scan scripts,
    gray/4:4:4/4:2:0, odd dims, and quality extremes (long zero runs
    exercise EOBRUN and ZRL span logic)."""
    from parserpdf_spark.kernels.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    cases = [
        (rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, size=(13, 19, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8),
         {"subsample": True}),
        (rng.integers(0, 256, size=(24, 24), dtype=np.uint8), {}),
        (np.full((16, 16, 3), 200, np.uint8), {}),
    ]
    for img, kw in cases:
        _, _, base = decode_jpeg_baseline(encode_jpeg_baseline(img, 88, **kw))
        for successive in (False, True):
            _, _, prog = decode_jpeg_baseline(
                encode_jpeg_progressive(img, 88, successive=successive, **kw))
            assert np.array_equal(prog, base), (img.shape, kw, successive)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    for q in (10, 95):
        _, _, base = decode_jpeg_baseline(encode_jpeg_baseline(img, q))
        _, _, prog = decode_jpeg_baseline(
            encode_jpeg_progressive(img, q, successive=True))
        assert np.array_equal(prog, base)


@settings(max_examples=20, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200),
       cut=st.integers(min_value=2, max_value=600))
def test_progressive_decoder_never_crashes_uncontrolled(junk, cut):
    from parserpdf_spark.kernels.jpeg import encode_jpeg_progressive

    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    valid = encode_jpeg_progressive(img, 85, successive=True)
    for data in (valid[:cut], valid[:40] + junk + valid[40:]):
        try:
            decode_jpeg_baseline(data)
        except ValueError:
            pass


def test_huge_sof_with_tiny_payload_fails_before_allocating():
    """A crafted SOF declaring enormous dimensions over a few entropy
    bytes must raise (allocation-bomb guard), in both the baseline and
    progressive paths."""
    import struct

    for sof_marker in (b"\xff\xc0", b"\xff\xc2"):
        seg = struct.pack(">BHHB", 8, 60000, 60000, 1) + bytes([1, 0x11, 0])
        dqt = (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64))
        dht = (b"\xff\xc4" + struct.pack(">H", 19 + 12) + b"\x00"
               + bytes([0, 1] + [0] * 14) + bytes(range(12)))
        sos = (b"\xff\xda" + struct.pack(">H", 8)
               + bytes([1, 1, 0x00, 0, 63, 0]))
        data = (b"\xff\xd8" + dqt + dht + sof_marker
                + struct.pack(">H", 2 + len(seg)) + seg + sos
                + b"\x00\x01\x02" + b"\xff\xd9")
        with pytest.raises(ValueError, match="large|entropy"):
            decode_jpeg_baseline(data)


def test_truncated_marker_segments_raise_valueerror_only():
    """Empty/truncated SOF/SOS/DRI segments used to escape as
    IndexError/struct.error; the kernel boundary must keep the
    ValueError-only contract (review finding)."""
    import struct

    for bad in (b"\xff\xd8\xff\xc0" + struct.pack(">H", 2),
                b"\xff\xd8\xff\xdd" + struct.pack(">H", 2),
                b"\xff\xd8\xff\xda" + struct.pack(">H", 3) + b"\x02"):
        with pytest.raises(ValueError):
            decode_jpeg_baseline(bad)


def test_progressive_separate_dc_scans_use_component_raster():
    """A single-component DC scan orders blocks by the COMPONENT's own
    raster, not the frame MCU grid — they differ exactly when the
    component's sampling factor exceeds 1 (subsampled luma).  Review
    finding: the old walk silently scrambled DC values."""
    from parserpdf_spark.kernels.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    for shape in ((32, 32, 3), (33, 41, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        _, _, base = decode_jpeg_baseline(
            encode_jpeg_baseline(img, 88, subsample=True))
        for successive in (False, True):
            _, _, prog = decode_jpeg_baseline(encode_jpeg_progressive(
                img, 88, successive=successive, dc_separate=True,
                subsample=True))
            assert np.array_equal(prog, base), (shape, successive)


def test_grayscale_with_declared_2x2_sampling_is_raster_ordered():
    """T.81: a one-component scan is non-interleaved regardless of SOF
    sampling factors.  Patch a gray baseline JPEG's sampling byte from
    0x11 to 0x22: decode must be identical (review finding: the MCU
    walk silently scrambled blocks)."""
    rng = np.random.default_rng(41)
    for shape in ((32, 32), (17, 29)):
        g = rng.integers(0, 256, size=shape, dtype=np.uint8)
        good = encode_jpeg_baseline(g, 90)
        _, _, want = decode_jpeg_baseline(good)
        at = good.index(b"\xff\xc0")
        # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1) samp(1)
        samp_at = at + 2 + 2 + 1 + 4 + 1 + 1
        assert good[samp_at] == 0x11
        patched = good[:samp_at] + b"\x22" + good[samp_at + 1:]
        _, _, got = decode_jpeg_baseline(patched)
        assert np.array_equal(got, want), shape
