"""From-scratch GIF codec (kernels/gif.py): exact lossless round-trips
(LZW is deterministic), interlace, animation, palette stress, and the
multimodal dispatch paths."""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.gif import decode_gif, encode_gif  # noqa: E402


def test_roundtrip_exact_plain_and_interlaced():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    img = rng.integers(0, 7, size=(19, 23), dtype=np.uint8)
    w, h, frames = decode_gif(encode_gif([img], pal))
    assert (w, h) == (23, 19)
    assert np.array_equal(frames[0], pal[img])
    _, _, fi = decode_gif(encode_gif([img], pal, interlace=True))
    assert np.array_equal(fi[0], pal[img])


def test_animated_frames_decode_independently():
    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    imgs = [rng.integers(0, 5, size=(10, 12), dtype=np.uint8)
            for _ in range(3)]
    _, _, frames = decode_gif(encode_gif(imgs, pal))
    assert len(frames) == 3
    for f, i in zip(frames, imgs):
        assert np.array_equal(f, pal[i])


def test_palette_extremes_exercise_lzw_width_growth():
    rng = np.random.default_rng(15)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    big = (rng.random((80, 120)) > 0.3).astype(np.uint8)
    _, _, f2 = decode_gif(encode_gif([big], pal2))
    assert np.array_equal(f2[0], pal2[big])
    # 256 colors of noise: 12-bit codes + clear-on-full-table
    pal256 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    noise = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    _, _, fn = decode_gif(encode_gif([noise], pal256))
    assert np.array_equal(fn[0], pal256[noise])


def test_subset_gates():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"plain bytes")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + bytes(7))
    rng = np.random.default_rng(16)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    img = rng.integers(0, 4, size=(6, 6), dtype=np.uint8)
    good = encode_gif([img], pal)
    with pytest.raises(ValueError):
        decode_gif(good[:20])


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200),
       cut=st.integers(min_value=6, max_value=100))
def test_gif_decoder_never_crashes_uncontrolled(junk, cut):
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = (np.arange(36).reshape(6, 6) % 2).astype(np.uint8)
    valid = encode_gif([img], pal)
    for data in (junk, b"GIF89a" + junk, valid[:cut],
                 valid[:15] + junk + valid[15:]):
        try:
            decode_gif(data)
        except ValueError:
            pass


def test_multimodal_dispatch_gif():
    from parserpdf_spark.operators.multimodal import (
        decode_frames_auto,
        decode_image_auto,
    )

    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    imgs = [rng.integers(0, 8, size=(9, 11), dtype=np.uint8)
            for _ in range(2)]
    gif = encode_gif(imgs, pal)
    w, h, rgb = decode_image_auto(gif)
    assert (w, h) == (11, 9) and np.array_equal(rgb, pal[imgs[0]])
    w, h, frames = decode_frames_auto(gif)
    assert len(frames) == 2
    with pytest.raises(ValueError, match="magic"):
        decode_frames_auto(b"\x00\x01\x02")


def test_truncated_gce_raises_valueerror():
    """A GIF chopped inside the Graphic Control Extension used to
    escape as IndexError (review finding)."""
    bad = b"GIF89a" + bytes([4, 0, 3, 0, 0, 0, 0]) + b"\x21\xf9\x04\x01"
    with pytest.raises(ValueError):
        decode_gif(bad)
