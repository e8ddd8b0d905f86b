"""GIF codec: index-level roundtrips are LOSSLESS (palette pixel path),
so equality is exact — across interlace, animation, 256-color dictionary
growth, transparency compositing and disposal."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_spark.functions.gif import (
    GifError, decode_gif, decode_gif_first_frame, encode_gif,
)


def _pal(k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(k, 3), dtype=np.uint8)


@pytest.mark.parametrize("k", [2, 5, 16, 100, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(k, interlace):
    rng = np.random.default_rng(k)
    pal = _pal(k, k)
    idx = rng.integers(0, k, size=(13, 17), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert frames.shape == (1, 13, 17, 3)
    assert np.array_equal(frames[0], pal[idx])


def test_animation_full_frames():
    rng = np.random.default_rng(9)
    pal = _pal(32, 1)
    anim = rng.integers(0, 32, size=(5, 10, 14), dtype=np.uint8)
    frames, delays = decode_gif(encode_gif(anim, pal, delays=[1, 2, 3, 4, 5]))
    assert frames.shape == (5, 10, 14, 3) and delays == [1, 2, 3, 4, 5]
    for i in range(5):
        assert np.array_equal(frames[i], pal[anim[i]])


def test_transparency_and_placement_composite():
    """Hand-built stream: frame 2 is a 2x2 patch at (1,1) with index 0
    transparent — composited over frame 1's pixels."""
    import struct

    from geotiff_spark.functions.gif import _lzw_encode, _sub_blocks

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    base = np.full((4, 4), 2, dtype=np.uint8)
    patch = np.array([[0, 1], [1, 0]], dtype=np.uint8)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x81, 3, 0)  # GCT size field 1 (4 slots)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, base.ravel()))
    # graphic control: transparency on, index 0
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 7, 0) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, patch.ravel()))
    out += b"\x3b"

    frames, delays = decode_gif(bytes(out))
    assert frames.shape[0] == 2 and delays == [0, 7]
    want = pal[base].copy()
    assert np.array_equal(frames[0], want)
    want[1, 2] = pal[1]
    want[2, 1] = pal[1]  # transparent 0s keep the base pixels
    assert np.array_equal(frames[1], want)


def test_errors():
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"notagif")
    pal = _pal(4)
    good = encode_gif(np.zeros((6, 6), dtype=np.uint8), pal)
    with pytest.raises(GifError):
        decode_gif(good[:20])


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16),
       k=st.integers(2, 64), seed=st.integers(0, 2**31))
def test_roundtrip_hypothesis(h, w, k, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(k, 3), dtype=np.uint8)
    idx = rng.integers(0, k, size=(h, w), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(frames[0], pal[idx])


def test_decode_image_dispatches_gif():
    from geotiff_spark.operators.multimodal import decode_image

    pal = _pal(8, 3)
    idx = (np.arange(48, dtype=np.uint8) % 8).reshape(6, 8)
    out = decode_image(encode_gif(idx, pal))
    assert np.array_equal(out, pal[idx])
    assert np.array_equal(
        decode_gif_first_frame(encode_gif(idx, pal)), pal[idx]
    )
