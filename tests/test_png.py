"""PNG codec roundtrips: encode applies the filter transform forward,
decode inverts it — agreement across all five filters, color types,
depths and adversarial arrays pins both directions."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_spark.functions.png import (
    PngError, decode_png, encode_png,
)


def _det(h, w, c, seed=0):
    i = np.arange(h * w * c, dtype=np.uint64) + seed
    z = (i * 2654435761 + 12345) % 251
    return z.astype(np.uint8).reshape(h, w, c)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_channels(ftype, c):
    arr = _det(13, 17, c, seed=ftype * 100 + c)
    out = decode_png(encode_png(arr, filters=ftype))
    assert out.shape == (13, 17, c)
    assert np.array_equal(out, arr)


def test_roundtrip_mixed_filters_default():
    arr = _det(11, 7, 3, seed=9)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@pytest.mark.parametrize("c", [1, 3])
def test_roundtrip_16bit(c):
    rng = np.arange(9 * 5 * c, dtype=np.uint64)
    arr = ((rng * 48271 + 7) % 65521).astype(np.uint16).reshape(9, 5, c)
    out = decode_png(encode_png(arr, filters=4))
    assert out.dtype == np.uint16
    assert np.array_equal(out, arr)


def test_roundtrip_palette():
    idx = _det(8, 8, 1, seed=3) % 16
    plte = _det(1, 16, 3, seed=5).reshape(16, 3)
    out = decode_png(encode_png(idx, palette=plte))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, plte[idx[:, :, 0]])


def test_single_pixel_and_single_row():
    assert np.array_equal(
        decode_png(encode_png(_det(1, 1, 3))), _det(1, 1, 3)
    )
    arr = _det(1, 40, 4, seed=2)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(arr, filters=f)), arr)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12), c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_hypothesis(h, w, c, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    fl = rng.integers(0, 5, size=h).tolist()
    assert np.array_equal(decode_png(encode_png(arr, filters=fl)), arr)


def test_errors():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(_det(4, 4, 3))
    with pytest.raises(PngError):
        decode_png(good[:30])  # truncated chunk
    # interlace flag rejected explicitly
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(PngError, match="nterlace"):
        decode_png(bytes(bad))


def test_decode_image_dispatches_on_png_magic():
    from geotiff_spark.operators.multimodal import decode_image

    arr = _det(10, 6, 3, seed=42)
    assert np.array_equal(decode_image(encode_png(arr)), arr)
