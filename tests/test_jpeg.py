"""Baseline JPEG codec: quality-100 tables are all-ones, so gray
roundtrips within +-1 (the only loss left is coefficient rounding —
round(DCT) quantization noise of <=0.5 per coefficient reaches at most
~1 pixel LSB through the IDCT); bounded lossy roundtrips for smooth
content, subsampling/odd-dims coverage, and explicit rejection of
non-baseline streams."""

import numpy as np
import pytest

from geotiff_spark.functions.jpeg import (
    JpegError, decode_jpeg, encode_jpeg,
)


def _smooth(h, w, seed=0):
    iy, ix = np.mgrid[0:h, 0:w]
    return (
        128 + 60 * np.sin((iy + seed) / 7.0) + 50 * np.cos((ix + 2 * seed) / 9.0)
    ).astype(np.uint8)


def test_gray_quality100_near_exact():
    arr = _smooth(24, 40)[:, :, None]
    out = decode_jpeg(encode_jpeg(arr, quality=100))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 1


def test_gray_random_quality100_near_exact():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(17, 19, 1), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=100))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2


@pytest.mark.parametrize("sub,tol_max,tol_mean", [
    ("444", 4, 0.6), ("420", 8, 1.6),
])
def test_rgb_smooth_bounded(sub, tol_max, tol_mean):
    h, w = 40, 56
    iy, ix = np.mgrid[0:h, 0:w]
    arr = np.stack([
        (100 + 50 * np.sin(iy / 9.0)).astype(np.uint8),
        (120 + 40 * np.cos(ix / 11.0)).astype(np.uint8),
        (90 + 30 * np.sin((ix + iy) / 13.0)).astype(np.uint8),
    ], -1)
    out = decode_jpeg(encode_jpeg(arr, quality=95, subsampling=sub))
    assert out.shape == arr.shape
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.max() <= tol_max and err.mean() <= tol_mean


@pytest.mark.parametrize("h,w", [(37, 51), (8, 8), (1, 1), (9, 16)])
def test_odd_dims_all_subsamplings(h, w):
    arr3 = np.stack([_smooth(h, w, s) for s in range(3)], -1)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(arr3, quality=95, subsampling=sub))
        assert out.shape == arr3.shape
    out = decode_jpeg(encode_jpeg(arr3[:, :, :1], quality=100))
    assert np.abs(out.astype(int) - arr3[:, :, :1].astype(int)).max() <= 1


def test_quality_tradeoff_monotone_size():
    arr = np.stack([_smooth(32, 32, s) for s in range(3)], -1)
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_non_baseline():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"nope")
    good = bytearray(encode_jpeg(_smooth(8, 8)[:, :, None]))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(good).find(b"\xff\xc0")
    bad = good.copy()
    bad[i + 1] = 0xC2
    with pytest.raises(JpegError, match="non-baseline"):
        decode_jpeg(bytes(bad))
    with pytest.raises(JpegError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated


def test_decode_image_dispatches_jpeg():
    from geotiff_spark.operators.multimodal import decode_image

    arr = _smooth(20, 12)[:, :, None]
    out = decode_image(encode_jpeg(arr, quality=100))
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 1
