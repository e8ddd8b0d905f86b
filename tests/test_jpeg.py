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
    i = bytes(good).find(b"\xff\xc0")
    # flip SOF0 -> SOF3 (lossless) — still unsupported
    bad = good.copy()
    bad[i + 1] = 0xC3
    with pytest.raises(JpegError, match="non-baseline"):
        decode_jpeg(bytes(bad))
    # SOF2 is supported since round 6, but a baseline stream merely
    # RELABELED progressive is malformed: its single scan spans the
    # full band, which progressive mode forbids
    bad2 = good.copy()
    bad2[i + 1] = 0xC2
    with pytest.raises(JpegError, match="Se=0"):
        decode_jpeg(bytes(bad2))
    with pytest.raises(JpegError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated


def test_decode_image_dispatches_jpeg():
    from geotiff_spark.operators.multimodal import decode_image

    arr = _smooth(20, 12)[:, :, None]
    out = decode_image(encode_jpeg(arr, quality=100))
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 1


# ---- progressive (SOF2), round 6 --------------------------------------------

def test_progressive_decodes_bit_identical_to_baseline():
    """encode_jpeg and encode_jpeg_progressive share the quantization
    front half, so the two entropy codings carry IDENTICAL coefficients
    — the decoders must produce bit-equal pixels. This pins the whole
    progressive machinery (spectral bands, successive approximation,
    DC refinement, EOB runs) against the tested baseline path."""
    from geotiff_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for h, w, c, sub in [(8, 8, 1, "444"), (16, 24, 3, "444"),
                         (33, 17, 3, "420"), (9, 31, 3, "420"),
                         (1, 1, 1, "444"), (7, 3, 3, "444")]:
        arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        for q in (60, 95, 100):
            b = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
            p = decode_jpeg(
                encode_jpeg_progressive(arr, quality=q, subsampling=sub))
            assert np.array_equal(b, p), (h, w, c, sub, q)


def test_multiscan_baseline_decodes_bit_identical_to_interleaved():
    """Per-component baseline scans (one SOS per component, legal
    baseline) must decode bit-identically to the interleaved layout:
    a single-component scan walks the component's OWN block grid
    (T.81 A.2.2), not the padded MCU grid — 420 subsampling with odd
    dims makes the two grids differ, which is exactly the foreign
    multi-scan shape that used to misalign (ADVICE r06)."""
    from geotiff_spark.functions.jpeg import encode_jpeg_multiscan

    rng = np.random.default_rng(13)
    for h, w, c, sub in [(16, 24, 3, "444"), (33, 17, 3, "420"),
                         (9, 31, 3, "420"), (8, 8, 1, "444"),
                         (7, 3, 3, "444")]:
        arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        for q in (60, 95, 100):
            b = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
            m = decode_jpeg(
                encode_jpeg_multiscan(arr, quality=q, subsampling=sub))
            assert np.array_equal(b, m), (h, w, c, sub, q)


def test_progressive_eob_and_zrl_paths():
    """Flat images make every AC band empty (maximal EOB runs across
    blocks); sparse spikes make long in-block zero runs (ZRL, including
    ZRL inside refinement scans). Both must still match baseline."""
    from geotiff_spark.functions.jpeg import encode_jpeg_progressive

    flat = np.full((48, 56, 3), 77, np.uint8)
    spikes = np.zeros((40, 40, 1), np.uint8)
    spikes[::3, ::5] = 255
    for arr, sub in ((flat, "420"), (flat, "444"), (spikes, "444")):
        for q in (60, 100):
            b = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
            p = decode_jpeg(
                encode_jpeg_progressive(arr, quality=q, subsampling=sub))
            assert np.array_equal(b, p)


def test_progressive_quality100_near_exact():
    from geotiff_spark.functions.jpeg import encode_jpeg_progressive

    arr = _smooth(24, 40)[:, :, None]
    out = decode_jpeg(encode_jpeg_progressive(arr, quality=100))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 1


def test_progressive_stream_is_multi_scan_sof2():
    from geotiff_spark.functions.jpeg import encode_jpeg_progressive

    data = encode_jpeg_progressive(_smooth(16, 16)[:, :, None], quality=80)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # gray scan script: DC first + 2 AC-first bands + DC refine +
    # 2 bands x 2 refinement levels = 8 SOS markers
    assert data.count(b"\xff\xda") == 8
