"""Raster↔model coordinate transforms, vectorized over numpy arrays.

Reimplements the semantics of the reference's CoordinateTransform
(/root/reference/src/coordinate_transform.rs:24-178) as pure functions over
coordinate *arrays* (the engine's sampling joins operate per Arrow batch,
not per point):

- affine (from a 4×4 ModelTransformation matrix → 6-coeff 2-D affine with
  analytic inverse; det < 1e-15 → error)
  (/root/reference/src/coordinate_transform/affine_transform.rs:7-44)
- tie point + pixel scale, with the NEGATED y scale (north-up)
  (/root/reference/src/coordinate_transform/tie_point_and_pixel_scale.rs:27-49)
- validation and dispatch of tag data, including mutual-exclusion errors
  (/root/reference/src/coordinate_transform.rs:45-128)

The tie-points (Delaunay piecewise warp) variant lives in tie_points.py —
feature-parity tier, mirroring the reference's `tie-points` cargo feature.

A transform is carried as ``(kind, coeffs)`` where coeffs is a flat list of
doubles — exactly how it is stored in the rasters DataFrame column
``transform: struct<kind: string, coeffs: array<double>>``:

- kind='affine':         coeffs = [a, b, c, d, e, f,  ia, ib, ic, id, ie, if]
                         (forward 6 then inverse 6)
- kind='tiepoint_scale': coeffs = [rx, ry, mx, my, sx, sy]
- kind='tie_points':     coeffs = flat tie-point sextuples (k>1 points)
- kind='identity':       coeffs = []
"""

from __future__ import annotations

import numpy as np


class TransformError(ValueError):
    pass


def transform_from_tag_data(
    pixel_scale: list[float] | None,
    tie_points: list[float] | None,
    transformation_matrix: list[float] | None,
) -> tuple[str, list[float]]:
    """Validate + dispatch tag data exactly like the reference
    (/root/reference/src/coordinate_transform.rs:45-128)."""
    if pixel_scale is not None and len(pixel_scale) != 3:
        raise TransformError("ModelPixelScaleTag must hold exactly 3 values")
    if tie_points is not None:
        if len(tie_points) == 0:
            raise TransformError("ModelTiePointTag must hold more than 0 values")
        if len(tie_points) % 6 != 0:
            raise TransformError("ModelTiePointTag length must be divisible by 6")
    if transformation_matrix is not None:
        if len(transformation_matrix) != 16:
            raise TransformError("ModelTransformationTag must hold exactly 16 values")
        if pixel_scale is not None or tie_points is not None:
            raise TransformError(
                "ModelTransformationTag is mutually exclusive with "
                "ModelPixelScaleTag/ModelTiePointTag"
            )
        return affine_from_matrix(transformation_matrix)

    if tie_points is None:
        raise TransformError(
            "ModelTiePointTag must be present when ModelTransformationTag is missing"
        )
    if len(tie_points) == 6:
        if pixel_scale is None:
            raise TransformError(
                "ModelPixelScaleTag required with a single tie point"
            )
        # [rx, ry, rz, mx, my, mz] + [sx, sy, sz] -> keep exact reference arithmetic
        return (
            "tiepoint_scale",
            [tie_points[0], tie_points[1], tie_points[3], tie_points[4],
             pixel_scale[0], pixel_scale[1]],
        )
    return ("tie_points", list(tie_points))


def affine_from_matrix(m: list[float]) -> tuple[str, list[float]]:
    """4×4 row-major ModelTransformation → 2-D affine + analytic inverse.

    Takes elements (0,1,3, 4,5,7); det below 1e-15 is an error, matching
    /root/reference/src/coordinate_transform/affine_transform.rs:7-37.
    """
    fwd = [m[0], m[1], m[3], m[4], m[5], m[7]]
    det = fwd[0] * fwd[4] - fwd[1] * fwd[3]
    if abs(det) < 1e-15:
        raise TransformError("transformation matrix is not invertible")
    inv = [
        fwd[4] / det,
        -fwd[1] / det,
        (fwd[1] * fwd[5] - fwd[2] * fwd[4]) / det,
        -fwd[3] / det,
        fwd[0] / det,
        (-fwd[0] * fwd[5] + fwd[2] * fwd[3]) / det,
    ]
    return ("affine", fwd + inv)


def _apply_affine(t: np.ndarray, x: np.ndarray, y: np.ndarray):
    return x * t[0] + y * t[1] + t[2], x * t[3] + y * t[4] + t[5]


def to_model(kind: str, coeffs, x, y):
    """Raster → model space, vectorized. x/y are float64 arrays (or scalars)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    c = np.asarray(coeffs, dtype=np.float64)
    if kind == "identity":
        return x, y
    if kind == "affine":
        return _apply_affine(c[:6], x, y)
    if kind == "tiepoint_scale":
        rx, ry, mx, my, sx, sy = c[:6]
        # y scale negated (north-up): tie_point_and_pixel_scale.rs:27-37
        return (x - rx) * sx + mx, (y - ry) * -sy + my
    if kind == "tie_points":
        from .tie_points import tie_points_to_model

        return tie_points_to_model(c, x, y)
    raise TransformError(f"unknown transform kind {kind}")


def to_raster(kind: str, coeffs, x, y, strict: bool = True):
    """Model → raster space, vectorized (hot path of every sampling join).

    `strict` only affects the tie_points warp: True replicates the
    reference panic for points outside every face (lib-parity paths);
    False yields NaN there (engine bulk-sampling paths, where an
    uncovered point is a NULL sample, not a job failure)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    c = np.asarray(coeffs, dtype=np.float64)
    if kind == "identity":
        return x, y
    if kind == "affine":
        return _apply_affine(c[6:12], x, y)
    if kind == "tiepoint_scale":
        rx, ry, mx, my, sx, sy = c[:6]
        return (x - mx) / sx + rx, (y - my) / -sy + ry
    if kind == "tie_points":
        from .tie_points import tie_points_to_raster

        return tie_points_to_raster(c, x, y, strict)
    raise TransformError(f"unknown transform kind {kind}")


def model_extent(
    kind: str,
    coeffs,
    width: int,
    height: int,
    raster_type: str | None,
) -> tuple[float, float, float, float]:
    """Image bounding box in model space (min/max normalized), matching
    GeoTiff::model_extent (/root/reference/src/lib.rs:103-122): transform the
    raster corners (off,off) and (w+off, h+off) where off = −0.5 for
    PixelIsPoint rasters else 0 (/root/reference/src/lib.rs:201-206)."""
    off = raster_offset(raster_type)
    xs, ys = to_model(
        kind, coeffs,
        np.array([off, width + off], dtype=np.float64),
        np.array([off, height + off], dtype=np.float64),
    )
    return (
        float(min(xs[0], xs[1])),
        float(min(ys[0], ys[1])),
        float(max(xs[0], xs[1])),
        float(max(ys[0], ys[1])),
    )


def raster_offset(raster_type: str | None) -> float:
    """PixelIsPoint ⇒ −0.5 else 0.0 (/root/reference/src/lib.rs:201-206)."""
    return -0.5 if raster_type == "point" else 0.0


def sample_indices(
    kind: str,
    coeffs,
    width: int,
    height: int,
    num_samples: int,
    raster_type: str | None,
    x,
    y,
    sample: int,
    strict: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized compute_index (/root/reference/src/lib.rs:164-199).

    Returns (flat_index int64 array, valid bool mask). Invalid positions hold
    index 0 — mask them out. Sample out of range raises, mirroring the
    reference's panic (/root/reference/src/lib.rs:173-178). `strict=False`
    turns tie-points coverage holes into invalid samples instead of errors.
    """
    if sample >= num_samples:
        raise IndexError(
            f"sample out of bounds: the number of samples is {num_samples} "
            f"but the sample is {sample}"
        )
    rx, ry = to_raster(kind, coeffs, x, y, strict)
    off = raster_offset(raster_type)
    rx = rx - off
    ry = ry - off
    valid = (rx >= 0.0) & (rx < width) & (ry >= 0.0) & (ry < height)
    # truncation toward zero on non-negative values == floor (lib.rs:198)
    ix = np.where(valid, rx, 0.0).astype(np.int64)
    iy = np.where(valid, ry, 0.0).astype(np.int64)
    idx = (iy * width + ix) * num_samples + sample
    return idx, valid
