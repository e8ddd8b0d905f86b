"""Generate the committed u64 GeoTIFF fixture for the exact-value
sampling driver gate (VERDICT r3 next #5).

64x64 uint64 raster whose values all exceed 2^63 and are deliberately
NOT float64-representable (odd low bits at magnitude 2^63, where the
float64 ulp is 2^11) — a float round trip anywhere in the sampling path
would change the value and break the hash-match. Deterministic pure
integer arithmetic; rerunning rewrites an identical file.

Lives in geotiff_spark/fixtures/u64/ (a SUBdirectory): the tile/pyramid
corpus globs fixtures/*.tif non-recursively, and their float64 pixel
oracles must not ingest values float64 cannot hold.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from tiff_writer import write_tiff  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "geotiff_spark", "fixtures", "u64",
    "synth_u64.tif",
)


def build() -> bytes:
    h = w = 64
    k = np.arange(h * w, dtype=np.uint64)
    arr = (
        np.uint64(1) << np.uint64(63)
    ) + k * (np.uint64(1) << np.uint64(50)) + 2 * k + np.uint64(1)
    return write_tiff(
        arr.reshape(h, w, 1),
        compression=8,
        rows_per_strip=16,
        pixel_scale=[1.0, 1.0, 0.0],
        tie_points=[0.0, 0.0, 0.0, 0.0, float(h), 0.0],
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    data = build()
    with open(OUT, "wb") as fh:
        fh.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")
