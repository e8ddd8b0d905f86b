"""Generate the committed synthetic tiled+planar GeoTIFF fixture.

The reference corpus (/root/reference/resources) has no tiled+planar
file, so the tiled decode path (functions/tiff.py tile branch, planar
config 2) was pytest-only until round 3. This fixture puts it on the
driver-verified Spark path: read_rasters → raster_to_tiles → tile_stats
with a DuckDB pixel-table oracle (oracle_raster.pixel_tables includes
it).

Deterministic by construction (pure integer arithmetic, no RNG), so the
committed binary is reproducible: python scripts/make_synth_fixture.py
rewrites an identical file.

Layout chosen to exercise every edge at once:
- 300×520 px, 2 samples, uint16  → odd tile edges in both axes
- tile 64×64, planar config 2    → B3 (padded edges) + B12 (planar)
- deflate (8) compression        → B6 on the tile path
- tie-point + pixel-scale geo tags → decodes through the same transform
  machinery as the reference fixtures
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from tiff_writer import write_tiff  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "geotiff_spark", "fixtures",
    "synth_tiled_planar_deflate.tif",
)


def build() -> bytes:
    h, w, spp = 300, 520, 2
    iy, ix = np.mgrid[0:h, 0:w]
    arr = np.empty((h, w, spp), dtype=np.uint16)
    for band in range(spp):
        arr[:, :, band] = ((iy * 31 + ix * 17 + band * 7) % 1021).astype(
            np.uint16
        )
    return write_tiff(
        arr,
        compression=8,
        tile=(64, 64),
        planar=2,
        pixel_scale=[0.01, 0.01, 0.0],
        tie_points=[0.0, 0.0, 0.0, 10.0, 45.0, 0.0],
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    data = build()
    with open(OUT, "wb") as fh:
        fh.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")
