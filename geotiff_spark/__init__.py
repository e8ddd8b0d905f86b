"""geotiff_spark — a PySpark-native spatial-join + tiling engine.

From-scratch reimplementation of the query/data-processing capabilities of
the georust/geotiff crate (reference at /root/reference), re-expressed as an
idiomatic Spark engine: GeoTIFF decode as vectorized numpy kernels inside
Arrow/pandas UDFs, spatial joins (cell-index broadcast + exact ray-casting
refinement), kNN via ring expansion, raster sampling joins, plus the
relational and training-data-pipeline surface (dedup, similarity search,
text analysis) a web-scale corpus needs.

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst/AQE does the planning.
- All custom logic is vectorized pandas/Arrow UDFs — no per-row Python.
- No JVM extensions: ships via ``spark-submit --py-files``.
"""

__version__ = "0.1.0"
