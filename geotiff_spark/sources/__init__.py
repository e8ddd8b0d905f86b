"""Sources: raster ingest (binaryFile → decode), pages, polygons."""
