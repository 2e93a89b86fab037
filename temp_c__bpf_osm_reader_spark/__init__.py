"""spark-spatial-tiles — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the *capabilities* of the C reference
`ReneNyffenegger/temp-C--bpf-osm-reader` (stream-decode a compressed columnar
geo-entity file into normalized relational tables, index, join, pivot) as a
distributed DataFrame pipeline over tables of (image, caption) records.

Layout:
  functions/  pure-numpy kernels (hashing, codec, grid index) + pandas UDF wrappers
  sources/    deterministic fixture generators (images, polygons, tags, blocks)
  operators/  DataFrame operators (decode, relational, spatial join, kNN, tiling,
              dedup, similarity, text analysis, multimodal plumbing)
  plans/      lineage metrics + snapshot-commit / checkpoint-resume
  streaming/  Structured Streaming analogues (windowed aggs, sessionization)

Nothing here is a port: the reference is cited (file:line) in docstrings only to
pin the capability contract; execution is DataFrame/Catalyst throughout.
"""

__version__ = "0.1.0"
