"""wayproblems_spark — a PySpark-native spatial validation + tiling engine.

A from-scratch rebuild of the capabilities of flohoff/wayproblems
(/root/reference/wayproblems.cpp, C++/libosmium/GDAL) as an idiomatic
Spark DataFrame engine:

* vectorized rule catalogue (46 rule families, ~230 emission sites) compiled
  into a single multi-emit Catalyst projection — no per-row Python,
* node-location resolution as an equi-join (explode → join → reassemble),
* S2-style cell indexing, point-in-polygon, kNN nearest-way assignment,
  web-mercator tiling,
* Common-Crawl-style `pages` ingestion with byte-identical text extraction
  (Arrow-batched), vectorized geoparse,
* training-data-pipeline operators: dedup (exact/minhash/simhash),
  similarity search, text quality stats, multimodal plumbing,
* checkpoint/lineage resume and explicit skew handling for 100 TB scale.
"""

__version__ = "0.1.0"
