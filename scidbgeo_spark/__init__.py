"""scidbgeo_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of the reference (jnumainville/SciDBGeo — a
Python orchestration layer over a SciDB chunked-array cluster) as idiomatic
Spark DataFrame pipelines:

- chunked 2-D/3-D dense arrays  -> tile DataFrames (one row per chunk,
  row-major ``array`` payload), see ``scidbgeo_spark.tiling``
- AFL operators (filter/apply/iif/join/between/subarray/slice/window/
  grouped_aggregate/redimension)  -> DataFrame ops, see
  ``scidbgeo_spark.operators``
- rasterize / zonal statistics / focal window / overlay  ->
  vectorized Arrow/pandas kernels, see ``scidbgeo_spark.kernels``
- web-scale graft surface (PIP join, kNN, dedup, ANN, text analysis)
  -> ``scidbgeo_spark.operators.{pip,knn,dedup,similarity,text}``

Nothing here is a port: the reference builds AFL query strings and shells
out to ``iquery``; this engine builds Catalyst logical plans and lets
Spark execute them.
"""

__version__ = "0.1.0"

from scidbgeo_spark import model, tiling  # noqa: F401
