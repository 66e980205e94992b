"""segment_rtree_spark — a PySpark-native spatial-join + tiling engine.

From-scratch rebuild of the query capabilities of jagill/segment-rtree
(flat-packed segment R-trees, winding-number point-in-polygon, segment
intersection, geometry validity, rectangle clipping) as vectorized
Arrow/pandas UDF kernels over NumPy-packed arrays, driven by the
PySpark DataFrame API: hierarchical tile assignment, broadcast and
cell-partitioned PIP joins, kNN, raster<->vector tile aggregation,
skew-aware partitioning, and checkpointed resumable jobs.
"""

__version__ = "0.1.0"
