"""Two-phase point-in-polygon spatial join (north-star operator).

Phase 1 — cell prefilter: each polygon is covered by res-r cells (conservative
bbox polyfill, functions/geo.py:polyfill_bbox); the (cell_id, polygon_id)
cover table is tiny (|polygons| × covered cells) → broadcast hash join against
the points on cell_id. No shuffle of the big side.

Phase 2 — exact refine: vectorized even-odd ray casting over the surviving
candidates in an Arrow-batched pandas UDF, polygon rings shipped once per
executor via a Spark broadcast variable (not re-pickled per task).

At 100 TB scale: the points side stays partition-pruned and never shuffles;
candidate inflation is bounded by cover-cell area / polygon area; skewed cells
are handled by AQE skew-join + optional salting (operators/skew.py).

The reference has no spatial join (nodes stored raw, geometry left to
consumers — SURVEY §2.4); this is the capability the north rule adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geo
from .indexing import grid_cell_col

PIP_RES = 7


def polygon_cover(spark: SparkSession, polygons: pd.DataFrame, res: int = PIP_RES) -> DataFrame:
    """Driver-side polyfill → small (cell_id, polygon_id) cover DataFrame."""
    cells, pids = [], []
    for _, row in polygons.iterrows():
        cc = geo.polyfill_bbox(np.asarray(row["ring_lat"]), np.asarray(row["ring_lon"]), res)
        cells.append(cc)
        pids.append(np.full(cc.size, row["polygon_id"], dtype=np.int64))
    pdf = pd.DataFrame({"cell_id": np.concatenate(cells), "polygon_id": np.concatenate(pids)})
    schema = T.StructType(
        [T.StructField("cell_id", T.LongType()), T.StructField("polygon_id", T.LongType())]
    )
    return spark.createDataFrame(pdf, schema=schema)


def pip_join(
    points: DataFrame,
    polygons: pd.DataFrame,
    res: int = PIP_RES,
    spark: SparkSession | None = None,
) -> DataFrame:
    """points(image_id, lat, lon, ...) ⋈ polygons → (image_id, polygon_id).

    Emits every containing polygon per point (a point may fall in >1 polygon).
    """
    spark = spark or points.sparkSession
    cover = polygon_cover(spark, polygons, res)

    rings = {
        int(r["polygon_id"]): (
            np.asarray(r["ring_lat"], dtype=np.float64),
            np.asarray(r["ring_lon"], dtype=np.float64),
        )
        for _, r in polygons.iterrows()
    }
    bc_rings = spark.sparkContext.broadcast(rings)

    cell = grid_cell_col(F.col("lat"), F.col("lon"), res)
    candidates = points.select("image_id", "lat", "lon", cell.alias("cell_id")).join(
        F.broadcast(cover), "cell_id"
    )

    @F.pandas_udf(T.BooleanType())
    def contains(lat: pd.Series, lon: pd.Series, pid: pd.Series) -> pd.Series:
        rr = bc_rings.value
        out = np.zeros(len(lat), dtype=bool)
        la, lo, pv = lat.to_numpy(), lon.to_numpy(), pid.to_numpy()
        # group the Arrow batch by polygon → one vectorized ray-cast per polygon
        order = np.argsort(pv, kind="stable")
        bounds = np.flatnonzero(np.diff(pv[order])) + 1
        for seg in np.split(order, bounds):
            ring_lat, ring_lon = rr[int(pv[seg[0]])]
            out[seg] = geo.point_in_polygon(la[seg], lo[seg], ring_lat, ring_lon)
        return pd.Series(out)

    return (
        candidates.filter(contains(F.col("lat"), F.col("lon"), F.col("polygon_id")))
        .select("image_id", "polygon_id")
    )
