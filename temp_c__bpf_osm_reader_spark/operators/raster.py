"""Raster-side operators over the packed grid-cell raster.

The engine's raster↔vector pair (OPERATORS.md north-rule table) started as
tile_assignment (raster→vector: grid cell → deterministic ordered image
table) and raster_density (vector→raster: rasterize the point layer onto
the res-8 pixel grid).  This module adds the two classic raster analytics
that sit on top of a rasterized layer:

  * pyramid()   — multi-resolution rollup (map-tile pyramid): level r-1 is
    aggregated from level r's ALREADY-AGGREGATED raster, never from the raw
    points, so the extra cost beyond the base rasterization is a geometric
    series over occupied-pixel counts (≤ 4× shrink per level).  At 10^12
    input rows only the base groupBy touches the full table — and it is
    map-side combinable (count), so the shuffle carries one partial row per
    (pixel × task).
  * focal_sum() — 3×3 neighborhood (focal/convolution) statistic: each
    occupied pixel's count plus its 8 neighbors'.  Runs entirely on the
    aggregated raster (bounded by the grid, 2^res × 2^(res+1) pixels), via
    a 9-way offset explode + one pixel-keyed shuffle; longitude wraps
    (mod nx), latitude clamps (rows outside [0, ny) are dropped), matching
    the cylinder topology of geo.grid_cell (functions/geo.py:119-137).

Cell ids are the packed (res << 54) | (i << 27) | j layout from
functions/geo.py; pixel extraction is pure JVM bit ops (shiftright / AND),
identical to the oracle's DuckDB expression, so both halves of the contract
decode the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IJ_MASK = (1 << 27) - 1


def density(points: DataFrame, cell_col: str) -> DataFrame:
    """Rasterize a point layer: (row_i, col_j, n_images) per occupied pixel."""
    return (
        points.select(
            F.shiftright(cell_col, 27).bitwiseAND(F.lit(IJ_MASK)).alias("row_i"),
            F.col(cell_col).bitwiseAND(F.lit(IJ_MASK)).alias("col_j"),
        )
        .groupBy("row_i", "col_j")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def pyramid(points: DataFrame, cell_col: str, base_res: int, min_res: int) -> DataFrame:
    """Multi-resolution raster pyramid: (res, row_i, col_j, n_images).

    The grid hierarchy is exact power-of-two (geo.cell_parent: i >> d,
    j >> d), so each coarser level is a lossless 2×2-block sum of the level
    below.  Level base_res is the only pass over the raw points; every
    other level aggregates the previous level's raster (≤ occupied pixels
    at that res, shrinking ≥ towards 4× per step), so the pyramid costs one
    full-table map-side-combinable shuffle plus a geometric tail of tiny
    ones — the plan a tile server would want at any scale.
    """
    if not base_res > min_res >= 0:
        raise ValueError(f"need base_res > min_res >= 0, got {base_res}, {min_res}")
    base = density(points, cell_col)
    levels = [base.withColumn("res", F.lit(base_res))]
    cur = base
    for r in range(base_res - 1, min_res - 1, -1):
        cur = (
            cur.groupBy(
                F.shiftright("row_i", 1).alias("row_i"),
                F.shiftright("col_j", 1).alias("col_j"),
            )
            .agg(F.sum("n_images").alias("n_images"))
        )
        levels.append(cur.withColumn("res", F.lit(r)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("res", "row_i", "col_j", "n_images")


def focal_sum(points: DataFrame, cell_col: str, res: int) -> DataFrame:
    """3×3 focal (neighborhood) sum over the rasterized layer.

    For every OCCUPIED pixel: its own count plus the counts of its 8 grid
    neighbors (missing neighbors contribute 0).  col_j wraps modulo nx
    (longitude is periodic); row_i clamps (no pixels beyond the poles).

    Plan: rasterize (the only full-table pass), explode each raster row to
    its 9 (target-pixel, weight) contributions, one groupBy shuffle on the
    target pixel, then an inner join back to the base raster — both sides
    are aggregated rasters bounded by the occupied-pixel count, and the
    inner join doubles as the "center must be occupied" filter.
    """
    ny, nx = 1 << res, 1 << (res + 1)
    base = density(points, cell_col)
    offsets = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    contrib = (
        base.select("row_i", "col_j", "n_images", F.explode(offsets).alias("o"))
        .select(
            (F.col("row_i") + F.col("o.di")).alias("ci"),
            F.pmod(F.col("col_j") + F.col("o.dj"), F.lit(nx)).alias("cj"),
            "n_images",
        )
        .where((F.col("ci") >= 0) & (F.col("ci") < ny))
        .groupBy("ci", "cj")
        .agg(F.sum("n_images").alias("focal_n"))
    )
    return (
        base.join(
            contrib,
            (base["row_i"] == contrib["ci"]) & (base["col_j"] == contrib["cj"]),
        )
        .select("row_i", "col_j", "n_images", "focal_n")
    )
