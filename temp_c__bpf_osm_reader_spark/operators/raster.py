"""Raster-side operators over the packed grid-cell raster.

The engine's raster↔vector pair (OPERATORS.md north-rule table) started as
tile_assignment (raster→vector: grid cell → deterministic ordered image
table) and raster_density (vector→raster: rasterize the point layer onto
the res-8 pixel grid).  This module adds the two classic raster analytics
that sit on top of a rasterized layer:

  * pyramid()   — multi-resolution rollup (map-tile pyramid): each base
    pixel is exploded to its ONE ancestor pixel per level (exact
    power-of-two hierarchy, i >> d), then a single groupBy sums every level
    at once.  At 10^12 input rows only the base groupBy touches the full
    table — map-side combinable (count), one partial row per (pixel ×
    task) — and the pyramid itself is one raster-bounded shuffle
    (n_levels × occupied pixels).
  * focal_sum() — 3×3 neighborhood (focal/convolution) statistic: each
    occupied pixel's count plus its 8 neighbors'.  Runs entirely on the
    aggregated raster (bounded by the grid, 2^res × 2^(res+1) pixels), via
    a 9-way offset explode (center tagged) + one pixel-keyed shuffle;
    longitude wraps (mod nx), latitude clamps (rows outside [0, ny) are
    dropped), matching the cylinder topology of geo.grid_cell
    (functions/geo.py:119-137).

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
    # Single-shuffle plan.  A per-level union would make each level an
    # INDEPENDENT plan subtree — Spark's exchange reuse does not fire across
    # union branches (measured: 0 ReusedExchange, the raw-points scan re-ran
    # once per level), and .cache()-ing the base raster was measured ~2x
    # SLOWER end-to-end at sf1.0 (InMemoryRelation fill + scan overhead and
    # the loss of AQE coalescing inside the cached plan outweigh the cheap
    # rescan).  Instead, exploit that the grid hierarchy is exact
    # power-of-two (geo.cell_parent: i >> d): every base pixel has exactly
    # one ancestor per level, so exploding each base-raster row to its
    # (res, i >> d, j >> d) ancestors and running ONE groupBy computes the
    # whole pyramid — one pass over the raw points, one raster-bounded
    # shuffle (n_levels x occupied-pixel rows, map-side combinable), no
    # repeated scan and no cache at any scale.
    base = density(points, cell_col)
    depths = F.array(*[F.lit(d) for d in range(base_res - min_res + 1)])
    return (
        base.select(F.explode(depths).alias("d"), "row_i", "col_j", "n_images")
        .groupBy(
            (F.lit(base_res) - F.col("d")).alias("res"),
            F.expr("shiftright(row_i, d)").alias("row_i"),
            F.expr("shiftright(col_j, d)").alias("col_j"),
        )
        .agg(F.sum("n_images").alias("n_images"))
        .select("res", "row_i", "col_j", "n_images")
    )


def focal_sum(points: DataFrame, cell_col: str, res: int) -> DataFrame:
    """3×3 focal (neighborhood) sum over the rasterized layer.

    For every OCCUPIED pixel: its own count plus the counts of its 8 grid
    neighbors (missing neighbors contribute 0).  col_j wraps modulo nx
    (longitude is periodic); row_i clamps (no pixels beyond the poles).

    Plan: rasterize (the only full-table pass), explode each raster row to
    its 9 (target-pixel, contribution) rows with the (0,0) offset tagged as
    the center, then ONE groupBy shuffle on the target pixel computes both
    focal_n (sum of all contributions) and the center's own count; keeping
    only groups that saw a center contribution IS the "center must be
    occupied" filter.  A join back to the base raster would re-run the
    full-table rasterization for the probe side (no cross-subtree exchange
    reuse; .cache() measured slower at sf1.0 — see pyramid()); the center
    tag folds the join into the aggregate, so the whole statistic is one
    pass + one raster-bounded shuffle.  The center contribution is
    unambiguous under wrap/clamp: offset (0,0) maps a pixel to itself only.
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
    return (
        base.select("row_i", "col_j", "n_images", F.explode(offsets).alias("o"))
        .select(
            (F.col("row_i") + F.col("o.di")).alias("ci"),
            F.pmod(F.col("col_j") + F.col("o.dj"), F.lit(nx)).alias("cj"),
            "n_images",
            ((F.col("o.di") == 0) & (F.col("o.dj") == 0)).alias("is_center"),
        )
        .where((F.col("ci") >= 0) & (F.col("ci") < ny))
        .groupBy("ci", "cj")
        .agg(
            F.sum("n_images").alias("focal_n"),
            F.max(F.when(F.col("is_center"), F.col("n_images"))).alias("center_n"),
        )
        .where(F.col("center_n").isNotNull())
        .select(
            F.col("ci").alias("row_i"),
            F.col("cj").alias("col_j"),
            F.col("center_n").alias("n_images"),
            "focal_n",
        )
    )
