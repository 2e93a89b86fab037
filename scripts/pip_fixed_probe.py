"""Decompose pip_join / tile_order fixed costs at one parallelism level.

Replays the flagship's timed region but times sub-steps separately, twice
each, so per-call fixed costs (driver createDataFrame + broadcast builds,
job submission) separate from scalable work (cache scan + join + refine).

  spark-submit --py-files .scratch/engine.zip scripts/pip_fixed_probe.py \
      --cores 8 --replicate 480
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=480)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.operators import indexing, spatial_join
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    n_parts = args.partitions
    fx = fixtures.ensure_all_for_sf(args.sf_dir)
    spark = get_spark(
        app="probe",
        cores=args.cores,
        shuffle_partitions=args.partitions,
        extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "131072"},
    )
    images = spark.read.parquet(fx["images"]).select("image_id", "phash")
    images = images.repartition(n_parts)
    if args.replicate > 1:
        reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
        images = images.crossJoin(reps).select(
            F.concat_ws("#", "image_id", "rep").alias("image_id"), "phash"
        )
    images = images.cache()
    images.count()
    indexing.geolocate(images.limit(n_parts * 2).repartition(n_parts)).count()

    def _prefault(it):
        import numpy as np
        import pandas as pd

        v = np.zeros(24_000_000, dtype=np.int64)
        v[::512] = 1
        rows = sum(len(pdf) for pdf in it)
        yield pd.DataFrame({"n": [rows + int(v[0])]})

    images.repartition(n_parts).mapInPandas(_prefault, schema="n long").count()

    n = fixtures.n_images_for_sf(args.sf_dir)
    polys = pd.read_parquet(fixtures.ensure_polygons(fixtures.n_polygons_for(n)))
    bounds = indexing.sample_cell_bounds(
        fx["images"], n_parts, res=7, id_suffix="#0" if args.replicate > 1 else ""
    )
    router = indexing.CellRouter(spark, bounds, n_parts, res=7)

    t = {}

    # ---- build the cached range-shuffled frame once (tile_stats path)
    t0 = time.time()
    points = indexing.geolocate_expr(images).select("image_id", "lat", "lon")
    tiles, rp = indexing.tile_assignment_scalable(
        points, 7, partitions=n_parts, keep_cols=("lat", "lon"),
        return_rp=True, router=router,
    )
    # force the cache fill via a cheap count on rp
    rp.count()
    t["tile_shuffle_cache_fill"] = round(time.time() - t0, 3)

    # ---- tile_order twice: checksum agg over tiles (order assign + agg)
    for i in (1, 2):
        t0 = time.time()
        tiles.select(
            F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
            F.count(F.lit(1)),
        ).collect()
        t[f"tile_order_run{i}"] = round(time.time() - t0, 3)

    # ---- pip sub-steps
    pts = rp.select("image_id", "lat", "lon")
    # (a) driver-side build costs alone
    t0 = time.time()
    cover = spatial_join.polygon_cover(spark, polys, 7)
    edges = spatial_join._polygon_edges(spark, polys)
    t["pip_build_dfs"] = round(time.time() - t0, 3)
    # (b) cache scan alone (no joins): count over the cached pts
    t0 = time.time()
    pts.count()
    t["cache_scan_count"] = round(time.time() - t0, 3)
    # (c) candidates only (prefilter join, no refine)
    cell = spatial_join.grid_cell_col(F.col("lat"), F.col("lon"), 7)
    t0 = time.time()
    pts.select("image_id", "lat", "lon", cell.alias("cell_id")).join(
        F.broadcast(cover), "cell_id"
    ).count()
    t["pip_prefilter_count"] = round(time.time() - t0, 3)
    # (d) full pip twice
    for i in (1, 2):
        t0 = time.time()
        spatial_join.pip_join(pts, polys).count()
        t[f"pip_full_run{i}"] = round(time.time() - t0, 3)

    print(json.dumps({"cores": args.cores, "replicate": args.replicate, **t}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
