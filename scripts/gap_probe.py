"""Localize driver-side flat time in the flagship's timed region: planning
(explain) vs execution per action, plus the driver work between actions."""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout

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
        shuffle_partitions=n_parts,
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
    n = fixtures.n_images_for_sf(args.sf_dir)
    polys = pd.read_parquet(fixtures.ensure_polygons(fixtures.n_polygons_for(n)))
    bounds = indexing.sample_cell_bounds(
        fx["images"], n_parts, res=7, id_suffix="#0" if args.replicate > 1 else ""
    )
    router = indexing.CellRouter(spark, bounds, n_parts, res=7)

    t = {}

    def mark(label, t0):
        t[label] = round(time.time() - t0, 3)

    # ---- replicate tile_assignment_scalable's internals with timestamps
    points = indexing.geolocate_expr(images).select("image_id", "lat", "lon")
    sel = points.select(
        indexing.grid_cell_col(F.col("lat"), F.col("lon"), 7).alias("cell_id"),
        "image_id", "lat", "lon",
    )
    t0 = time.time()
    rp = router.route(sel).sortWithinPartitions("cell_id", "image_id").cache()
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())
    stats_df = with_mid.groupBy(
        F.spark_partition_id().alias("pid"), "cell_id"
    ).agg(F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid"))
    mark("build_plans", t0)

    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        stats_df.explain("formatted")
    mark("stats_plan_explain", t0)

    t0 = time.time()
    spdf = stats_df.toPandas()
    mark("stats_action", t0)

    t0 = time.time()
    import numpy as np

    spdf = spdf.sort_values(["cell_id", "pid"], kind="stable", ignore_index=True)
    acc = spdf.groupby("cell_id", sort=False)["cnt"].cumsum() - spdf["cnt"]
    mask48 = (1 << 48) - 1
    sub_pdf = pd.DataFrame(
        {
            "_okey": (spdf["pid"].to_numpy().astype(np.int64) << 48)
            | (spdf["cell_id"].to_numpy().astype(np.int64) & mask48),
            "_sub": (spdf["min_mid"] - acc - 1).astype(np.int64),
        }
    )
    mark("driver_offsets_pandas", t0)

    t0 = time.time()
    sub_df = spark.createDataFrame(sub_pdf, schema="_okey long, _sub long")
    mark("createDataFrame", t0)

    okey = F.shiftleft(F.spark_partition_id().cast("long"), 48).bitwiseOR(
        F.col("cell_id").bitwiseAND(F.lit(mask48))
    )
    tiles = (
        with_mid.withColumn("_okey", okey)
        .join(F.broadcast(sub_df), "_okey")
        .withColumn("order_", (F.col("_mid") - F.col("_sub")).cast("int"))
        .select("cell_id", "image_id", "order_", "lat", "lon")
    )
    chk = tiles.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
        F.count(F.lit(1)),
    )
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        chk.explain("formatted")
    mark("checksum_plan_explain", t0)
    t0 = time.time()
    chk.collect()
    mark("checksum_action", t0)

    pip = spatial_join.pip_join(rp.select("image_id", "lat", "lon"), polys)
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        pip.explain("formatted")
    mark("pip_plan_explain", t0)
    t0 = time.time()
    pip.count()
    mark("pip_action", t0)

    print(json.dumps({"cores": args.cores, **t}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
