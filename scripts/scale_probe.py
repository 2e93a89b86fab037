"""Sub-stage scaling decomposition for the flagship pipeline.

Runs the flagship's constituent stages SEPARATELY at one pinned core count
and prints per-stage timings as one JSON line. Drive it at 2 vs 8 cores to
see which stage stops scaling:

  A jvm_agg     : pure-JVM scan + hash agg over the cached input (control)
  B geolocate   : mapInArrow crossing + numpy kernel, JVM-side sum sink
  C route_sort  : geolocate -> bounds routing -> shuffle -> sort -> cache fill
  D stats_agg   : mid/groupBy(pid,cell)/collect over the cached rp
  E checksum    : broadcast order join + hash checksum agg (tile_order body)

Usage: spark-submit --py-files engine.zip scripts/scale_probe.py \
        --cores 8 --replicate 240 [--sf-dir /root/testdata/sf0.1]
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
    ap.add_argument("--replicate", type=int, default=240)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.operators import indexing
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    n_parts = args.partitions
    fx = fixtures.ensure_all_for_sf(args.sf_dir)
    spark = get_spark(
        app="scale-probe",
        cores=args.cores,
        shuffle_partitions=n_parts,
        extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "131072"},
    )

    images = spark.read.parquet(fx["images"]).select("image_id", "phash")
    if args.replicate > 1:
        reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
        images = images.crossJoin(reps).select(
            F.concat_ws("#", "image_id", "rep").alias("image_id"), "phash"
        )
    images = images.repartition(n_parts).cache()
    n_points = images.count()

    # worker warmup + prefault (mirrors flagship_job)
    indexing.geolocate(images.limit(n_parts * 2).repartition(n_parts)).count()

    def _prefault(it):
        import numpy as np

        v = np.zeros(24_000_000, dtype=np.int64)
        v[::512] = 1
        rows = sum(len(pdf) for pdf in it)
        yield pd.DataFrame({"n": [rows + int(v[0])]})

    images.repartition(n_parts).mapInPandas(_prefault, schema="n long").count()

    bounds = indexing.sample_cell_bounds(
        fx["images"], n_parts, res=7,
        id_suffix="#0" if args.replicate > 1 else "",
    )

    t: dict[str, float] = {}

    # A: pure-JVM control
    for tag in ("jvm_agg_warm", "jvm_agg"):
        t0 = time.time()
        images.select(
            F.sum(F.hash("image_id", "phash").cast("bigint")), F.count(F.lit(1))
        ).collect()
        t[tag] = round(time.time() - t0, 3)

    # B: geolocate crossing, cheap JVM sink
    for tag in ("geolocate_warm", "geolocate"):
        t0 = time.time()
        indexing.geolocate(images).select(F.sum("lat"), F.count(F.lit(1))).collect()
        t[tag] = round(time.time() - t0, 3)

    # C: geolocate -> routed shuffle -> sort -> cache fill
    t0 = time.time()
    points = indexing.geolocate(images).select("image_id", "lat", "lon")
    tiles, rp = indexing.tile_assignment_scalable(
        points, 7, partitions=n_parts, keep_cols=("lat", "lon"),
        return_rp=True, bounds=bounds,
    )
    rp.count()  # materialize shuffle+sort+cache WITHOUT the stats pass
    t["route_sort_cache"] = round(time.time() - t0, 3)

    # D: stats agg over the cache (re-run the stats body alone)
    t0 = time.time()
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())
    with_mid.groupBy(F.spark_partition_id().alias("pid"), "cell_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid")
    ).collect()
    t["stats_agg"] = round(time.time() - t0, 3)

    # E: checksum over tiles (tile_order body: broadcast join + hash agg)
    t0 = time.time()
    tiles.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
        F.count(F.lit(1)),
    ).collect()
    t["checksum"] = round(time.time() - t0, 3)

    print(json.dumps({"cores": args.cores, "points": n_points, "timings": t}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
