"""Prototype probe: pure-JVM geolocate (xxhash64-based) feeding the same
routed shuffle -> sort -> cache fill -> stats path, vs the Python-crossing
geolocate. Measures whether eliminating the JVM<->Python crossing makes the
tile_stats stage scale.

The xxhash64 formula here is a SHAPE prototype (stand-in constants) — it
produces valid lat/lon with the same distribution/pocket structure, not the
frozen-spec values. If scaling wins, the spec migration is a separate step.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def jvm_latlon(df):
    """(image_id, phash) -> + lat, lon — ANSI-safe, all JVM built-ins."""
    # u01 from a 64-bit hash: take the top 53 bits as an unsigned fraction
    def u01(h):
        return F.shiftrightunsigned(h, 11) / F.lit(float(1 << 53))

    u = F.xxhash64(F.col("phash"))
    v = F.xxhash64(F.col("phash"), F.lit(1))
    j1 = F.xxhash64(F.col("image_id"))
    j2 = F.xxhash64(F.col("image_id"), F.lit(1))
    base_lat = u01(u) * 180.0 - 90.0
    base_lon = u01(v) * 360.0 - 180.0
    lat = base_lat + (u01(j1) - 0.5) * 0.2
    lat = F.least(F.greatest(lat, F.lit(-90.0)), F.lit(90.0 - 1e-9))
    lon = base_lon + (u01(j2) - 0.5) * 0.2
    lon = F.pmod(lon + 180.0, F.lit(360.0)) - 180.0
    return df.withColumn("lat", lat).withColumn("lon", lon)


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
        app="jvm-geo-probe",
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

    t: dict[str, float] = {}

    # pure-JVM geolocate alone (warm + timed)
    for tag in ("jvm_geo_warm", "jvm_geo"):
        t0 = time.time()
        jvm_latlon(images).select(F.sum("lat"), F.count(F.lit(1))).collect()
        t[tag] = round(time.time() - t0, 3)

    # full tile_stats path with JVM geolocate and SLOT-MAP routing:
    # res-7 cells form a 32768-slot linear grid; the driver turns sampled
    # range cuts into a slot -> magic-route-key table (32k rows) that is
    # BROADCAST-joined to the points — O(1) per row, no chained-when scan,
    # no giant expression tree for Catalyst to inline.
    import numpy as np
    import pandas as pd

    from temp_c__bpf_osm_reader_spark.operators.indexing import (
        grid_cell_col, magic_partition_keys, sample_cell_bounds,
    )

    bounds = sample_cell_bounds(
        fx["images"], n_parts, res=7,
        id_suffix="#0" if args.replicate > 1 else "",
    )
    cut_cells = np.array(sorted({c for c, _ in bounds}), dtype=np.int64)
    base = 7 << 54
    slots = np.arange(128 * 256, dtype=np.int64)
    slot_cells = base | ((slots // 256) << 27) | (slots % 256)
    part_of_slot = np.searchsorted(cut_cells, slot_cells, side="left")
    magic = np.array(magic_partition_keys(n_parts), dtype=np.int64)
    slot_map = spark.createDataFrame(
        pd.DataFrame({"_slot": slots, "_route": magic[part_of_slot]})
    )

    t0 = time.time()
    geo = jvm_latlon(images)
    cell = grid_cell_col(F.col("lat"), F.col("lon"), 7)
    pts = geo.select(
        "image_id", "lat", "lon", cell.alias("cell_id"),
        (
            (F.shiftright(cell, 27) % (1 << 27)) * 256 + (cell % (1 << 27)) % 256
        ).alias("_slot"),
    )
    rp = (
        pts.join(F.broadcast(slot_map), "_slot")
        .repartition(n_parts, "_route")
        .drop("_slot", "_route")
        .sortWithinPartitions("cell_id", "image_id")
        .cache()
    )
    rp.count()
    t["jvm_route_sort_cache"] = round(time.time() - t0, 3)

    t0 = time.time()
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())
    stats = with_mid.groupBy(F.spark_partition_id().alias("pid"), "cell_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid")
    ).collect()
    t["stats_agg"] = round(time.time() - t0, 3)

    by_cell: dict[int, list] = {}
    for r in stats:
        by_cell.setdefault(r["cell_id"], []).append((r["pid"], r["cnt"], r["min_mid"]))
    sub_rows = []
    for cid, lst in by_cell.items():
        lst.sort()
        acc = 0
        for pid, c, mn in lst:
            sub_rows.append((pid, cid, mn - acc - 1))
            acc += c
    sub_df = spark.createDataFrame(sub_rows, schema="pid int, cell_id long, _sub long")
    tiles = (
        with_mid.withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(sub_df), ["pid", "cell_id"])
        .withColumn("order_", (F.col("_mid") - F.col("_sub")).cast("int"))
        .select("cell_id", "image_id", "order_", "lat", "lon")
    )

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
