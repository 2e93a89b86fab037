"""Probe v3: JVM geolocate + scattered-sample bounds + hybrid slot routing.

Pipeline under test (all-JVM, no Python crossing):
  xxhash64 geolocate -> cell -> slot broadcast-join routing (with per-cut-cell
  image_id splits) -> shuffle -> sort -> cache -> stats -> order join -> checksum

Prints stage timings + partition balance. Run pinned at 2 vs 8 cores.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def jvm_latlon(df):
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


def jvm_latlon_pdf(ids: list[str], phash: np.ndarray, spark):
    """Driver-side twin via a tiny Spark job (prototype shortcut: the real
    migration ships a numpy xxhash64 twin; for bounds we just need the same
    values, so let the JVM compute them on 8k rows)."""
    pdf = pd.DataFrame({"image_id": ids, "phash": phash})
    out = jvm_latlon(spark.createDataFrame(pdf)).toPandas()
    return out["lat"].to_numpy(), out["lon"].to_numpy()


def scattered_bounds(spark, images_path, n_parts, max_rows=65536, id_suffix=""):
    """(cell, image_id) range cuts from a SCATTERED bounded sample: k batches
    spread across each file's row groups (prefix-only sampling is biased when
    key structure correlates with row order). O(max_rows) driver memory."""
    import pyarrow.parquet as pq

    from temp_c__bpf_osm_reader_spark.functions import geo as geo_fns

    paths = (
        sorted(glob.glob(os.path.join(images_path, "*.parquet")))
        if os.path.isdir(images_path)
        else [images_path]
    )
    chunks = []
    per_file = max(1024, max_rows // max(1, len(paths)))
    for p in paths:
        pf = pq.ParquetFile(p)
        n_rows = pf.metadata.num_rows
        batch = 1024
        n_batches = max(1, per_file // batch)
        # read every k-th batch of `batch` rows
        stride = max(1, n_rows // (batch * n_batches))
        got = 0
        for i, rb in enumerate(pf.iter_batches(batch_size=batch, columns=["image_id", "phash"])):
            if i % stride == 0:
                chunks.append(rb.to_pandas())
                got += len(rb)
                if got >= per_file:
                    break
        pf.close()
    sample = pd.concat(chunks, ignore_index=True)
    ids = (sample["image_id"] + id_suffix).tolist()
    lat, lon = jvm_latlon_pdf(ids, sample["phash"].to_numpy(), spark)
    cell = geo_fns.grid_cell(lat, lon, 7)
    order = np.lexsort((np.array(ids), cell))
    cuts = [len(order) * k // n_parts for k in range(1, n_parts)]
    return [(int(cell[order[c]]), ids[order[c]]) for c in cuts]


def hybrid_route(pts, bounds, n_parts, magic):
    """slot -> (base bucket, image_id cuts within the slot's cell) broadcast
    map; route = magic[base + #cuts below image_id]. O(1) per row."""
    spark = pts.sparkSession
    base_cell = 7 << 54
    cut_cells = np.array([c for c, _ in bounds], dtype=np.int64)
    slots = np.arange(128 * 256, dtype=np.int64)
    slot_cells = base_cell | ((slots // 256) << 27) | (slots % 256)
    # bucket of the FIRST row of each slot-cell: number of cuts strictly
    # below (cell, "") == number of cuts with cut_cell < cell
    p_lo = np.searchsorted(cut_cells, slot_cells, side="left")
    cuts_in_cell: dict[int, list[str]] = {}
    for c, i in bounds:
        cuts_in_cell.setdefault(int(c), []).append(i)
    rows = pd.DataFrame(
        {
            "_slot": slots,
            "_plo": p_lo.astype(np.int32),
            "_cuts": [
                cuts_in_cell.get(int(sc), None) for sc in slot_cells
            ],
        }
    )
    schema = "_slot long, _plo int, _cuts array<string>"
    slot_map = spark.createDataFrame(rows, schema=schema)
    magic_arr = F.array(*[F.lit(int(m)).cast("long") for m in magic])
    bucket = F.col("_plo") + F.when(
        F.col("_cuts").isNull(), F.lit(0)
    ).otherwise(
        F.aggregate(
            F.col("_cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("image_id") > c, 1).otherwise(0),
        )
    )
    joined = pts.join(F.broadcast(slot_map), "_slot")
    return (
        joined.withColumn("_route", F.element_at(magic_arr, bucket + 1))
        .repartition(len(magic), "_route")
        .drop("_slot", "_plo", "_cuts", "_route")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=240)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from temp_c__bpf_osm_reader_spark.operators.indexing import (
        grid_cell_col, magic_partition_keys,
    )
    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    n_parts = args.partitions
    fx = fixtures.ensure_all_for_sf(args.sf_dir)
    spark = get_spark(
        app="jvm-geo-probe2",
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

    bounds = scattered_bounds(
        spark, fx["images"], n_parts,
        id_suffix="#0" if args.replicate > 1 else "",
    )
    magic = magic_partition_keys(n_parts)

    t: dict[str, float] = {}

    # warm plan shapes on a tiny sample (mirror flagship warmup)
    cell = grid_cell_col(F.col("lat"), F.col("lon"), 7)

    def build(df):
        pts = jvm_latlon(df).select(
            "image_id", "lat", "lon", cell.alias("cell_id"),
            (
                (F.shiftright(cell, 27) % (1 << 27)) * 256 + F.pmod(cell, 1 << 27) % 256
            ).alias("_slot"),
        )
        return hybrid_route(pts, bounds, n_parts, magic).sortWithinPartitions(
            "cell_id", "image_id"
        ).cache()

    warm = build(images.limit(512).repartition(n_parts))
    warm.count()
    wm = warm.withColumn("_mid", F.monotonically_increasing_id())
    wm.groupBy(F.spark_partition_id().alias("pid"), "cell_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid")
    ).collect()
    warm.unpersist()

    t0 = time.time()
    rp = build(images)
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())
    stats = with_mid.groupBy(F.spark_partition_id().alias("pid"), "cell_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid")
    ).collect()
    t["tile_stats"] = round(time.time() - t0, 3)

    t0 = time.time()
    by_cell: dict[int, list] = {}
    for r in stats:
        by_cell.setdefault(r["cell_id"], []).append((r["pid"], r["cnt"], r["min_mid"]))
    sub_rows = []
    psize: dict[int, int] = {}
    for cid, lst in by_cell.items():
        lst.sort()
        acc = 0
        for pid, c, mn in lst:
            sub_rows.append((pid, cid, mn - acc - 1))
            acc += c
            psize[pid] = psize.get(pid, 0) + c
    sub_df = spark.createDataFrame(sub_rows, schema="pid int, cell_id long, _sub long")
    tiles = (
        with_mid.withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(sub_df), ["pid", "cell_id"])
        .withColumn("order_", (F.col("_mid") - F.col("_sub")).cast("int"))
        .select("cell_id", "image_id", "order_")
    )
    checksum, n_tiles = tiles.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
        F.count(F.lit(1)),
    ).collect()[0]
    t["tile_order"] = round(time.time() - t0, 3)

    sizes = sorted(psize.values())
    ideal = n_points / n_parts
    print(
        json.dumps(
            {
                "cores": args.cores,
                "points": n_points,
                "tiles": int(n_tiles),
                "checksum": int(checksum),
                "timings": t,
                "pipeline_s": round(t["tile_stats"] + t["tile_order"], 3),
                "part_max_share": round(sizes[-1] / ideal, 2),
                "part_min_share": round(sizes[0] / ideal, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
