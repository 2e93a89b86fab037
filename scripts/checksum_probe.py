"""Isolate the tile_order checksum stage's cost components at one level.

Variants over the cached range-shuffled frame:
  a) full current checksum: join sub_df + hash(cell,image,order) + sum
  b) no-join: hash(cell_id, image_id, _mid) + sum   (string hash + scan)
  c) numeric-only: hash(cell_id, _mid) + sum        (scan, no string)
  d) join + count only                              (join probe, no hash)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=480)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.operators import indexing
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    n_parts = args.partitions
    fx = fixtures.ensure_all_for_sf(args.sf_dir)
    spark = get_spark(app="probe", cores=args.cores, shuffle_partitions=n_parts)
    images = spark.read.parquet(fx["images"]).select("image_id", "phash")
    images = images.repartition(n_parts)
    if args.replicate > 1:
        reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
        images = images.crossJoin(reps).select(
            F.concat_ws("#", "image_id", "rep").alias("image_id"), "phash"
        )
    images = images.cache()
    images.count()

    bounds = indexing.sample_cell_bounds(
        fx["images"], n_parts, res=7, id_suffix="#0" if args.replicate > 1 else ""
    )
    router = indexing.CellRouter(spark, bounds, n_parts, res=7)
    points = indexing.geolocate_expr(images).select("image_id", "lat", "lon")
    tiles, rp = indexing.tile_assignment_scalable(
        points, 7, partitions=n_parts, keep_cols=("lat", "lon"),
        return_rp=True, router=router,
    )
    rp.count()

    t = {}
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())

    def run(label, df):
        for i in (1, 2):
            t0 = time.time()
            df.collect()
            t[f"{label}_{i}"] = round(time.time() - t0, 3)

    run("a_full", tiles.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
        F.count(F.lit(1)),
    ))
    run("b_nojoin_strhash", with_mid.select(
        F.sum(F.hash("cell_id", "image_id", "_mid").cast("bigint")),
        F.count(F.lit(1)),
    ))
    run("c_numeric_only", with_mid.select(
        F.sum(F.hash("cell_id", "_mid").cast("bigint")), F.count(F.lit(1))
    ))
    run("d_join_count", tiles.select(F.count(F.lit(1))))
    run("e_xxh_str", with_mid.select(
        F.sum(F.shiftright(F.xxhash64("cell_id", "image_id", "_mid"), 32)),
        F.count(F.lit(1)),
    ))

    # f) same join but keyed on ONE long: (pid << 48) | linear slot of cell —
    # LongHashedRelation dense fast path instead of the generic unsafe-row
    # two-column hash relation
    from temp_c__bpf_osm_reader_spark.functions.geo import I_SHIFT
    import numpy as np

    res = 7
    nx = 1 << (res + 1)
    spdf = (
        with_mid.groupBy(F.spark_partition_id().alias("pid"), "cell_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid"))
        .toPandas()
        .sort_values(["cell_id", "pid"], kind="stable", ignore_index=True)
    )
    acc = spdf.groupby("cell_id", sort=False)["cnt"].cumsum() - spdf["cnt"]
    slot_np = (
        ((spdf["cell_id"].to_numpy() >> I_SHIFT) & ((1 << I_SHIFT) - 1)) * nx
        + (spdf["cell_id"].to_numpy() & (nx - 1))
    )
    import pandas as pd

    sub1 = pd.DataFrame(
        {
            "_key": (spdf["pid"].to_numpy().astype(np.int64) << 48) | slot_np,
            "_sub": (spdf["min_mid"] - acc - 1).astype(np.int64),
        }
    )
    sub1_df = spark.createDataFrame(sub1, schema="_key long, _sub long")
    slot_col = (
        (F.shiftright(F.col("cell_id"), I_SHIFT) % (1 << I_SHIFT)) * nx
        + F.pmod(F.col("cell_id"), nx)
    )
    keyed = with_mid.withColumn(
        "_key",
        F.shiftleft(F.spark_partition_id().cast("long"), 48).bitwiseOR(slot_col),
    )
    tiles1 = (
        keyed.join(F.broadcast(sub1_df), "_key")
        .withColumn("order_", (F.col("_mid") - F.col("_sub")).cast("int"))
    )
    run("f_longkey_full", tiles1.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")),
        F.count(F.lit(1)),
    ))
    run("g_longkey_count", tiles1.select(F.count(F.lit(1))))

    print(json.dumps({"cores": args.cores, **t}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
