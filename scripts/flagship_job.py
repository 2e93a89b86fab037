"""Flagship pipeline job — run via `spark-submit --py-files engine.zip`.

decode blocks → geolocate → cell-index → deterministic tile assignment →
two-phase PIP spatial join → k-ring kNN. Prints one JSON line with row counts,
throughput, and a determinism checksum.

Usage:
  spark-submit --py-files engine.zip scripts/flagship_job.py \
      [--sf-dir /root/testdata/sf0.001] [--cores 8] [--skip-knn]
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--skip-knn", action="store_true")
    args = ap.parse_args()

    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.operators import decode, indexing, knn, spatial_join
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    fx = fixtures.ensure_all_for_sf(args.sf_dir)
    spark = get_spark(app="flagship", cores=args.cores)
    t_all = time.time()
    timings: dict[str, float] = {}

    # 1. decode the PBF-analogue blocks → nodes (the reference's load loop)
    t0 = time.time()
    blocks = spark.read.parquet(fx["blocks"])
    nodes, tags = decode.decode_entities(blocks)
    n_nodes = nodes.count()
    n_tags = tags.count()
    timings["decode"] = time.time() - t0

    # 2. geolocate + index + deterministic tile assignment (from the images table)
    t0 = time.time()
    images = spark.read.parquet(fx["images"])
    points = indexing.with_cells(indexing.geolocate(images), resolutions=(7,), zlevel=0)
    points = points.select("image_id", "lat", "lon", "cell_r7").cache()
    tiles = indexing.tile_assignment(points, 7)
    checksum = tiles.select(
        F.sum(F.hash("cell_id", "image_id", "order_").cast("bigint")).alias("s")
    ).collect()[0]["s"]
    n_tiles = tiles.count()
    timings["tile_assign"] = time.time() - t0

    # 3. two-phase PIP join
    t0 = time.time()
    polys = pd.read_parquet(fx["polygons"])
    pip = spatial_join.pip_join(points, polys)
    n_pip = pip.count()
    timings["pip_join"] = time.time() - t0

    # 4. kNN
    n_knn = 0
    if not args.skip_knn:
        t0 = time.time()
        queries = points.filter(
            (F.regexp_extract("image_id", r"img_(\d+)", 1).cast("long") % 100) == 0
        ).select("image_id", "lat", "lon")
        n_knn = knn.knn_join(points.select("image_id", "lat", "lon"), queries).count()
        timings["knn"] = time.time() - t0

    wall = time.time() - t_all
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cores": args.cores,
                "nodes": n_nodes,
                "tags": n_tags,
                "tiles": n_tiles,
                "tile_checksum": checksum,
                "pip_rows": n_pip,
                "knn_rows": n_knn,
                "timings_s": {k: round(v, 3) for k, v in timings.items()},
                "wall_s": round(wall, 3),
                "images_per_sec": round(n_nodes / max(wall, 1e-9), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
