"""Benchmark runner — prints ONE JSON line for the round driver.

Measures:
  * headline query timings at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    on local[$SPARK_GRAFT_CPUS];
  * spatial-join pipeline throughput (images/sec) — the BASELINE.json metric;
  * scaling evidence: the flagship pipeline via `spark-submit --py-files` at
    local[8] and local[32] on identical input → efficiency = T8/(4*T32)
    throughput ratio (the in-sandbox stand-in for N vs 4N executors,
    BASELINE.md). Skip with SPARK_GRAFT_SKIP_SCALING=1.

Everything generated is cached under data/ — re-runs are warm.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _make_zip() -> str:
    zpath = os.path.join(REPO, ".scratch", "engine.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "temp_c__bpf_osm_reader_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _scaling_run(zpath: str, sf_dir: str, cores: int, replicate: int) -> dict:
    out = subprocess.run(
        [
            "spark-submit",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "flagship_job.py"),
            "--sf-dir",
            sf_dir,
            "--cores",
            str(cores),
            "--replicate",
            str(replicate),
            "--skip-knn",
            "--skip-decode",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from flagship run (cores={cores}): {out.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))

    from temp_c__bpf_osm_reader_spark import api
    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.sources import fixtures

    fixtures.ensure_all_for_sf(sf_dir)  # warm the fixture cache before timing

    spark = get_spark(app="bench", cores=cores)
    qs = api.queries()
    headline = [
        "geolocate_cells",
        "tile_assignment",
        "pip_join",
        "knn",
        "decode_nodes",
        "decode_tags",
        "q1_lineitem_agg",
        "revenue_by_segment",
        "topk_orders_per_customer",
        "events_windowed",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "ann_topk",
        "exact_dedup_groups",
        "token_stats",
        "decode_integrity",
        "cell_counts_salted",
    ]
    timings: dict[str, float] = {}
    n_images = fixtures.n_images_for_sf(sf_dir)
    for name in headline:
        t0 = time.time()
        # count() forces the full plan; result sizes are small by construction
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    spatial_wall = timings["geolocate_cells"] + timings["tile_assignment"] + timings["pip_join"]
    spark.stop()

    result = {
        "metric": "headline_suite_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "n_images": n_images,
        "spatial_images_per_sec": round(n_images / max(spatial_wall, 1e-9), 1),
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        zpath = _make_zip()
        replicate = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "40"))
        runs = {c: _scaling_run(zpath, sf_dir, c, replicate) for c in (8, 32)}
        thr = {c: r["images_per_sec"] for c, r in runs.items()}
        result["scaling"] = {
            "replicate": replicate,
            "points": runs[32]["points"],
            "images_per_sec_local8": thr[8],
            "images_per_sec_local32": thr[32],
            "efficiency_8_to_32": round(thr[32] / (4.0 * thr[8]), 3),
            "pipeline_s_local8": runs[8]["pipeline_s"],
            "pipeline_s_local32": runs[32]["pipeline_s"],
            "tile_checksum_match": runs[8]["tile_checksum"] == runs[32]["tile_checksum"],
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
