"""Measure the PIP cover resolution trade (round-4 verdict item 7).

Runs the flagship job (pinned 8 CPUs, replicate=480, flagship settings) with
--pip-res 7/8/9, interleaved passes, and reports per-res pip stage time +
row-count equality. Finer cover = 4x cover rows per level (still broadcast-
small) but fewer exact ray casts and fewer candidates overall.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip() -> str:
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


def run(zpath: str, res: int, cores: int = 8, replicate: int | None = None) -> dict:
    replicate = replicate or int(os.environ.get("PIP_PROBE_REPLICATE", "480"))
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--driver-memory", "8g",
        "--conf", "spark.driver.extraJavaOptions=-Xms8g -XX:+AlwaysPreTouch",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "flagship_job.py"),
        "--sf-dir", os.environ.get("PIP_PROBE_SF", "/root/testdata/sf0.001"),
        "--cores", str(cores),
        "--replicate", str(replicate),
        "--partitions", "32",
        "--skip-knn", "--skip-decode",
        "--pip-res", str(res),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-1500:])


def main() -> None:
    zpath = _zip()
    res_list = [int(x) for x in (sys.argv[1:] or ["7", "8", "9"])]
    passes = int(os.environ.get("PIP_PROBE_PASSES", "2"))
    results: dict[int, list] = {r: [] for r in res_list}
    rows: dict[int, int] = {}
    for p in range(passes):
        for r in res_list:
            d = run(zpath, r)
            results[r].append(d["timings_s"]["pip_join"])
            rows.setdefault(r, d["pip_rows"])
            assert d["pip_rows"] == rows[res_list[0]], (r, d["pip_rows"], rows)
            print(f"pass {p} res {r}: pip {d['timings_s']['pip_join']}s "
                  f"geo_tile {d['timings_s']['geo_tile']}s rows {d['pip_rows']}",
                  flush=True)
    print(json.dumps({
        "pip_best": {r: min(v) for r, v in results.items()},
        "pip_runs": results,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
