"""Driver for scale_probe experiment matrix; prints one line per experiment."""
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import bench

z = bench._make_zip()


def run(cores, extra="", replicate=240):
    env = dict(os.environ)
    if extra:
        env["SPARK_GRAFT_EXTRA_CONF"] = extra
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit", "--driver-memory", "8g",
        "--conf", "spark.driver.extraJavaOptions=-Xms8g -XX:+AlwaysPreTouch",
        "--py-files", z, "scripts/scale_probe.py",
        "--cores", str(cores), "--replicate", str(replicate),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["timings"]
    raise RuntimeError(out.stderr[-1500:])


def main():
    exps = {}
    for arg in sys.argv[1:]:
        name, _, conf = arg.partition(":")
        exps[name] = conf
    for name, conf in exps.items():
        t8 = run(8, conf)
        t2 = run(2, conf)
        keys = ["geolocate", "route_sort_cache", "checksum"]
        row = "  ".join(
            f"{k}: {t2[k]:.1f}/{t8[k]:.1f} eff={t2[k] / t8[k] / 4:.2f}" for k in keys
        )
        print(f"{name:9s} {row}", flush=True)


if __name__ == "__main__":
    main()
