"""Standalone (no-Spark) scaling probe for the geolocate numpy kernel.

Runs latlon_from_phash over Arrow string batches in P pinned processes at
P=2 vs P=8 and prints the throughput ratio — isolates kernel scaling from
the JVM/IPC side of the mapInArrow path.
"""

import multiprocessing as mp
import os
import statistics
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(16 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(16 << 30))


def work(procs):
    os.sched_setaffinity(0, set(range(int(procs))))
    import numpy as np
    import pyarrow as pa

    sys.path.insert(0, "/root/repo")
    from temp_c__bpf_osm_reader_spark.functions.geo import latlon_from_phash

    rng = np.random.default_rng(1)
    n = 131072
    ph = rng.integers(-(2**62), 2**62, n)
    ids = pa.array([f"img_{i:07d}#{i % 240}" for i in range(n)])
    t0 = time.time()
    for _ in range(12):
        latlon_from_phash(ph, ids)
    return time.time() - t0


def main():
    ctx = mp.get_context("spawn")
    res = {}
    for procs in (2, 8, 2, 8):
        with ctx.Pool(procs) as p:
            p.map(work, [procs] * procs)  # warm
            t0 = time.time()
            p.map(work, [procs] * (procs * 2))
            el = time.time() - t0
        res.setdefault(procs, []).append(procs * 2 / el)
    thr2, thr8 = max(res[2]), max(res[8])
    print(f"2p: {thr2:.3f} q/s  8p: {thr8:.3f} q/s  eff={thr8 / (4 * thr2):.3f}")
    print("all:", {k: [round(v, 3) for v in vs] for k, vs in res.items()})


if __name__ == "__main__":
    main()
