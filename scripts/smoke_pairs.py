"""Quick smoke of bench._scaling_pairs (alternating order + estimators)."""
import os
import sys
import time


def main():
    sys.path.insert(0, "/root/repo")
    import bench

    z = bench._make_zip()
    t0 = time.time()
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    replicate = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "60"))
    pr = bench._scaling_pairs(z, "/root/testdata/sf0.1", 2, 8, replicate, reps)
    print("wall:", round(time.time() - t0, 1))
    print("pair_efficiencies:", pr["pair_efficiencies"])
    print("small_runs:", pr["small_runs"], "big_runs:", pr["big_runs"])
    print("ceilings:", pr["pair_ceilings"])
    print("min-est:", round(min(pr["small_runs"]) / (4 * min(pr["big_runs"])), 3))


if __name__ == "__main__":
    main()
