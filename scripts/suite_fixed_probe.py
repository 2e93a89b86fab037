"""Per-query fixed-vs-scan cost split for the headline bench suite
(round-4 verdict item 8).

Method: run every headline query at two scales (sf0.01 and sf0.1 — 10x data)
in interleaved best-of-N passes inside ONE warmed session per scale, then
solve t(sf) = fixed + scan * sf per query:

    fixed      = max(0, (10 * t_small - t_big) / 9)
    scan(sf01) = t_big - fixed

A query whose time is mostly `fixed` is bounded by the per-action floor
(whole-stage-codegen compile + scheduling, ~1.1 s/action on this host) — a
regression there means more actions or plan bloat, not slower scans. A query
whose time is mostly `scan` regresses only when per-row work grows. The table
goes to BASELINE.md so future per-query regressions can be attributed in
minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "geolocate_cells", "tile_assignment", "pip_join", "knn",
    "decode_nodes", "decode_tags", "q1_lineitem_agg", "revenue_by_segment",
    "topk_orders_per_customer", "events_windowed", "minhash_lsh_pairs",
    "simhash_pairs", "ann_topk", "exact_dedup_groups", "token_stats",
    "decode_integrity", "cell_counts_salted", "asof_purchase_view", "xml_nodes",
]


def measure(sf_dir: str, passes: int = 2) -> dict[str, float]:
    from pyspark.sql import functions as F

    from temp_c__bpf_osm_reader_spark import api
    from temp_c__bpf_osm_reader_spark.session import get_spark
    from temp_c__bpf_osm_reader_spark.sources import fixtures, xml_source

    fixtures.ensure_all_for_sf(sf_dir)
    xml_source.ensure_xml(fixtures.n_images_for_sf(sf_dir))
    spark = get_spark(app=f"fixed-probe-{os.path.basename(sf_dir)}")
    qs = api.queries()
    # same steady-state warmup as bench.py
    qs["geolocate_cells"](spark, sf_dir).count()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(32 * 64).repartition(64).select(_warm("id")).count()
    runs: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for _ in range(passes + 1):  # pass 0 = per-query warmup, kept like bench
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs[name].append(time.time() - t0)
        spark.catalog.clearCache()
    spark.stop()
    return {n: min(v) for n, v in runs.items()}


def main() -> None:
    t_small = measure("/root/testdata/sf0.01")
    t_big = measure("/root/testdata/sf0.1")
    table = {}
    for n in HEADLINE:
        fixed = max(0.0, (10 * t_small[n] - t_big[n]) / 9)
        table[n] = {
            "t_sf001": round(t_small[n], 3),
            "t_sf01": round(t_big[n], 3),
            "fixed_s": round(fixed, 3),
            "scan_s_sf01": round(t_big[n] - fixed, 3),
            "fixed_frac_sf01": round(fixed / t_big[n], 2) if t_big[n] else 0.0,
        }
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
