"""Deterministic polygon-layer generator (analogue of OSM ways: ordered closed
point sequences forming geometry — pbf2sqlite.c:422-428 `nod_way(way_id,
nod_id, order_)`).

Polygons are star-convex rings around seeded centers with per-vertex radius
noise → mix of convex and concave shapes; ~overlapping pairs occur naturally
(a point may fall inside >1 polygon and the join must emit all matches,
FIXTURES.md §2). No ring crosses the antimeridian or poles (generator clamps
centers), keeping bbox polyfill simple.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import splitmix64, u01

KINDS = ["district", "park", "water", "forest", "industrial"]


def generate_polygons(n: int, seed: int = 42) -> pd.DataFrame:
    """→ pandas DF: polygon_id int64, kind str, ring_lat list<float>, ring_lon list<float>.

    Ring is closed (first vertex repeated last), counter-clockwise.
    """
    pid = np.arange(n, dtype=np.int64)
    r0 = splitmix64(pid + np.int64(seed) * np.int64(777_767))
    r1 = splitmix64(r0.view(np.int64))
    r2 = splitmix64(r1.view(np.int64))
    # centers clamped away from poles/antimeridian by radius margin
    c_lat = u01(r0) * 150.0 - 75.0
    c_lon = u01(r1) * 330.0 - 165.0
    radius = 0.5 + u01(r2) * 4.5  # degrees
    n_vert = 5 + (r2 % np.uint64(8)).astype(np.int64)  # 5..12 vertices
    kind = np.take(KINDS, (r0 % np.uint64(len(KINDS))).astype(np.int64))

    ring_lat, ring_lon = [], []
    for k in range(n):
        m = int(n_vert[k])
        ang = 2.0 * np.pi * np.arange(m) / m
        vr = splitmix64(pid[k] * np.int64(1 << 16) + np.arange(m, dtype=np.int64) + np.int64(seed))
        rad = radius[k] * (0.5 + u01(vr))  # concavity via radius jitter
        la = np.clip(c_lat[k] + rad * np.sin(ang), -89.9, 89.9)
        lo = np.clip(c_lon[k] + rad * np.cos(ang), -179.9, 179.9)
        ring_lat.append(np.append(la, la[0]).tolist())
        ring_lon.append(np.append(lo, lo[0]).tolist())

    return pd.DataFrame(
        {
            "polygon_id": pid,
            "kind": kind,
            "ring_lat": pd.Series(ring_lat, dtype=object),
            "ring_lon": pd.Series(ring_lon, dtype=object),
        }
    )
