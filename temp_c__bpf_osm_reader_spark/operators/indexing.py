"""Geolocation + hierarchical cell indexing + deterministic tile assignment.

The load-side of the engine: the analogue of the reference's decode → store →
index pipeline (readosm.c:1107-1309 decode; pbf2sqlite.c:585-597 post-load
index build). 'Indexing' in Spark terms = computing the partition/cluster key
columns; the physical layout step is `repartition(cell).sortWithinPartitions`.

Cell math is plain floor/bit arithmetic in pyspark.sql.functions — JVM-side,
whole-stage-codegen'd, and replicable in ANSI SQL by the DuckDB oracle
(`oracle_cell_expr` emits the exact same formula as SQL text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import RES_SHIFT, I_SHIFT, latlon_from_phash


def geolocate(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(image_id, phash, …) → (image_id, …extra, lat, lon) — single
    mapInArrow pass (one Arrow hop, no shuffle, no pandas materialization).

    Deliberately NOT an expression UDF: Catalyst collapses projections and
    would re-evaluate the Python expression once per referencing operator
    (observed: latlon computed 2× in the PIP plan). And Arrow-native rather
    than mapInPandas: the FNV kernel reads the UTF-8 buffer of the Arrow
    string column directly, so image_ids are never materialized as Python
    objects (input_hint: vectorized Arrow UDFs, no per-row Python). Payload
    columns (bytes) are pruned before the Python boundary.
    """
    import pyarrow as pa

    keep = ["image_id", *extra_cols]
    src = df.select(*dict.fromkeys(keep + ["phash"]))
    fields = [f for f in src.schema.fields if f.name != "phash" or "phash" in keep]
    out_schema = T.StructType(
        fields
        + [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    )
    out_names = [f.name for f in out_schema.fields]

    def gen(batches):
        for rb in batches:
            cols = {rb.schema.field(i).name: rb.column(i) for i in range(rb.num_columns)}
            ids = cols["image_id"]
            if isinstance(ids, pa.ChunkedArray):  # defensive; batches are flat
                ids = ids.combine_chunks()
            phash = cols["phash"].to_numpy(zero_copy_only=False)
            lat, lon = latlon_from_phash(phash, ids)
            cols["lat"] = pa.array(lat, type=pa.float64())
            cols["lon"] = pa.array(lon, type=pa.float64())
            yield pa.RecordBatch.from_arrays([cols[n] for n in out_names], names=out_names)

    return src.mapInArrow(gen, schema=out_schema)


def geolocate_expr(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """geolocate() as pure-JVM column expressions (functions/geo.latlon_cols)
    — bit-identical output, zero Python crossing, whole-stage codegen.

    This is the hot-pipeline form: the Arrow-kernel geolocate() pays a
    JVM<->Python crossing that measures ~0.56 scaling efficiency on this
    host's kernel-mediated IPC and ~8x the per-row cost of the expression
    form (BASELINE.md round-3 decomposition). geolocate() remains the
    vectorized-UDF surface (input_hint) and the two are equality-pinned by
    tests/test_spark_geo.py.
    """
    from ..functions.geo import latlon_cols

    keep = ["image_id", *extra_cols]
    src = df.select(*dict.fromkeys(keep + ["phash"]))
    out_cols = [f.name for f in src.schema.fields if f.name != "phash" or "phash" in keep]
    lat, lon = latlon_cols()
    return src.select(*out_cols, lat.alias("lat"), lon.alias("lon"))


def grid_cell_col(lat: Column, lon: Column, res: int) -> Column:
    """int64 cell id — same frozen spec as functions/geo.py:grid_cell."""
    ny, nx = 1 << res, 1 << (res + 1)
    i = F.least(F.greatest(F.floor((lat + 90.0) / 180.0 * ny), F.lit(0)), F.lit(ny - 1))
    j = F.pmod(F.floor((lon + 180.0) / 360.0 * nx), F.lit(nx))
    return (
        F.lit(res).cast("bigint") * F.lit(1 << RES_SHIFT).cast("bigint")
        + i.cast("bigint") * F.lit(1 << I_SHIFT).cast("bigint")
        + j.cast("bigint")
    )


def z_cell_col(lat: Column, lon: Column, level: int = 12) -> Column:
    """Morton-interleaved S2-analogue cell id (bit ops, JVM-side)."""
    n = 1 << level
    i = F.least(F.greatest(F.floor((lat + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1)).cast("bigint")
    j = F.pmod(F.floor((lon + 180.0) / 360.0 * n), F.lit(n)).cast("bigint")
    out = F.lit(level).cast("bigint") * F.lit(1 << 48).cast("bigint")
    for b in range(level):
        out = out + F.shiftleft(F.shiftright(i, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        out = out + F.shiftleft(F.shiftright(j, b).bitwiseAND(F.lit(1)), 2 * b)
    return out


def oracle_cell_expr(lat: str, lon: str, res: int) -> str:
    """The grid-cell formula as ANSI SQL (DuckDB oracle twin of grid_cell_col)."""
    ny, nx = 1 << res, 1 << (res + 1)
    i = f"least(greatest(floor(({lat} + 90.0) / 180.0 * {ny}), 0), {ny - 1})"
    j = f"((CAST(floor(({lon} + 180.0) / 360.0 * {nx}) AS BIGINT) % {nx} + {nx}) % {nx})"
    return (
        f"(CAST({res} AS BIGINT) * {1 << RES_SHIFT} + CAST({i} AS BIGINT) * {1 << I_SHIFT} + {j})"
    )


def oracle_zcell_expr(lat: str, lon: str, level: int = 12) -> str:
    """Morton z-cell as ANSI SQL (sum of per-bit terms)."""
    n = 1 << level
    i = f"CAST(least(greatest(floor(({lat} + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT)"
    j = f"CAST(((CAST(floor(({lon} + 180.0) / 360.0 * {n}) AS BIGINT) % {n} + {n}) % {n}) AS BIGINT)"
    terms = [f"CAST({level} AS BIGINT) * {1 << 48}"]
    for b in range(level):
        terms.append(f"(({i} // {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(({j} // {1 << b}) % 2) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def with_cells(df: DataFrame, resolutions=(7, 8, 9), zlevel: int = 12) -> DataFrame:
    """Add cell_r{r} for each grid resolution + zcell_l{L} (S2-analogue)."""
    for r in resolutions:
        df = df.withColumn(f"cell_r{r}", grid_cell_col(F.col("lat"), F.col("lon"), r))
    if zlevel:
        df = df.withColumn(f"zcell_l{zlevel}", z_cell_col(F.col("lat"), F.col("lon"), zlevel))
    return df


def sample_cell_bounds(
    images_path: str,
    n_parts: int,
    res: int = 7,
    max_rows: int = 8192,
    id_suffix: str = "",
) -> list:
    """Range cut points [(cell_id, image_id), ...] for the tile shuffle from
    a BOUNDED driver-side read: row-group batches SPREAD EVENLY across each
    parquet file, capped at max_rows rows total — O(n_files) driver work and
    O(max_rows) memory regardless of table size. This plays the role Iceberg
    manifest statistics play on a real lakehouse; footer min/max stats can't
    carry the DERIVED cell key (cell = f(phash)), so a bounded scattered
    sample per file stands in.

    Scattered, not prefix: a prefix sample is only unbiased if key structure
    is uncorrelated with row order, and the Zipf pattern pool violates that
    enough to produce 3x-ideal partitions (measured round 3 — the 8-core
    straggler tail). Evenly-strided batches keep the read bounded while
    sampling the whole file.

    Bounds affect partition BALANCE only, never output (searchsorted
    routing in tile_assignment_scalable; output equality is pytest-pinned),
    so sampled bounds are exactly as correct as full-column bounds — and
    they remove the O(table) driver read that is a driver OOM at 10^12
    rows. Deterministic: same files + max_rows -> same bounds, independent
    of core count (tile_checksum stability across parallelism levels).

    id_suffix: the flagship's replicate mode derives bounds from the '#0'
    replica's keyspace; the other replicas interleave across the same cuts.
    """
    import glob
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..functions import geo as geo_fns

    if os.path.isdir(images_path):
        paths = sorted(glob.glob(os.path.join(images_path, "*.parquet")))
    else:
        paths = [images_path]
    per_file = max(64, max_rows // max(1, len(paths)))
    chunks = []
    for p in paths:
        pf = pq.ParquetFile(p)
        try:
            ngr = pf.metadata.num_row_groups
            if ngr > 1:
                # row groups spread evenly across the file — IO stays
                # bounded (n_keep groups), coverage spans the whole file
                n_keep = min(ngr, max(2, per_file // 1024))
                gidx = sorted({g * (ngr - 1) // (n_keep - 1) for g in range(n_keep)})
                per_group = max(64, per_file // len(gidx))
                for g in gidx:
                    tbl = pf.read_row_group(g, columns=["image_id", "phash"]).to_pandas()
                    step = max(1, len(tbl) // per_group)
                    chunks.append(tbl.iloc[::step])
            else:
                # single row group (small file): one group IS the minimum IO
                # unit — read it and stride rows in memory for even coverage
                tbl = pf.read_row_group(0, columns=["image_id", "phash"]).to_pandas()
                step = max(1, len(tbl) // per_file)
                chunks.append(tbl.iloc[::step])
        finally:
            pf.close()
    sample = pd.concat(chunks, ignore_index=True)
    ids = (sample["image_id"] + id_suffix).tolist()
    lat, lon = geo_fns.latlon_from_phash(sample["phash"].to_numpy(), ids)
    cell = geo_fns.grid_cell(lat, lon, res)
    order = np.lexsort((np.array(ids), cell))
    cuts = [len(order) * k // n_parts for k in range(1, n_parts)]
    return [(int(cell[order[c]]), ids[order[c]]) for c in cuts]


def tile_assignment(points: DataFrame, res: int = 7) -> DataFrame:
    """Deterministic (cell_id, image_id, order_) table — byte-for-byte stable
    across runs and parallelism levels (north-rule exactness criterion).

    order_ is dense within a cell, ordered by image_id — the analogue of
    nod_way(way_id, nod_id, order_) ordered membership (pbf2sqlite.c:422-428).
    One shuffle on cell_id; at cluster scale this is the natural layout
    shuffle (write partitioned by cell prefix afterwards).
    """
    cell = F.col(f"cell_r{res}") if f"cell_r{res}" in points.columns else grid_cell_col(
        F.col("lat"), F.col("lon"), res
    )
    w = Window.partitionBy("cell_id").orderBy("image_id")
    return (
        points.select(cell.alias("cell_id"), "image_id")
        .withColumn("order_", F.row_number().over(w))
    )


def tile_assignment_scalable(
    points: DataFrame,
    res: int = 7,
    partitions: int | None = None,
    keep_cols: tuple[str, ...] = (),
    return_rp: bool = False,
    bounds=None,
    router: "CellRouter | None" = None,
):
    """Byte-identical to tile_assignment, but without the one-task-per-cell
    window bottleneck: at 10^12 rows a hot cell (Zipf head) would serialize an
    entire reducer. Instead:

      1. repartitionByRange(cell_id, image_id) + sortWithinPartitions — hot
         cells SPAN partitions instead of landing on one;
      2. per-(partition, cell) (count, min monotonic id) → driver (bounded by
         #cells + #partitions because ranges are contiguous) → cross-partition
         prefix offsets folded into one small (pid, cell_id, sub) table;
      3. order_ = monotonically_increasing_id() - sub, applied as a broadcast
         hash join — entirely JVM-side, no second Python crossing.

    Output equality with tile_assignment is pinned by test_spark_geo.

    keep_cols: extra point columns carried through the shuffle and emitted
    untouched alongside (cell_id, image_id, order_) — lets downstream
    consumers (e.g. the PIP join) reuse the SAME range-shuffled cached data
    instead of a second materialization of the points (one cache fill and one
    full pass fewer in the fused flagship pipeline).

    bounds: optional precomputed range cut points [(cell_id, image_id), ...]
    (partitions-1 of them, ascending). repartitionByRange SAMPLES its input to
    find bounds — a full extra pass over the upstream plan (for the flagship,
    a second whole geolocate). With bounds supplied, rows route DIRECTLY to
    their partition through a codegen searchsorted + magic-key hash
    repartition (magic_partition_keys), skipping the sample pass entirely —
    the write-time bucketing pattern: on a real lakehouse the bounds come
    from table statistics (manifests), not a per-job sample. Output is
    byte-identical as long as bounds are ascending (balance, not placement,
    is all sampling ever bought). Bounds quality only affects partition
    balance, never correctness.
    """
    spark = points.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    # Preconditions of the folded _okey broadcast key (step 3 below): pid must
    # fit in 15 bits (sign bit safety) and the low 48 bits of cell_id must be
    # unique per cell, which holds for res <= 15 ((i<<27)|j < 2^42). Violating
    # either would silently corrupt order_ (duplicate broadcast keys multiply
    # join rows), so fail loudly — partitions is caller-controlled.
    if partitions >= (1 << 15):
        raise ValueError(
            f"tile_assignment_scalable: partitions={partitions} >= 2^15 would "
            "overflow the folded (pid << 48) order-join key; split the job or "
            "widen the key layout"
        )
    if res > 15:
        raise ValueError(
            f"tile_assignment_scalable: res={res} > 15 makes low-48 cell bits "
            "collide in the folded order-join key; use res <= 15"
        )
    cell = F.col(f"cell_r{res}") if f"cell_r{res}" in points.columns else grid_cell_col(
        F.col("lat"), F.col("lon"), res
    )
    sel = points.select(cell.alias("cell_id"), "image_id", *keep_cols)
    # auto-build a slot-map router only when the partition count makes the
    # chained-when searchsorted expensive: the router's driver build +
    # broadcast costs ~0.4 s, which a 16-partition query pays for nothing
    # (15 compares/row is cheap); the flagship passes a prebuilt router
    if router is None and bounds is not None and res <= 8 and partitions > 24:
        router = CellRouter(spark, bounds, partitions, res=res)
    if router is not None:
        rp = router.route(sel).sortWithinPartitions("cell_id", "image_id").cache()
    elif bounds is not None:
        # res too fine for a slot map: fall back to the chained-when
        # searchsorted (O(partitions) per row — fine for small counts)
        magic = magic_partition_keys(partitions)
        # LongType matters: HashPartitioning murmur3-hashes an INT over 4
        # bytes but a BIGINT over 8 — magic keys are computed for BIGINT
        route = F.element_at(
            F.array(*[F.lit(m).cast("long") for m in magic]),
            bounds_bucket_col(F.col("cell_id"), F.col("image_id"), bounds) + 1,
        )
        routed = sel.withColumn("_route", route).repartition(partitions, "_route")
        rp = (
            routed.drop("_route")
            .sortWithinPartitions("cell_id", "image_id")
            .cache()
        )
    else:
        rp = (
            sel.repartitionByRange(partitions, "cell_id", "image_id")
            .sortWithinPartitions("cell_id", "image_id")
            .cache()
        )
    # order_ is assigned ENTIRELY JVM-side — no second Python crossing.
    # (Round-3 measurement: an IDENTITY mapInArrow round-trip over the cached
    # rp costs 16 s @2 pinned cores / 7.2 s @8 and scales at 0.56, while the
    # same scan + hash agg pure-JVM is 1.6 s / 0.4 s and scales cleanly —
    # this host's kernel-mediated JVM<->Python IPC neither is cheap nor
    # scales, and on a real cluster the crossing is still 2x memory traffic.)
    #
    # Construction: rows in each cached partition sit in TOTAL order
    # (cell_id, image_id) — unique keys, so the order is deterministic even
    # on cache-eviction recompute. monotonically_increasing_id() is
    # (partition_id << 33) + row_index_in_partition, so within a partition
    # (mid - min_mid_of_its_cell_run) is the row's position inside its
    # (partition, cell) run. The same stats pass that always ran now also
    # collects min(mid) per (partition, cell); the driver turns the
    # cross-partition prefix counts into one small (pid, cell_id, sub)
    # table — order_ = mid - sub — applied as a BROADCAST hash join
    # (≤ partitions × cells-in-range rows, bounded because ranges are
    # contiguous). Partitions beyond 2^33 rows would overflow the row-index
    # field (8.6e9 rows per partition — far past any sane task size).
    with_mid = rp.withColumn("_mid", F.monotonically_increasing_id())
    # cross-partition prefix offsets, vectorized; the fetch is Arrow
    # (toPandas), not py4j rows — ~#cells × #touched-partitions rows (bounded
    # because ranges are contiguous), and row-based collect of ~32k Rows
    # costs ~0.5-1 s of pure driver deserialization that Arrow doesn't.
    # order_ = (_mid - mn) + acc + 1 == _mid - (mn - acc - 1)
    # where acc = rows of the same cell in lower-pid partitions.
    import numpy as np
    import pandas as pd

    spdf = (
        with_mid.groupBy(F.spark_partition_id().alias("pid"), "cell_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("min_mid"))
        .toPandas()
        .sort_values(["cell_id", "pid"], kind="stable", ignore_index=True)
    )
    acc = spdf.groupby("cell_id", sort=False)["cnt"].cumsum() - spdf["cnt"]
    # Join key folded to ONE BIGINT — (pid << 48) | low-48-of-cell — so the
    # broadcast side is Spark's dense LongHashedRelation instead of the
    # generic two-column unsafe-row relation: the per-row probe is then an
    # array index, not a composite-key hash+compare. Measured on the 50.9M-row
    # flagship checksum action: 6.0 s → 1.1 s at 8 pinned cores, 5.9 → 3.2 s
    # at 2 (the generic probe was also the stage whose CPU inflated ~3x under
    # 8-way memory contention). Low 48 bits of cell_id are (i << 27) | j —
    # unique per cell at a fixed res (res bits live above bit 54, constant
    # across the frame) and < 2^(27+res) <= 2^42 for res <= 15, so they never
    # collide with the pid field; pid < 2^15 keeps the key positive.
    mask48 = (1 << 48) - 1
    sub_pdf = pd.DataFrame(
        {
            "_okey": (spdf["pid"].to_numpy().astype(np.int64) << 48)
            | (spdf["cell_id"].to_numpy().astype(np.int64) & mask48),
            "_sub": (spdf["min_mid"] - acc - 1).astype(np.int64),
        }
    )
    sub_df = spark.createDataFrame(sub_pdf, schema="_okey long, _sub long")
    okey = F.shiftleft(F.spark_partition_id().cast("long"), 48).bitwiseOR(
        F.col("cell_id").bitwiseAND(F.lit(mask48))
    )
    tiles = (
        with_mid.withColumn("_okey", okey)
        .join(F.broadcast(sub_df), "_okey")
        .withColumn("order_", (F.col("_mid") - F.col("_sub")).cast("int"))
        .select("cell_id", "image_id", "order_", *keep_cols)
    )
    if return_rp:
        # hand the cached range-shuffled frame to callers that want to reuse
        # the SAME materialization (e.g. the PIP join) without paying the
        # assign() Arrow round-trip again
        return tiles, rp
    return tiles


def write_partitioned(
    points: DataFrame, path: str, parent_res: int = 3, res: int = 7
) -> None:
    """Hive-partitioned layout keyed by the COARSE cell (the hierarchy's
    parent, 128 directories at res 3) with fine-cell clustering inside each —
    so a cell predicate prunes directories at planning time (Catalyst
    partition pruning, the §4 'header skip' analogue) and the fine sort gives
    row-group skipping within. The res-3 parent of a res-7 cell is pure bit
    arithmetic on lat/lon, so both keys derive from the same columns."""
    pts = points.withColumn(
        "p_cell", grid_cell_col(F.col("lat"), F.col("lon"), parent_res)
    )
    (
        pts.repartition(F.col("p_cell"))
        .sortWithinPartitions("p_cell", f"cell_r{res}", "image_id")
        .write.mode("overwrite")
        .partitionBy("p_cell")
        .parquet(path)
    )


def write_indexed(points: DataFrame, path: str, res: int = 7, buckets: int = 64) -> None:
    """Physical 'index build': cluster by cell, sort within partitions —
    the Spark replacement for the reference's post-load B-tree indexes
    (pbf2sqlite.c:585-597). Readers get partition pruning + clustered scans."""
    (
        points.repartition(buckets, F.col(f"cell_r{res}"))
        .sortWithinPartitions(f"cell_r{res}", "image_id")
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------ direct-routed tile shuffle

def _mmh3_long(v: int, seed: int = 42) -> int:
    """Spark's Murmur3 x86_32 of a BIGINT (two LE 32-bit words) — matches
    F.hash(bigint) exactly (verified against the JVM)."""
    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    for k in ((v & 0xFFFFFFFF), ((v >> 32) & 0xFFFFFFFF)):
        k = rotl((k * c1) & 0xFFFFFFFF, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = (rotl(h, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 8
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h if h < 0x80000000 else h - 0x100000000


def magic_partition_keys(n: int) -> list[int]:
    """Smallest non-negative ints m_0..m_{n-1} with pmod(murmur3(m_i), n) == i:
    routing rows to `repartition(n, key)` with key = m_i lands them EXACTLY in
    partition i. This turns hash repartitioning into direct addressing."""
    found: dict[int, int] = {}
    m = 0
    while len(found) < n:
        r = _mmh3_long(m) % n
        if r not in found:
            found[r] = m
        m += 1
    return [found[i] for i in range(n)]


class CellRouter:
    """Precompiled range router for the tile shuffle: slot -> (base bucket,
    intra-cell image_id cuts) as a BROADCAST map over the res-r linear cell
    grid (2^(2r+1) slots; 32k at res 7). Routing a row is then an O(1)
    broadcast-join probe + at most a couple of string compares (only for
    rows in one of the <= partitions-1 cut cells) — independent of the
    partition count, unlike the chained-when searchsorted expression
    (bounds_bucket_col), whose O(partitions) per-row comparison chain blows
    past codegen limits and costs 4x wall at 96 partitions (measured r3).

    Build once per job (driver-side, O(slots)); reuse across every stage
    that shuffles on the same bounds. On a real lakehouse this is the
    "write-time bucketing spec" artifact: derived from table statistics,
    shipped to executors as a broadcast.
    """

    def __init__(self, spark, bounds, partitions: int, res: int = 7):
        import numpy as np
        import pandas as pd

        ny, nx = 1 << res, 1 << (res + 1)
        if ny * nx > (1 << 21):
            raise ValueError(f"CellRouter: res {res} grid too large to broadcast")
        self.partitions = partitions
        self.res = res
        base_cell = res << RES_SHIFT
        cut_cells = np.array([c for c, _ in bounds], dtype=np.int64)
        slots = np.arange(ny * nx, dtype=np.int64)
        slot_cells = base_cell | ((slots // nx) << I_SHIFT) | (slots % nx)
        p_lo = np.searchsorted(cut_cells, slot_cells, side="left").astype(np.int32)
        cuts_in_cell: dict[int, list[str]] = {}
        for c, i in bounds:
            cuts_in_cell.setdefault(int(c), []).append(str(i))
        self._map_pdf = pd.DataFrame(
            {
                "_slot": slots,
                "_plo": p_lo,
                "_cuts": [cuts_in_cell.get(int(sc)) for sc in slot_cells],
            }
        )
        self._slot_map = spark.createDataFrame(
            self._map_pdf, schema="_slot long, _plo int, _cuts array<string>"
        )
        self._magic = magic_partition_keys(partitions)

    def route(self, sel: DataFrame) -> DataFrame:
        """sel must carry (cell_id, image_id). Returns sel hash-repartitioned
        into `partitions` range buckets (ascending by (cell_id, image_id))."""
        ny, nx = 1 << self.res, 1 << (self.res + 1)
        slot = (
            F.shiftright(F.col("cell_id"), I_SHIFT) % (1 << I_SHIFT)
        ) * nx + F.pmod(F.col("cell_id"), 1 << I_SHIFT)
        magic_arr = F.array(*[F.lit(int(m)).cast("long") for m in self._magic])
        bucket = F.col("_plo") + F.when(F.col("_cuts").isNull(), F.lit(0)).otherwise(
            F.aggregate(
                F.col("_cuts"),
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("image_id") > c, 1).otherwise(0),
            )
        )
        return (
            sel.withColumn("_slot", slot)
            .join(F.broadcast(self._slot_map), "_slot")
            .withColumn("_route", F.element_at(magic_arr, bucket + 1))
            .repartition(self.partitions, "_route")
            .drop("_slot", "_plo", "_cuts", "_route")
        )


def bounds_bucket_col(cell: Column, image_id: Column, bounds) -> Column:
    """searchsorted((cell, image_id), bounds) as a codegen-able JVM expression:
    bucket = #bounds strictly below the row's (cell, image_id)."""
    b = F.lit(0)
    for c, i in bounds:
        b = b + F.when(
            (cell > F.lit(int(c)))
            | ((cell == F.lit(int(c))) & (image_id > F.lit(str(i)))),
            1,
        ).otherwise(0)
    return b


def cell_compact(points: DataFrame, level: int = 12, min_level: int = 10) -> DataFrame:
    """→ (cell, level) — hierarchical compaction of the occupied z-cell set
    (the H3 `compact` / S2 covering-normalization analogue): any 4 sibling
    cells that are ALL occupied are replaced by their parent, applied
    bottom-up from `level` to `min_level`.

    The Morton layout (z_cell_col: level·2^48 + interleaved bits) makes the
    hierarchy pure bit arithmetic — a child's parent is
    `((cell - lv·2^48) >> 2) + (lv-1)·2^48` and every parent has exactly 4
    children — so the whole operator is groupBy on JVM bigint keys.

    Plan: one distinct on the cell domain, then per level ONE map-side-
    combinable groupBy(parent) that both decides completeness (count = 4)
    and carries the ≤4 children for re-emission — no join, no second
    shuffle. All shuffles are on the cell domain (≪ points, bounded by
    4^level), so the operator scales with occupied area, not input rows.
    Output is an order-independent set; `level` marks the granularity kept.

    The distinct cell set and each level's groupBy are CACHED: every level
    references its `g` twice (keep-branch + parent carry-forward) and the
    final union references every level, so without the cache Spark plans
    independent subtrees and the FULL-TABLE distinct re-runs once per
    branch (measured: 6 parquet scans, 0 ReusedExchange at 2 levels). All
    cached intermediates live on the cell domain — grid-bounded at any
    input size.
    """
    cur = points.select(F.col(f"zcell_l{level}").alias("cell")).distinct().cache()
    cached = [cur]
    pieces = []
    for lv in range(level, min_level, -1):
        g = (
            cur.withColumn(
                "pcell",
                F.shiftright(F.col("cell") - F.lit(lv << 48), 2) + F.lit((lv - 1) << 48),
            )
            .groupBy("pcell")
            .agg(F.count(F.lit(1)).alias("c"), F.collect_list("cell").alias("children"))
        ).cache()
        cached.append(g)
        pieces.append(
            g.where(F.col("c") < 4)
            .select(F.explode("children").alias("cell"))
            .withColumn("level", F.lit(lv))
        )
        cur = g.where(F.col("c") == 4).select(F.col("pcell").alias("cell"))
    pieces.append(cur.withColumn("level", F.lit(min_level)))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # the result is grid-bounded (≤ occupied cells), so cutting the lineage
    # eagerly is cheap — and lets every per-level cache be RELEASED here
    # instead of accumulating pinned executor storage across a long
    # multi-query session (knn_join_global's established pattern)
    out = out.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out
