"""One-off scale stress pass (round-4 verdict item 6): run EVERY oracle
compare at a bigger sf than the driver's sf0.01 gate — default the synthetic
data/sf1.0 (n_images = 1,060,000; tables from scripts/make_sf1.py) — and
record per-query pass/fail + wall time to STRESS_<base>.json.

Mirrors tests/test_oracles.py's comparison exactly (row count, sorted
columns, exact values); failures don't stop the pass — the point is the
complete per-query table, including the queries that only break at scale
(window state growth, int overflow in pack branches, fixture-generator
asymptotics).

Usage: python scripts/stress_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "data", "sf1.0")
ONLY = set(sys.argv[2:])
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
BASE = os.path.basename(os.path.normpath(SF_DIR))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in sorted(pdf.columns):
        s = pdf[c]
        if pd.api.types.is_integer_dtype(s):
            try:
                s = s.astype("int64")
            except (TypeError, ValueError, OverflowError):
                pass
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns), kind="mergesort", ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype("float64"), bv.astype("float64"), equal_nan=True)
        else:
            ok = bool((pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all())
        if not ok:
            mism = np.flatnonzero(
                ~(pd.Series(av).astype(str) == pd.Series(bv).astype(str)).to_numpy()
            )[:3]
            return (
                f"{c}: mismatch at rows {mism.tolist()}; "
                f"spark={av[mism].tolist()} oracle={bv[mism].tolist()}"
            )
    return None


def _verify_bucketed_near_dup(spdf: pd.DataFrame, n: int) -> str | None:
    """Spec-derived replacement for the all-pairs DuckDB oracle, which is
    O(n^2) in emb_dups rows (5.6e9 pairs at the sf1.0 stress scale — hours
    in SQL, so the oracle is skipped and the output is pinned against the
    GENERATOR spec instead): fixtures.ensure_emb_dups plants vec i % 4 == 1
    (i > 0) as a near-copy of vec i-1 at cosine ~0.9994, and asserts at
    generation that every background pair stays < 0.78 < tau = 0.8, so the
    exact near-dup pair set IS the planted set — each pair (i-1, i), sim in
    [0.99, 1], found by LSH with per-pair miss probability ~1e-17."""
    exp = [(i - 1, i) for i in range(1, n) if i % 4 == 1]
    got = sorted(zip(spdf["vec1"].astype(int), spdf["vec2"].astype(int)))
    if got != exp:
        extra = [p for p in got if p not in set(exp)][:3]
        missing = [p for p in exp if p not in set(got)][:3]
        return f"pair set != planted set: extra={extra} missing={missing}"
    sims = spdf["sim"].astype(float)
    if not ((sims >= 0.99) & (sims <= 1.0)).all():
        return f"planted sim out of range: [{sims.min()}, {sims.max()}]"
    return None


# Queries whose ORACLE (not the engine) is quadratic in a table that grows
# with the stress scale; each maps to a spec-derived verifier over the spark
# result so the engine side still gets a hard check at scale.
ORACLE_QUADRATIC = {
    "emb_near_dup_bucketed": _verify_bucketed_near_dup,
}


def _checksum_compare(sdf, con, oracle_sql: str) -> dict:
    """Distributed value check for results too large to collect to the driver
    (spark.driver.maxResultSize) — the comparison a real cluster job would
    use. Spark aggregates JVM-side: exact row count + exact sum (decimal(38),
    overflow-free) of the chained multi-column xxhash64 row hash, one tiny
    row to the driver. The oracle side reproduces the IDENTICAL row hash with
    the bit-exact numpy twin of Spark's xxhash64 (functions/hashing.xxh64_long
    chained per column — pinned against Spark in
    tests/test_spark_geo.py::test_xxh64_twin_matches_spark) over the DuckDB
    result read as Arrow. Integer-typed, null-free columns only — a hash-sum
    equality here is the same evidence strength as the driver's value-hash."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from temp_c__bpf_osm_reader_spark.functions import hashing as H

    cols = sorted(sdf.columns)
    int_kinds = {"tinyint", "smallint", "int", "bigint", "integer", "long", "short", "byte"}
    bad_types = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if f.dataType.simpleString() not in int_kinds
    ]
    if bad_types:
        return {"status": "ERROR", "err": f"checksum compare needs int columns, got {bad_types}"}

    rowh = F.xxhash64(*[F.col(c).cast("long") for c in cols])
    nullc = sum(F.sum(F.col(c).isNull().cast("long")) for c in cols)
    agg = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rowh.cast("decimal(38,0)")).alias("hsum"),
        nullc.alias("nulls"),
    ).collect()[0]
    if agg["nulls"]:
        return {"status": "ERROR", "err": f"checksum compare saw {agg['nulls']} spark-side NULLs"}

    tab = con.execute(oracle_sql).arrow()
    if sorted(tab.column_names) != cols:
        return {
            "status": "FAIL",
            "err": f"columns {cols} vs oracle {sorted(tab.column_names)}",
        }
    hs = H.XXH64_SEED
    for c in cols:
        col = tab.column(c).combine_chunks()
        if col.null_count:
            return {"status": "ERROR", "err": f"oracle col {c} has NULLs"}
        hs = H.xxh64_long(np.asarray(col.cast(pa.int64()), dtype=np.int64), seed=hs)
    o_sum = int(hs.view(np.int64).astype(object).sum())
    rec = {
        "rows": int(agg["n"]),
        "oracle_rows": tab.num_rows,
        "hash_sum": str(int(agg["hsum"])),
        "oracle_hash_sum": str(o_sum),
        "oracle": "distributed xxhash64 checksum (result > maxResultSize)",
    }
    if int(agg["n"]) != tab.num_rows:
        rec.update(status="FAIL", err=f"row count {agg['n']} vs oracle {tab.num_rows}")
    elif int(agg["hsum"]) != o_sum:
        rec.update(status="FAIL", err="xxhash64 row-hash sums differ")
    else:
        rec["status"] = "pass_checksum"
    return rec


def main() -> None:
    if not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")):
        from scripts.make_sf1 import make

        print(f"[stress] generating {SF_DIR} ...", flush=True)
        make(SF_DIR)

    from temp_c__bpf_osm_reader_spark import api
    from temp_c__bpf_osm_reader_spark.session import get_spark

    t0 = time.time()
    print(f"[stress] ensuring fixtures at {SF_DIR} (n={api._N}) ...", flush=True)
    api.ensure_oracle_fixtures()
    print(f"[stress] fixtures ready in {time.time() - t0:.0f}s", flush=True)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    spark = get_spark(app=f"stress-{BASE}")
    # Warm the JVM / codegen / shuffle machinery before the timed loop so the
    # first query's row doesn't absorb ~5-10 s of one-time session cost —
    # without this, partial reruns (ONLY set) record inflated, incomparable
    # walls for whichever query happens to run first.
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(1_000_000).groupBy((F.col("id") % 97).alias("k")).count().count()
    print(f"[stress] session warmed in {time.time() - t0:.1f}s", flush=True)
    qs, oracles = api.queries(), api.oracle_sql()
    names = [n for n in qs if not ONLY or n in ONLY]
    out_path = os.path.join(REPO, f"STRESS_{BASE}.json")
    results: dict[str, dict] = {}
    if ONLY and os.path.exists(out_path):
        # partial rerun: merge over the existing record instead of clobbering
        with open(out_path) as fh:
            results = json.load(fh).get("results", {})
    for i, name in enumerate(names):
        rec: dict = {}
        t1 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            if name in ORACLE_QUADRATIC:
                spdf = sdf.toPandas()
                rec["spark_s"] = round(time.time() - t1, 1)
                rec["rows"] = len(spdf)
                err = ORACLE_QUADRATIC[name](spdf, api._N // 10)
                rec["status"] = "pass_spec" if err is None else "FAIL"
                rec["oracle"] = "spec-derived (SQL oracle quadratic at stress scale)"
                if err:
                    rec["err"] = err
            elif name in oracles:
                try:
                    spdf = sdf.toPandas()
                except Exception as exc:  # noqa: BLE001
                    if "maxResultSize" not in str(exc):
                        raise
                    # result too big for a driver collect — verify the way a
                    # cluster job would: distributed checksum, no collect
                    rec = _checksum_compare(sdf, con, oracles[name])
                    rec["spark_s"] = round(time.time() - t1, 1)
                else:
                    rec["spark_s"] = round(time.time() - t1, 1)
                    t2 = time.time()
                    dpdf = con.execute(oracles[name]).df()
                    rec["oracle_s"] = round(time.time() - t2, 1)
                    rec["rows"] = len(spdf)
                    err = _compare(spdf, dpdf)
                    rec["status"] = "pass" if err is None else "FAIL"
                    if err:
                        rec["err"] = err
            else:
                rec["rows"] = sdf.count()
                rec["spark_s"] = round(time.time() - t1, 1)
                rec["status"] = "rows_only"
        except Exception as exc:  # noqa: BLE001 — the table IS the deliverable
            rec["status"] = "ERROR"
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        rec["wall_s"] = round(time.time() - t1, 1)
        results[name] = rec
        print(f"[stress] {i + 1}/{len(names)} {name}: {rec['status']} {rec['wall_s']}s", flush=True)
        with open(out_path, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "n_images": api._N, "results": results}, fh, indent=1)
        spark.catalog.clearCache()
    bad = {
        k: v
        for k, v in results.items()
        if v["status"] not in ("pass", "pass_spec", "pass_checksum", "rows_only")
    }
    print(f"[stress] done: {len(results) - len(bad)}/{len(results)} ok; failures: {sorted(bad)}")


if __name__ == "__main__":
    main()
