"""Lineage/checkpoint-resume + streaming equivalence tests (north-rule items)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from temp_c__bpf_osm_reader_spark.operators import indexing, relational
from temp_c__bpf_osm_reader_spark.plans.lineage import SnapshotPipeline, lineage_metrics
from temp_c__bpf_osm_reader_spark.streaming import events as stream_events

SF = "/root/testdata/sf0.001"


def test_snapshot_commit_and_resume(spark, fx, tmp_path):
    root = str(tmp_path / "pipe")
    calls = {"n": 0}

    def stage():
        calls["n"] += 1
        df = spark.read.parquet(fx["images"])
        return indexing.with_cells(indexing.geolocate(df), resolutions=(7,), zlevel=0).select(
            "image_id", "cell_r7"
        )

    p = SnapshotPipeline(spark, root)
    a = p.run_stage("cells", stage)
    assert calls["n"] == 1
    m = p.manifest("cells")
    assert m is not None and m["rows"] == a.count() == 1060
    # resume: second run must NOT recompute
    b = p.run_stage("cells", stage)
    assert calls["n"] == 1
    assert b.count() == 1060
    # lineage totals re-derivable from the committed data
    assert p.verify_stage("cells")
    # lineage rows sum to input count (count-consistency invariant)
    lm = spark.read.parquet(os.path.join(root, "cells", "lineage"))
    assert lm.agg(F.sum("row_count")).collect()[0][0] == 1060


def test_lineage_checksum_parallelism_invariant(spark, fx):
    df = spark.read.parquet(fx["images"]).select("image_id", "phash")
    a = lineage_metrics(df).agg(F.sum("checksum"), F.sum("row_count")).collect()[0]
    b = lineage_metrics(df.repartition(13)).agg(F.sum("checksum"), F.sum("row_count")).collect()[0]
    assert a[0] == b[0] and a[1] == b[1]


def test_streaming_windowed_equals_batch(spark):
    got = (
        stream_events.windowed_counts_stream(spark, SF, "win_eq_test")
        .toPandas()
        .sort_values(["win_start", "event_type"], ignore_index=True)
    )
    exp = (
        relational.events_windowed(spark, SF)
        .toPandas()
        .sort_values(["win_start", "event_type"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stateful_user_totals_equals_batch(spark):
    got = (
        stream_events.stateful_user_totals(spark, SF, "state_eq_test")
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0, 2).alias(
                "total_value"
            ),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
