"""Skew handling: salted two-phase aggregation + AQE-skew-join helpers.

The Zipfian duplicate clusters put ~10% of points in a handful of cells (hot
tiles — Manhattan, not the Pacific). A single groupBy(cell) would hand one
reducer the hot cell; salting splits it into SALT partial groups first
(classic map-side combine + salt), then merges. Result is identical to the
plain groupBy — only the shuffle layout changes — so the DuckDB oracle is the
plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_group_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT) -> DataFrame:
    """count per key via salt → partial → merge. → (key, n)."""
    partial = (
        df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return partial.groupBy(key).agg(F.sum("_pn").alias("n"))


def skew_join_conf(spark) -> None:
    """AQE skew-join knobs (runtime split of oversized partitions)."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64MB")
