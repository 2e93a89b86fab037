"""Multimodal (binary payload) plumbing: decode, integrity, feature extraction.

Images are opaque `binary` columns with typed metadata (w, h, fmt) — decoded
only at the last stage that needs pixels (the reference measures blob
decompression at ~33% of read cost, readosm.c:1783-1790 — same reason).
The in-repo codec handles fmt ∈ {raw, rle}; foreign codecs (jpeg/png) are
stubbed behind NotImplementedError (no image libs in this container) while the
Spark-side plumbing — schema, Arrow batching, UDF signatures — is real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec
from ..functions.hashing import phash64
from ..sources import fixtures

_DECODE_STATS_TYPE = T.StructType(
    [
        T.StructField("pix_sum", T.LongType()),
        T.StructField("phash_dec", T.LongType()),
    ]
)


@F.pandas_udf(_DECODE_STATS_TYPE)
def decode_stats_udf(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Decode each payload, return (sum of pixel values, phash of decoded pixels)."""
    n = len(data)
    pix_sum = np.empty(n, dtype=np.int64)
    ph = np.empty(n, dtype=np.int64)
    wv, hv, fv = w.to_numpy(), h.to_numpy(), fmt.to_numpy()
    for i in range(n):
        px = codec.decode(data.iloc[i], int(wv[i]), int(hv[i]), str(fv[i]))
        pix_sum[i] = int(px.sum(dtype=np.int64))
        ph[i] = phash64(px, int(wv[i]), int(hv[i]))
    return pd.DataFrame({"pix_sum": pix_sum, "phash_dec": ph})


def decode_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """→ (image_id, fmt, pix_sum, phash_dec) — engine decode of every payload.

    Golden twin (sources/fixtures.ensure_golden_decode) computes the same
    through plain numpy, no Spark. phash_dec equals the stored phash column for
    fmt='raw' exactly; for 'rle' it may differ in marginal bits (quantization),
    which the pytest invariant bounds."""
    n = fixtures.n_images_for_sf(sf_dir)
    images = spark.read.parquet(fixtures.ensure_images(n))
    stats = decode_stats_udf(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"))
    return images.withColumn("_s", stats).select(
        "image_id",
        "fmt",
        F.col("_s.pix_sum").alias("pix_sum"),
        F.col("_s.phash_dec").alias("phash_dec"),
    )


def block_features_flat(spark: SparkSession, sf_dir: str, grid: int = 4) -> DataFrame:
    """block_mean_features exploded to (image_id, feat_idx, value) — the
    oracle-checkable flat form (value-hash over scalar columns; the array
    variant stays for consumers that want vectors). value = block_sum / (bh*bw)
    with an exact integer numerator, so the pure-Python golden twin
    (sources/fixtures_text.ensure_golden_blockmeans) reproduces it bit-for-bit."""
    n = fixtures.n_images_for_sf(sf_dir)
    images = spark.read.parquet(fixtures.ensure_images(n)).select(
        "image_id", "bytes", "w", "h", "fmt"
    )

    def gen(batches):
        for pdf in batches:
            ids, idxs, vals = [], [], []
            wv, hv, fv = pdf["w"].to_numpy(), pdf["h"].to_numpy(), pdf["fmt"].to_numpy()
            data = pdf["bytes"]
            for i in range(len(pdf)):
                w, h = int(wv[i]), int(hv[i])
                px = codec.decode(data.iloc[i], w, h, str(fv[i]))
                bh, bw = h // grid, w // grid
                sums = (
                    px.reshape(grid, bh, grid, bw)
                    .sum(axis=(1, 3), dtype=np.int64)
                    .ravel()
                )
                ids.extend([pdf["image_id"].iloc[i]] * (grid * grid))
                idxs.extend(range(grid * grid))
                vals.extend((sums / float(bh * bw)).tolist())
            yield pd.DataFrame(
                {
                    "image_id": pd.Series(ids, dtype=object),
                    "feat_idx": pd.Series(idxs, dtype="int32"),
                    "value": pd.Series(vals, dtype="float64"),
                }
            )

    return images.mapInPandas(gen, schema="image_id string, feat_idx int, value double")


RESIZE_TO = 8


def resize_nn(spark: SparkSession, sf_dir: str, size: int = RESIZE_TO) -> DataFrame:
    """Nearest-neighbor resize of every payload to size×size (the canonical
    image-pipeline resize step, pure numpy gather — no image libs needed) →
    (image_id, r_sum, r_phash): exact pixel sum + phash of the resized image.

    Frozen sampling spec: source index for output i = floor(i * h / size)
    (top-left rule). Compact outputs keep the oracle scalar while the full
    resized tensor shape is covered by the golden twin's identical walk."""
    n = fixtures.n_images_for_sf(sf_dir)
    images = spark.read.parquet(fixtures.ensure_images(n)).select(
        "image_id", "bytes", "w", "h", "fmt"
    )

    def gen(batches):
        for pdf in batches:
            ids, sums, phs = [], [], []
            wv, hv, fv = pdf["w"].to_numpy(), pdf["h"].to_numpy(), pdf["fmt"].to_numpy()
            data = pdf["bytes"]
            for i in range(len(pdf)):
                w, h = int(wv[i]), int(hv[i])
                px = codec.decode(data.iloc[i], w, h, str(fv[i])).reshape(h, w)
                ri = (np.arange(size) * h) // size
                rj = (np.arange(size) * w) // size
                small = px[np.ix_(ri, rj)]
                ids.append(pdf["image_id"].iloc[i])
                sums.append(int(small.sum(dtype=np.int64)))
                phs.append(phash64(small.ravel(), size, size))
            yield pd.DataFrame(
                {
                    "image_id": pd.Series(ids, dtype=object),
                    "r_sum": pd.Series(sums, dtype="int64"),
                    "r_phash": pd.Series(phs, dtype="int64"),
                }
            )

    return images.mapInPandas(gen, schema="image_id string, r_sum long, r_phash long")


FRAME_STRIDE = 8


def frame_sample(spark: SparkSession, sf_dir: str, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas: each image row is
    treated as a frame sequence (h frames of w samples — the video analogue);
    every `stride`-th frame is emitted with its exact sum and mean.

    → (image_id, frame_idx, frame_sum, frame_mean) with frame_mean =
    frame_sum / w (pure IEEE division — bit-equal to the pure-Python golden).
    mapInPandas because the op is 1→many rows (frames per image); decode stays
    per-image numpy like the rest of the codec family."""
    n = fixtures.n_images_for_sf(sf_dir)
    images = spark.read.parquet(fixtures.ensure_images(n)).select(
        "image_id", "bytes", "w", "h", "fmt"
    )

    def gen(batches):
        for pdf in batches:
            ids, idxs, sums, means = [], [], [], []
            wv, hv, fv = pdf["w"].to_numpy(), pdf["h"].to_numpy(), pdf["fmt"].to_numpy()
            data = pdf["bytes"]
            for i in range(len(pdf)):
                w, h = int(wv[i]), int(hv[i])
                px = codec.decode(data.iloc[i], w, h, str(fv[i])).reshape(h, w)
                frames = px[::stride]
                fsum = frames.sum(axis=1, dtype=np.int64)
                ids.extend([pdf["image_id"].iloc[i]] * len(fsum))
                idxs.extend(range(0, h, stride))
                sums.extend(fsum.tolist())
                means.extend((fsum / float(w)).tolist())
            yield pd.DataFrame(
                {
                    "image_id": pd.Series(ids, dtype=object),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return images.mapInPandas(
        gen, schema="image_id string, frame_idx int, frame_sum long, frame_mean double"
    )


def block_mean_features(spark: SparkSession, sf_dir: str, grid: int = 4) -> DataFrame:
    """Feature extraction: per-image grid×grid block-mean vector (the
    resize/feature step of an image pipeline) → (image_id, features array)."""
    n = fixtures.n_images_for_sf(sf_dir)
    images = spark.read.parquet(fixtures.ensure_images(n))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def feat(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        wv, hv, fv = w.to_numpy(), h.to_numpy(), fmt.to_numpy()
        for i in range(len(data)):
            px = codec.decode(data.iloc[i], int(wv[i]), int(hv[i]), str(fv[i]))
            img = px.reshape(int(hv[i]), int(wv[i])).astype(np.float64)
            bh, bw = int(hv[i]) // grid, int(wv[i]) // grid
            means = img.reshape(grid, bh, grid, bw).mean(axis=(1, 3)).ravel()
            out.append(np.round(means, 6).tolist())
        return pd.Series(out)

    return images.select("image_id", feat("bytes", "w", "h", "fmt").alias("features"))
