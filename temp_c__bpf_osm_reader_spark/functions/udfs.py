"""Vectorized pandas-UDF wrappers around the numpy kernels.

Only the operations Spark built-ins genuinely can't express live here
(64-bit unsigned bit-mixing, the image codec, perceptual hashing). Everything
else (cell arithmetic, distances, cumsum decode) stays JVM-side in
pyspark.sql.functions — see operators/. No per-row Python anywhere
(BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from .hashing import phash64_batch

# NOTE: pseudo-geolocation lives in operators/indexing.py:geolocate as a
# mapInPandas pass, not an expression UDF — Catalyst would re-evaluate an
# expression UDF once per referencing operator (see that docstring).


@F.pandas_udf(T.BinaryType())
def decode_pixels_udf(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
    """bytes → decoded flat uint8 pixel buffer (the zlib-blob-decode analogue,
    readosm.c:1779-1809). Arrow-batched; per-image numpy work only."""
    out = []
    wv, hv, fv = w.to_numpy(), h.to_numpy(), fmt.to_numpy()
    for i, buf in enumerate(data):
        out.append(codec.decode(buf, int(wv[i]), int(hv[i]), str(fv[i])).tobytes())
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.LongType())
def phash_of_pixels_udf(pixels: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """Recompute phash from decoded pixels (integrity check vs the stored column)."""
    wv, hv = w.to_numpy(), h.to_numpy()
    out = np.empty(len(pixels), dtype=np.int64)
    # group same-shaped images for batch phash
    pdf = pd.DataFrame({"w": wv, "h": hv, "i": np.arange(len(pixels))})
    for (gw, gh), grp in pdf.groupby(["w", "h"], sort=False):
        idx = grp["i"].to_numpy()
        mat = np.stack([np.frombuffer(pixels.iloc[k], dtype=np.uint8) for k in idx])
        out[idx] = phash64_batch(mat, int(gw), int(gh))
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def psnr_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two same-length pixel buffers (per-row invariant check)."""
    out = np.empty(len(a))
    for i in range(len(a)):
        pa_ = np.frombuffer(a.iloc[i], dtype=np.uint8)
        pb_ = np.frombuffer(b.iloc[i], dtype=np.uint8)
        out[i] = codec.psnr(pa_, pb_)
    return pd.Series(out)
