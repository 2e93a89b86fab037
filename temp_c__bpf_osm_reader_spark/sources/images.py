"""Deterministic (image, caption) table generator — the engine's primary input.

Shape is authoritative per BASELINE.json `input_hint`:
  (image_id string, bytes binary, w int32, h int32, fmt string,
   caption string, phash int64)

Design goals:
  * fully deterministic from (n, seed) — counter-based PRNG, no global state;
  * realistic duplicate structure: images draw a base pattern from a Zipfian
    (log-uniform) pool, so exact dups, near-dups (same phash, noised pixels)
    and hot spatial cells all occur — exercising dedup + skew salting;
  * both codec paths ('raw' exact, 'rle' lossy) so the PSNR>=40dB per-row
    invariant is testable (BASELINE.json input_hint).

This is the analogue of the reference's golden corpus generation: the node
stream (id, lat, lon) + tag stream (k, v) of pbf2sqlite (pbf2sqlite.c:414-468),
re-expressed as payload-bearing records.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codec
from ..functions.hashing import splitmix64, phash64_batch, u01

ADJS = ["red", "blue", "green", "old", "tiny", "vast", "quiet", "bright", "dark", "pale"]
NOUNS = ["harbor", "forest", "café", "bridge", "market", "tower", "garden", "läke", "street", "山丘"]
PLACES = ["Zürich", "Vaduz", "Genève", "Basel", "Bern", "Chur", "Lugano", "Sion", "Thun", "Aarau"]
STYLES = ["photo", "sketch", "oil", "pixel", "aerial"]
SIZES = np.array([16, 32, 64], dtype=np.int32)


def _pattern_pixels(pattern_ids: np.ndarray, w: int, h: int, seed: int) -> np.ndarray:
    """Base pattern pixels for a batch of images that share (w, h).

    pixel[p] = low byte of splitmix64(pattern_id * 2^20 + p + seed_offset) —
    counter-based so any (pattern, size) is generated independently.
    """
    npx = w * h
    base = pattern_ids.astype(np.int64)[:, None] * np.int64(1 << 20) + np.int64(seed * 7919)
    idx = base + np.arange(npx, dtype=np.int64)[None, :]
    return (splitmix64(idx.ravel()) & np.uint64(0xFF)).astype(np.uint8).reshape(-1, npx)


def generate_images(n: int, seed: int = 42, n_patterns: int | None = None) -> pd.DataFrame:
    """Generate the deterministic images table (pandas; Arrow-friendly dtypes)."""
    if n_patterns is None:
        n_patterns = max(8, n // 40)
    i = np.arange(n, dtype=np.int64)
    r0 = splitmix64(i + np.int64(seed) * np.int64(1_000_000_007))
    r1 = splitmix64(r0.view(np.int64))
    r2 = splitmix64(r1.view(np.int64))
    r3 = splitmix64(r2.view(np.int64))

    # Zipf-ish (log-uniform) pattern pool → duplicate clusters + spatial skew
    pattern = np.floor(np.power(float(n_patterns), u01(r0))).astype(np.int64)
    pattern = np.clip(pattern, 1, n_patterns) - 1

    # size/fmt deterministic per image; dup-cluster members share size (keyed by pattern)
    size_pick = (splitmix64(pattern + np.int64(seed) * 31) & np.uint64(0xFFFF)).astype(np.int64) % 3
    w = SIZES[size_pick]
    h = SIZES[(size_pick + (pattern % 2).astype(np.int64)) % 3]
    fmt_is_rle = (r1 & np.uint64(1)).astype(bool)

    # variant: 1/4 of images are exact copies of the base pattern, rest noised
    variant = (r2 & np.uint64(3)).astype(np.int64)

    image_id = np.array([f"img_{k:07d}" for k in range(n)])

    bytes_col: list[bytes] = [b""] * n
    phash = np.empty(n, dtype=np.int64)
    # group by (w, h) so pattern/noise generation is vectorized per shape
    df_groups = pd.DataFrame({"w": w, "h": h, "idx": np.arange(n)})
    for (gw, gh), grp in df_groups.groupby(["w", "h"], sort=True):
        sel = grp["idx"].to_numpy()
        px = _pattern_pixels(pattern[sel], int(gw), int(gh), seed)
        # noise: amplitude ±2 on ~12.5% of pixels for variants 1..3
        noisy = variant[sel] > 0
        if noisy.any():
            nsel = sel[noisy]
            npx = int(gw) * int(gh)
            nbase = nsel.astype(np.int64)[:, None] * np.int64(1 << 21) + np.int64(seed * 104729)
            nr = splitmix64((nbase + np.arange(npx, dtype=np.int64)[None, :]).ravel()).reshape(len(nsel), npx)
            mask = (nr & np.uint64(7)) == 0
            delta = ((nr >> np.uint64(3)) & np.uint64(3)).astype(np.int16) - 1  # -1..2
            pv = px[noisy].astype(np.int16)
            pv = np.clip(pv + np.where(mask, delta, 0), 0, 255).astype(np.uint8)
            px[noisy] = pv
        phash[sel] = phash64_batch(px, int(gw), int(gh))
        for row, k in enumerate(sel):
            fmt = "rle" if fmt_is_rle[k] else "raw"
            bytes_col[k] = codec.encode(px[row], fmt)

    # caption core (adj/noun/place) keyed by pattern → near-dup captions inside
    # a duplicate cluster; style/q vary per image
    rp = splitmix64(pattern + np.int64(seed) * 613)
    adj = np.take(ADJS, (rp % np.uint64(len(ADJS))).astype(np.int64))
    noun = np.take(NOUNS, ((rp >> np.uint64(8)) % np.uint64(len(NOUNS))).astype(np.int64))
    place = np.take(PLACES, ((rp >> np.uint64(16)) % np.uint64(len(PLACES))).astype(np.int64))
    style = np.take(STYLES, ((r3 >> np.uint64(24)) % np.uint64(len(STYLES))).astype(np.int64))
    q = ((r3 >> np.uint64(32)) % np.uint64(10)).astype(np.int64)
    caption = pd.Series(
        ["a " + a + " " + b + " in " + c + " style=" + s + " q=" + str(int(qq))
         for a, b, c, s, qq in zip(adj, noun, place, style, q)]
    )

    return pd.DataFrame(
        {
            "image_id": image_id,
            "bytes": pd.Series(bytes_col, dtype=object),
            "w": w.astype(np.int32),
            "h": h.astype(np.int32),
            "fmt": np.where(fmt_is_rle, "rle", "raw"),
            "caption": caption,
            "phash": phash,
        }
    )
