"""PBF-analogue block encoder: images table → compressed columnar entity blocks.

Mirrors the wire shape the reference decodes (osmformat.proto:100-230,
readosm.c:1107-1309) so the engine can demonstrate the full decode capability
set Spark-first:

  block_id   long          — one row per PrimitiveBlock analogue
  strtab     array<string> — per-block dictionary; index 0 reserved ""
                             (StringTable, osmformat.proto:128-136)
  id_delta   array<long>   — delta-coded entity ordinals (DenseNodes.id)
  lat_dz     array<long>   — zigzag(delta(round(lat*1e7)))  (sint64 semantics,
  lon_dz     array<long>     readosm.c:309-343 + 1e-7 scaling readosm.c:1206)
  image_sid  array<int>    — strtab index of the image_id string
  keys_vals  array<int>    — 0-delimited (k,v) strtab-index pairs per entity
                             (osmformat.proto:207-229)

Block size 1000 entities (reference convention ≤8000, readosm.c:620).
The engine's decoder (operators/decode.py) inverts all of this with pure
DataFrame ops; `decode(encode(x)) == x` is the round-trip test, the analogue
of the reference's XML-vs-PBF dual-decode equivalence check (SURVEY §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.geo import latlon_from_phash

BLOCK_SZ = 1000
SCALE = 10_000_000  # fixed-point 1e-7 degrees, readosm.c:1206-1207


def zigzag_encode(d: np.ndarray) -> np.ndarray:
    """Valid for |d| < 2^62 (coordinate deltas ≤ 3.6e9 and monotone id deltas
    are far inside); beyond that the int64 shift wraps — same caveat as the
    reference's sint64 varint path."""
    d = np.asarray(d, dtype=np.int64)
    return (d << np.int64(1)) ^ (d >> np.int64(63))


def zigzag_decode(z: np.ndarray) -> np.ndarray:
    z = np.asarray(z, dtype=np.int64)
    return (z >> np.int64(1)) ^ -(z & np.int64(1))


def caption_tags(caption: str) -> list[tuple[str, str]]:
    """Parse the fixed caption grammar into (k, v) tags.

    'a {adj} {noun} in {place} style={s} q={n}' →
    [(place, ...), (style, ...), (q, ...), (noun, ...)]
    """
    words = caption.split(" ")
    return [
        ("place", words[4]),
        ("style", words[5][len("style="):]),
        ("q", words[6][len("q="):]),
        ("noun", words[2]),
    ]


WAY_BLOCK_SZ = 200  # ways per block (reference convention ≤8000 entities)


def encode_way_blocks(
    n_images: int, n_ways: int | None = None, block_sz: int = WAY_BLOCK_SZ
) -> pd.DataFrame:
    """Way-stream analogue of encode_blocks: per-block way arrays where each
    way's refs[] is zigzag(delta)-coded WITHIN the way starting from 0 —
    exactly the wire form readosm.c:1423-1433 decodes (sint64 deltas against
    the previous ref). Way ids are plain: unlike DenseNodes, Way.id is not
    cross-entity delta-coded (osmformat.proto Way message).

    Refs jump around the node-ordinal space deterministically, so deltas go
    negative and the zigzag branch is genuinely exercised.
    """
    if n_ways is None:
        n_ways = max(n_images // 20, 8)
    rows = []
    for b0 in range(0, n_ways, block_sz):
        way_id, refs_dz = [], []
        for w in range(b0, min(b0 + block_sz, n_ways)):
            j = np.arange(3 + (w % 6), dtype=np.int64)
            refs = (w * 1009 + j * 2003 + j * j * 7) % n_images
            way_id.append(1_000_000 + w)
            refs_dz.append(zigzag_encode(np.diff(refs, prepend=np.int64(0))).tolist())
        rows.append(
            {
                "block_id": np.int64(b0 // block_sz),
                "way_id": way_id,
                "refs_dz": refs_dz,
            }
        )
    return pd.DataFrame(rows)


REL_BLOCK_SZ = 100  # relations per block (reference convention ≤8000 entities)


def encode_rel_blocks(
    n_images: int, n_rels: int | None = None, block_sz: int = REL_BLOCK_SZ
) -> pd.DataFrame:
    """Relation-stream blocks — the THIRD and last delta-coded wire stream the
    reference decodes (readosm.c:1575-1582: each memid is a sint64 delta
    against the previous member's id within the SAME relation; roles_sid
    indexes the block string table; types is the member-type enum
    osmformat.proto:245-249 {0=NODE, 1=WAY, 2=RELATION}).

      block_id   long                — one row per PrimitiveBlock analogue
      strtab     array<string>      — per-block role dictionary, "" at 0
      rel_id     array<long>        — plain ids (Relation.id is not
                                      cross-entity delta-coded, like Way.id)
      memids_dz  array<array<long>> — zigzag(delta within relation, from 0)
      types      array<array<long>> — member-type enum per member
      roles_sid  array<array<long>> — strtab index per member

    Member ids jump around the id space deterministically so deltas go
    negative and the zigzag branch is genuinely exercised; types cycle all
    three branches of pbf2sqlite.c:811-857's dispatch.
    """
    if n_rels is None:
        n_rels = max(n_images // 80, 6)
    roles = ["outer", "inner", "label", ""]
    rows = []
    for b0 in range(0, n_rels, block_sz):
        used = set()
        rel_id, memids_dz, types, roles_sid = [], [], [], []
        for r in range(b0, min(b0 + block_sz, n_rels)):
            j = np.arange(2 + (r % 5), dtype=np.int64)
            memids = (r * 1013 + j * 4019 + j * j * 11) % (3 * n_images)
            rel_id.append(2_000_000 + r)
            memids_dz.append(
                zigzag_encode(np.diff(memids, prepend=np.int64(0))).tolist()
            )
            types.append(((r + j) % 3).tolist())
            rs = [roles[int((r + int(i)) % len(roles))] for i in j]
            used.update(rs)
            roles_sid.append(rs)  # resolved to sids below once strtab is fixed
        strtab = [""] + sorted(used - {""})
        sidx = {s: i for i, s in enumerate(strtab)}
        rows.append(
            {
                "block_id": np.int64(b0 // block_sz),
                "strtab": strtab,
                "rel_id": rel_id,
                "memids_dz": memids_dz,
                "types": types,
                "roles_sid": [[sidx[s] for s in rs] for rs in roles_sid],
            }
        )
    return pd.DataFrame(rows)


def encode_blocks(images: pd.DataFrame, block_sz: int = BLOCK_SZ) -> pd.DataFrame:
    """images table → blocks table (one row per block)."""
    n = len(images)
    lat, lon = latlon_from_phash(images["phash"].to_numpy(), images["image_id"].to_numpy())
    lat_i = np.round(lat * SCALE).astype(np.int64)
    lon_i = np.round(lon * SCALE).astype(np.int64)
    ords = np.arange(n, dtype=np.int64)

    rows = []
    for b0 in range(0, n, block_sz):
        sl = slice(b0, min(b0 + block_sz, n))
        ids = ords[sl]
        bl_lat, bl_lon = lat_i[sl], lon_i[sl]
        img_ids = images["image_id"].to_numpy()[sl]
        caps = images["caption"].to_numpy()[sl]

        tags_per_entity = [caption_tags(c) for c in caps]
        # per-block dictionary: "" at 0, then sorted distinct strings
        strings = set(img_ids.tolist())
        for tags in tags_per_entity:
            for k, v in tags:
                strings.add(k)
                strings.add(v)
        strtab = [""] + sorted(strings)
        sidx = {s: i for i, s in enumerate(strtab)}

        keys_vals: list[int] = []
        for tags in tags_per_entity:
            for k, v in tags:
                keys_vals.append(sidx[k])
                keys_vals.append(sidx[v])
            keys_vals.append(0)

        rows.append(
            {
                "block_id": np.int64(b0 // block_sz),
                "strtab": strtab,
                "id_delta": np.diff(ids, prepend=np.int64(0)).tolist(),
                "lat_dz": zigzag_encode(np.diff(bl_lat, prepend=np.int64(0))).tolist(),
                "lon_dz": zigzag_encode(np.diff(bl_lon, prepend=np.int64(0))).tolist(),
                "image_sid": [sidx[s] for s in img_ids],
                "keys_vals": keys_vals,
            }
        )
    return pd.DataFrame(rows)
