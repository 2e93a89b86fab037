"""`spark.read.format("osmxml")` — the .osm XML input as a first-class Spark
Python Data Source (Spark 4 DataSource V2 Python API).

The reference is, at heart, a file reader users point at a path
(pbf2sqlite.c:main: `pbf2sqlite file.osm.pbf db`); this module gives the
engine the same product shape natively in Spark:

    spark.dataSource.register(OsmXmlDataSource)
    spark.read.format("osmxml").option("what", "nodes").load(xml_dir)
    spark.read.format("osmxml").option("what", "tags").load(xml_dir)

Spark-first properties:
  * one InputPartition per .osm shard (file = parallel unit, exactly as PBF
    blocks are in readosm.c:1694-1892);
  * read() yields ONE Arrow RecordBatch per shard — bytes go straight from
    the parser into Arrow columns, no per-row Python→JVM traffic;
  * FILTER PUSHDOWN into the Python source (pushFilters): predicates on `id`
    prune whole shards by filename (shard k holds ids [k*B, k*B+B)), the
    Python-source analogue of the reference's header-skip fseek
    (readosm.c:595) and of Parquet row-group pruning. Unhandled filters are
    returned to Spark for post-evaluation, per the API contract.

Decode arithmetic (round(coord * 1e7) / 1e7) is identical to the blocks
decoder, so doubles are bit-equal across formats (the reference's XML-vs-PBF
golden equivalence, SURVEY §5.2).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCALE = 10_000_000.0


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _shard_index(path: str) -> int:
    base = os.path.basename(path)  # part-00042.osm
    return int(base.split("-")[1].split(".")[0])


class OsmXmlDataSource(DataSource):
    """Options: path (directory of part-*.osm shards), what = nodes|tags,
    block_size (ids per shard, default 1000 — the blocks fixture layout)."""

    @classmethod
    def name(cls) -> str:
        return "osmxml"

    def schema(self) -> str:
        what = self.options.get("what", "nodes")
        if what == "tags":
            return "image_id string, k string, v string"
        return "id bigint, image_id string, lat double, lon double"

    def reader(self, schema) -> "OsmXmlReader":
        return OsmXmlReader(dict(self.options))

    def simpleStreamReader(self, schema) -> "OsmXmlStreamReader":
        return OsmXmlStreamReader(dict(self.options))


class OsmXmlReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmxml: .load(path) is required")
        self.what = options.get("what", "nodes")
        self.block_size = int(options.get("block_size", "1000"))
        # id range the pushed-down filters allow, [lo, hi] inclusive
        self._id_lo: int | None = None
        self._id_hi: int | None = None

    def pushFilters(self, filters):
        """Accept id-range filters (shard pruning); yield back the rest.

        Handles =, >, >=, <, <= on `id` — the natural shard-pruning predicate
        shapes — by folding each into one inclusive [lo, hi] window. Only for
        what='nodes' (tags rows carry no id column)."""

        def _narrow(lo=None, hi=None):
            if lo is not None:
                self._id_lo = lo if self._id_lo is None else max(self._id_lo, lo)
            if hi is not None:
                self._id_hi = hi if self._id_hi is None else min(self._id_hi, hi)

        for f in filters:
            if self.what == "nodes" and getattr(f, "attribute", None) == ("id",):
                if isinstance(f, EqualTo):
                    _narrow(lo=int(f.value), hi=int(f.value))
                    continue  # fully handled: shard pruning + exact re-check below
                if isinstance(f, GreaterThan):
                    _narrow(lo=int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    _narrow(lo=int(f.value))
                    continue
                if isinstance(f, LessThan):
                    _narrow(hi=int(f.value) - 1)
                    continue
                if isinstance(f, LessThanOrEqual):
                    _narrow(hi=int(f.value))
                    continue
            yield f

    def partitions(self):
        import glob

        shards = sorted(glob.glob(os.path.join(self.path, "part-*.osm")))
        if not shards:
            raise FileNotFoundError(f"osmxml: no part-*.osm under {self.path}")
        if self._id_lo is not None or self._id_hi is not None:
            lo = self._id_lo if self._id_lo is not None else 0
            hi = self._id_hi if self._id_hi is not None else 1 << 62
            shards = [
                p
                for p in shards
                if _shard_index(p) * self.block_size <= hi
                and (_shard_index(p) + 1) * self.block_size > lo
            ]
        return [_Shard(p) for p in shards]

    def read(self, partition: _Shard):
        import xml.etree.ElementTree as ET

        import pyarrow as pa

        with open(partition.path, "rb") as f:
            root = ET.fromstring(f.read())
        if self.what == "tags":
            img, ks, vs = [], [], []
            for node in root.iter("node"):
                u = node.get("user")
                for tag in node.iter("tag"):
                    img.append(u)
                    ks.append(tag.get("k"))
                    vs.append(tag.get("v"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(img, pa.string()), pa.array(ks, pa.string()), pa.array(vs, pa.string())],
                names=["image_id", "k", "v"],
            )
            return
        ids, imgs, lats, lons = [], [], [], []
        for node in root.iter("node"):
            i = int(node.get("id"))
            if self._id_lo is not None and i < self._id_lo:
                continue
            if self._id_hi is not None and i > self._id_hi:
                continue
            ids.append(i)
            imgs.append(node.get("user"))
            lats.append(round(float(node.get("lat")) * SCALE) / SCALE)
            lons.append(round(float(node.get("lon")) * SCALE) / SCALE)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(imgs, pa.string()),
                pa.array(lats, pa.float64()),
                pa.array(lons, pa.float64()),
            ],
            names=["id", "image_id", "lat", "lon"],
        )


def register(spark) -> None:
    """Register the source AND enable Python-source filter pushdown.

    Spark 4 hard-fails ANY read through a reader that overrides pushFilters
    when `spark.sql.python.filterPushdown.enabled` is false — and false is
    the session default, so a caller with a default-conf session (the round-2
    driver environment) would break at plan time. The conf is a runtime-
    settable SQLConf, so the source's entry point owns it: registering the
    source is consenting to its pushdown.

    SIDE EFFECT (session-wide, deliberate): the conf applies to EVERY Python
    data source in the calling session, not just this one — any other source
    that overrides pushFilters will also start receiving pushed filters after
    register() runs. There is no per-source scope for this conf in Spark 4;
    callers who need the old behavior for another source can reset the conf
    after registering (reads through THIS source will then fail loudly at
    plan time rather than silently skipping pushdown)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OsmXmlDataSource)


# ------------------------------------------------------------ streaming read

class OsmXmlStreamReader:
    """Incremental shard consumption: offset = next unread shard index.

    The streaming twin of the reference's block-at-a-time read loop
    (readosm.c:1694-1892): shards appearing in the directory are consumed
    exactly once, in filename order, and `readBetweenOffsets` replays any
    committed range deterministically (shards are immutable once written).
    Simple reader variant — rows flow through the driver, which bounds
    per-batch volume; the partitioned DataSourceStreamReader is the scale
    path and shares all parsing code via OsmXmlReader.read().
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmxml: .load(path) is required")
        self.what = options.get("what", "nodes")

    def initialOffset(self):
        return {"shard": 0}

    def _shards(self):
        import glob

        return sorted(glob.glob(os.path.join(self.path, "part-*.osm")))

    def _rows_for(self, paths):
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # returned iterator, and generators are not copyable
        rd = OsmXmlReader({"path": self.path, "what": self.what})
        rows = []
        for p in paths:
            for rb in rd.read(_Shard(p)):
                rows.extend(tuple(row.values()) for row in rb.to_pylist())
        return rows

    def read(self, start):
        k0 = int(start["shard"])
        # consume only the CONTIGUOUS prefix of present shard indices: if
        # shards land out of order (part-00003 before part-00002), stopping at
        # the first gap means the late shard is picked up by a later batch
        # instead of being silently skipped forever (offset would have jumped
        # past it)
        present = {_shard_index(p): p for p in self._shards() if _shard_index(p) >= k0}
        k1 = k0
        while k1 in present:
            k1 += 1
        if k1 == k0:
            return iter(()), start
        return iter(self._rows_for([present[k] for k in range(k0, k1)])), {"shard": k1}

    def readBetweenOffsets(self, start, end):
        k0, k1 = int(start["shard"]), int(end["shard"])
        paths = [p for p in self._shards() if k0 <= _shard_index(p) < k1]
        return iter(self._rows_for(paths))

    def commit(self, end):
        pass
