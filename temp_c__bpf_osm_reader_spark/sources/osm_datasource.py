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
    InputPartition,
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

        Only for what='nodes' (tags rows carry no id column)."""
        for f in filters:
            if self.what == "nodes" and isinstance(f, EqualTo) and f.attribute == ("id",):
                v = int(f.value)
                self._id_lo = v if self._id_lo is None else max(self._id_lo, v)
                self._id_hi = v if self._id_hi is None else min(self._id_hi, v)
                continue  # fully handled: shard pruning + exact re-check below
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
        new = [p for p in self._shards() if _shard_index(p) >= k0]
        if not new:
            return iter(()), start
        k1 = max(_shard_index(p) for p in new) + 1
        return iter(self._rows_for(new)), {"shard": k1}

    def readBetweenOffsets(self, start, end):
        k0, k1 = int(start["shard"]), int(end["shard"])
        paths = [p for p in self._shards() if k0 <= _shard_index(p) < k1]
        return iter(self._rows_for(paths))

    def commit(self, end):
        pass
