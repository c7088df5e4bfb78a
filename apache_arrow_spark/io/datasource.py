"""Spark 4 Python DataSource connector for Arrow IPC shard directories.

The ``io.ipc`` module reads shard dirs by parallelizing a file list into
``mapInArrow`` tasks; this module exposes the SAME storage layout through
Spark's first-class connector API (``pyspark.sql.datasource``, new in
Spark 4), so the format composes with everything a registered source
gets for free: ``spark.read.format("aas_ipc").load(dir)``, SQL
``CREATE TABLE ... USING aas_ipc``, and catalog integration.

Connector anatomy (the part the reference implements in C++ readers,
re-expressed as Spark's plugin surface):
- ``schema()`` sniffs the first shard's IPC metadata on the driver
  (dictionary fields decode to their dense value types — SURVEY §1.2);
- ``partitions()`` returns one InputPartition per shard, so every shard
  is read by its own task — scan parallelism == shard count, no driver
  funnel;
- ``read()`` yields pyarrow RecordBatches directly (Spark 4's
  arrow-batch path — no per-row Python serialization).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _shards(path: str) -> list[str]:
    files = sorted(
        _glob.glob(os.path.join(path, "*.arrow"))
        + _glob.glob(os.path.join(path, "*.arrows"))
    )
    if not files:
        raise FileNotFoundError(f"no IPC shards under {path}")
    return files


def _read_shard_table(path: str):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    with open(path, "rb") as fh:
        try:
            table = ipc.open_file(fh).read_all()
        except pa.ArrowInvalid:
            fh.seek(0)
            table = ipc.open_stream(fh).read_all()
    # dictionary columns decode to dense (the Spark representation)
    fields = [
        f.with_type(f.type.value_type) if pa.types.is_dictionary(f.type) else f
        for f in table.schema
    ]
    dense = pa.schema(fields)
    if dense != table.schema:
        table = table.cast(dense)
    return table


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ArrowIPCShardReader(DataSourceReader):
    def __init__(self, path: str):
        self._path = path

    def partitions(self):
        return [_Shard(p) for p in _shards(self._path)]

    def read(self, partition):
        table = _read_shard_table(partition.path)
        yield from table.to_batches()


class ArrowIPCDataSource(DataSource):
    """``format("aas_ipc")``: Arrow IPC shard directories as a
    first-class Spark data source."""

    @classmethod
    def name(cls) -> str:
        return "aas_ipc"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow as pa

        first = _shards(self.options["path"])[0]
        table = _read_shard_table(first)
        return from_arrow_schema(table.schema, prefer_timestamp_ntz=True)

    def reader(self, schema):
        return ArrowIPCShardReader(self.options["path"])

    def simpleStreamReader(self, schema):
        return ArrowIPCSimpleStreamReader(self.options["path"])


def register_ipc_source(spark) -> None:
    """Idempotently register the connector on this session."""
    spark.dataSource.register(ArrowIPCDataSource)


from pyspark.sql.datasource import SimpleDataSourceStreamReader


class ArrowIPCSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (SimpleDataSourceStreamReader):
    the shard DIRECTORY is the unbounded source — files appended by the
    distributed sink become micro-batches.  Offsets are simply the count
    of shards consumed (shard list sorted by name, append-only by the
    sink's uuid naming), so ``readBetweenOffsets`` replays any window
    deterministically — exactly-once with a durable checkpoint."""

    def __init__(self, path: str):
        self._path = path

    def initialOffset(self):
        return {"idx": 0}

    def _rows(self, lo: int, hi: int) -> list:
        # a MATERIALIZED list, not a generator: the runner's prefetch
        # cache copy.copy()s the iterator, which generators don't support
        try:
            files = _shards(self._path)
        except FileNotFoundError:
            files = []
        out = []
        for p in files[lo:hi]:
            table = _read_shard_table(p)
            out.extend(tuple(row.values()) for row in table.to_pylist())
        return out

    def read(self, start):
        try:
            n = len(_shards(self._path))
        except FileNotFoundError:
            n = start["idx"]
        end = {"idx": n}
        return self._rows(start["idx"], n), end

    def readBetweenOffsets(self, start, end):
        return self._rows(start["idx"], end["idx"])

    def commit(self, end):
        pass

