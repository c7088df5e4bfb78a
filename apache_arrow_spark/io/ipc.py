"""Arrow IPC stream/file source + sink (SURVEY §2.1/§2.9).

The reference wire formats (format/IPC.md:22-95):
- *stream* (``.arrows``): Schema message, then Dictionary/RecordBatch
  messages, length-prefixed flatbuffers (writer.h:89 / reader.h:54).
- *file* (``.arrow``): stream + magic + footer block index for random
  access by batch (writer.h:127, reader.cc:563, format/File.fbs:26-40).

Spark-first design: a directory of IPC shards is the distributed dataset
(same model as parquet part-files).  The sink runs ``mapInArrow`` so every
executor writes its partition as one shard — Arrow batches never pass
through Python row objects, and nothing funnels through the driver.  The
source distributes the *file list* and each task reads whole shards with
pyarrow (zero-copy mmap), again via ``mapInArrow``.

Single-file mode exists for interop with external tools expecting one
``.arrows`` file — driver-side by necessity, documented small-data-only.

Shared-filesystem contract: like parquet part-files, ``path`` must be
storage every node sees (NFS/HDFS/S3-fuse or local disk on local[N]).
The sink writes shards from executors and the source lists them with a
driver-local glob, so a multi-node cluster with node-local paths would
write shards the driver cannot list and list shards other nodes cannot
open.  (A Hadoop-FS-API listing would relax the driver-side glob but not
the executor-side open — shared storage is the real requirement, same as
every distributed file sink.)
"""

from __future__ import annotations

from collections.abc import Sequence

import glob as _glob
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _shard_pattern(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "*.arrow"))
            + _glob.glob(os.path.join(path, "*.arrows"))
        )
    else:
        files = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"no IPC files under {path}")
    return files


def write_ipc(
    df: DataFrame,
    path: str,
    format: str = "stream",
    dictionary_encode: Sequence[str] = (),
    num_shards: int | None = None,
    shard_cols: Sequence[str] = (),
) -> int:
    """Distributed IPC sink: one shard per partition under ``path``/.

    Returns the number of shards written.  ``format``: 'stream' (.arrows,
    RecordBatchStreamWriter parity) or 'file' (.arrow, RecordBatchFileWriter
    parity — carries the random-access footer).  ``dictionary_encode``
    names columns to write dictionary-encoded: the writer then emits
    DictionaryBatch messages before the RecordBatches — including deltas as
    new values appear across batches — exactly the reference's wire
    behavior (format/Message.fbs isDelta; ipc/writer.cc DictionaryMemo).

    ``num_shards`` repartitions to that many output shards; ``shard_cols``
    (only meaningful together with ``num_shards``) hash-partitions by the
    named columns instead of the keyless round-robin, which skips the
    ``sortBeforeRepartition`` local sort of every row.  Caveat: the shard
    key must be high-cardinality and unskewed — a low-cardinality or
    skewed key yields fewer non-empty shards than requested (worst case
    one), reintroducing the serialized write/read ``num_shards`` exists to
    avoid.  Passing ``shard_cols`` without ``num_shards`` is a usage bug
    and warns.
    """
    assert format in ("stream", "file")
    if shard_cols and not num_shards:
        import warnings

        warnings.warn(
            "write_ipc: shard_cols is ignored unless num_shards is set",
            stacklevel=2,
        )
    if num_shards:
        # shard-count control: a degenerate upstream partitioning (e.g. a
        # single-row-group parquet file locally) would otherwise serialize
        # the write AND the eventual read of the shard directory.
        # ``shard_cols`` shards by hash of the named columns — a keyless
        # round-robin repartition first pays a full local sort of every
        # row (spark.sql.execution.sortBeforeRepartition, needed for
        # deterministic retries) which is pure overhead for a shard sink;
        # hashing a key column is deterministic without the sort.
        if shard_cols:
            import pyspark.sql.functions as F

            df = df.repartition(num_shards, *[F.col(c) for c in shard_cols])
        else:
            df = df.repartition(num_shards)
    os.makedirs(path, exist_ok=True)
    ext = "arrows" if format == "stream" else "arrow"
    run_id = uuid.uuid4().hex[:8]
    dict_cols = list(dictionary_encode)

    def _write(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}-{run_id}.{ext}")
        writer = None
        rows = 0
        opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
        for batch in batches:
            if dict_cols:
                arrays = [
                    pc.dictionary_encode(batch.column(name))
                    if name in dict_cols
                    else batch.column(name)
                    for name in batch.schema.names
                ]
                batch = pa.RecordBatch.from_arrays(arrays, names=batch.schema.names)
            if writer is None:
                sink = pa.OSFile(out, "wb")
                writer = (
                    ipc.new_stream(sink, batch.schema, options=opts)
                    if format == "stream"
                    else ipc.new_file(sink, batch.schema, options=opts)
                )
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is not None:
            writer.close()
        yield pa.RecordBatch.from_pydict(
            {"path": [out if rows or writer else None], "rows": [rows]}
        )

    manifest = df.mapInArrow(_write, "path string, rows bigint").collect()
    return sum(1 for r in manifest if r["path"] is not None)


def read_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed IPC source: schema from the first shard's metadata
    (driver, cheap), shard list parallelized, whole-shard reads in tasks.

    Handles both wire formats and dictionary-encoded columns (dictionaries
    are decoded to dense — the Spark representation; SURVEY §1.2 DICTIONARY).
    """
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from pyspark.sql.pandas.types import from_arrow_schema

    files = _shard_pattern(path)

    with open(files[0], "rb") as fh:
        try:
            arrow_schema = ipc.open_file(fh).schema
        except pa.ArrowInvalid:
            fh.seek(0)
            arrow_schema = ipc.open_stream(fh).schema

    # dictionary columns decode to their value type
    fields = [
        f.with_type(f.type.value_type) if pa.types.is_dictionary(f.type) else f
        for f in arrow_schema
    ]
    spark_schema = from_arrow_schema(pa.schema(fields), prefer_timestamp_ntz=True)

    paths_df = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )

    def _read(batches):
        import pyarrow as pa_
        import pyarrow.ipc as ipc_

        for b in batches:
            for p in b.column("path").to_pylist():
                with pa_.memory_map(p, "rb") as source:
                    try:
                        reader = ipc_.open_file(source)
                        table = reader.read_all()
                    except pa_.ArrowInvalid:
                        with pa_.memory_map(p, "rb") as s2:
                            table = ipc_.open_stream(s2).read_all()
                for col in table.schema.names:
                    if pa_.types.is_dictionary(table.schema.field(col).type):
                        idx = table.schema.get_field_index(col)
                        table = table.set_column(
                            idx,
                            table.schema.field(col).with_type(
                                table.schema.field(col).type.value_type
                            ),
                            table.column(col).cast(
                                table.schema.field(col).type.value_type
                            ),
                        )
                yield from table.to_batches()

    return paths_df.mapInArrow(_read, spark_schema)


def write_ipc_single(df: DataFrame, path: str, format: str = "stream") -> None:
    """One-file writer for interop (RecordBatchStream/FileWriter on the
    collected table).  Driver-side — small results only."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = df.toArrow()
    with pa.OSFile(path, "wb") as sink:
        writer = (
            ipc.new_stream(sink, table.schema)
            if format == "stream"
            else ipc.new_file(sink, table.schema)
        )
        writer.write_table(table)
        writer.close()
