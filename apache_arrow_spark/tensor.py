"""Tensor ↔ NumPy mapping + tensor IPC (SURVEY §2.1 Tensor row).

The reference wraps dense n-dimensional arrays zero-copy
(``Tensor.from_numpy``/``to_numpy``, python/pyarrow/array.pxi:492-524) and
ships them as standalone IPC messages (``WriteTensor``/``ReadTensor``,
cpp/src/arrow/ipc/writer.h:246-270, reader.h:222).

Spark mapping (SURVEY §1.2): a tensor is a DataFrame with one row per
outermost-axis slice — an ``ArrayType`` column of the row-major-flattened
slice — plus the original shape/strides/order/dtype recorded in field
metadata under the engine's ``arrow`` metadata key.  Slicing on axis 0 is
the natural distribution unit (a 1B×512 embedding matrix becomes 1B rows
of 512 floats — exactly the layout the similarity operators consume), and
an explicit ``__tensor_row`` ordinal makes reassembly order-exact without
relying on partition ordering.

The IPC helpers delegate to pyarrow's public tensor-message API — the
same wire format the reference emits — so files interoperate with any
Arrow implementation.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_arrow_spark.types import ARROW_META_KEY

ROW_COL = "__tensor_row"

_DTYPE_SPARK = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
}


def tensor_metadata(arr: np.ndarray) -> dict:
    """The Tensor message header fields (format/Tensor.fbs:35): shape,
    strides (bytes, as the flatbuffer records them), dim order, dtype."""
    return {
        "type": "tensor",
        "shape": list(arr.shape),
        "strides": list(arr.strides),
        "order": "F" if arr.flags["F_CONTIGUOUS"] and not arr.flags["C_CONTIGUOUS"] else "C",
        "dtype": str(arr.dtype),
    }


def from_numpy(spark: SparkSession, arr: np.ndarray, col: str = "tensor") -> DataFrame:
    """ndarray -> DataFrame: one row per outermost-axis slice, flattened
    row-major; original layout in field metadata.  1-d arrays become
    single-element slices (shape (n,) -> n rows of 1-element lists) so the
    row count always equals shape[0]."""
    if arr.ndim == 0:
        raise ValueError("0-d tensors are scalars; use a literal column")
    if str(arr.dtype) not in _DTYPE_SPARK:
        raise NotImplementedError(f"tensor dtype {arr.dtype} has no Spark element type")
    meta = tensor_metadata(arr)
    elem = _DTYPE_SPARK[str(arr.dtype)]
    # row-major slices regardless of source order; order is restored on
    # egress from the recorded strides
    flat = np.ascontiguousarray(arr).reshape(arr.shape[0], -1)
    schema = T.StructType(
        [
            T.StructField(ROW_COL, T.LongType(), False),
            T.StructField(
                col,
                T.ArrayType(elem, containsNull=False),
                False,
                metadata={ARROW_META_KEY: meta},
            ),
        ]
    )
    rows = [(i, flat[i].tolist()) for i in range(flat.shape[0])]
    return spark.createDataFrame(rows, schema)


def to_numpy(df: DataFrame, col: str = "tensor") -> np.ndarray:
    """DataFrame (from ``from_numpy``) -> ndarray restoring shape, dtype
    and memory order from the recorded metadata."""
    field = df.schema[col]
    meta = (field.metadata or {}).get(ARROW_META_KEY)
    if isinstance(meta, str):  # metadata survives parquet as JSON text
        meta = json.loads(meta)
    if not meta or meta.get("type") != "tensor":
        raise ValueError(f"column {col!r} carries no tensor metadata")
    shape = tuple(int(s) for s in meta["shape"])
    dtype = np.dtype(meta["dtype"])
    rows = df.select(ROW_COL, col).orderBy(ROW_COL).collect()
    flat = np.array([r[col] for r in rows], dtype=dtype).reshape(shape)
    if meta.get("order") == "F":
        flat = np.asfortranarray(flat)
    return flat


def column_as_tensor(df: DataFrame, col: str, dtype: str = "float64") -> np.ndarray:
    """Any ArrayType column of uniform length -> 2-d ndarray (rows in the
    DataFrame's current order) — the bulk-egress path for embedding
    matrices feeding single-node numeric code."""
    rows = df.select(col).collect()
    return np.array([r[col] for r in rows], dtype=np.dtype(dtype))


# ---------------------------------------------------------------------------
# Tensor IPC messages (the reference's WriteTensor/ReadTensor wire format)
# ---------------------------------------------------------------------------


def write_tensor_ipc(arr: np.ndarray, path: str) -> int:
    """Write one tensor message; returns bytes written.  The file is the
    reference's standalone tensor IPC format (ipc/writer.h:246) —
    readable by any Arrow implementation's ReadTensor."""
    tensor = pa.Tensor.from_numpy(arr)
    with pa.OSFile(path, "wb") as sink:
        return pa.ipc.write_tensor(tensor, sink)


def read_tensor_ipc(path: str) -> np.ndarray:
    with pa.memory_map(path, "rb") as src:
        tensor = pa.ipc.read_tensor(src)
    return tensor.to_numpy()
