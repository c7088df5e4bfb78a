"""Tensor ↔ NumPy + tensor IPC (SURVEY §2.1 Tensor row; reference
python/pyarrow/array.pxi:492-524, cpp/src/arrow/ipc/writer.h:246-270)."""

import numpy as np
import pytest

from apache_arrow_spark.tensor import (
    column_as_tensor,
    from_numpy,
    read_tensor_ipc,
    tensor_metadata,
    to_numpy,
    write_tensor_ipc,
)


def test_roundtrip_2d(spark):
    arr = np.arange(24, dtype="float64").reshape(4, 6)
    df = from_numpy(spark, arr)
    assert df.count() == 4
    back = to_numpy(df)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == arr.dtype


def test_roundtrip_3d_int(spark):
    arr = np.arange(2 * 3 * 5, dtype="int32").reshape(2, 3, 5)
    back = to_numpy(from_numpy(spark, arr))
    np.testing.assert_array_equal(back, arr)
    assert back.shape == (2, 3, 5)


def test_roundtrip_1d(spark):
    arr = np.array([1.5, -2.5, 3.5], dtype="float32")
    df = from_numpy(spark, arr)
    assert df.count() == 3  # one row per outermost index
    back = to_numpy(df)
    np.testing.assert_array_equal(back, arr)


def test_fortran_order_preserved(spark):
    """Strides metadata restores memory order, not just values."""
    c = np.arange(12, dtype="float64").reshape(3, 4)
    f = np.asfortranarray(c)
    meta = tensor_metadata(f)
    assert meta["order"] == "F"
    assert meta["strides"] == list(f.strides)
    back = to_numpy(from_numpy(spark, f))
    np.testing.assert_array_equal(back, c)
    assert back.flags["F_CONTIGUOUS"]


def test_metadata_fields(spark):
    arr = np.zeros((5, 7), dtype="int64")
    meta = tensor_metadata(arr)
    assert meta["shape"] == [5, 7]
    assert meta["strides"] == [56, 8]  # row-major int64
    assert meta["dtype"] == "int64"


def test_unsupported_dtype(spark):
    with pytest.raises(NotImplementedError):
        from_numpy(spark, np.zeros(3, dtype="complex128"))
    with pytest.raises(ValueError):
        from_numpy(spark, np.float64(3.0)[()] * np.ones(()))  # 0-d


def test_missing_metadata_raises(spark):
    df = spark.createDataFrame([(0, [1.0])], "__tensor_row long, tensor array<double>")
    with pytest.raises(ValueError):
        to_numpy(df)


def test_column_as_tensor(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "i long, e array<double>"
    ).orderBy("i")
    m = column_as_tensor(df, "e")
    np.testing.assert_array_equal(m, [[1.0, 2.0], [3.0, 4.0]])


def test_tensor_ipc_roundtrip(tmp_path):
    arr = np.arange(30, dtype="float32").reshape(5, 6)
    p = str(tmp_path / "t.arrow_tensor")
    n = write_tensor_ipc(arr, p)
    assert n > 0
    back = read_tensor_ipc(p)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == np.float32


def test_tensor_ipc_interop_with_pyarrow(tmp_path):
    """Our writer's file is readable by plain pyarrow (wire-format parity)."""
    import pyarrow as pa

    arr = np.arange(8, dtype="int64").reshape(2, 4)
    p = str(tmp_path / "t2.arrow_tensor")
    write_tensor_ipc(arr, p)
    with pa.memory_map(p, "rb") as src:
        t = pa.ipc.read_tensor(src)
    assert tuple(t.shape) == (2, 4)
    np.testing.assert_array_equal(t.to_numpy(), arr)


def test_parquet_roundtrip_keeps_metadata(spark, tmp_path):
    """Tensor metadata survives a parquet write/read (JSON-encoded in the
    parquet field metadata), so sealed tensor tables stay reassemblable."""
    arr = np.arange(6, dtype="float64").reshape(2, 3)
    p = str(tmp_path / "tensor_pq")
    from_numpy(spark, arr).write.parquet(p)
    back_df = spark.read.parquet(p)
    np.testing.assert_array_equal(to_numpy(back_df), arr)
