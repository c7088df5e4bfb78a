"""Sources/sinks (SURVEY §2.1): parquet, Arrow IPC, feather, ORC, pandas."""

from apache_arrow_spark.io.parquet import (
    read_dataset,
    read_table,
    write_table,
    write_to_dataset,
)
from apache_arrow_spark.io.ipc import read_ipc, write_ipc, write_ipc_single
from apache_arrow_spark.io.compression import (
    compress,
    compress_column,
    decompress,
    decompress_column,
)
from apache_arrow_spark.io.feather import read_feather, write_feather
from apache_arrow_spark.io.orc import read_orc, write_orc
from apache_arrow_spark.io.pandas_bridge import from_arrow, from_pandas, to_pandas

__all__ = [
    "read_table", "write_table", "write_to_dataset", "read_dataset",
    "read_ipc", "write_ipc", "write_ipc_single",
    "read_feather", "write_feather",
    "read_orc", "write_orc",
    "from_pandas", "to_pandas", "from_arrow",
    "compress", "decompress", "compress_column", "decompress_column",
]
