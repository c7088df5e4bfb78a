"""arrow2csv — print Arrow IPC files/streams (and feather) as CSV.

Parity with the reference's JS CLI (js/src/bin/arrow2csv.ts): reads an
Arrow IPC file, IPC stream, or feather file and writes CSV to stdout (or
``--out``).  Format is sniffed from the magic bytes the same way the JS
tool tries file-then-stream (arrow2csv.ts `readBatches`).

Usage: python tools/arrow2csv.py PATH [--out OUT] [--sep SEP] [--head N]

This is a driver-side inspection utility (the reference's is too); the
distributed CSV sink is ``df.write.csv``.
"""

from __future__ import annotations

import argparse
import csv
import sys

import pyarrow as pa


def read_any(path: str) -> pa.Table:
    """IPC file ('ARROW1' magic), IPC stream, or feather — sniffed."""
    with open(path, "rb") as f:
        magic = f.read(6)
    if magic == b"ARROW1":
        return pa.ipc.open_file(path).read_all()
    if magic[:4] == b"FEA1":
        import pyarrow.feather as feather

        return feather.read_table(path)
    with pa.ipc.open_stream(path) as reader:
        return reader.read_all()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path")
    ap.add_argument("--out", default=None, help="output file (default stdout)")
    ap.add_argument("--sep", default=",")
    ap.add_argument("--head", type=int, default=None, help="first N rows only")
    args = ap.parse_args(argv)

    table = read_any(args.path)
    if args.head is not None:
        table = table.slice(0, args.head)

    out = open(args.out, "w", newline="") if args.out else sys.stdout
    try:
        w = csv.writer(out, delimiter=args.sep)
        w.writerow(table.column_names)
        for batch in table.to_batches():
            cols = [c.to_pylist() for c in batch.columns]
            w.writerows(zip(*cols))
    finally:
        if args.out:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
