"""Derive a deterministic 3x corpus ("sf0.3") from the read-only sf0.1
fixtures, for the one-notch-up scaling check (r9 verdict #6): re-derive
the top-wall queries' growth exponents at a scale the 22-row alpha guard
doesn't reach.  /root/testdata is read-only, so the derived tables land
in a scratch dir (default /tmp/aas_sf0.3) and are regenerable from this
script — nothing is committed.

Only the tables the top-5 wall queries read are generated:

- ``documents`` (q33 / q140 / q143): three copies; copy 0 verbatim,
  copies 1-2 pass the text through a bijective alphabet rotation
  (translate a-z -> rot7 / rot13, upper case too).  A character cipher
  preserves the *structure* every set-similarity operator keys on —
  per-copy n-gram document frequencies, doc lengths, and the exact
  near-dup pair set are isomorphic to the original — while cross-copy
  gram collisions are coincidental vocabulary hits, far below any
  similarity threshold.  So true pairs scale exactly 3x and the corpus
  is 3x, which is what a linear-alpha claim must be tested against
  (naive row duplication would instead square the duplicate structure:
  3 exact copies of every doc = 3x the near-dup CLUSTERS but 9x the
  candidate pairs, invalidating the exponent).
- ``lineitem`` + ``orders`` (q26 / q269): three copies with order keys
  offset per copy (new orders), supplier keys offset per copy (3x the
  supplier nodes), customer/part keys kept (the same customers place 3x
  the orders across a 3x supplier pool) — the customer-supplier graph
  q269 walks grows 3x in edges and supplier nodes without splitting
  into disjoint replicas (a key-disjoint copy would leave the BFS ball
  stuck in copy 0 and fake alpha ~ 0).

Usage: python tools/make_sf03.py [out_dir]
Then:  python tools/scaling_curves.py /root/testdata/sf0.1 <out_dir> \
           --ratio 3 --queries q26_...,q33_...,...
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def _rot(k: int) -> tuple[str, str]:
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    src = lo + up
    dst = lo[k:] + lo[:k] + up[k:] + up[:k]
    return src, dst


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aas_sf0.3"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    docs = f"read_parquet('{SRC}/documents.parquet')"
    n_docs = con.sql(f"SELECT max(doc_id) + 1 FROM {docs}").fetchone()[0]
    copies = ["SELECT * FROM base"]
    for c, k in ((1, 7), (2, 13)):
        src, dst = _rot(k)
        copies.append(
            f"SELECT doc_id + {c * n_docs} AS doc_id,"
            f" translate(text, '{src}', '{dst}') AS text,"
            f" lang, source, n_chars FROM base"
        )
    con.execute(
        f"COPY (WITH base AS (SELECT * FROM {docs}) "
        + " UNION ALL ".join(copies)
        + f") TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )

    li = f"read_parquet('{SRC}/lineitem.parquet')"
    o = f"read_parquet('{SRC}/orders.parquet')"
    max_ord = con.sql(f"SELECT max(o_orderkey) + 1 FROM {o}").fetchone()[0]
    max_sup = con.sql(f"SELECT max(l_suppkey) + 1 FROM {li}").fetchone()[0]
    li_copies = [
        f"SELECT l_orderkey + {c * max_ord} AS l_orderkey, l_partkey,"
        f" l_suppkey + {c * max_sup} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate"
        f" FROM {li}"
        for c in range(3)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(li_copies)})"
        f" TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
    )
    o_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {o}").fetchall()]
    rest = ", ".join(c for c in o_cols if c != "o_orderkey")
    o_copies = [
        f"SELECT o_orderkey + {c * max_ord} AS o_orderkey, {rest} FROM {o}"
        for c in range(3)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(o_copies)})"
        f" TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )
    for t in ("documents", "lineitem", "orders"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    con.close()


if __name__ == "__main__":
    main()
