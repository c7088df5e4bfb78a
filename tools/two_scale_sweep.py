"""Two-scale (sf0.1) oracle coverage for the quadratic-oracle family.

The r6 sf0.1 sweep verified 240/294 queries; the remainder is the
near-dup/pair family whose DuckDB oracles (exact set-Jaccard, cluster
replay, all-pairs cosine) are quadratic in the documents/embeddings
tables — an ORACLE-side wall, not an engine one.  This tool closes the
gap without unbounded DuckDB runtime:

1. attempt each query at FULL sf0.1 with a watchdog on the DuckDB side
   (``con.interrupt()`` from a timer thread after ``--timeout`` seconds);
2. on oracle timeout, fall back to a deterministic SLICE fixture —
   documents/embeddings cut to the lowest ``SLICE_DOCS`` ids (id-prefix
   keeps planted-duplicate neighborhoods intact), every other table the
   full sf0.1 file — and verify the query exactly there.  Slice scale is
   3x the driver's grade scale, so scale-dependent divergence classes
   (float associativity, overflow, ordering ties) still get headroom
   beyond sf0.01 even for the capped rows.

Verdicts per query: ``full`` (green at sf0.1), ``slice`` (green at the
3x-grade-scale slice; oracle quadratic at sf0.1), ``FAIL``.

Usage: python tools/two_scale_sweep.py [--timeout N] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, compare  # noqa: E402

BIG = "/root/testdata/sf0.1"
SLICE_DOCS = 1000  # 2x sf0.01's 500 documents (q33's exact-Jaccard oracle
SLICE_VECS = 1000  # is ~20 s at 500 docs and quadratic: ~80 s here, ~2000 s
#                    at full sf0.1 — the slice is what makes it verifiable)

# The 18 queries the r6 sweep skipped as quadratic-oracle (reconstructed
# from the r6 sweep logs: 240 green + this family + the tail behind it;
# the tail is swept directly by check_oracle.py, it was never expensive).
FAMILY = [
    "q33_minhash_near_duplicates",
    "q34_simhash_near_duplicates",
    "q36_ann_lsh_topk",
    "q37_embedding_near_duplicates",
    "q79_neardup_clusters",
    "q89_incremental_dedup",
    "q112_incremental_neardup",
    "q119_winnow_fingerprints",
    "q127_pagerank_neardup",
    "q130_semantic_dedup_pairs",
    "q135_triangle_census",
    "q139_sharded_bloom_dedup",
    "q140_ngram_jaccard_pairs",
    "q143_containment_pairs",
    "q160_dedup_keep_best",
    "q206_dup_weighted_sample",
    "q207_streaming_ann_index",
    "q221_image_near_duplicates",
    "q222_similarity_profile",
    "q243_match_evidence",
]


def build_slice_dir(path: str) -> str:
    """Deterministic slice fixture: documents/embeddings id-prefix cut,
    all other tables symlinked to the full sf0.1 files."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BIG}/documents.parquet')"
        f" ORDER BY doc_id LIMIT {SLICE_DOCS})"
        f" TO '{path}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BIG}/embeddings.parquet')"
        f" ORDER BY vec_id LIMIT {SLICE_VECS})"
        f" TO '{path}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        src = os.path.join(BIG, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(path, f"{t}.parquet"))
    return path


def oracle_with_timeout(sf_dir: str, sql: str, timeout_s: float):
    """Run the oracle on a fresh connection; interrupt from a timer.
    Returns (pdf, elapsed) or raises TimeoutError."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    timed_out = threading.Event()

    def _kill():
        timed_out.set()
        con.interrupt()

    timer = threading.Timer(timeout_s, _kill)
    timer.start()
    t0 = time.time()
    try:
        pdf = con.sql(sql).df()
    except Exception:
        if timed_out.is_set():
            raise TimeoutError(f"oracle exceeded {timeout_s}s")
        raise
    finally:
        timer.cancel()
        con.close()
    return pdf, time.time() - t0


def main() -> None:
    timeout_s = 180.0
    slice_only = False
    args = sys.argv[1:]
    while args and args[0].startswith("--"):
        if args[0] == "--timeout":
            timeout_s = float(args[1])
            args = args[2:]
        elif args[0] == "--slice-only":
            # known worse-than-quadratic oracles (cluster replay /
            # triangle enumeration): skip the hopeless full-sf0.1 attempt
            slice_only = True
            args = args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args or FAMILY

    import __spark_entry__ as entrymod
    from apache_arrow_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    slice_dir = None
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        verdict, detail = "FAIL", ""
        try:
            if slice_only:
                raise TimeoutError("skipped: --slice-only")
            sdf = queries[name](spark, BIG)
            opdf, osec = oracle_with_timeout(BIG, oracles[name], timeout_s)
            problems = compare(name, sdf, opdf)
            if problems:
                detail = "; ".join(problems)[:400]
            else:
                verdict, detail = "full", f"oracle {osec:.1f}s"
        except TimeoutError:
            # quadratic oracle: exact verification on the slice fixture
            if slice_dir is None:
                slice_dir = build_slice_dir("/tmp/aas_sf01_slice")
            try:
                sdf = queries[name](spark, slice_dir)
                opdf, osec = oracle_with_timeout(
                    slice_dir, oracles[name], timeout_s
                )
                problems = compare(name, sdf, opdf)
                if problems:
                    detail = "slice: " + "; ".join(problems)[:400]
                else:
                    verdict = "slice"
                    detail = f"sf0.1 oracle quadratic; slice oracle {osec:.1f}s"
            except Exception as e:  # noqa: BLE001
                detail = f"slice: {type(e).__name__}: {str(e)[:300]}"
        except Exception as e:  # noqa: BLE001
            detail = f"{type(e).__name__}: {str(e)[:300]}"
        results[name] = {"verdict": verdict, "detail": detail}
        mark = {"full": "✓", "slice": "◐"}.get(verdict, "✗")
        print(f"  {mark} {name}: {verdict}  [{time.time()-t0:.1f}s] {detail}",
              flush=True)
    counts = {
        v: sum(1 for r in results.values() if r["verdict"] == v)
        for v in ("full", "slice", "FAIL")
    }
    print(json.dumps({"counts": counts, "results": results}))
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
