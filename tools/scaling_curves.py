"""Two-point scaling law for the hottest headline queries.

Runs each query at two scale factors (default sf0.01 and sf0.1 — a 10x
data ratio), records wall time and EXECUTED-plan shuffle bytes
(plans/inspect.shuffle_bytes_written), and prints the growth exponent
alpha = log(ratio) / log(10) for each.  alpha ~ 1 is the linear-scaling
claim SCALE.md makes for the winnowing/MinHash caps; alpha >= ~1.5 means
a super-linear stage snuck in (candidate flood, uncapped pair join).

Timings are only meaningful run ALONE (no concurrent pytest/oracle jobs).

Usage: python tools/scaling_curves.py [sf_small_dir sf_big_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT = [
    "q22_join_region_revenue",
    "q26_ipc_roundtrip",
    "q33_minhash_near_duplicates",
    "q97_importance_weights",
    "q119_winnow_fingerprints",
    # r5: both exact set-similarity joins post digest-shuffle rewrite
    "q140_ngram_jaccard_pairs",
    "q143_containment_pairs",
    "q164_token_cooccurrence",
    "q172_source_overlap_matrix",
    # r4: rolling-distinct fan-out, partial-Gram covariance, sweep-line
    # coverage, incremental session stitch
    "q262_rolling_active_users",
    "q265_embedding_covariance",
    "q274_interval_coverage",
    "q276_session_stitch",
    # r6: the two largest remaining headline shufflers + the r5
    # reference-parity kernels
    "q216_nb_confusion",
    "q205_perplexity_strata",
    "q290_isin_match",
    "q291_row_group_scan",
    # r6 perf wave
    "q130_semantic_dedup_pairs",
    "q248_cogroup_reconcile",
    # r6 verdict follow-up: the remaining perf-wave queries enter the
    # tooling.  q269's documented expected band is alpha <= ~1.5, NOT ~1:
    # at toy scale the per-hop frontier saturates the whole graph (every
    # vertex reached), so work grows faster than input until edges >>
    # frontier; at real scale edges ≤ |lineitem| and the per-hop join is
    # linear in frontier+edges (SCALE.md r6 "q269's +10MB shuffle delta").
    "q263_grid_interpolation",
    "q269_bfs_khop",
    # r7: q133's distributed ntile replay (ex single-task global window)
    "q133_quantile_binning",
]

# per-query documented alpha bands (upper bound); absent -> 1.2 default
EXPECTED_ALPHA_MAX = {
    "q269_bfs_khop": 1.55,  # toy-graph saturation, see comment above
}


from apache_arrow_spark.plans.inspect import app_shuffle_bytes, latest_stage_id


def measure(spark, name: str, sf_dir: str) -> dict:
    from apache_arrow_spark.queries import QUERIES

    # untimed pass compiles the target-sf plan shapes (bench.py discipline)
    QUERIES[name](spark, sf_dir).collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.5)  # let the listener bus drain before the baseline read
    # stage-id watermark, not a cumulative diff: the status store evicts
    # stages past spark.ui.retainedStages in long sessions (r7 lesson)
    mark = latest_stage_id(spark)
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).collect()  # timed END-TO-END, call included
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    return {
        "wall_s": round(wall, 3),
        "shuffle_bytes": app_shuffle_bytes(spark, since_stage=mark),
    }


def main() -> None:
    # --ratio R: the data-size ratio between the two dirs (alpha
    # denominator log(R); default 10 for the sf0.01 -> sf0.1 pair).
    # --queries a,b,c: restrict to a subset of HOT (the sf0.3 notch runs
    # the top-5 wall queries only, r9 verdict #6).
    args = list(sys.argv[1:])
    ratio = 10.0
    names = HOT
    rest = []
    while args:
        a = args.pop(0)
        if a == "--ratio":
            ratio = float(args.pop(0))
        elif a == "--queries":
            names = [q for q in args.pop(0).split(",") if q]
        else:
            rest.append(a)
    small = rest[0] if rest else "/root/testdata/sf0.01"
    big = rest[1] if len(rest) > 1 else "/root/testdata/sf0.1"
    from apache_arrow_spark.session import get_spark

    spark = get_spark()
    out = {}
    for name in names:
        s = measure(spark, name, small)
        b = measure(spark, name, big)
        row = {"small": s, "big": b}
        if s["shuffle_bytes"] > 0:
            row["bytes_ratio"] = round(b["shuffle_bytes"] / s["shuffle_bytes"], 2)
            row["bytes_alpha"] = round(math.log(row["bytes_ratio"]) / math.log(ratio), 3)
        if s["wall_s"] > 0:
            row["wall_ratio"] = round(b["wall_s"] / s["wall_s"], 2)
        if "bytes_alpha" in row:
            row["alpha_ok"] = row["bytes_alpha"] <= EXPECTED_ALPHA_MAX.get(name, 1.2)
        out[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(out))
    # markdown table for SCALE.md
    print("\n| query | wall sf0.01 | wall sf0.1 | shuffle sf0.01 | shuffle sf0.1 | bytes ratio | alpha |")
    print("|---|---|---|---|---|---|---|")
    for name, r in out.items():
        print(
            f"| {name} | {r['small']['wall_s']} s | {r['big']['wall_s']} s "
            f"| {r['small']['shuffle_bytes']:,} | {r['big']['shuffle_bytes']:,} "
            f"| {r.get('bytes_ratio', '—')} | {r.get('bytes_alpha', '—')} |"
        )


if __name__ == "__main__":
    main()
