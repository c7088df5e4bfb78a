"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no driver collect, no disk write),
so timings measure scan + compute + shuffle, the parts that matter at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q04_select_project",
    "q06_countby_returnflag",
    "q09_dictionary_encode_returnflag",
    "q11_cast_double_to_int",
    "q13_cast_ns_to_us",
    "q16_decimal_ops",
    "q21_sort_topk",
    "q22_join_region_revenue",
    "q23_window_top_order_per_customer",
    "q24_tumbling_window_events",
    "q26_ipc_roundtrip",
    "q28_text_quality",
    "q31_dedup_exact",
    "q33_minhash_near_duplicates",
    "q35_cosine_topk",
    "q39_streaming_tumbling_counts",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from apache_arrow_spark.queries import QUERIES
    from apache_arrow_spark.session import get_spark

    spark = get_spark(app_name="aas-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # derive sf from the dir name when possible
    sf = None
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    names = [n for n in HEADLINE if n in QUERIES]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in QUERIES]

    # warm the JVM + file-listing caches once with the cheapest query
    QUERIES["q06_countby_returnflag"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
