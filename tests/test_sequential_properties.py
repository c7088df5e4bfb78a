"""Randomized (seeded) equivalence tests for the sequential/stateful
operators added in r4: each seed builds an adversarial random input and
checks the distributed implementation against a pure-Python reference —
the property layer for operators whose single-case tests can't cover
ordering/boundary interactions (per test_property.py's convention, Spark
properties use deterministic seeds, not hypothesis examples)."""

import random

from apache_arrow_spark.functions.pipeline import grid_interpolate
from apache_arrow_spark.operators.sessionize import (
    debounce,
    session_summary,
    stitch_sessions,
)

SEEDS = (7, 23, 99)


def _rand_events(rng, n_users=6, max_events=40, t_range=1000):
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        ts = rng.sample(range(t_range), rng.randint(1, max_events))
        for t in ts:
            rows.append((u, t, eid))
            eid += 1
    return rows


def test_debounce_matches_python_walk(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng)
        gap = rng.randint(2, 40)
        df = spark.createDataFrame(rows, "user_id long, ts long, eid long")
        got = sorted(
            (r["user_id"], r["ts"])
            for r in debounce(df, "user_id", "ts", gap).collect()
        )
        want = []
        by_u = {}
        for u, t, _ in rows:
            by_u.setdefault(u, []).append(t)
        for u, ts in by_u.items():
            last = None
            for t in sorted(ts):
                if last is None or t - last > gap:
                    want.append((u, t))
                    last = t
        assert got == sorted(want), (seed, gap)


def test_stitch_matches_full_recompute_random(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng)
        gap = rng.randint(5, 60)
        boundary = rng.randint(200, 800)
        df = spark.createDataFrame(rows, "user_id long, ts long, eid long")
        old = session_summary(
            df.filter(df.ts < boundary), "user_id", "ts", gap, ["eid"]
        )
        got = sorted(
            map(
                tuple,
                stitch_sessions(
                    old, df.filter(df.ts >= boundary), "user_id", "ts",
                    gap, boundary, ["eid"],
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                session_summary(df, "user_id", "ts", gap, ["eid"])
                .select("user_id", "start", "end", "n_events")
                .collect(),
            )
        )
        assert got == want, (seed, gap, boundary)


def test_grid_interpolate_matches_python(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        rows = []
        for u in range(1, 5):
            ts = sorted(rng.sample(range(1000), rng.randint(2, 25)))
            for t in ts:
                rows.append((u, t, float(rng.randint(0, 10000)) / 100.0))
        step = rng.choice((10, 25, 50))
        cap = rng.choice((None, 3 * step))
        df = spark.createDataFrame(rows, "k long, t long, v double")
        got = {
            (r["k"], r["grid_t"]): r["value_interp"]
            for r in grid_interpolate(
                df, "k", "t", "v", step_ns=step, max_gap_ns=cap
            ).collect()
        }
        want = {}
        by_k = {}
        for k, t, v in rows:
            by_k.setdefault(k, []).append((t, v))
        for k, obs in by_k.items():
            obs.sort()
            lo, hi = obs[0][0], obs[-1][0]
            h = -(-lo // step)
            while h * step <= hi:
                t = h * step
                prev = max((o for o in obs if o[0] <= t), default=None)
                nxt = min((o for o in obs if o[0] > t), default=None)
                if prev is not None and prev[0] == t:
                    want[(k, t)] = prev[1]
                elif prev is not None and nxt is not None and (
                    cap is None or nxt[0] - prev[0] <= cap
                ):
                    ratio = (t - prev[0]) / (nxt[0] - prev[0])
                    want[(k, t)] = prev[1] + (nxt[1] - prev[1]) * ratio
                h += 1
        assert got == want, (seed, step, cap)
