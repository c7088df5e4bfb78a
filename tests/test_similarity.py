"""Similarity search: brute-force cosine correctness vs numpy, LSH recall,
near-dup pairs."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.similarity import (
    ann_topk_lsh,
    cosine_topk,
    embedding_near_duplicates,
    hyperplanes,
    lsh_bucket,
)

N, DIM = 200, 16


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, DIM)).astype(np.float32)
    # plant a near-duplicate of row 0 at row 1
    v[1] = v[0] + rng.normal(scale=0.01, size=DIM).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def edf(spark, vecs):
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _np_topk(vecs, q, k):
    v = vecs.astype(np.float64)
    q = q.astype(np.float64)
    sims = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(sims)), key=lambda i: (-round(sims[i], 6), i))
    return order[:k]


def test_cosine_topk_matches_numpy(spark, edf, vecs):
    q = vecs[0]
    got = [r["vec_id"] for r in cosine_topk(edf, [float(x) for x in q], k=10).collect()]
    assert got == _np_topk(vecs, q, 10)
    top = cosine_topk(edf, [float(x) for x in q], k=1).collect()[0]
    assert top["vec_id"] == 0 and abs(top["sim"] - 1.0) < 1e-6


def test_ann_lsh_recall(spark, edf, vecs):
    q = vecs[0]
    exact = set(_np_topk(vecs, q, 5))
    approx = {r["vec_id"] for r in ann_topk_lsh(edf, [float(x) for x in q], k=5, planes=8, n_probe_bits=2).collect()}
    # multi-probe LSH at these settings should recover most of the top-5
    assert len(exact & approx) >= 3
    assert 0 in approx and 1 in approx


def test_lsh_bucket_deterministic(spark, edf):
    hp = hyperplanes(DIM, 8)
    a = edf.select("vec_id", lsh_bucket(F.col("embedding"), hp).alias("b")).collect()
    b = edf.select("vec_id", lsh_bucket(F.col("embedding"), hp).alias("b")).collect()
    assert {r["vec_id"]: r["b"] for r in a} == {r["vec_id"]: r["b"] for r in b}
    buckets = {r["b"] for r in a}
    assert len(buckets) > 1  # actually partitions the space


def test_embedding_near_duplicates_finds_planted_pair(spark, edf):
    pairs = embedding_near_duplicates(edf, threshold=0.99, planes=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got


def test_ivf_topk_recall(spark, edf, vecs):
    from apache_arrow_spark.functions.similarity import ivf_topk

    q = vecs[0]
    exact = set(_np_topk(vecs, q, 5))
    approx = {
        r["vec_id"]
        for r in ivf_topk(edf, [float(x) for x in q], k=5, n_clusters=8, n_probe=3).collect()
    }
    assert len(exact & approx) >= 3
    assert 0 in approx and 1 in approx
