"""Plasma-analog object store semantics (SURVEY §2.1 Plasma row)."""

import pytest

from apache_arrow_spark.store import ObjectStore


@pytest.fixture()
def store(spark, tmp_path):
    return ObjectStore(spark, spill_dir=str(tmp_path))


def _df(spark, n=10):
    return spark.createDataFrame([(i,) for i in range(n)], "v int")


def test_put_get_contains(store, spark):
    store.put("a", _df(spark))
    assert store.contains("a")
    assert store.get("a").count() == 10
    assert not store.contains("missing")
    with pytest.raises(KeyError):
        store.get("missing")


def test_immutable_once_sealed(store, spark):
    store.put("a", _df(spark))
    with pytest.raises(KeyError):
        store.put("a", _df(spark, 5))


def test_evict_and_spill_survival(store, spark):
    store.put("a", _df(spark), spill=True)
    assert store.evict("a")
    assert not store.evict("a")  # already gone from hot tier
    assert store.contains("a")  # sealed copy survives
    assert store.get("a").count() == 10


def test_evict_without_spill_loses_object(spark):
    store = ObjectStore(spark)  # no spill dir
    store.put("a", _df(spark))
    store.evict("a")
    assert not store.contains("a")


def test_lru_eviction(store, spark):
    for name in ["a", "b", "c"]:
        store.put(name, _df(spark))
    store.get("a")  # refresh a -> LRU order is b, c, a
    victims = store.evict_lru(keep=1)
    assert victims == ["b", "c"]
    assert store.list() == ["a"]


def test_broadcast_small(store, spark):
    store.put("dim", _df(spark, 5))
    b = store.broadcast_small("dim")
    assert len(b.value) == 5
    b.unpersist()
