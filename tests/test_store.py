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


def test_subscribe_notify_on_seal(store, spark):
    sub = store.subscribe()
    store.put("a", _df(spark, 7))
    note = sub.get_notification(timeout=5)
    assert note.object_id == "a"
    assert note.data_size == 7
    assert not note.deleted


def test_subscribe_notify_on_evict(store, spark):
    store.put("a", _df(spark))
    sub = store.subscribe()  # after seal: only the delete event arrives
    store.evict("a")
    notes = sub.drain()
    assert [(n.object_id, n.deleted, n.data_size) for n in notes] == [("a", True, -1)]


def test_subscription_timeout_and_unsubscribe(store, spark):
    sub = store.subscribe()
    with pytest.raises(TimeoutError):
        sub.get_notification(timeout=0.05)
    store.unsubscribe(sub)
    store.put("a", _df(spark, 3))
    assert sub.drain() == []  # unsubscribed streams receive nothing


def test_wait_and_fetch(store, spark):
    store.put("a", _df(spark, 4), spill=True)
    store.put("b", _df(spark, 5))
    ready, not_ready = store.wait(["a", "b", "zzz"], timeout=0.2)
    assert set(ready) == {"a", "b"} and not_ready == ["zzz"]
    # num_returns: satisfied as soon as 1 object is available
    ready, _ = store.wait(["a", "zzz"], timeout=0.2, num_returns=1)
    assert ready == ["a"]
    # fetch pulls the spilled copy back into the hot tier after evict
    store.evict("a")
    assert "a" not in store.list()
    avail = store.fetch(["a", "zzz"])
    assert avail == {"a": True, "zzz": False}
    assert "a" in store.list()
    assert store.get("a").count() == 4


# ---------------------------------------------------------------------------
# hash + transfer (client.h:209 Hash, :298-304 Transfer)
# ---------------------------------------------------------------------------


def test_hash_digest_stable_under_partitioning(spark, tmp_path):
    from apache_arrow_spark.store import ObjectStore

    store = ObjectStore(spark, spill_dir=str(tmp_path / "sp1"))
    import os

    os.makedirs(str(tmp_path / "sp1"), exist_ok=True)
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    store.put("obj", df)
    d1 = store.hash("obj")
    # same rows, different physical layout -> same digest
    store2 = ObjectStore(spark, spill_dir=None)
    store2.put("obj", df.repartition(7).sortWithinPartitions("v"))
    assert store2.hash("obj") == d1
    # different content -> different digest
    store3 = ObjectStore(spark, spill_dir=None)
    store3.put("obj", df.filter("id < 999"))
    assert store3.hash("obj") != d1
    # duplicate-row sensitivity (xor alone would cancel pairs)
    store4 = ObjectStore(spark, spill_dir=None)
    store4.put("obj", df.unionAll(df))
    assert store4.hash("obj") != d1


def test_transfer_cross_store(spark, tmp_path):
    import os

    from apache_arrow_spark.store import ObjectStore

    src_dir, dst_dir = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src_dir)
    os.makedirs(dst_dir)
    src = ObjectStore(spark, spill_dir=src_dir)
    dst = ObjectStore(spark, spill_dir=dst_dir)
    df = spark.range(0, 100).selectExpr("id", "id % 7 AS g")
    src.put("t1", df, spill=True)

    sub = dst.subscribe()
    out = src.transfer("t1", dst)
    assert out.count() == 100
    assert dst.contains("t1")
    # integrity check the manager protocol performs: digests agree
    assert src.hash("t1") == dst.hash("t1")
    # the arrival was sealed -> notification fired in the TARGET store
    notes = sub.drain()
    assert any(n.object_id == "t1" and not n.deleted for n in notes)
    # sealed = immutable: re-transfer refuses
    import pytest as _pytest

    with _pytest.raises(KeyError):
        src.transfer("t1", dst)
    # target spill copy exists independently of the source store
    assert os.path.exists(os.path.join(dst_dir, "t1.parquet"))


def test_transfer_copy_is_independent_of_source_cache(spark):
    from apache_arrow_spark.store import ObjectStore

    src = ObjectStore(spark, spill_dir=None)
    dst = ObjectStore(spark, spill_dir=None)
    df = spark.range(0, 50).selectExpr("id", "id * 3 AS v")
    src.put("x", df)
    src.transfer("x", dst)
    # evicting the SOURCE must not unpersist the target's sealed copy
    src.evict("x")
    got = dst.get("x")
    assert got.count() == 50
    assert got.storageLevel.useMemory  # still materialized in the target
