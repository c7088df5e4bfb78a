"""Plasma-analog named object store (SURVEY §2.1 Plasma row, §7.7).

The reference's Plasma (cpp/src/plasma/client.h, store.cc:111-577) is a
shared-memory daemon holding immutable sealed objects with LRU eviction.
On a Spark cluster that role is played by the BlockManager: this module
exposes Plasma's *API shape* — create/seal/get/contains/evict/list — over
``persist`` (hot tier) plus an optional parquet directory (sealed/spill
tier, surviving the session like Plasma survives clients).

Semantics preserved:
- objects are immutable once sealed (put = create+seal; no update);
- ``get`` of an unsealed/absent id raises KeyError (Plasma's get blocks;
  a batch engine raises instead);
- ``evict`` drops the hot copy but a spilled object remains fetchable
  (Plasma's delete-on-eviction applies only to the memory tier here);
- LRU bookkeeping: ``list`` reports access order (eviction_policy.h:37).
"""

from __future__ import annotations

import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession


class ObjectStore:
    def __init__(self, spark: SparkSession, spill_dir: str | None = None):
        self.spark = spark
        self.spill_dir = spill_dir
        self._hot: dict[str, DataFrame] = {}
        self._last_access: dict[str, float] = {}

    # -- Plasma client surface (client.h: Create/Seal/Get/Contains/Evict) --
    def put(self, object_id: str, df: DataFrame, spill: bool = False) -> DataFrame:
        """create + seal: pin the dataset hot (MEMORY_AND_DISK) and
        optionally write the sealed parquet copy."""
        if object_id in self._hot:
            raise KeyError(f"object {object_id!r} already sealed (immutable)")
        pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
        self._hot[object_id] = pinned
        self._last_access[object_id] = time.time()
        if spill:
            if not self.spill_dir:
                raise ValueError("spill requested but store has no spill_dir")
            pinned.write.mode("errorifexists").parquet(self._path(object_id))
        return pinned

    def get(self, object_id: str) -> DataFrame:
        self._last_access[object_id] = time.time()
        if object_id in self._hot:
            return self._hot[object_id]
        path = self._path(object_id)
        if path and os.path.exists(path):
            df = self.spark.read.parquet(path)
            self._hot[object_id] = df.persist(StorageLevel.MEMORY_AND_DISK)
            return self._hot[object_id]
        raise KeyError(f"object {object_id!r} not in store")

    def contains(self, object_id: str) -> bool:
        if object_id in self._hot:
            return True
        path = self._path(object_id)
        return bool(path and os.path.exists(path))

    def evict(self, object_id: str) -> bool:
        """Drop the hot copy (BlockManager unpersist).  Sealed spill copies
        survive, like Plasma objects that were replicated out."""
        df = self._hot.pop(object_id, None)
        if df is not None:
            df.unpersist()
            return True
        return False

    def evict_lru(self, keep: int) -> list[str]:
        """Evict least-recently-used hot objects beyond ``keep`` (the
        eviction_policy.h LRU loop)."""
        order = sorted(
            [k for k in self._hot], key=lambda k: self._last_access.get(k, 0.0)
        )
        victims = order[: max(len(order) - keep, 0)]
        for k in victims:
            self.evict(k)
        return victims

    def list(self) -> list[str]:
        """Hot object ids in LRU order (oldest first)."""
        return sorted(self._hot, key=lambda k: self._last_access.get(k, 0.0))

    def broadcast_small(self, object_id: str):
        """Driver-side broadcast of a small sealed object — the Plasma
        'every worker maps the same memory' pattern for dimension tables."""
        pdf = self.get(object_id).toPandas()
        return self.spark.sparkContext.broadcast(pdf)

    def _path(self, object_id: str) -> str | None:
        if not self.spill_dir:
            return None
        return os.path.join(self.spill_dir, f"{object_id}.parquet")
