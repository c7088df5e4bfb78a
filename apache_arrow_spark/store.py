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
- LRU bookkeeping: ``list`` reports access order (eviction_policy.h:37);
- pub/sub: ``subscribe`` yields a notification stream of seal/delete events
  (python/pyarrow/plasma.pyx:615-620 ``subscribe``/``get_notification_socket``;
  cpp/src/plasma/store.cc:577 ``push_notification``), and ``wait``/``fetch``
  mirror the client's readiness/pull calls (client.h Wait/Fetch).
"""

from __future__ import annotations

import os
import queue
import time
from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Notification:
    """One pub/sub event — the decoded analog of Plasma's notification
    flatbuffer (ObjectInfo: object_id + sizes, data_size == -1 marks a
    deletion, store.cc:577)."""

    object_id: str
    data_size: int  # -1 on delete/evict, else row count (batch-engine size unit)
    deleted: bool


class Subscription:
    """A subscriber's notification stream (the analog of the notification
    socket returned by plasma.pyx ``get_notification_socket``)."""

    def __init__(self) -> None:
        self._q: queue.Queue[Notification] = queue.Queue()

    def get_notification(self, timeout: float | None = None) -> Notification:
        """Blocking read of the next seal/delete event; raises
        ``TimeoutError`` when nothing arrives in time (the socket-read
        analog of plasma.pyx ``get_next_notification``)."""
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            raise TimeoutError("no plasma notification within timeout") from None

    def drain(self) -> list[Notification]:
        """All queued events, non-blocking."""
        out = []
        while True:
            try:
                out.append(self._q.get_nowait())
            except queue.Empty:
                return out


class ObjectStore:
    def __init__(self, spark: SparkSession, spill_dir: str | None = None):
        self.spark = spark
        self.spill_dir = spill_dir
        self._hot: dict[str, DataFrame] = {}
        self._last_access: dict[str, float] = {}
        self._subscribers: list[Subscription] = []

    # -- Plasma client surface (client.h: Create/Seal/Get/Contains/Evict) --
    def put(self, object_id: str, df: DataFrame, spill: bool = False) -> DataFrame:
        """create + seal: pin the dataset hot (MEMORY_AND_DISK) and
        optionally write the sealed parquet copy.

        Sealing is eager (``count()`` materializes the cache) — in Plasma an
        object's bytes exist in shared memory the moment it is sealed
        (store.cc SealObject), so subscribers notified here can ``get``
        without recomputation.
        """
        if object_id in self._hot:
            raise KeyError(f"object {object_id!r} already sealed (immutable)")
        pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
        self._hot[object_id] = pinned
        self._last_access[object_id] = time.time()
        if spill:
            if not self.spill_dir:
                raise ValueError("spill requested but store has no spill_dir")
            pinned.write.mode("errorifexists").parquet(self._path(object_id))
        n_rows = pinned.count()  # materialize = seal
        self._notify(Notification(object_id, n_rows, deleted=False))
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
            self._notify(Notification(object_id, -1, deleted=True))
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

    # -- pub/sub + readiness (plasma.pyx subscribe/wait/fetch analogs) -----
    def subscribe(self) -> Subscription:
        """Register a notification stream: every subsequent seal and evict
        event is pushed to the returned Subscription (plasma.pyx:615
        ``subscribe``)."""
        sub = Subscription()
        self._subscribers.append(sub)
        return sub

    def unsubscribe(self, sub: Subscription) -> None:
        self._subscribers.remove(sub)

    def wait(
        self, object_ids: list[str], timeout: float = 10.0, num_returns: int | None = None
    ) -> tuple[list[str], list[str]]:
        """Block until ``num_returns`` of ``object_ids`` are available (hot
        or spilled) or the timeout lapses; returns (ready, not_ready) in the
        order given — the client Wait call (client.h:Wait)."""
        want = len(object_ids) if num_returns is None else num_returns
        deadline = time.time() + timeout
        while True:
            ready = [oid for oid in object_ids if self.contains(oid)]
            if len(ready) >= want or time.time() >= deadline:
                not_ready = [oid for oid in object_ids if oid not in ready]
                return ready, not_ready
            time.sleep(0.01)

    def fetch(self, object_ids: list[str]) -> dict[str, bool]:
        """Pull spilled objects into the hot tier (the multi-node Fetch that
        copies remote objects into the local store); returns id->available.
        Absent ids are reported False, not raised — Fetch is best-effort."""
        out = {}
        for oid in object_ids:
            if oid in self._hot:
                out[oid] = True
                continue
            path = self._path(oid)
            if path and os.path.exists(path):
                self._hot[oid] = self.spark.read.parquet(path).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                self._last_access[oid] = time.time()
                out[oid] = True
            else:
                out[oid] = False
        return out

    def hash(self, object_id: str) -> str:
        """Content digest of a sealed object (client.h:209 ``Hash`` — the
        XXH64 of a Plasma object's data+metadata buffers; here an
        order-insensitive digest of the dataset's rows).  Computed
        DISTRIBUTED: per-row xxhash64 over canonicalized columns, combined
        with an order-independent aggregate (sum + count + xor via bit_xor)
        so the digest is stable under partitioning/shuffle — two stores
        holding the same sealed rows agree byte-for-byte."""
        import pyspark.sql.functions as F

        df = self.get(object_id)
        # NULL args leave xxhash64's seed chain unchanged (skipped), so
        # rows differing only in WHICH column is null would collide —
        # fold nulls as an explicit sentinel instead.
        h = F.xxhash64(
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x1eNULL"))
                for c in sorted(df.columns)
            ]
        )
        # decimal sum: ANSI-mode bigint sum would raise on overflow; a
        # decimal(38,0) multiset-sum is exact to ~10^19 rows.  bit_xor adds
        # duplicate-row sensitivity the sum alone lacks cheaply.
        row = df.select(
            F.coalesce(F.sum(h.cast("decimal(38,0)")), F.lit(0)).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(h), F.lit(0)).alias("x"),
        ).collect()[0]
        import hashlib

        return hashlib.sha256(
            f"{row['s']}:{row['n']}:{row['x']}".encode()
        ).hexdigest()

    def transfer(self, object_id: str, target: "ObjectStore") -> DataFrame:
        """Copy a sealed object into another store (client.h:298-304
        ``Transfer`` to a different plasma manager).  The object arrives
        sealed and immutable in the target (same id, same rows); digest
        equality (:meth:`hash`) is the cross-store integrity check the
        reference's manager protocol performs.  If both stores share a
        spill_dir the parquet copy is reused rather than rewritten."""
        df = self.get(object_id)
        if target.contains(object_id):
            raise KeyError(f"object {object_id!r} already in target store")
        spill = bool(target.spill_dir) and not (
            self.spill_dir == target.spill_dir
            and self._path(object_id)
            and os.path.exists(self._path(object_id))
        )
        # The copy must be INDEPENDENT: put() on the source's cached
        # DataFrame object would share one cache entry between the stores,
        # so evict in either would unpersist the other's "sealed" copy.
        # Prefer re-reading the sealed parquet (fresh lineage); for a
        # hot-only object, localCheckpoint materializes an independent
        # physical copy.
        src_path = self._path(object_id)
        if src_path and os.path.exists(src_path):
            copy = self.spark.read.parquet(src_path)
        else:
            copy = df.localCheckpoint(eager=True)
        return target.put(object_id, copy, spill=spill)

    def _notify(self, note: Notification) -> None:
        for sub in self._subscribers:
            sub._q.put(note)

    def broadcast_small(self, object_id: str):
        """Driver-side broadcast of a small sealed object — the Plasma
        'every worker maps the same memory' pattern for dimension tables."""
        pdf = self.get(object_id).toPandas()
        return self.spark.sparkContext.broadcast(pdf)

    def _path(self, object_id: str) -> str | None:
        if not self.spill_dir:
            return None
        return os.path.join(self.spill_dir, f"{object_id}.parquet")
