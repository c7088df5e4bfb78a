"""Micro-batch pub/sub bridge (SURVEY §2.9 Plasma-notifications row;
reference python/pyarrow/plasma.pyx:615-620 subscribe,
cpp/src/plasma/store.cc:577 push_notification).

In Plasma, consumers subscribe and are pushed a notification each time an
object seals.  The Spark analog of "object sealed" is "micro-batch
committed": this module attaches a ``StreamingQueryListener`` that pushes
one :class:`~apache_arrow_spark.store.Notification` per committed batch
(id = ``<query>/batch-<n>``, size = rows in the batch) and a deletion
notification when the query terminates — the same event stream shape the
store's own ``subscribe`` delivers for sealed objects, so consumers can
multiplex both sources over one ``Subscription`` type.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from apache_arrow_spark.store import Notification, Subscription


class MicroBatchNotifier(StreamingQueryListener):
    """Pushes seal-style notifications for every committed micro-batch."""

    def __init__(self) -> None:
        self._subs: list[Subscription] = []
        self._names: dict[str, str] = {}  # query id -> display name

    def subscribe(self) -> Subscription:
        sub = Subscription()
        self._subs.append(sub)
        return sub

    def unsubscribe(self, sub: Subscription) -> None:
        self._subs.remove(sub)

    # -- StreamingQueryListener callbacks ----------------------------------
    def onQueryStarted(self, event) -> None:
        self._names[str(event.id)] = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        note = Notification(
            object_id=f"{name}/batch-{p.batchId}",
            data_size=int(p.numInputRows),
            deleted=False,
        )
        self._push(note)

    def onQueryTerminated(self, event) -> None:
        name = self._names.pop(str(event.id), str(event.id))
        self._push(Notification(object_id=name, data_size=-1, deleted=True))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def _push(self, note: Notification) -> None:
        for sub in self._subs:
            sub._q.put(note)


def attach_notifier(spark: SparkSession) -> MicroBatchNotifier:
    """Register a MicroBatchNotifier on the session's stream manager;
    detach with ``spark.streams.removeListener(notifier)``."""
    notifier = MicroBatchNotifier()
    spark.streams.addListener(notifier)
    return notifier
