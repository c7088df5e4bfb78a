"""Micro-batch pub/sub bridge (SURVEY §2.9 Plasma-notifications row)."""

import pyspark.sql.functions as F

from apache_arrow_spark.streaming.notifications import attach_notifier


def test_microbatch_notifications(spark, tmp_path):
    notifier = attach_notifier(spark)
    sub = notifier.subscribe()
    try:
        # small file-drop stream -> availableNow run
        src = str(tmp_path / "src")
        spark.range(100).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        ).write.parquet(src)
        stream = (
            spark.readStream.schema("id long, k long")
            .parquet(src)
            .groupBy("k")
            .count()
        )
        from apache_arrow_spark.streaming.ops import run_to_memory_sink

        result = run_to_memory_sink(stream, spark, output_mode="complete")
        assert result.count() == 5

        # seal-style notification for the committed batch, then the
        # termination (deletion-style) event
        notes = [sub.get_notification(timeout=30)]
        while not notes[-1].deleted:
            notes.append(sub.get_notification(timeout=30))
        batch_notes = [n for n in notes if not n.deleted]
        assert batch_notes, "no micro-batch notification received"
        assert any(n.data_size == 100 for n in batch_notes)
        assert all("/batch-" in n.object_id for n in batch_notes)
        assert notes[-1].deleted and notes[-1].data_size == -1
    finally:
        notifier.unsubscribe(sub)
        spark.streams.removeListener(notifier)
