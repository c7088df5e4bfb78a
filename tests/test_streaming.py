"""Streaming (SURVEY §2.9): IPC file-drop source, windowed aggregations,
batch-equivalence of streaming results."""

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.io import write_ipc
from apache_arrow_spark.streaming import (
    read_ipc_stream,
    replay_table_stream,
    run_to_memory_sink,
    session_windows,
    tumbling_window_counts,
)
from apache_arrow_spark.streaming.ops import with_event_time


@pytest.fixture()
def events(spark, sf_dir):
    from apache_arrow_spark.session import load_table

    return load_table(spark, sf_dir, "events")


def test_ipc_stream_source_matches_batch(spark, sf_dir, tmp_path, events):
    """Drop lineitem as IPC shards, stream them back, counts must match."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    drop_dir = str(tmp_path / "drop")
    write_ipc(li.repartition(3), drop_dir, format="stream")

    stream = read_ipc_stream(spark, drop_dir, li.schema)
    agg = stream.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    got = run_to_memory_sink(agg, spark, output_mode="complete")
    expect = {r["l_returnflag"]: r["count"] for r in li.groupBy("l_returnflag").count().collect()}
    assert {r["l_returnflag"]: r["n"] for r in got.collect()} == expect


def test_replay_events_tumbling_window_matches_batch(spark, sf_dir, events):
    stream = with_event_time(replay_table_stream(spark, sf_dir, "events"))
    windowed = tumbling_window_counts(stream, window="1 hour", watermark="2 hours")
    got = run_to_memory_sink(windowed, spark, output_mode="complete")

    batch = with_event_time(events)
    expect = (
        batch.groupBy(F.date_trunc("hour", "event_time").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    e = {(str(r["window_start"]), r["event_type"]): r["n"] for r in expect.collect()}
    g = {(str(r["window_start"]), r["event_type"]): r["n"] for r in got.collect()}
    assert g == e


def test_session_windows(spark, sf_dir):
    stream = with_event_time(replay_table_stream(spark, sf_dir, "events"))
    sess = session_windows(stream, gap="10 minutes")
    got = run_to_memory_sink(sess, spark, output_mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    # sessions are per-user, non-overlapping, end >= start
    for r in rows[:20]:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_stateful_running_totals_across_microbatches(spark, tmp_path):
    """applyInPandasWithState carries totals across micro-batches:
    two files + maxFilesPerTrigger=1 -> two batches -> second batch's
    totals include the first's."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    d1 = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], "user_id bigint, value double")
    d2 = spark.createDataFrame([(1, 2.0), (2, 3.0)], "user_id bigint, value double")
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    out = running_totals(stream)
    import uuid

    name = f"state_sink_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # one row per (key, batch-with-data); 2 batches x up to 2 keys
    per_key_final = {}
    for r in sorted(rows, key=lambda r: r["total_events"]):
        per_key_final[r["key"]] = (r["total_events"], r["total_value"])
    assert per_key_final[1][0] == 3 and abs(per_key_final[1][1] - 17.0) < 1e-9
    assert per_key_final[2][0] == 2 and abs(per_key_final[2][1] - 4.0) < 1e-9
    # state actually crossed batches: some key emitted twice
    from collections import Counter

    key_counts = Counter(r["key"] for r in rows)
    assert max(key_counts.values()) == 2


def test_streaming_dedup_restores_exactly_once(spark, sf_dir):
    import pyspark.sql.functions as F

    from apache_arrow_spark.streaming import (
        replay_table_stream,
        run_to_memory_sink,
        streaming_dedup,
    )
    from apache_arrow_spark.streaming.ops import with_event_time

    base = with_event_time(replay_table_stream(spark, sf_dir, "events"))
    doubled = base.unionByName(base)  # every event delivered twice
    got = run_to_memory_sink(
        streaming_dedup(doubled, ["event_id"]), spark, output_mode="append"
    )
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_time_bounded_join_matches_batch(spark, sf_dir):
    import pyspark.sql.functions as F

    from apache_arrow_spark.streaming import (
        replay_table_stream,
        run_to_memory_sink,
        time_bounded_join,
    )
    from apache_arrow_spark.streaming.ops import with_event_time

    clicks = with_event_time(replay_table_stream(spark, sf_dir, "events")).filter(
        F.col("event_type") == "click"
    )
    purchases = with_event_time(replay_table_stream(spark, sf_dir, "events")).filter(
        F.col("event_type") == "purchase"
    )
    got = run_to_memory_sink(
        time_bounded_join(clicks, purchases, "user_id", upper="30 minutes"),
        spark,
        output_mode="append",
    ).select("l_event_id", "r_event_id")
    b = with_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("event_type") == "click")
    ).select(F.col("event_id").alias("l_event_id"), F.col("user_id").alias("u"), F.col("event_time").alias("lt"))
    p = with_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("event_type") == "purchase")
    ).select(F.col("event_id").alias("r_event_id"), F.col("user_id").alias("u"), F.col("event_time").alias("rt"))
    expect = b.join(p, "u").filter(
        (F.col("rt") >= F.col("lt"))
        & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 30 minutes"))
    ).select("l_event_id", "r_event_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_foreachbatch_sink_idempotent_replay(spark, sf_dir, tmp_path):
    """Re-running with the SAME checkpoint must not duplicate landed rows
    (batchId-keyed overwrite restores exactly-once over at-least-once
    foreachBatch)."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.streaming import (
        replay_table_stream,
        run_foreachbatch_parquet_sink,
    )

    out = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    stream = replay_table_stream(spark, sf_dir, "events").select("event_id")
    run_foreachbatch_parquet_sink(stream, out, ckpt)
    n1 = spark.read.parquet(out).count()
    # replay: availableNow with a caught-up checkpoint lands nothing new,
    # and any re-delivered batch overwrites its own directory
    run_foreachbatch_parquet_sink(stream, out, ckpt)
    n2 = spark.read.parquet(out).count()
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n1 == n2 == expected


def test_streaming_lsh_index_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.similarity import (
        hyperplanes,
        lsh_bucket,
        streaming_lsh_index_upsert,
    )

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") * (j + 1) % 7 - 3).cast("float") for j in range(8)]
        ).alias("embedding"),
    )
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_lsh_index_upsert(
        stream, str(tmp_path / "idx"), str(tmp_path / "ckpt"), dim=8, planes=6
    )
    landed = spark.read.parquet(str(tmp_path / "idx"))
    assert landed.count() == 40
    hp = hyperplanes(8, 6)
    batch = emb.withColumn("__bucket", lsh_bucket(F.col("embedding"), hp))
    got = {r["vec_id"]: r["__bucket"] for r in landed.collect()}
    want = {r["vec_id"]: r["__bucket"] for r in batch.collect()}
    assert got == want
