"""Structured Streaming dual-mode proof: the tumbling-window rollup
produces identical results via readStream (availableNow) and batch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lab_1806_vec_db_spark.streaming.windows import tumbling_agg


def test_tumbling_agg_stream_equals_batch(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=7 * i), "click" if i % 2 else "view", float(i))
        for i in range(40)
    ]
    src = str(tmp_path / "events_src")
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    df.repartition(4).write.mode("overwrite").parquet(src)

    batch_rows = sorted(
        tuple(r) for r in tumbling_agg(spark.read.parquet(src)).collect()
    )

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    agg = tumbling_agg(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM tumbling_test").collect()
    )
    assert stream_rows == batch_rows
    assert len(batch_rows) > 2


def test_tumbling_agg_append_mode_evicts_state(spark, tmp_path):
    # append mode REQUIRES the aggregation state to be evictable: Spark
    # rejects a streaming agg whose grouping it cannot bound with the
    # watermark. This passing is the proof that the streaming grouping
    # is a real time-window (F.window), not an opaque date_trunc.
    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=30 * i), "click", float(i))
        for i in range(12)
    ]
    src = str(tmp_path / "events_append_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        tumbling_agg(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("tumbling_append_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM tumbling_append_test").collect()
    # finalized windows only: everything below the final watermark
    # (max event time - 1h) is emitted; the last open window is held back
    assert 1 <= len(out) < 7
    assert all(r["n_events"] == 2 for r in out)
