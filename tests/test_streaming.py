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


def test_session_agg_matches_lag_construction(spark):
    # Includes an exactly-gap-apart pair (u2: 08:00:00 → 08:30:00) to pin
    # the boundary semantics: session_window keeps ts == prev + gap in
    # the SAME session, i.e. the lag construction's strict > test.
    import datetime as dt

    from lab_1806_vec_db_spark.streaming.windows import session_agg, sessionize

    b = dt.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (1, 1, b, 1.0),
        (2, 1, b + dt.timedelta(minutes=10), 2.0),
        (3, 1, b + dt.timedelta(minutes=41), 4.0),   # > 30m gap → new session
        (4, 2, b, 8.0),
        (5, 2, b + dt.timedelta(minutes=30), 16.0),  # == gap → same session
        (6, 2, b + dt.timedelta(minutes=91), 32.0),  # > gap → new session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")

    native = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"])
        for r in session_agg(df).collect()
    }
    lagged = (
        sessionize(df.withColumn("ts_sec", F.col("ts").cast("long")), ts_col="ts_sec",
                   tiebreak_cols=("event_id",))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"),
             F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert len(native) == len(lagged) == 4
    for r in lagged:
        key = (r["user_id"], r["start"].strftime("%Y-%m-%d %H:%M:%S"))
        end, n, s = native[key]
        assert n == r["n"] and s == r["s"]
        assert end == (r["end"] + datetime.timedelta(minutes=30)).strftime("%Y-%m-%d %H:%M:%S")


def test_session_agg_stream_equals_batch(spark, tmp_path):
    # Session windows stream in append mode only (merging state is
    # incompatible with complete); a far-future sentinel event drives the
    # watermark past every real session so all of them finalize.
    import datetime as dt

    from lab_1806_vec_db_spark.streaming.windows import session_agg

    b = dt.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (i, i % 5, b + dt.timedelta(minutes=(3 * i) % 240 + (i % 3)), float(i))
        for i in range(60)
    ]
    rows.append((999, 99, b + dt.timedelta(days=30), 0.0))  # watermark driver
    src = str(tmp_path / "events_sess_src")
    schema = "event_id long, user_id long, ts timestamp, value double"
    spark.createDataFrame(rows, schema).repartition(4).write.mode("overwrite").parquet(src)

    batch_rows = sorted(
        tuple(r) for r in session_agg(spark.read.parquet(src)).collect()
        if r["user_id"] != 99
    )

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        session_agg(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("session_agg_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        tuple(r) for r in spark.sql(
            "SELECT * FROM session_agg_test WHERE user_id != 99"
        ).collect()
    )
    assert stream_rows == batch_rows
    assert len(batch_rows) >= 5


def test_hopping_agg_stream_equals_batch(spark, tmp_path):
    from lab_1806_vec_db_spark.streaming.windows import hopping_agg

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=11 * i), "click" if i % 3 else "view", float(i))
        for i in range(40)
    ]
    src = str(tmp_path / "events_hop_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).repartition(4).write.mode("overwrite").parquet(src)

    batch_rows = sorted(
        tuple(r) for r in hopping_agg(spark.read.parquet(src)).collect()
    )
    # overlap invariant: each event is in window/slide = 2 windows
    n_batch = sum(r[2] for r in batch_rows)
    assert n_batch == 2 * 40

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        hopping_agg(stream, watermark="3 hours")
        .writeStream.format("memory")
        .queryName("hopping_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM hopping_test").collect()
    )
    assert stream_rows == batch_rows


def test_dedup_stream_drops_dupes_across_batches(spark, tmp_path):
    # duplicates arriving in DIFFERENT micro-batches within the horizon
    # must still dedup — that is what the keyed state store provides
    from lab_1806_vec_db_spark.streaming.dedup_stream import dedup_stream

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    src = str(tmp_path / "docs_stream")
    schema = "doc_id long, ts timestamp, text string"
    # file 1: three docs, one internal dup; file 2 (separate micro-batch
    # under maxFilesPerTrigger=1): a dup of doc A + one new doc
    spark.createDataFrame(
        [(0, base, "alpha"), (1, base + datetime.timedelta(minutes=1), "beta"),
         (2, base + datetime.timedelta(minutes=2), "alpha")],
        schema,
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(3, base + datetime.timedelta(minutes=3), "alpha"),
         (4, base + datetime.timedelta(minutes=4), "gamma")],
        schema,
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        dedup_stream(stream, content_col="text", ts_col="ts", horizon="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT text FROM dedup_stream_test").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha", "beta", "gamma"]

    # batch mode: same semantics via plain dropDuplicates
    batch = spark.read.schema(schema).parquet(src + "/f*")
    out = dedup_stream(batch, content_col="text").select("text").collect()
    assert sorted(r["text"] for r in out) == ["alpha", "beta", "gamma"]


def test_streaming_topk_matches_batch_knn(spark, tmp_path):
    """applyInPandasWithState running top-k: after all waves are
    processed, the carried state equals the batch flat-kNN answer over
    the union of the waves; state stays k-bounded throughout."""
    import numpy as np

    from lab_1806_vec_db_spark.operators import knn as knn_ops
    from lab_1806_vec_db_spark.streaming.topk_stream import streaming_topk

    rng = np.random.default_rng(11)
    dim, n, k = 8, 120, 5
    vecs = rng.normal(size=(n, dim)).astype("float32")
    queries = {0: [float(x) for x in vecs[0]], 1: [float(x) for x in vecs[1]]}

    src = str(tmp_path / "vec_stream_src")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "id long, vec array<float>",
    )
    # three files -> maxFilesPerTrigger=1 forces three micro-batches,
    # so the final emission must merge state across batches
    df.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, vec array<float>").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_topk(stream, queries, k=k, metric="l2sqr")

    emissions = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, bid: emissions.append((bid, bdf.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last emission per query is the final running top-k
    final = {}
    for _, rows in emissions:
        for r in rows:
            final.setdefault(r["query_id"], {})
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["dist"]))
        for qid, pairs in by_q.items():
            final[qid] = sorted(pairs, key=lambda t: (t[1], t[0]))

    for qid, qv in queries.items():
        batch = knn_ops.knn(df, qv, k=k, metric="l2sqr", vec_col="vec", id_col="id")
        expect = [(r["id"], r["dist"]) for r in batch.collect()]
        got = [(i, float(np.floor(d * 1e4 + 0.5) / 1e4)) for i, d in final[qid]]
        assert [i for i, _ in got] == [i for i, _ in expect]
        assert got[0][0] == qid and got[0][1] == 0.0  # self-hit at dist 0
        assert len(final[qid]) == k  # state stayed k-bounded


def test_dedup_stream_batch_winner_is_deterministic(spark):
    """Batch mode must keep the FIRST-seen (min event-time) row per
    content key regardless of partitioning — dropDuplicates picks an
    arbitrary row, which broke re-run reproducibility."""
    from lab_1806_vec_db_spark.streaming.dedup_stream import dedup_stream

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (5, base + datetime.timedelta(minutes=9), "alpha"),
        (0, base, "alpha"),
        (3, base + datetime.timedelta(minutes=3), "beta"),
    ]
    schema = "doc_id long, ts timestamp, text string"
    for parts in (1, 4):  # same winner under different partitionings
        df = spark.createDataFrame(rows, schema).repartition(parts)
        out = {r["text"]: r["doc_id"]
               for r in dedup_stream(df, content_col="text", ts_col="ts").collect()}
        assert out == {"alpha": 0, "beta": 3}


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """Stream-static join: a streaming event feed enriched with a
    static dimension (broadcast per micro-batch — Spark re-plans the
    static side under the hood) then rolled up per (window, segment).
    The identical composition on the batch read must match row-for-row
    — the unified-model contract the rest of the streaming suite
    relies on, extended to joins."""
    import datetime

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=11 * i), i % 5, float(i))
        for i in range(40)
    ]
    src = str(tmp_path / "ev_src")
    schema = "event_id long, ts timestamp, user_id long, value double"
    spark.createDataFrame(rows, schema).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    dim = spark.createDataFrame(
        [(u, "vip" if u < 2 else "std") for u in range(5)],
        "user_id long, segment string",
    )

    def pipeline(ev, **wm):
        joined = ev.join(F.broadcast(dim), "user_id")
        return tumbling_agg(joined, keys=("segment",), **wm)

    batch_rows = sorted(tuple(r) for r in pipeline(spark.read.parquet(src)).collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        pipeline(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM enrich_test").collect()
    )
    assert stream_rows == batch_rows
    assert {r[1] for r in batch_rows} == {"vip", "std"}


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Native stream-stream inner join with watermarks and a time-range
    predicate: each purchase joined to the same user's clicks in the
    preceding 30 minutes — Spark buffers both sides in state bounded
    by the watermark + interval. Must equal the identical batch join."""
    import datetime

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    clicks = [
        (i, base + datetime.timedelta(minutes=3 * i), i % 4) for i in range(40)
    ]
    purchases = [
        (100 + i, base + datetime.timedelta(minutes=10 * i), i % 4)
        for i in range(12)
    ]
    cs, ps = str(tmp_path / "clicks"), str(tmp_path / "purch")
    cschema = "click_id long, cts timestamp, user_id long"
    pschema = "purch_id long, pts timestamp, user_id long"
    spark.createDataFrame(clicks, cschema).repartition(2).write.parquet(cs)
    spark.createDataFrame(purchases, pschema).repartition(2).write.parquet(ps)

    def join(c, p):
        return p.join(
            c,
            (p.user_id == c.user_id)
            & (c.cts >= p.pts - F.expr("INTERVAL 30 MINUTES"))
            & (c.cts <= p.pts),
        ).select("purch_id", "click_id")

    batch = sorted(
        tuple(r) for r in join(
            spark.read.parquet(cs), spark.read.parquet(ps)
        ).collect()
    )
    assert len(batch) > 10  # the interval predicate actually matches

    cstream = spark.readStream.schema(cschema).parquet(cs).withWatermark("cts", "1 hour")
    pstream = spark.readStream.schema(pschema).parquet(ps).withWatermark("pts", "1 hour")
    q = (
        join(cstream, pstream)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = sorted(tuple(r) for r in spark.sql("SELECT * FROM ssj_test").collect())
    assert stream == batch


def test_neardup_stream_suppresses_and_matches_batch(spark, tmp_path):
    """Streaming SimHash near-dup: the near-copy of doc 0 is
    suppressed, distinct docs survive, and the stream (one file per
    trigger, event-time order) equals the batch twin."""
    import datetime

    from lab_1806_vec_db_spark.streaming.dedup_stream import neardup_stream

    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    d0 = "the quick brown fox jumps over the lazy dog near the river bank today"
    d1 = d0 + " again"                     # near-dup of d0 (most bands equal)
    d2 = "completely different content about distributed spark query engines and columnar execution"
    waves = [
        [(0, base, d0)],
        [(1, base + datetime.timedelta(minutes=1), d1)],
        [(2, base + datetime.timedelta(minutes=2), d2)],
        # sentinel: pushes the watermark past the earlier windows so
        # append mode finalizes them; its own window stays open and is
        # excluded from the comparison
        [(99, base + datetime.timedelta(hours=3), "sentinel flush doc xyz")],
    ]
    src = str(tmp_path / "nd_src")
    schema = "doc_id long, ts timestamp, text string"
    import os

    os.makedirs(src)
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    batch_rows = sorted(
        tuple(r) for r in neardup_stream(spark.read.parquet(src)).collect()
        if r["doc_id"] != 99
    )
    batch_ids = {r[1] for r in batch_rows}
    assert 0 in batch_ids and 2 in batch_ids and 1 not in batch_ids

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        neardup_stream(stream)
        .writeStream.format("memory")
        .queryName("neardup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM neardup_test").collect()
        if r["doc_id"] != 99
    )
    assert stream_rows == batch_rows
