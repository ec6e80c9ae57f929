"""Streaming exact dedup — the online form of the batch dedup family
(operators/dedup.py), for ingest pipelines that must drop repeated
documents as they arrive rather than in a nightly batch job.

Dual-mode like the window rollups: on a batch DataFrame this is a plain
``dropDuplicates`` on the content key; on ``readStream`` it uses
``dropDuplicatesWithinWatermark``, whose state store keeps one entry per
key and — unlike streaming ``dropDuplicates`` — EVICTS keys once the
watermark passes them, so state is bounded by the dedup horizon instead
of growing with the corpus. A near-dup variant would key on the SimHash
band signature (functions/text.py / operators/dedup.py) instead of the
exact hash; the plumbing is identical.

Scale: one shuffle on the content hash (the state-store partitioning
key); each event crosses the wire once, the state store holds
``|distinct keys within horizon|`` entries per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    df: DataFrame,
    content_col: str = "text",
    ts_col: str | None = None,
    horizon: str = "1 hour",
    key_col: str = "content_hash",
) -> DataFrame:
    """Keep the first-seen row per exact content hash.

    ``horizon`` (streaming only) bounds how long a key is remembered:
    a duplicate arriving within the horizon of the original is dropped;
    after the watermark passes, the key's state is evicted and a later
    recurrence is treated as new — the bounded-state contract every
    unbounded ingest pipeline needs.
    """
    if key_col in df.columns:
        raise ValueError(
            f"dedup_stream: input already has a '{key_col}' column — "
            "pass a different key_col instead of silently overwriting it"
        )
    out = df.withColumn(key_col, F.md5(F.col(content_col)))
    if out.isStreaming:
        if ts_col is None:
            raise ValueError("streaming dedup needs an event-time column for the watermark")
        out = out.withWatermark(ts_col, horizon)
        return out.dropDuplicatesWithinWatermark([key_col])
    # batch mode: deterministic winner per key — dropDuplicates keeps an
    # ARBITRARY row (partitioning-dependent), which breaks re-run
    # reproducibility; rank by event time (when given) with the full
    # row as tiebreak, the min-id shape of operators/dedup.exact_dedup
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] if ts_col is not None else []
    # orderable tiebreak columns: atomics AND arrays of atomics
    # (Spark orders them lexicographically); only maps and structs —
    # and arrays of them — are excluded, and if the tie survives those
    # the rows are identical in every orderable column anyway
    def _orderable(t: str) -> bool:
        if t.startswith(("map<", "struct<")):
            return False
        if t.startswith("array<"):
            return not t[len("array<"):].startswith(("map<", "struct<", "array<"))
        return True

    atomic = [c for c, t in df.dtypes
              if c != content_col and c != ts_col and _orderable(t)]
    order += [F.col(c).asc() for c in atomic]
    w = Window.partitionBy(key_col).orderBy(*order) if order else None
    if w is None:
        return out.dropDuplicates([key_col])
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def neardup_stream(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    horizon: str = "1 hour",
    band_bits: int = 8,
    window: str = "10 minutes",
) -> DataFrame:
    """Streaming NEAR-dup screen — the online form of the banded
    SimHash path (operators/dedup.py:simhash_near_pairs): a document
    is emitted as unique iff EVERY band of its 32-bit SimHash is
    unseen within the horizon; sharing any band with a recent doc
    (hamming distance < #bands) marks it a near-dup and it is
    suppressed.

    Streaming plan (two watermark-friendly stateful ops, a pipeline
    Spark ≥3.5 supports): map-only ``simhash32`` fingerprint (no
    aggregation — streaming-safe) → band explode → per-(band, value)
    ``dropDuplicatesWithinWatermark`` (state = one entry per live band
    key, evicted past the horizon) → tumbling-window count per doc →
    keep docs whose surviving-band count equals the band total.
    Emits (window_start, id, simhash) in append mode once the
    watermark closes the window.

    Batch twin (same columns): a doc is unique iff it is the FIRST
    (by event time, id) holder of every one of its band values —
    deterministic, and equal to the stream when arrivals respect
    event-time order within the horizon.

    Same-microbatch caveat: when two near-dups land in one trigger,
    exactly one is suppressed but WHICH follows arrival order inside
    the batch; feed order-sensitive tests one file per trigger.
    """
    from lab_1806_vec_db_spark.operators.dedup import (
        simhash32_from_hashes,
        token_hashes,
    )

    if band_bits <= 0 or 32 % band_bits:
        raise ValueError(
            f"band_bits must divide 32 (got {band_bits}) — otherwise "
            "high simhash bits silently never participate in a band"
        )
    n_bands = 32 // band_bits
    mask = (1 << band_bits) - 1
    # Two projections on purpose: the token-hash array (1 md5/token) is
    # a non-cheap multi-consumer alias, so Catalyst keeps it un-inlined
    # and the 32 bit-aggregates read it instead of re-hashing the text
    # 32x per row. Still map-only — streaming-safe.
    sig = df.select(
        F.col(id_col), F.col(ts_col),
        token_hashes(F.col(text_col)).alias("__th"),
    ).select(
        id_col, ts_col, simhash32_from_hashes(F.col("__th")).alias("simhash")
    )
    banded = sig.select(
        id_col, ts_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask)).alias("band_val"),
            )
            for b in range(n_bands)
        ])).alias("bb"),
    ).select(id_col, ts_col, "simhash", "bb.band_id", "bb.band_val")

    if df.isStreaming:
        first_bands = (
            banded.withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["band_id", "band_val"])
        )
        counted = (
            first_bands.groupBy(
                F.window(F.col(ts_col), window).alias("__w"),
                F.col(id_col),
                F.col("simhash"),
            )
            .agg(F.count("*").alias("__n_new"))
        )
        return counted.filter(F.col("__n_new") == n_bands).select(
            F.date_format(F.col("__w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            id_col, "simhash",
        )

    # batch twin: first (ts, id) holder per band value
    from pyspark.sql import Window as W

    w = W.partitionBy("band_id", "band_val").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    flagged = banded.withColumn("__rn", F.row_number().over(w))
    per_doc = (
        flagged.groupBy(id_col, ts_col, "simhash")
        .agg(F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias("__n_new"))
    )
    # the SAME F.window the streaming branch groups by — any window
    # string stays batch/stream consistent (no hand-rolled epoch math)
    return per_doc.filter(F.col("__n_new") == n_bands).select(
        F.date_format(
            F.window(F.col(ts_col), window)["start"], "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start"),
        id_col, "simhash",
    )
