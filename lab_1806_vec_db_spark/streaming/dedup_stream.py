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
    atomic = [c for c, t in df.dtypes
              if c != content_col and c != ts_col
              and not t.startswith(("array<", "map<", "struct<"))]
    order += [F.col(c).asc() for c in atomic]
    w = Window.partitionBy(key_col).orderBy(*order) if order else None
    if w is None:
        return out.dropDuplicates([key_col])
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
