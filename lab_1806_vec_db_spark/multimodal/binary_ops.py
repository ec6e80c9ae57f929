"""Multimodal binary-column operators — the plumbing a 100 TB
image/audio/video pipeline needs, with codec steps stubbed.

Design (north-star extension; the reference stores only dense vectors):
- media rows are ``(id LONG, media BINARY, media_type STRING,
  meta MAP<STRING,STRING>)`` — content is an opaque binary column with
  typed metadata, exactly how Parquet/Iceberg lakes store blobs;
- decode / resize / frame-sample / feature-extract run as Arrow-batched
  ``mapInPandas`` operators: bytes stay executor-side, batches amortize
  Python crossing, output schemas are fixed and typed;
- the actual codecs (PIL/ffmpeg/librosa) are NOT in this environment,
  so the codec kernels are stubs: ``decode_media`` raises
  ``NotImplementedError`` unless handed a decoder, and
  ``DETERMINISTIC_FAKE_DECODER`` provides a seeded, content-derived
  fake (byte statistics) so the distributed plumbing is fully testable
  end-to-end. Swapping in a real codec is a one-argument change; the
  Spark plan does not change.

Scale notes: every operator here is map-only (no shuffle); blob
batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
— for multi-MB media, lower it (or pre-split files) so a batch fits
executor memory.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.operators.knn import np_round_half_up

MEDIA_SCHEMA = "id long, media binary, media_type string, meta map<string,string>"

#: Deterministic stand-in for a real image/audio decoder: derives a
#: fixed-length feature block from raw bytes (length, mean, first
#: bytes). Content-deterministic → oracle-checkable. CLEARLY A FAKE:
#: replace with a real codec (e.g. PIL → np.array) in production.
def DETERMINISTIC_FAKE_DECODER(content: bytes) -> np.ndarray:
    buf = np.frombuffer(content, dtype=np.uint8)
    head = np.zeros(8, dtype=np.float64)
    head[: min(8, buf.size)] = buf[:8].astype(np.float64)
    mean = float(buf.mean()) if buf.size else 0.0
    return np.concatenate([[float(buf.size), mean], head])


def media_table(df: DataFrame, content_col: str, id_col: str, media_type: str) -> DataFrame:
    """Normalize any source into the MEDIA_SCHEMA shape."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(content_col).cast("binary").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    media_col: str = "media",
    id_col: str = "id",
    feature_dim: int = 10,
) -> DataFrame:
    """Decode + featurize each blob → ``(id, features ARRAY<DOUBLE>)``.

    ``decoder`` maps raw bytes to a 1-D float array of ``feature_dim``;
    pass a real codec in production. Without one this raises
    ``NotImplementedError`` — use ``DETERMINISTIC_FAKE_DECODER`` for
    plumbing tests.
    """
    if decoder is None:
        raise NotImplementedError(
            "No media codec in this environment: pass decoder= (e.g. a "
            "PIL/ffmpeg-backed callable, or DETERMINISTIC_FAKE_DECODER "
            "for plumbing tests)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                np.asarray(decoder(bytes(b)), dtype=np.float64)[:feature_dim]
                for b in pdf[media_col]
            ]
            feats = [np.pad(f, (0, feature_dim - f.size)) for f in feats]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_col} long, features array<double>"
    )


def frame_sample(
    df: DataFrame,
    every_n_bytes: int,
    frame_bytes: int,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """Deterministic frame sampler: one 'frame' (byte slice) every
    ``every_n_bytes`` — the plumbing shape of video frame extraction
    (real impl: ffmpeg keyframes). Output ``(id, frame_no, frame)``,
    exploded map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[media_col]):
                b = bytes(b)
                for fno, off in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(i)
                    nos.append(fno)
                    frames.append(b[off : off + frame_bytes])
            if ids:
                yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_col} long, frame_no int, frame binary"
    )


def resize_bytes(
    df: DataFrame,
    target_bytes: int,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """Deterministic 'resize': nearest-sample the blob down/up to
    ``target_bytes`` (index i reads source byte ``i*n // target``) —
    the plumbing shape of image resize / audio resample (real impl: a
    codec kernel). Map-only ``mapInPandas``; output
    ``(id, media BINARY)`` keeps the MEDIA_SCHEMA contract so resized
    blobs flow through the same downstream extractors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_media = [], []
            for i, b in zip(pdf[id_col], pdf[media_col]):
                buf = np.frombuffer(bytes(b), dtype=np.uint8)
                if buf.size:
                    idx = np.arange(target_bytes, dtype=np.int64) * buf.size // target_bytes
                    resized = buf[idx].tobytes()
                else:
                    resized = b""
                out_ids.append(i)
                out_media.append(resized)
            yield pd.DataFrame({id_col: out_ids, "media": out_media})

    return df.select(F.col(id_col).alias(id_col), media_col).mapInPandas(
        run, schema=f"{id_col} long, media binary"
    )


def byte_stats(df: DataFrame, media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Per-blob byte statistics ``(id, n_bytes, mean_byte, first_byte)``
    — the decode-free part of the feature extractor, exact and
    SQL-reproducible (used as the multimodal correctness probe)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"id": [], "n_bytes": [], "mean_byte": [], "first_byte": []}
            for i, b in zip(pdf[id_col], pdf[media_col]):
                buf = np.frombuffer(bytes(b), dtype=np.uint8)
                out["id"].append(i)
                out["n_bytes"].append(int(buf.size))
                out["mean_byte"].append(
                    float(np_round_half_up(buf.mean())) if buf.size else 0.0
                )
                out["first_byte"].append(int(buf[0]) if buf.size else -1)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), media_col).mapInPandas(
        run, schema="id long, n_bytes long, mean_byte double, first_byte int"
    )
