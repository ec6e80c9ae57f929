"""Binary vector sources/sinks — fvecs and raw little-endian files.

Reference semantics:
- raw bin: a headerless flat sequence of little-endian scalars; dim
  comes from config, optional row ``limit`` (vec_set.rs:166-203,
  scalar.rs:84-105); types are exactly f32 and u8 (scalar.rs:117-119);
- fvecs: ``<dim:u32 LE><f32 × dim>`` repeated (texmex format;
  bin/convert_fvecs.rs:29-48), converted once into the engine's native
  layout;
- TOML config ``{dim, data_type, data_path, limit}`` picks the typed
  reader at runtime (config.rs:29-52, vec_set.rs:241-253).

Spark mapping: files load through ``spark.read.format("binaryFile")``
and are decoded **executor-side** in ``mapInPandas`` — bytes never
land on the driver. One file is one task (the format is not
splittable — it has no sync markers), so parallelism comes from file
count; the FIRST thing a pipeline should do is convert to Parquet
(``convert_fvecs_to_parquet`` / ``convert_raw_bin_to_parquet``, the
S3 converter job) and the bounded decode cost is paid exactly once.
Row ids are per-file ordinals (the reference's positional ids) plus
the source filename for multi-file loads.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:
    import tomllib  # py311+
except ImportError:  # pragma: no cover
    tomllib = None

_DTYPES = {"float32": np.float32, "uint8": np.uint8}
_SPARK_ELEM = {"float32": "float", "uint8": "smallint"}


def read_fvecs(spark: SparkSession, path: str) -> DataFrame:
    """S1/S3 scan: fvecs file(s) → ``(file STRING, id LONG, vec
    ARRAY<FLOAT>)``, decoded executor-side."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                buf = np.frombuffer(content, dtype=np.uint8)
                if buf.size == 0:
                    continue
                dim = int(np.frombuffer(buf[:4], dtype="<u4")[0])
                row_bytes = 4 + 4 * dim
                n = buf.size // row_bytes
                mat = buf[: n * row_bytes].reshape(n, row_bytes)
                dims = mat[:, :4].copy().view("<u4")[:, 0]
                if not (dims == dim).all():
                    raise ValueError(f"Inconsistent dims in fvecs file {fpath}")
                vecs = mat[:, 4:].copy().view("<f4")
                yield pd.DataFrame({
                    "file": os.path.basename(fpath),
                    "id": np.arange(n, dtype=np.int64),
                    "vec": list(vecs),
                })

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(decode, schema="file string, id long, vec array<float>")
    )


def read_raw_bin(
    spark: SparkSession,
    path: str,
    dim: int,
    data_type: str = "float32",
    limit: int | None = None,
) -> DataFrame:
    """S1/S2 scan: headerless flat scalar file → ``(file, id, vec)``
    with the element type chosen at runtime (vec_set.rs:241-253)."""
    if data_type not in _DTYPES:
        raise ValueError(f"Unsupported data_type: {data_type} (f32/u8 only, scalar.rs:117-119)")
    np_t = _DTYPES[data_type]
    elem = _SPARK_ELEM[data_type]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                arr = np.frombuffer(content, dtype=np.dtype(np_t).newbyteorder("<"))
                n = arr.size // dim
                if limit is not None:
                    n = min(n, limit)
                vecs = arr[: n * dim].reshape(n, dim)
                if data_type == "uint8":
                    vecs = vecs.astype(np.int16)  # smallint-safe
                yield pd.DataFrame({
                    "file": os.path.basename(fpath),
                    "id": np.arange(n, dtype=np.int64),
                    "vec": list(vecs),
                })

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(decode, schema=f"file string, id long, vec array<{elem}>")
    )


def load_vecset_config(path: str) -> dict:
    """S2: the reference's TOML ``VecDataConfig`` (config.rs:29-52)."""
    if tomllib is None:
        raise RuntimeError("tomllib unavailable")
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    vec = cfg.get("vec_data", cfg)
    out = {
        "dim": int(vec["dim"]),
        "data_type": {"float32": "float32", "uint8": "uint8", "f32": "float32", "u8": "uint8"}[
            str(vec.get("data_type", "float32")).lower()
        ],
        "data_path": str(vec["data_path"]),
        "limit": vec.get("limit"),
    }
    return out


def read_with_config(spark: SparkSession, config_path: str) -> DataFrame:
    """S2: typed dynamic scan — the runtime f32/u8 dispatch."""
    cfg = load_vecset_config(config_path)
    return read_raw_bin(
        spark, cfg["data_path"], cfg["dim"], cfg["data_type"], cfg.get("limit")
    )


def convert_fvecs_to_parquet(spark: SparkSession, src: str, dst: str) -> int:
    """S3: the one-time converter job (bin/convert_fvecs.rs:20-51) —
    fvecs → Parquet, the engine's native columnar layout. Returns rows
    written."""
    df = read_fvecs(spark, src)
    df.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


def convert_raw_bin_to_parquet(
    spark: SparkSession, src: str, dst: str, dim: int, data_type: str = "float32"
) -> int:
    df = read_raw_bin(spark, src, dim, data_type)
    df.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


_BIN_SINK_MAX_ROWS = 10_000_000


def _check_bin_sink_bound(df: DataFrame, max_rows: int, sink: str) -> int:
    """Format parity demands ONE sequential local file, so these sinks
    are driver-side by construction — the guard (mirroring
    operators/knn.py's knn_batch bound) turns the silent 100×-scale
    driver OOM into an explicit error that points at the scale sink."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{sink}: {n} rows exceeds the single-file sink bound of "
            f"{max_rows} (the format is a sequential local file, assembled "
            "through the driver); write Parquet for datasets at this scale, "
            "or raise max_rows= explicitly if the driver really has the "
            "memory for the ordered stream."
        )
    return n


def write_fvecs(
    df: DataFrame,
    path: str,
    vec_col: str = "vec",
    id_col: str = "id",
    max_rows: int = _BIN_SINK_MAX_ROWS,
) -> int:
    """fvecs sink (driver-side assemble — the format is single-file,
    bounded by design; Parquet is the scale sink, S4). Streams via
    ``toLocalIterator`` so the driver holds one partition at a time,
    and refuses outright past ``max_rows``."""
    _check_bin_sink_bound(df, max_rows, "write_fvecs")
    n = 0
    with open(path, "wb") as f:
        for r in df.select(id_col, vec_col).orderBy(id_col).toLocalIterator():
            v = np.asarray(r[1], dtype="<f4")
            f.write(struct.pack("<I", v.size))
            f.write(v.tobytes())
            n += 1
    return n


def write_raw_bin(
    df: DataFrame,
    path: str,
    data_type: str = "float32",
    vec_col: str = "vec",
    id_col: str = "id",
    max_rows: int = _BIN_SINK_MAX_ROWS,
) -> int:
    """S4: raw binary sink (vec_set.rs:184-192) — flat little-endian
    scalars in id order. Driver-side single file; streamed partition
    by partition with an explicit row bound."""
    if data_type not in _DTYPES:
        raise ValueError(f"Unsupported data_type: {data_type}")
    _check_bin_sink_bound(df, max_rows, "write_raw_bin")
    n = 0
    with open(path, "wb") as f:
        for r in df.select(id_col, vec_col).orderBy(id_col).toLocalIterator():
            f.write(np.asarray(r[1], dtype=np.dtype(_DTYPES[data_type]).newbyteorder("<")).tobytes())
            n += 1
    return n
