"""Zero-copy bridges between Arrow record batches and numpy matrices.

The serving hot paths (IVF probe scan, IVF+PQ ADC scan, PQ re-rank)
move fixed-width vector columns (``array<float|double>``) and packed
code columns (``binary``) between the JVM and Python once per Arrow
batch. ``mapInPandas`` materializes those as pandas Series of Python
lists / bytes objects, and the ``np.asarray(series.to_list())``
round-trip costs ~100 ms per 50k×960 batch — measured 500× the cost of
flattening the Arrow buffer in place. These helpers back the
``mapInArrow`` variants of the scans: same bytes, same values, no
per-row materialization.

Contract: vector columns are fixed-width and null-free (SURVEY §1.2 —
the reference's VecSet is a dense rectangle, vec_set.rs:14-30). Ragged
or null input raises instead of silently mis-shaping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(arr: pa.Array, dtype=None) -> np.ndarray:
    """(n, dim) matrix view of a ``list<float|double>`` Arrow column.

    Zero-copy when possible (``flatten`` respects slice offsets; the
    child buffer is handed to numpy in place); the only copy is the
    optional ``dtype`` cast. Raises on nulls (zero_copy_only) and on
    ragged rows (reshape)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=True)
    if flat.size % n:
        raise ValueError(f"ragged vector column: {flat.size} values / {n} rows")
    dim = flat.size // n
    offsets = getattr(arr, "offsets", None)
    if offsets is not None:
        off = offsets.to_numpy(zero_copy_only=True)
        if off.size and not np.all(np.diff(off) == dim):
            raise ValueError("ragged vector column (non-uniform offsets)")
    mat = flat.reshape(n, dim)
    if dtype is not None and mat.dtype != dtype:
        mat = mat.astype(dtype)
    return mat


def binary_matrix(arr: pa.Array) -> np.ndarray:
    """(n, width) uint8 matrix view of a uniform-width ``binary``
    column (packed PQ codes / raw u8 vectors). Zero-copy on the common
    non-sliced path."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.uint8)
    if arr.null_count:
        raise ValueError("null bytes in binary column")
    buffers = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    widths = np.diff(off)
    w = int(widths[0]) if n else 0
    if not np.all(widths == w):
        raise ValueError("non-uniform binary widths")
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    return data[int(off[0]) : int(off[0]) + n * w].reshape(n, w)


def result_batch(schema: pa.Schema, **cols: np.ndarray) -> pa.RecordBatch:
    """RecordBatch from numpy columns, coerced to ``schema``'s field
    types (mapInArrow requires exact type match)."""
    arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


#: shared output schema of every batch-kNN scan stage
def knn_schema(id_col: str) -> pa.Schema:
    return pa.schema([
        pa.field("query_id", pa.int64()),
        pa.field(id_col, pa.int64()),
        pa.field("dist", pa.float64()),
    ])
