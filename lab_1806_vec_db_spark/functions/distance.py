"""Vector distance expression library.

Reference semantics (all citations into /root/reference):
- dot product  Σ aᵢbᵢ                      src/distance/mod.rs:71-78
- norm         sqrt(dot(a,a))               src/distance/mod.rs:46-48
- L2² distance Σ (aᵢ−bᵢ)²  — the reference also uses the cached
  algebraic form ``ip_a + ip_b − 2·ab``     src/distance/mod.rs:51-57
- cosine       1 − ab / max(‖a‖·‖b‖, 1e-10) ∈ [0, 2]
                                            src/distance/mod.rs:60-69
- metric names exactly {"l2sqr", "cosine"}; anything else raises
  ValueError                                src/pyo3/mod.rs:15-31
- f32↔u8 cast: saturating, NaN→0            src/utils/scalar.rs:23-46

All expressions accumulate in DOUBLE (the reference accumulates in f32;
we deliberately widen — at 100 TB a float accumulator drifts, and the
driver's DuckDB oracle computes in double). They are pure Catalyst
column expressions (``zip_with`` + ``aggregate``): whole-stage-codegen
eligible, no Python in the hot path. The batch kNN operators use an
Arrow/numpy path instead (operators/knn.py) — these expressions are the
semantic ground truth and the single-query convenience form.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: metric name → expression builder; the key set is the public contract
#: (ValueError on anything else, matching pyo3/mod.rs:15-22).
DISTANCES = ("l2sqr", "cosine")

_COSINE_FLOOR = 1e-10  # reference floors the norm product: distance/mod.rs:68


def _as_double(col: Column) -> Column:
    return col.cast("double")


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double accumulation (distance/mod.rs:71-78)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column | str) -> Column:
    """sqrt(a·a) (distance/mod.rs:46-48). Materialize this at write time
    as the ``norm`` column — the reference caches it per vector on insert
    (hnsw_index.rs:251-254); for us it is a stored column so cosine search
    never recomputes the base-side norm."""
    return F.sqrt(dot_expr(a, a))


def l2sqr_expr(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ−bᵢ)² (distance/mod.rs:51-57). Direct form."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diff2 = F.zip_with(a, b, lambda x, y: (_as_double(x) - _as_double(y)) ** 2)
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def l2sqr_cached_expr(a: Column | str, b: Column | str, ip_a: Column, ip_b: Column) -> Column:
    """Cached form ``ip_a + ip_b − 2ab`` (distance/mod.rs:55-57): one dot
    product instead of a subtract-square pass when self-dots are stored."""
    return ip_a + ip_b - F.lit(2.0) * dot_expr(a, b)


def cosine_expr(
    a: Column | str,
    b: Column | str,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """1 − a·b / max(‖a‖‖b‖, 1e-10) (distance/mod.rs:60-69).

    Pass ``norm_a`` / ``norm_b`` when the norms are materialized columns
    (the cached-norm form, distance/mod.rs:64-66) to skip recomputation.
    """
    na = norm_a if norm_a is not None else norm_expr(a)
    nb = norm_b if norm_b is not None else norm_expr(b)
    denom = F.greatest(na * nb, F.lit(_COSINE_FLOOR))
    return F.lit(1.0) - dot_expr(a, b) / denom


def dist_expr(
    a: Column | str,
    b: Column | str,
    metric: str = "cosine",
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """Metric dispatch with the reference's exact name set and error
    behavior (pyo3/mod.rs:15-31: ``ValueError`` on unknown name)."""
    if metric == "l2sqr":
        return l2sqr_expr(a, b)
    if metric == "cosine":
        return cosine_expr(a, b, norm_a=norm_a, norm_b=norm_b)
    raise ValueError(f"Invalid distance function: {metric} (expected one of {DISTANCES})")


def calc_dist(a: Sequence[float], b: Sequence[float], dist: str = "cosine") -> float:
    """Driver-side scalar parity API for ``lab_1806_vec_db.calc_dist``
    (pyo3/mod.rs:43-48): plain-Python distance between two vectors."""
    if len(a) != len(b):
        raise ValueError("Dimension mismatch")
    if dist == "l2sqr":
        return float(sum((x - y) ** 2 for x, y in zip(a, b)))
    if dist == "cosine":
        ab = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return float(1.0 - ab / max(na * nb, _COSINE_FLOOR))
    raise ValueError(f"Invalid distance function: {dist} (expected one of {DISTANCES})")


def cast_vec_expr(vec: Column | str, to_type: str) -> Column:
    """Element cast f32↔u8 with the reference's saturating, NaN→0,
    truncate-toward-zero semantics (Rust ``as`` cast, scalar.rs:20-37;
    vec_set.rs:142-149).

    Spark's native cast differs (NaN→NULL-ish behavior on ints, wraps on
    overflow in ANSI-off mode), so the guard is explicit:
    ``trunc(clamp(x, 0, 255))`` with NaN mapped to 0.
    """
    vec = F.col(vec) if isinstance(vec, str) else vec
    if to_type in ("u8", "tinyint-as-int", "uint8"):
        def to_u8(x: Column) -> Column:
            d = x.cast("double")
            clamped = F.least(F.greatest(d, F.lit(0.0)), F.lit(255.0))
            return F.when(F.isnan(d), F.lit(0)).otherwise(F.floor(clamped).cast("int"))
        return F.transform(vec, to_u8)
    if to_type in ("f32", "float32", "float"):
        return F.transform(vec, lambda x: x.cast("float"))
    raise ValueError(f"Unsupported cast target: {to_type} (reference supports f32/u8, scalar.rs:117-119)")


def recall_expr(pred: Column | str, gnd: Column | str) -> Column:
    """|pred ∩ gnd| / |gnd| (candidate_pair.rs:127-140)."""
    pred = F.col(pred) if isinstance(pred, str) else pred
    gnd = F.col(gnd) if isinstance(gnd, str) else gnd
    return F.size(F.array_intersect(pred, gnd)).cast("double") / F.size(gnd).cast("double")
