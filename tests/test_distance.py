"""Distance expression library vs the reference's hand-computed oracle
values (src/distance/mod.rs:136-150) and numpy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.functions import (
    calc_dist,
    cast_vec_expr,
    cosine_expr,
    dist_expr,
    dot_expr,
    l2sqr_expr,
    norm_expr,
    recall_expr,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _pair_df(spark, a, b):
    return spark.createDataFrame(
        [([float(x) for x in a], [float(y) for y in b])], "a array<float>, b array<float>"
    )


def test_l2sqr_reference_value(spark):
    # distance/mod.rs:136-142 — l2sqr([0,1,2,3],[3,4,5,6]) within the
    # reference test's hand-computed expectation 36.0 (4 diffs of 3²)
    df = _pair_df(spark, [0, 1, 2, 3], [3, 4, 5, 6])
    got = df.select(l2sqr_expr("a", "b").alias("d")).first()["d"]
    assert got == pytest.approx(36.0, abs=1e-6)


def test_cosine_reference_value(spark):
    # distance/mod.rs:144-150 — cosine of parallel vectors is 0.0
    df = _pair_df(spark, [1, 2, 3], [2, 4, 6])
    got = df.select(cosine_expr("a", "b").alias("d")).first()["d"]
    assert got == pytest.approx(0.0, abs=1e-6)


def test_cosine_floor_on_zero_vector(spark):
    # distance/mod.rs:68 — norm product floored at 1e-10, so the zero
    # vector yields exactly 1.0 (dot = 0), never NaN
    df = _pair_df(spark, [0, 0], [1, 1])
    got = df.select(cosine_expr("a", "b").alias("d")).first()["d"]
    assert got == pytest.approx(1.0, abs=1e-9)


def test_against_numpy_random(spark):
    rng = np.random.default_rng(42)
    a = rng.normal(size=64)
    b = rng.normal(size=64)
    df = _pair_df(spark, a, b)
    row = df.select(
        dot_expr("a", "b").alias("dot"),
        l2sqr_expr("a", "b").alias("l2"),
        cosine_expr("a", "b").alias("cos"),
        norm_expr("a").alias("na"),
    ).first()
    af, bf = a.astype(np.float32).astype(np.float64), b.astype(np.float32).astype(np.float64)
    assert row["dot"] == pytest.approx(float(af @ bf), rel=1e-9)
    assert row["l2"] == pytest.approx(float(((af - bf) ** 2).sum()), rel=1e-9)
    assert row["cos"] == pytest.approx(
        1.0 - float(af @ bf) / max(float(np.linalg.norm(af) * np.linalg.norm(bf)), 1e-10),
        rel=1e-9,
    )
    assert row["na"] == pytest.approx(float(np.linalg.norm(af)), rel=1e-9)


def test_dist_expr_bad_metric_raises():
    with pytest.raises(ValueError, match="Invalid distance function"):
        dist_expr("a", "b", "euclid")


def test_calc_dist_parity():
    # pyo3/mod.rs:43-48 surface
    assert calc_dist([0, 1, 2, 3], [3, 4, 5, 6], "l2sqr") == pytest.approx(36.0)
    assert calc_dist([1, 2, 3], [2, 4, 6], "cosine") == pytest.approx(0.0, abs=1e-12)
    assert calc_dist([0, 0], [1, 1], "cosine") == pytest.approx(1.0)
    with pytest.raises(ValueError):
        calc_dist([1], [1], "dotprod")
    with pytest.raises(ValueError):
        calc_dist([1, 2], [1], "l2sqr")


def test_cast_u8_saturating_nan_to_zero(spark):
    # scalar.rs:20-37: Rust `as u8` — truncate toward zero, saturate to
    # [0,255], NaN→0
    df = spark.createDataFrame(
        [([-5.0, 0.2, 254.6, 300.0, float("nan")],)], "a array<float>"
    )
    got = df.select(cast_vec_expr("a", "u8").alias("v")).first()["v"]
    assert got == [0, 0, 254, 255, 0]


def test_recall_expr(spark):
    df = spark.createDataFrame([([1, 2, 3, 4], [2, 3, 9, 10])], "pred array<int>, gnd array<int>")
    got = df.select(recall_expr("pred", "gnd").alias("r")).first()["r"]
    assert got == pytest.approx(0.5)


def test_norm_is_codegen_expression(spark):
    # guard: the expression library must stay JVM-side (no PythonUDF nodes)
    df = _pair_df(spark, [1, 2], [3, 4]).select(dist_expr("a", "b", "l2sqr").alias("d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
