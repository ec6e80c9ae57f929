"""Scalar / expression library: vector distances, stable hashing, text
analysis. Everything here returns Spark ``Column`` expressions (JVM-side,
codegen-eligible) unless the name says ``_udf``.
"""

from lab_1806_vec_db_spark.functions.distance import (
    DISTANCES,
    calc_dist,
    cast_vec_expr,
    cosine_expr,
    dist_expr,
    dot_expr,
    l2sqr_expr,
    norm_expr,
    recall_expr,
)

__all__ = [
    "DISTANCES",
    "calc_dist",
    "cast_vec_expr",
    "cosine_expr",
    "dist_expr",
    "dot_expr",
    "l2sqr_expr",
    "norm_expr",
    "recall_expr",
]
