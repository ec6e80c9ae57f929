"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``lab_1806_vec_db_spark/plans/entry_queries.py`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_1806_vec_db_spark.plans.entry_queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch cosine kNN over
    the embeddings table via the scale-path Arrow scan (per-batch
    partial top-k, k-bounded shuffle, window merge)."""
    return QUERIES["knn_batch_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``.
    Keys absent here (vs queries()) are genuinely non-SQL-expressible
    ops — the driver records the weaker rows-only check for those."""
    return dict(ORACLE)
