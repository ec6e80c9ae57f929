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

_PKG_SHIPPED: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """The harness may hand us a SparkSession whose Python workers
    cannot import this package (PYTHONPATH set after JVM launch, or a
    different cwd). Ship the package source as a zip via addPyFile —
    idempotent per session, harmless when workers could already
    import, and makes every mapInPandas/applyInPandas closure
    resolvable regardless of how the session was built."""
    key = id(spark)
    if key in _PKG_SHIPPED:
        return
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "lab_1806_vec_db_spark")
    zpath = os.path.join(
        tempfile.gettempdir(), f"lab_1806_vec_db_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect sessions without a sparkContext
    _PKG_SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch cosine kNN over
    the embeddings table via the scale-path Arrow scan (per-batch
    partial top-k, k-bounded shuffle, window merge)."""
    _ensure_workers_can_import(spark)
    return QUERIES["knn_batch_cosine"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``.
    Keys absent here (vs queries()) are genuinely non-SQL-expressible
    ops — the driver records the weaker rows-only check for those."""
    return dict(ORACLE)
