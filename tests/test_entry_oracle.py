"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry and its DuckDB ``oracle_sql()`` twin side-by-side,
compare row count, column names, and (order-insensitively) values.

Float columns were rounded by the queries themselves (the determinism
contract), so comparison is exact string equality after sorting.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v + 0.0:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(rows):
    return sorted(tuple(_canon(v) for v in row) for row in rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_correct, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, sf_correct)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = _duck(sf_correct)
    ddf = con.execute(sql)
    dcols = [d[0].lower() for d in ddf.description]
    drows = ddf.fetchall()
    con.close()

    assert scols == dcols, f"{name}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    s, d = _rowset(srows), _rowset(drows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: value mismatch, first diffs: {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "vec_id", "dist"}


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    for k in entry_mod.oracle_sql():
        assert k in qs


def test_driver_window_rotation_invariants():
    """The A/B front blocks must each fill the 50-slot window exactly,
    jointly cover EVERY registry entry (so any two consecutive driver
    rounds check the whole registry), contain no duplicates or unknown
    names, and map odd→A / even→B."""
    from lab_1806_vec_db_spark.plans import entry_queries as eq

    a, b = eq._DRIVER_WINDOW_FRONT_A, eq._DRIVER_WINDOW_FRONT_B
    names = set(eq.QUERIES)
    assert len(a) == len(set(a)) == 50
    assert len(b) == len(set(b)) == 50
    assert set(a) <= names and set(b) <= names
    assert set(a) | set(b) == names
    assert eq.driver_window_front(7) is a and eq.driver_window_front(9) is a
    assert eq.driver_window_front(8) is b and eq.driver_window_front(10) is b
    # the live registry is curated for the UPCOMING round's block
    assert list(eq.QUERIES)[:50] == eq.driver_window_front()


def test_driver_window_schemas_are_canonicalizer_safe(spark):
    """The driver's pandas canonicalizer (sort_values + hash) dies on
    ARRAY/MAP/STRUCT columns — exactly what cost multimodal_features
    and text_hash_embedding their r06 rows. The window rotates between
    blocks A and B (jointly all entries), so EVERY entry must emit
    only scalar columns."""
    from pyspark.sql import types as T

    qs = entry_mod.queries()
    bad = {}
    for name in list(qs):
        df = qs[name](spark, "/root/testdata/sf0.001")
        offenders = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"driver-window entries with non-scalar columns: {bad}"
