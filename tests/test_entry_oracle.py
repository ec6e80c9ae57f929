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


def test_driver_window_staleness_invariants():
    """The front window must hold exactly 50 known, distinct entries;
    every entry that has never been driver-green must be in it (the
    whole point of staleness ranking); and the live registry must lead
    with it so the driver's first-50 check hits it."""
    from lab_1806_vec_db_spark.plans import entry_queries as eq

    front = eq.driver_window_front()
    names = set(eq.QUERIES)
    assert len(front) == len(set(front)) == eq._DRIVER_WINDOW == 50
    assert set(front) <= names
    last = eq.last_green_rounds()
    never = [k for k in eq._REGISTRATION_ORDER if k not in last]
    missing = [k for k in never if k not in front]
    # an 80-entry registry can always fit its never-green set unless
    # more than 50 entries are brand new, which we never do in one round
    assert len(never) <= 50 and not missing, (
        f"never-driver-green entries outside the window: {missing}"
    )
    # the live registry is curated so the driver's first-50 == front
    assert list(eq.QUERIES)[:50] == front
    assert set(eq._REGISTRATION_ORDER) == names


def test_driver_window_two_round_coverage():
    """Simulate the driver recording the current window green: the
    NEXT window must then contain every entry the current one parked
    past slot 49 — i.e. any two consecutive RECORDED driver rounds
    jointly cover the whole registry (80 ≤ 2×50)."""
    from lab_1806_vec_db_spark.plans import entry_queries as eq

    last = dict(eq.last_green_rounds())
    front_now = eq.rank_by_staleness(eq._REGISTRATION_ORDER, last)[:50]
    simulated_round = max(last.values(), default=0) + 1
    for k in front_now:
        last[k] = simulated_round
    front_next = eq.rank_by_staleness(eq._REGISTRATION_ORDER, last)[:50]
    parked = [k for k in eq._REGISTRATION_ORDER if k not in set(front_now)]
    assert set(parked) <= set(front_next)
    assert set(front_now) | set(front_next) == set(eq._REGISTRATION_ORDER)


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
