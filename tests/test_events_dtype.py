"""Guard against driver testdata type drift on the events table.

The driver's ``events.parquet`` has shipped ``ts`` as parquet
TIMESTAMP(NANOS) (read as epoch-nanos BIGINT under ``nanosAsLong``),
as TIMESTAMP, and as TIMESTAMP_NTZ across rounds — the round-4
``events_sessionize`` regression was exactly such a flip. Every
events-reading registry entry must therefore be dtype-agnostic: this
test materializes the same instants under all three typings and
asserts each entry returns byte-identical results on every fixture.
"""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from lab_1806_vec_db_spark.session import read_table

EVENTS_ENTRIES = [
    "events_tumbling_agg",
    "events_hopping_agg",
    "events_sessionize",
    "events_session_agg",
]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v + 0.0:.6f}"
    return str(v)


def _rowset(df):
    return sorted(tuple(_canon(v) for v in row) for row in df.collect())


@pytest.fixture(scope="module")
def fixture_dirs(spark, sf_smoke, tmp_path_factory):
    """Three sibling dirs whose events.parquet encode the same instants
    as (a) TIMESTAMP, (b) TIMESTAMP_NTZ, (c) epoch-nanos BIGINT."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = read_table(spark, sf_smoke, "events")
    base = tmp_path_factory.mktemp("events_dtype")
    ts_as = {
        "tstz": F.col("ts").cast("timestamp"),
        "ntz": F.col("ts").cast("timestamp").cast("timestamp_ntz"),
        "nanos": (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).cast("long"),
    }
    dirs = {}
    for label, expr in ts_as.items():
        out = base / label
        tmp = str(out / "_stage")
        ev.withColumn("ts", expr).coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), str(out / "events.parquet"))
        shutil.rmtree(tmp)
        dirs[label] = str(out)
    return dirs


@pytest.mark.parametrize("name", EVENTS_ENTRIES)
def test_events_entries_are_ts_dtype_agnostic(spark, name, fixture_dirs):
    q = entry_mod.queries()[name]
    results = {label: _rowset(q(spark, d)) for label, d in fixture_dirs.items()}
    ref = results["tstz"]
    assert ref, f"{name}: empty result"
    for label, rows in results.items():
        assert rows == ref, f"{name}: {label} fixture diverges from tstz"


def test_fixture_dtypes_actually_differ(spark, fixture_dirs):
    """The guard is only meaningful if the three fixtures really read
    back with three distinct ts dtypes."""
    seen = {}
    for label, d in fixture_dirs.items():
        seen[label] = dict(read_table(spark, d, "events").dtypes)["ts"]
    assert seen["nanos"] == "bigint"
    assert seen["tstz"] != seen["ntz"] or seen["tstz"] == "timestamp"
    assert len(set(seen.values())) >= 2


def test_floor_div_exact_at_bigint_extremes(spark):
    """_floor_div must agree with Python's exact // for ALL bigint
    inputs — including magnitudes past 2^53·d where a double-division
    implementation floors off by one (nanos beyond ~2116)."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.events import _floor_div

    d = 1_000_000_000
    vals = [-(2**62) + 7, -(2**61) - 12345, -d, -1, 0, 1, d - 1, d,
            2**61 + 12345, 2**62 - 1, 2**63 - 1, -(2**63) + d]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    out = {r["x"]: r["q"] for r in
           df.select("x", _floor_div(F.col("x"), d).alias("q")).collect()}
    for v in vals:
        assert out[v] == v // d, v
