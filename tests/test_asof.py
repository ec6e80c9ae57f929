"""as-of join semantics: <=/tolerance/tie rules, unmatched rows, and
the one-shuffle plan shape."""

from __future__ import annotations

import contextlib
import io

import pytest

from lab_1806_vec_db_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "l0"), (1, 20, "l1"), (1, 4, "l2"), (2, 50, "l3")],
        "k bigint, ts bigint, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 200), (1, 15, 300), (3, 1, 999)],
        "k bigint, ts bigint, payload bigint",
    )
    return left, right


def test_asof_matches_latest_leq(frames):
    left, right = frames
    out = {r["lbl"]: r for r in asof_join(
        left, right, key_cols=("k",), ts_col="ts", right_payload=("payload",)
    ).collect()}
    assert out["l0"]["payload"] == 200 and out["l0"]["matched_ts"] == 10  # equal ts matches
    assert out["l1"]["payload"] == 300 and out["l1"]["matched_ts"] == 15
    assert out["l2"]["payload"] is None                                   # earliest right ts is 5 > 4
    assert out["l3"]["payload"] is None                                   # key 2 has no right rows


def test_asof_leq_not_lt(spark):
    # ts=4 has only right ts=5 which is NOT <= 4 → no match
    left = spark.createDataFrame([(1, 4, "x")], "k bigint, ts bigint, lbl string")
    right = spark.createDataFrame([(1, 5, 7)], "k bigint, ts bigint, payload bigint")
    row = asof_join(left, right, ("k",), "ts", ("payload",)).collect()[0]
    assert row["payload"] is None and row["matched_ts"] is None


def test_asof_tolerance(frames):
    left, right = frames
    out = {r["lbl"]: r for r in asof_join(
        left, right, key_cols=("k",), ts_col="ts",
        right_payload=("payload",), tolerance=3,
    ).collect()}
    assert out["l0"]["payload"] == 200      # gap 0 <= 3
    assert out["l1"]["payload"] is None     # gap 5 > 3 → nulled out
    assert out["l1"]["matched_ts"] is None


def test_asof_right_tiebreak(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k bigint, ts bigint, lbl string")
    right = spark.createDataFrame(
        [(1, 10, 1, 111), (1, 10, 2, 222)], "k bigint, ts bigint, seq bigint, payload bigint"
    )
    row = asof_join(
        left, right, ("k",), "ts", ("payload",), right_order="seq"
    ).collect()[0]
    assert row["payload"] == 222   # largest right_order wins at equal (k, ts)


def test_asof_single_shuffle_plan(frames):
    left, right = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, ("k",), "ts", ("payload",)).explain("formatted")
    plan = buf.getvalue()
    # union + ONE window exchange on the key; no join operator at all
    assert plan.count("+- Exchange") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("seed", [0, 7, 21])
def test_asof_matches_bruteforce_random(spark, seed):
    """Randomized cross-check: asof_join == per-row brute-force max
    over eligible right rows (keys with duplicates, ties, gaps, and
    keys present on only one side)."""
    import random

    rng = random.Random(seed)
    lrows = [(rng.randrange(4), rng.randrange(30), i) for i in range(60)]
    rrows = [(rng.randrange(5), rng.randrange(30), 1000 + i) for i in range(40)]
    # unique (k, ts) on the right — the documented well-defined regime
    seen, runiq = set(), []
    for k, ts, p in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            runiq.append((k, ts, p))
    left = spark.createDataFrame(lrows, "k bigint, ts bigint, lid bigint")
    right = spark.createDataFrame(runiq, "k bigint, ts bigint, payload bigint")
    got = {
        r["lid"]: (r["matched_ts"], r["payload"])
        for r in asof_join(left, right, ("k",), "ts", ("payload",)).collect()
    }
    for k, ts, lid in lrows:
        elig = [(rts, p) for rk, rts, p in runiq if rk == k and rts <= ts]
        want = max(elig) if elig else (None, None)
        assert got[lid] == want, (seed, k, ts, lid, got[lid], want)


def test_asof_rejects_column_clash(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("payload", "lbl"),
                  ("k",), "ts", ("lbl",))
    with pytest.raises(ValueError, match="lacks"):
        asof_join(left, right.withColumnRenamed("ts", "when"),
                  ("k",), "ts", ("payload",))


def test_asof_null_payload_not_skipped(spark):
    """A NULL payload in the MATCHING right row must surface as NULL —
    not be replaced by a stale value from an older right row (DuckDB's
    native ASOF JOIN semantics)."""
    left = spark.createDataFrame([(1, 10, "x")], "k bigint, ts bigint, lbl string")
    right = spark.createDataFrame(
        [(1, 1, 10), (1, 5, None)], "k bigint, ts bigint, payload bigint"
    )
    row = asof_join(left, right, ("k",), "ts", ("payload",)).collect()[0]
    assert row["matched_ts"] == 5 and row["payload"] is None
