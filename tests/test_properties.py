"""Property-based tests (hypothesis) for the pure kernels: distance
algebra, cast saturation, PQ packing, heuristic selection, rounding.
These go beyond the reference's own test strategy (SURVEY §5 notes it
has no property tests) — they pin the invariants the oracle relies on.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lab_1806_vec_db_spark.functions.distance import calc_dist
from lab_1806_vec_db_spark.index.kmeans import _pairwise_dist
from lab_1806_vec_db_spark.index.pq import pack_codes, pq_groups, unpack_codes
from lab_1806_vec_db_spark.operators.knn import np_round_half_up

finite = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32)
vec = st.lists(finite, min_size=1, max_size=16)


@given(vec)
@settings(max_examples=50, deadline=None)
def test_calc_dist_identity(v):
    assert calc_dist(v, v, "l2sqr") == 0.0
    # self-cosine is 0 only above the reference's 1e-10 denominator
    # floor (distance/mod.rs:68) — below it the floor dominates and the
    # distance is deliberately nonzero
    if sum(x * x for x in v) > 1e-5:
        assert abs(calc_dist(v, v, "cosine")) < 1e-9


@given(vec, vec)
@settings(max_examples=50, deadline=None)
def test_calc_dist_symmetry_and_bounds(a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    assert calc_dist(a, b, "l2sqr") == calc_dist(b, a, "l2sqr") >= 0.0
    c = calc_dist(a, b, "cosine")
    assert calc_dist(b, a, "cosine") == c
    assert -1e-9 <= c <= 2.0 + 1e-9  # cosine distance range (distance/mod.rs:60-69)


@given(st.integers(min_value=1, max_value=2048), st.integers(min_value=1, max_value=64))
def test_pq_groups_partition_exactly(dim, m):
    m = min(m, dim)
    groups = pq_groups(dim, m)
    assert len(groups) == m
    assert groups[0][0] == 0
    for (s1, l1), (s2, _) in zip(groups, groups[1:]):
        assert s1 + l1 == s2
        assert l1 > 0
    assert sum(l for _, l in groups) == dim
    sizes = [l for _, l in groups]
    assert max(sizes) - min(sizes) <= 1  # div_ceil balance (pq_table.rs:38-53)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=33),
    st.sampled_from([4, 8]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_pack_unpack_roundtrip(n, m, n_bits, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1 << n_bits, (n, m)).astype(np.uint8)
    width = m if n_bits == 8 else (m + 1) // 2
    buf = np.frombuffer(b"".join(pack_codes(codes, n_bits)), dtype=np.uint8).reshape(n, width)
    assert (unpack_codes(buf, m, n_bits) == codes).all()


@given(st.floats(min_value=0, max_value=1e6, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_round_half_up_matches_sql_semantics(x):
    got = float(np_round_half_up(np.asarray([x]))[0])
    # SQL ROUND(x, 4): half away from zero for non-negative inputs
    expect = math.floor(x * 10_000 + 0.5) / 10_000
    assert got == expect
    assert got >= 0.0 and math.copysign(1.0, got) == 1.0  # never -0.0


@given(st.integers(min_value=2, max_value=30), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_pairwise_dist_matches_naive(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 8))
    c = rng.normal(size=(3, 8))
    d = _pairwise_dist(x, c, "l2sqr")
    naive = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assert np.allclose(d, naive, atol=1e-8)
    dc = _pairwise_dist(x, c, "cosine")
    assert (dc >= -1e-9).all() and (dc <= 2.0 + 1e-9).all()


@given(st.floats(min_value=0.01, max_value=1e7, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_cents_rounding_portable_python_vs_duckdb(x):
    """The exact-cents contract (operators/relational.py:cents) relies
    on floor(x*100 + 0.5) evaluating identically on IEEE doubles in
    every engine; cross-check Python's C-double arithmetic against
    DuckDB's for random prices."""
    import duckdb

    py = math.floor(x * 100 + 0.5)
    db = duckdb.sql(
        f"SELECT CAST(floor(CAST({x!r} AS DOUBLE) * 100 + 0.5) AS BIGINT)"
    ).fetchone()[0]
    assert py == db


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), max_size=24))
@settings(max_examples=100, deadline=None)
def test_hash32_portable_python_vs_duckdb(s):
    """The md5-prefix 32-bit hash that keys MinHash/LSH/fingerprints
    must agree across engines for arbitrary token content."""
    import duckdb
    import hashlib

    py = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    db = duckdb.execute(
        "SELECT CAST(('0x' || substr(md5(?),1,8)) AS BIGINT)", [s]
    ).fetchone()[0]
    assert py == db
