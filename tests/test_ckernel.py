"""Compiled-kernel parity gates: the ctypes HNSW kernel must return
exactly what the numpy lockstep kernel returns (same pool semantics,
same (dist, id) tie order, same rounding contract) on every supported
configuration — and fall back cleanly when disabled."""

import numpy as np
import pytest

from lab_1806_vec_db_spark.index import ckernel
from lab_1806_vec_db_spark.index.hnsw import HNSWIndex
from lab_1806_vec_db_spark.index.pq import PQTable

pytestmark = pytest.mark.skipif(
    not ckernel.available(), reason="no C toolchain on this host"
)


@pytest.fixture(scope="module")
def emb(spark):
    from lab_1806_vec_db_spark.session import read_table

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    df.count()
    return df


def _both(idx, qmat, k, ef, adc=None):
    cid, cd = idx._kernel_search(qmat, k, ef, adc=adc)
    ckernel_state = (ckernel._lib, ckernel._tried)
    try:
        ckernel._lib, ckernel._tried = None, True  # force numpy fallback
        nid, nd = idx._kernel_search(qmat, k, ef, adc=adc)
    finally:
        ckernel._lib, ckernel._tried = ckernel_state
    return (cid, cd), (nid, nd)


@pytest.mark.parametrize("metric", ["l2sqr", "cosine"])
def test_exact_parity(emb, metric):
    idx = HNSWIndex.build(emb, metric=metric, vec_col="embedding",
                          id_col="vec_id", m=8, ef_construction=60, seed=11)
    rng = np.random.default_rng(3)
    qmat = rng.normal(size=(40, 64))
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    (cid, cd), (nid, nd) = _both(idx, qmat, 10, 120)
    assert np.array_equal(cid, nid)
    assert np.allclose(cd, nd)


def test_adc_parity(emb):
    idx = HNSWIndex.build(emb, metric="l2sqr", vec_col="embedding",
                          id_col="vec_id", m=8, ef_construction=60, seed=11)
    pq = PQTable.train(emb, dim=64, m=16, n_bits=4, train_proportion=0.5,
                       vec_col="embedding", id_col="vec_id", seed=5)
    pq.codes.count()
    rng = np.random.default_rng(4)
    qmat = rng.normal(size=(25, 64))
    adc = idx.adc_for(pq, qmat)
    (cid, cd), (nid, nd) = _both(idx, qmat, 10, 150, adc=adc)
    assert np.array_equal(cid, nid)
    assert np.allclose(cd, nd)


def test_single_query_and_threaded_match_batch(emb):
    idx = HNSWIndex.build(emb, metric="l2sqr", vec_col="embedding",
                          id_col="vec_id", m=8, ef_construction=60, seed=11)
    rng = np.random.default_rng(5)
    qmat = rng.normal(size=(64, 64))
    bid, bd = idx.search_many(qmat, 10, 100)
    for i in (0, 17, 63):
        sid, sd = idx.search_np(qmat[i], 10, 100)
        assert np.array_equal(sid, bid[i][bid[i] >= 0])
        assert np.allclose(sd, bd[i][bid[i] >= 0])
    tid, td = idx.search_many_parallel(qmat, 10, 100, workers=8)
    assert np.array_equal(tid, bid)
    assert np.allclose(td, bd)


def test_threaded_adc_matches_batch(emb):
    idx = HNSWIndex.build(emb, metric="l2sqr", vec_col="embedding",
                          id_col="vec_id", m=8, ef_construction=60, seed=11)
    pq = PQTable.train(emb, dim=64, m=16, n_bits=4, train_proportion=0.5,
                       vec_col="embedding", id_col="vec_id", seed=5)
    pq.codes.count()
    rng = np.random.default_rng(9)
    qmat = rng.normal(size=(64, 64))
    bid, bd = idx.search_many(qmat, 10, 150, pq=pq)
    tid, td = idx.search_many_parallel(qmat, 10, 150, pq=pq, workers=8)
    assert np.array_equal(tid, bid)
    assert np.allclose(td, bd)


def test_adc_block_matches_numpy_reference():
    # the block-ADC entry point (IVF+PQ scan) must reproduce the numpy
    # lookup-sum bit-for-bit in f64 across shapes, including the m%8
    # tail path of the 8-lane accumulator
    rng = np.random.default_rng(3)
    for m, ksub, n, S in ((320, 16, 37, 5), (22, 16, 64, 3), (7, 256, 11, 2)):
        codes = rng.integers(0, ksub, (n, m)).astype(np.uint8)
        lut = np.ascontiguousarray(rng.normal(size=(S, m, ksub)))
        got = ckernel.adc_block(np.ascontiguousarray(codes), lut)
        want = np.stack([lut[s][np.arange(m), codes].sum(axis=1) for s in range(S)])
        assert np.allclose(got, want, rtol=0, atol=1e-9), (m, ksub)
        # sel indirection picks the same rows
        sel = np.array([S - 1, 0], dtype=np.int64)
        got_sel = ckernel.adc_block(np.ascontiguousarray(codes), lut, sel)
        assert np.array_equal(got_sel, got[sel])
