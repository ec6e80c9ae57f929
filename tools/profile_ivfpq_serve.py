"""Wave-split profile of the distributed IVF+PQ two-pass serve at
1M/960-dim (VERDICT r11 item 1 follow-up): where does the
distributed-vs-local-mirror delta actually go?

Times, on the cached fixture + pinned codes frame (same setup as
tools/bench_1m_ivf_ab.py):
  approx  — the pruned ADC scan emitting per-task top-ef (wave A's
            compute + JVM→Python Arrow ship, no shuffle consumer);
  cand    — approx + the global ADC gate (adds the tasks×|Q|×ef
            exchange + window) = everything before the re-rank;
  full    — the complete two-pass search (adds the broadcast-build of
            cand, the re-rank join shipping candidate vectors to
            Python, and the final top-k window);
  local   — the driver-mirror twin (identical probes/gates/re-rank,
            zero Spark jobs) as the compute floor.

Usage: python tools/profile_ivfpq_serve.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from lab_1806_vec_db_spark import get_spark  # noqa: E402

N = 1_000_000
DIM = 960
K = 10
RUNS = 3
GT_DIR = os.environ.get("BENCH_GT_DIR", "/tmp/spark_graft_gt")
FIXTURE = os.path.join(GT_DIR, f"matched_base_{N}_v4.parquet")
GIST_TEST = "/root/reference/data/gist_test.bin"


def _timed(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    assert os.path.exists(FIXTURE), f"fixture missing: {FIXTURE}"
    from lab_1806_vec_db_spark.index.ivfpq import IVFPQIndex

    spark = get_spark("profile_ivfpq_serve", cpus=32)
    queries = np.fromfile(GIST_TEST, dtype=np.float32).reshape(-1, DIM).astype(np.float64)
    n_q = queries.shape[0]
    bdf = spark.read.parquet(FIXTURE).coalesce(32).cache()
    bdf.count()
    qpdf = pd.DataFrame({"query_id": np.arange(n_q, dtype=np.int64),
                         "embedding": list(queries)})
    qdf = spark.createDataFrame(qpdf, schema="query_id long, embedding array<double>")
    qdf = qdf.coalesce(32).cache()
    qdf.count()

    t0 = time.time()
    idx = IVFPQIndex.build(
        bdf, k_coarse=128, m=DIM // 3, n_bits=4, metric="l2sqr",
        vec_col="embedding", id_col="vec_id", train_size=1000, dim=DIM,
        store_vec_dtype="float32",
    )
    idx.persist_codes()
    out: dict = {"n": N, "dim": DIM, "build_sec": round(time.time() - t0, 1),
                 "runs_best_of": RUNS, "waves": {}}

    for n_probes, ef in ((8, 200), (32, 200)):
        row: dict = {}
        # warm-up once per config so the first timed run is steady-state
        idx.search_batch(qdf, k=K, n_probes=n_probes, ef=ef,
                         qvec_col="embedding").collect()
        for stage in ("approx", "cand", None):
            # debug stages consume via count() (JVM-side sink): a
            # collect() of the tasks×|Q|×ef candidate frame measures
            # driver ingest, not the wave (the round-12 confound)
            if stage is None:
                sec = _timed(lambda: idx.search_batch(
                    qdf, k=K, n_probes=n_probes, ef=ef,
                    qvec_col="embedding").collect())
            else:
                sec = _timed(lambda s=stage: idx.search_batch(
                    qdf, k=K, n_probes=n_probes, ef=ef, qvec_col="embedding",
                    debug_stage=s).count())
            row["full" if stage is None else stage] = round(sec, 3)
        row["gate_sec"] = round(row["cand"] - row["approx"], 3)
        row["rerank_sec"] = round(row["full"] - row["cand"], 3)
        out["waves"][f"{n_probes}p_ef{ef}"] = row
        print(f"{n_probes}p/ef{ef}:", row, flush=True)

    assert idx.enable_local_serve(max_bytes=12 << 30)
    for n_probes, ef in ((8, 200), (32, 200)):
        sec = _timed(lambda p=n_probes, e=ef: idx.search_batch(
            qdf, k=K, n_probes=p, ef=e, qvec_col="embedding").collect())
        out["waves"][f"{n_probes}p_ef{ef}"]["local"] = round(sec, 3)
        print(f"local {n_probes}p/ef{ef}: {sec:.3f}", flush=True)

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_ivfpq_serve.json"
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)
    spark.stop()


if __name__ == "__main__":
    main()
