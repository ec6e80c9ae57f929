"""Decompose WAVE A of the distributed IVF+PQ serve at 1M/960-dim.

The round-13 wave-split profile (docs/PROFILE_IVFPQ_SERVE_r13.json)
put ~85% of the two-pass serve in the approx scan itself — not the
gate or the re-rank. This harness times cumulative variants of the
scan closure over the SAME pinned codes frame to split that wave:

  ship    — mapInArrow with a closure that only counts rows (pure
            JVM→Python Arrow ship of id + cluster_id + code);
  unpack  — + unpack_codes (packed 4-bit → (n, m) uint8);
  gather  — + per-cluster row gather (the ascontiguousarray copy);
  kernel  — + the compiled adc_topk tile per (cluster × queries);
  approx  — the real scan (adds the accumulator + emission), via
            debug_stage="approx" consumed with count().

Usage: python tools/profile_wavea_1m.py [out.json]
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
    from lab_1806_vec_db_spark.index.ivfpq import IVFPQIndex
    from lab_1806_vec_db_spark.index.pq import build_lookup_batch

    spark = get_spark("profile_wavea", cpus=32)
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
                 "runs_best_of": RUNS, "stages": {}}

    from pyspark.sql import functions as F

    m, n_bits = idx.pq.m, idx.pq.n_bits
    id_col = idx.id_col

    for n_probes, ef in ((8, 200),):
        probes = idx.model.rank_centroids_batch(queries, n_probes)
        by_cluster: dict[int, list[int]] = {}
        for qi, row in enumerate(probes):
            for c in row:
                by_cluster.setdefault(int(c), []).append(qi)
        lut3, sq, qn = build_lookup_batch(
            queries, idx.pq.codebooks, idx.pq.groups, idx.pq.n_bits, "l2sqr")
        bc = spark.sparkContext.broadcast((by_cluster, lut3))
        probed_any = sorted(by_cluster.keys())
        pruned = (
            idx.codes_clustered.filter(F.col("cluster_id").isin(probed_any))
            .select(id_col, "code", "cluster_id")
        )
        ef_ = ef

        def make_stage(level: str):
            def scan(batches):
                import pyarrow as pa

                from lab_1806_vec_db_spark.functions.arrowvec import binary_matrix
                from lab_1806_vec_db_spark.index import ckernel
                from lab_1806_vec_db_spark.index.ivfpq import unpack_codes

                bclusters, blut = bc.value
                lut64 = np.ascontiguousarray(blut, dtype=np.float64)
                n = 0
                for rb in batches:
                    if rb.num_rows == 0:
                        continue
                    n += rb.num_rows
                    if level == "ship":
                        continue
                    sch = rb.schema
                    buf = binary_matrix(rb.column(sch.get_field_index("code")))
                    codes_all = unpack_codes(buf, m, n_bits)
                    ids_all = rb.column(sch.get_field_index(id_col)).to_numpy(
                        zero_copy_only=False)
                    cl_all = rb.column(sch.get_field_index("cluster_id")).to_numpy(
                        zero_copy_only=False)
                    if level == "unpack":
                        continue
                    for cid in np.unique(cl_all):
                        sel = bclusters.get(int(cid))
                        if not sel:
                            continue
                        rows = np.nonzero(cl_all == cid)[0]
                        codes_sub = np.ascontiguousarray(codes_all[rows])
                        ids = ids_all[rows]
                        if level == "gather":
                            continue
                        sel_arr = np.asarray(sel, dtype=np.int64)
                        kk = min(ef_, codes_sub.shape[0])
                        ckernel.adc_topk(
                            codes_sub,
                            np.ascontiguousarray(ids, dtype=np.int64),
                            lut64, sel_arr, kk,
                        )
                yield pa.RecordBatch.from_arrays(
                    [pa.array([n], type=pa.int64())], names=["n"])
            return scan

        row: dict = {}
        for level in ("ship", "unpack", "gather", "kernel"):
            df = pruned.mapInArrow(make_stage(level), schema="n long")
            sec = _timed(lambda d=df: d.agg(F.sum("n")).collect())
            row[level] = round(sec, 3)
            print(f"{n_probes}p/ef{ef} {level}: {sec:.3f}", flush=True)
        sec = _timed(lambda: idx.search_batch(
            qdf, k=10, n_probes=n_probes, ef=ef, qvec_col="embedding",
            debug_stage="approx").count())
        row["approx"] = round(sec, 3)
        print(f"{n_probes}p/ef{ef} approx: {sec:.3f}", flush=True)
        sec = _timed(lambda: idx.search_batch(
            qdf, k=10, n_probes=n_probes, ef=ef,
            qvec_col="embedding").collect())
        row["full_driver_merge"] = round(sec, 3)
        print(f"{n_probes}p/ef{ef} full(driver_merge auto): {sec:.3f}", flush=True)
        out["stages"][f"{n_probes}p_ef{ef}"] = row

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_wavea_1m.json"
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)
    spark.stop()


if __name__ == "__main__":
    main()
