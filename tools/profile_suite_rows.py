"""Stage-level decomposition of the slow sf-suite bench rows (guide
§1): reproduces bench.py's exact row state (densified 50k table, same
index builds, same query set), then times each row's internal stages
separately so the optimization target is measured, not guessed.

Rows covered: pq_ef80, flat_batch, ivf_probe50pct, hnsw_filtered_ef360.

Usage: python tools/profile_suite_rows.py [--rows pq,flat,...]
Writes /tmp/profile_suite_rows.json and prints per-stage seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="pq,flat,ivf,hnswf")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="/tmp/profile_suite_rows.json")
    args = ap.parse_args()
    rows = set(args.rows.split(","))

    import bench
    from lab_1806_vec_db_spark.session import get_spark, read_table

    spark = get_spark("profile_suite_rows")
    sc = spark.sparkContext
    emb = read_table(spark, bench.SF_DIR, "embeddings").cache()
    n_real = emb.count()
    if n_real < bench.SF_MIN_ROWS:
        dens = bench._densify_rows(spark, emb, bench.SF_MIN_ROWS).cache()
        dens.count()
        emb.unpersist()
        emb = dens
    n_rows = emb.count()
    queries = (
        emb.filter(F.col("vec_id") < bench.N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )
    queries.count()
    out: dict = {"n_rows": int(n_rows), "runs": args.runs,
                 "calibration": bench.host_calibration()}
    R = args.runs

    if "pq" in rows:
        from lab_1806_vec_db_spark.index.pq import PQTable, build_lookup_batch
        from lab_1806_vec_db_spark.operators.knn import _topk_per_query

        t0 = time.perf_counter()
        pq = PQTable.train(emb, dim=64, m=22, n_bits=4, train_proportion=0.2,
                           vec_col="embedding", id_col="vec_id")
        pq.codes.count()
        d = {"build_sec": round(time.perf_counter() - t0, 3)}

        sc.setJobDescription("prof:pq qrows collect")
        d["q_collect"] = timed(
            lambda: queries.select("query_id", "embedding").collect(), R)
        qrows = queries.select("query_id", "embedding").collect()
        qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
        qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
        d["lut_build"] = timed(lambda: build_lookup_batch(
            qmat, pq.codebooks, pq.groups, pq.n_bits, "l2sqr"), R)
        d["n_code_parts"] = pq.code_partitions

        # stage: the ADC scan alone (per-partition top-ef emission)
        lut3, sq, qn = build_lookup_batch(
            qmat, pq.codebooks, pq.groups, pq.n_bits, "l2sqr")
        import lab_1806_vec_db_spark.index.pq as pq_mod
        bc = sc.broadcast((qids, lut3, sq, qn, pq.m, pq.n_bits))
        d["bcast"] = timed(lambda: sc.broadcast(
            (qids, lut3, sq, qn, pq.m, pq.n_bits)), 2)

        def mk_approx():
            # mirror of search_batch's scan piece
            return pq.codes.mapInArrow(
                _scan_factory(pq_mod, bc, "vec_id"),
                schema="query_id long, vec_id long, dist double")

        sc.setJobDescription("prof:pq approx scan")
        d["approx_noop"] = timed(lambda: noop(mk_approx()), R)
        sc.setJobDescription("prof:pq approx+window")
        d["approx_window_noop"] = timed(
            lambda: noop(_topk_per_query(mk_approx(), 80, "vec_id", None)
                         .select("query_id", "vec_id")), R)
        sc.setJobDescription("prof:pq full row")
        d["full_collect"] = timed(lambda: pq.search_batch(
            queries, k=10, ef=80, metric="l2sqr",
            qvec_col="embedding").collect(), R)
        sc.setJobDescription(None)
        out["pq_ef80"] = d
        print("pq_ef80:", json.dumps(d), flush=True)

    if "flat" in rows:
        from lab_1806_vec_db_spark.operators import knn as knn_ops

        d = {}
        sc.setJobDescription("prof:flat full")
        d["full_collect"] = timed(lambda: knn_ops.knn_batch(
            emb, queries, k=10, metric="l2sqr", vec_col="embedding",
            id_col="vec_id", qid_col="query_id", qvec_col="embedding",
        ).collect(), R)

        # scan-only: rebuild the internals without the merge window
        qrows = queries.select("query_id", "embedding").collect()
        qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
        qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
        d["q_collect"] = timed(
            lambda: queries.select("query_id", "embedding").collect(), R)
        scored = _flat_scan_df(spark, emb, qids, qmat, "l2sqr")
        sc.setJobDescription("prof:flat scan only")
        d["scan_noop"] = timed(lambda: noop(
            _flat_scan_df(spark, emb, qids, qmat, "l2sqr")), R)
        sc.setJobDescription("prof:flat scan+window")
        from lab_1806_vec_db_spark.operators.knn import _topk_per_query
        d["scan_window_noop"] = timed(lambda: noop(_topk_per_query(
            _flat_scan_df(spark, emb, qids, qmat, "l2sqr"), 10, "vec_id",
            None)), R)
        sc.setJobDescription(None)
        out["flat_batch"] = d
        print("flat_batch:", json.dumps(d), flush=True)

    if "ivf" in rows:
        from lab_1806_vec_db_spark.index.ivf import IVFIndex

        ivf_k = max(8, int(np.sqrt(n_rows)))
        n_probes = max(2, ivf_k // 2)
        t0 = time.perf_counter()
        ivf = IVFIndex.build(emb, k=ivf_k, metric="l2sqr",
                             vec_col="embedding", id_col="vec_id",
                             train_size=10_000)
        ivf.persist_data()
        d = {"build_sec": round(time.perf_counter() - t0, 3),
             "ivf_k": ivf_k, "n_probes": n_probes}
        sc.setJobDescription("prof:ivf full")
        d["full_collect"] = timed(lambda: ivf.search_batch(
            queries, k=10, n_probes=n_probes, qvec_col="embedding",
        ).collect(), R)
        sc.setJobDescription(None)
        out["ivf_probe50pct"] = d
        print("ivf_probe50pct:", json.dumps(d), flush=True)

    if "hnswf" in rows:
        from lab_1806_vec_db_spark.index.hnsw import HNSWIndex
        from lab_1806_vec_db_spark.operators.knn import (
            _topk_per_query, filtered_topk_from_pool)

        t0 = time.perf_counter()
        hnsw = HNSWIndex.build(emb, metric="l2sqr", vec_col="embedding",
                               id_col="vec_id", m=16, ef_construction=200)
        d = {"build_sec": round(time.perf_counter() - t0, 3)}
        filt = emb.filter(F.col("label") == 1)
        sc.setJobDescription("prof:hnswf pool only")
        d["pool_noop"] = timed(lambda: noop(hnsw.search_batch(
            queries, k=360, ef=360, qvec_col="embedding")), R)
        sc.setJobDescription("prof:hnswf pool+join+window")

        def pool_join():
            pool = hnsw.search_batch(queries, k=360, ef=360,
                                     qvec_col="embedding")
            surv = pool.join(filt.select("vec_id"), "vec_id").select(
                "query_id", "vec_id", "dist")
            return _topk_per_query(surv, 12, "vec_id", None).toPandas()

        d["pool_join_topk_pandas"] = timed(pool_join, R)
        sc.setJobDescription("prof:hnswf full")
        d["full_collect"] = timed(lambda: hnsw.search_batch_filtered(
            queries, k=10, filtered_base=filt, ef=360,
            qvec_col="embedding", vec_col="embedding",
            fallback_margin=1.2).collect(), R)
        # how many queries escalate to the exact pass?
        pdf = pool_join()
        counts = pdf.groupby("query_id").size()
        d["n_starved"] = int((counts.reindex(
            [int(r[0]) for r in queries.select("query_id").collect()],
            fill_value=0) < 12).sum())
        sc.setJobDescription(None)
        out["hnsw_filtered_ef360"] = d
        print("hnsw_filtered_ef360:", json.dumps(d), flush=True)

    out["calibration_end"] = bench.host_calibration()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


def _scan_factory(pq_mod, bc, id_col):
    """The same scan closure pq.search_batch builds (copied call shape:
    one LUT chunk), for timing the approx stage in isolation."""
    from typing import Iterator

    ef_ = 80

    def scan(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from lab_1806_vec_db_spark.functions.arrowvec import (
            binary_matrix, knn_schema, result_batch)

        bqids, blut3, bsq, bqn, m, n_bits = bc.value
        out_schema = knn_schema(id_col)
        lut_t = np.ascontiguousarray(blut3.transpose(1, 2, 0))
        run_d = run_id = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            buf = binary_matrix(rb.column(rb.schema.get_field_index("code")))
            codes = pq_mod.unpack_codes(buf, m, n_bits)
            ids = rb.column(rb.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False)
            summed = np.zeros((codes.shape[0], lut_t.shape[2]))
            for g in range(m):
                summed += lut_t[g][codes[:, g]]
            idm = np.broadcast_to(ids[:, None], summed.shape)
            if run_d is not None:
                summed = np.concatenate([run_d, summed], axis=0)
                idm = np.concatenate([run_id, idm], axis=0)
            kk = min(ef_, summed.shape[0])
            if kk < summed.shape[0]:
                part = np.argpartition(summed, kk - 1, axis=0)[:kk, :]
                summed = np.take_along_axis(summed, part, axis=0)
                idm = np.take_along_axis(idm, part, axis=0)
            sel = np.lexsort((idm, summed), axis=0)
            run_d = np.take_along_axis(summed, sel, axis=0)
            run_id = np.take_along_axis(idm, sel, axis=0)
        if run_d is not None:
            kk = run_d.shape[0]
            yield result_batch(
                out_schema,
                query_id=np.repeat(bqids, kk),
                **{id_col: run_id.T.reshape(-1)},
                dist=run_d.T.reshape(-1),
            )

    return scan


def _flat_scan_df(spark, emb, qids, qmat, metric):
    from typing import Iterator

    from lab_1806_vec_db_spark.operators.knn import (
        _dist_matrix, np_round_half_up)

    bc = spark.sparkContext.broadcast((qids, qmat))
    k = 10

    def scan(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from lab_1806_vec_db_spark.functions.arrowvec import (
            knn_schema, result_batch, vec_matrix)

        bqids, bq = bc.value
        out_schema = knn_schema("vec_id")
        run_d = run_i = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            x = vec_matrix(rb.column(rb.schema.get_field_index("embedding")),
                           dtype=np.float64)
            d = _dist_matrix(x, bq, metric)
            d = np_round_half_up(d)
            ids = rb.column(rb.schema.get_field_index("vec_id")).to_numpy(
                zero_copy_only=False)
            kk = min(k, d.shape[0])
            order_ids = np.broadcast_to(ids[:, None], d.shape)
            sel = np.lexsort((order_ids, d), axis=0)[:kk, :]
            new_i = ids[sel]
            new_d = np.take_along_axis(d, sel, axis=0)
            if run_d is None:
                run_d, run_i = new_d, new_i
                continue
            md = np.concatenate([run_d, new_d], axis=0)
            mi = np.concatenate([run_i, new_i], axis=0)
            sel2 = np.lexsort((mi, md), axis=0)[: min(k, md.shape[0]), :]
            run_d = np.take_along_axis(md, sel2, axis=0)
            run_i = np.take_along_axis(mi, sel2, axis=0)
        if run_d is None:
            return
        kk = run_d.shape[0]
        yield result_batch(
            out_schema,
            query_id=np.repeat(bqids, kk),
            **{"vec_id": run_i.T.reshape(-1)},
            dist=run_d.T.reshape(-1),
        )

    return emb.select("vec_id", "embedding").mapInArrow(
        scan, schema="query_id long, vec_id long, dist double")


if __name__ == "__main__":
    main()
