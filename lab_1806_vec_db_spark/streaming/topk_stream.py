"""Streaming top-k nearest neighbors via ``applyInPandasWithState``.

The one query shape Structured Streaming's built-in operators cannot
express: a running "k closest vectors seen so far" per query over an
unbounded vector stream (the streaming twin of Q2/Q6 — the reference
is batch-only here, so this is a Spark-native extension; top-k
semantics follow flat_index.rs:48-57 / ordered_vec.rs).

Design for scale:

- State per query is EXACTLY ``k`` (id, dist) pairs — bounded forever,
  no watermark needed; ``GroupStateTimeout.NoTimeout`` is sound because
  state size is O(k·|Q|), independent of stream length.
- Arriving vectors are routed to every query by an ``explode`` of the
  (small) query-id list — map-only fan-out of |Q| light rows per
  vector; the only shuffle is the ``groupBy(query_id)`` feeding the
  stateful operator, keyed by |Q| keys. For large |Q| shard the query
  list across parallel streams.
- Distances are computed vectorized (one GEMV per Arrow batch) inside
  the state function; the merge with carried state is a k-bounded
  numpy argpartition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lab_1806_vec_db_spark.operators.knn import np_round_half_up

OUTPUT_SCHEMA = "query_id long, vec_id long, dist double"
STATE_SCHEMA = "ids array<long>, dists array<double>"


def _batch_dists(mat: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    if metric == "l2sqr":
        # direct sum-of-squared-diffs, the same form as the batch
        # operator's l2sqr_expr — the algebraic |v|²+|q|²-2v·q form can
        # cancel to tiny NEGATIVE values for exact duplicates, which the
        # batch path never emits
        diff = mat - q[None, :]
        return (diff * diff).sum(axis=1)
    if metric == "cosine":
        qn = float(np.sqrt(q @ q))
        mn = np.sqrt((mat * mat).sum(axis=1))
        denom = np.maximum(mn * qn, 1e-10)
        return 1.0 - (mat @ q) / denom
    raise ValueError(f"Invalid distance function: {metric}")


def streaming_topk(
    stream: DataFrame,
    queries: dict[int, list[float]],
    k: int,
    metric: str = "l2sqr",
    vec_col: str = "vec",
    id_col: str = "id",
) -> DataFrame:
    """Running per-query top-k over a vector stream. Each trigger emits
    the CURRENT top-k rows ``(query_id, vec_id, dist)`` for every query
    that saw new vectors (update semantics); ties break by id, matching
    the batch operator's ordering contract."""
    qvecs = {int(qid): np.asarray(v, dtype=np.float64) for qid, v in queries.items()}

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (qid,) = key
        q = qvecs[int(qid)]
        if state.exists:
            ids, dists = state.get
            ids = np.asarray(ids, dtype=np.int64)
            dists = np.asarray(dists, dtype=np.float64)
        else:
            ids = np.empty(0, dtype=np.int64)
            dists = np.empty(0, dtype=np.float64)
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # 4-dp half-up BEFORE the merge: k-boundary membership and
            # tie-breaks must be decided on the same rounded values the
            # batch operator orders by (the repo-wide determinism
            # contract), not on raw floats that round to equal
            nd = np_round_half_up(_batch_dists(mat, q, metric))
            ids = np.concatenate([ids, pdf[id_col].to_numpy(np.int64)])
            dists = np.concatenate([dists, nd])
            if ids.size > k:
                # k-bounded: keep the k best, ties by id (lexsort is
                # stable on (dist, id))
                order = np.lexsort((ids, dists))[:k]
                ids, dists = ids[order], dists[order]
        order = np.lexsort((ids, dists))
        ids, dists = ids[order], dists[order]
        state.update((ids.tolist(), dists.tolist()))
        yield pd.DataFrame(
            {"query_id": np.full(ids.size, qid, dtype=np.int64),
             "vec_id": ids, "dist": dists}
        )

    routed = stream.withColumn(
        "query_id",
        F.explode(F.array(*[F.lit(int(qid)) for qid in sorted(qvecs)])),
    )
    return routed.groupBy("query_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
