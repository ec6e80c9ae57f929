"""Seeded k-means for index construction (IVF coarse quantizer, PQ
codebooks).

Reference semantics (/root/reference/src/index_algorithm/k_means.rs):
- k-means++ seeding: first centroid uniform, then each next centroid
  drawn with probability ∝ min distance to the already-chosen set
  (k_means.rs:61-87).
- Lloyd iterations: assign to nearest centroid, recompute per-cluster
  mean; an empty cluster keeps its old centroid; stop when the max
  centroid movement (L2²) drops below ``tol`` or ``max_iter`` is hit
  (k_means.rs:95-162).
- Training runs on a *sample* of the data (the reference trains PQ on
  ``len * train_proportion`` rows, metadata_vec_table.rs:133-137, and
  IVF on ``k_means_size`` rows) — so a driver-side numpy fit over a
  bounded sample is the faithful AND the scale-correct design: at
  100 TB you still train the codebook on ~10⁵ rows; only *assignment*
  must be distributed, and it is (broadcast centroids + Arrow scan,
  the Spark analogue of the rayon par-assign at k_means.rs:117-123).

Everything is seeded (numpy ``default_rng``) → deterministic across
runs, which the correctness harness relies on.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pairwise_dist(x: np.ndarray, c: np.ndarray, metric: str) -> np.ndarray:
    """(n × d) rows vs (k × d) centroids → (n × k) float64 distances.

    Same algebraic forms as the distance library (distance/mod.rs:51-69):
    L2² via the cached-dot identity, cosine with the 1e-10 floor.
    """
    ip = x @ c.T
    if metric == "l2sqr":
        x2 = np.einsum("ij,ij->i", x, x)
        c2 = np.einsum("ij,ij->i", c, c)
        d = x2[:, None] + c2[None, :] - 2.0 * ip
        np.maximum(d, 0.0, out=d)
        return d
    if metric == "cosine":
        nx = np.sqrt(np.einsum("ij,ij->i", x, x))
        nc = np.sqrt(np.einsum("ij,ij->i", c, c))
        denom = np.maximum(nx[:, None] * nc[None, :], 1e-10)
        return 1.0 - ip / denom
    raise ValueError(f"Invalid distance function: {metric}")


def kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.Generator, metric: str) -> np.ndarray:
    """k-means++ seeding (k_means.rs:61-87): first pick uniform, then
    each next ∝ min-distance-to-chosen (D weighting, as the reference
    weights by the raw distance, not D²)."""
    n = x.shape[0]
    chosen = np.empty((k, x.shape[1]), dtype=np.float64)
    first = int(rng.integers(0, n))
    chosen[0] = x[first]
    min_d = _pairwise_dist(x, chosen[0:1], metric)[:, 0]
    for i in range(1, k):
        w = np.maximum(min_d, 0.0)
        total = w.sum()
        if total <= 0:
            idx = int(rng.integers(0, n))
        else:
            idx = int(rng.choice(n, p=w / total))
        chosen[i] = x[idx]
        d_new = _pairwise_dist(x, chosen[i : i + 1], metric)[:, 0]
        np.minimum(min_d, d_new, out=min_d)
    return chosen


@dataclass
class KMeansModel:
    """Fitted centroids + the metric they were fitted under."""

    centroids: np.ndarray  # (k, dim) float64
    metric: str

    @property
    def k(self) -> int:
        return int(self.centroids.shape[0])

    # -- driver-side ops (centroids are always driver/broadcast-resident,
    #    like the reference's in-memory centroid VecSet) ------------------

    def assign(self, x: np.ndarray) -> np.ndarray:
        """Nearest-centroid id per row (k_means.rs:40-57 find_nearest)."""
        return np.argmin(_pairwise_dist(np.asarray(x, dtype=np.float64), self.centroids, self.metric), axis=1)

    def rank_centroids(self, q: np.ndarray, n: int) -> np.ndarray:
        """Top-n nearest centroid ids for a query — multi-probe ranking
        (k_means.rs:174-191 find_n_nearest)."""
        d = _pairwise_dist(np.asarray(q, dtype=np.float64)[None, :], self.centroids, self.metric)[0]
        n = min(n, self.k)
        return np.argsort(d, kind="stable")[:n]

    def rank_centroids_batch(self, q: np.ndarray, n: int) -> np.ndarray:
        """(m × dim) queries → (m × n) probed centroid ids."""
        d = _pairwise_dist(np.asarray(q, dtype=np.float64), self.centroids, self.metric)
        n = min(n, self.k)
        return np.argsort(d, axis=1, kind="stable")[:, :n]

    # -- distributed assignment (A4: the Spark analogue of the rayon
    #    par-assign, ivf_index.rs:88-96) ----------------------------------

    def assign_df(self, df: DataFrame, vec_col: str = "vec", out_col: str = "cluster_id") -> DataFrame:
        """Distributed cluster assignment: broadcast centroids, Arrow
        scan, numpy argmin per batch. No shuffle — a map-only stage."""
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((self.centroids, self.metric))
        cols = df.columns

        def assign_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
            import pyarrow as pa

            from lab_1806_vec_db_spark.functions.arrowvec import vec_matrix

            centroids, metric = bc.value
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                # the vector column flattens zero-copy; every other
                # column passes through untouched as Arrow buffers
                x = vec_matrix(rb.column(rb.schema.get_field_index(vec_col)),
                               dtype=np.float64)
                cid = np.argmin(_pairwise_dist(x, centroids, metric), axis=1)
                yield rb.append_column(
                    pa.field(out_col, pa.int32(), nullable=False),
                    pa.array(cid.astype(np.int32), type=pa.int32()),
                )

        schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.IntegerType(), False)])
        return df.mapInArrow(assign_batches, schema=schema).select(*cols, out_col)


def fit_kmeans(
    x: np.ndarray,
    k: int,
    metric: str = "l2sqr",
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
) -> KMeansModel:
    """Lloyd's algorithm with k-means++ seeding (k_means.rs:95-162).

    ``x`` is the (sampled) training block — bounded by design, see
    module docstring. Dedup-aware: k is clamped to the number of
    distinct rows so the exactness regime (#distinct ≤ k) yields one
    centroid per distinct vector (pq_table.rs:324-372 relies on this).
    """
    x = np.asarray(x, dtype=np.float64)
    distinct = np.unique(x, axis=0)
    k = min(int(k), distinct.shape[0])
    rng = np.random.default_rng(seed)
    if k == distinct.shape[0]:
        # exactness regime: every distinct vector is its own centroid
        centroids = distinct.copy()
    else:
        centroids = kmeans_pp_init(x, k, rng, metric)
        for _ in range(max_iter):
            d = _pairwise_dist(x, centroids, metric)
            labels = np.argmin(d, axis=1)
            new_centroids = centroids.copy()  # empty cluster keeps old centroid
            for c in range(k):
                mask = labels == c
                if mask.any():
                    new_centroids[c] = x[mask].mean(axis=0)
            move = np.max(np.einsum("ij,ij->i", centroids - new_centroids, centroids - new_centroids))
            centroids = new_centroids
            if move < tol:
                break
    return KMeansModel(centroids=centroids, metric=metric)


def sample_key(id_col: str, seed: int = 42):
    """Seeded pseudo-random sort key: md5 of ``"<seed>:<id>"``. Unlike
    ``F.rand`` (whose per-partition XORShift stream is Spark-internal),
    md5 is engine-portable — DuckDB reproduces the identical key with
    ``md5(<seed> || ':' || CAST(id AS VARCHAR))``, which is what lets
    the ``vec_random_sample`` registry entry carry a full value-hash
    oracle instead of a rows-only check."""
    return F.md5(F.concat_ws(":", F.lit(str(int(seed))), F.col(id_col).cast("string")))


def sample_rows(
    df: DataFrame, n: int, vec_col: str = "vec", id_col: str = "id", seed: int = 42
) -> np.ndarray:
    """Deterministic training sample (A1, vec_set.rs:154-163): order by a
    seeded hash key of the id, take n. ``orderBy(key).limit(n)`` is a
    TakeOrderedAndProject — k-bounded, no full sort, no full shuffle."""
    pdf = (
        df.select(vec_col, sample_key(id_col, seed).alias("__sk"))
        .orderBy("__sk")
        .limit(int(n))
        .select(vec_col)
        .toPandas()  # Arrow: ndarray rows, no boxed floats on the driver
    )
    out = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
    del pdf
    return out
