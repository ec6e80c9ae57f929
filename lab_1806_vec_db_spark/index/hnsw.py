"""HNSW graph index — build + broadcast serving.

Reference semantics (/root/reference/src/index_algorithm/hnsw_index.rs):
- level sampling: ``floor(−ln U · 1/ln M)`` (hnsw_index.rs:112-119 via
  the standard HNSW level generator);
- insert: greedy descent from the entry point through layers above the
  node's level, then per level a best-first beam search with
  ``ef_construction`` candidates and heuristic neighbor selection
  (hnsw_index.rs:538-572, 493-612);
- heuristic pruning: keep candidate v iff for every already-chosen p,
  d(v, p) ≥ d(v, query) — diversity pruning capped at M
  (candidate_pair.rs:85-99);
- search: greedy descent to layer 0, then beam search with width
  ``max(ef, k)``; results ascending (hnsw_index.rs:614-634, 258-330).

Spark disposition (SURVEY §4): graph traversal is pointer-chasing,
latency-bound, and per-query — it is NOT a relational dataflow. The
reference itself is a single-node in-memory engine whose only
parallelism is *across queries* (rayon over the query set,
examples/bench.rs:414-417). The faithful AND scale-correct Spark design
is therefore:

- **build** driver-side over collected ``(id, vec)`` — the graph must
  be globally connected, and the reference's own build is a single
  shared-memory structure. The collected arrays are exactly what the
  reference holds in RAM, so the capability envelope is unchanged. At
  100 TB you shard tables (one graph per table/partition of a
  catalog), or use the IVF/PQ path which is fully distributed;
- **serve** by broadcasting the compact graph (few MB: int32 link
  arrays + vectors) and running beam search inside ``mapInPandas``
  over the *queries* DataFrame — queries are the parallel axis,
  thousands of beam searches run per task with zero shuffle.
"""

from __future__ import annotations

import heapq
import json
import os
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.index.kmeans import _pairwise_dist
from lab_1806_vec_db_spark.operators.knn import np_round_half_up


def _dist_one(vecs: np.ndarray, i: int, q: np.ndarray, metric: str) -> float:
    return float(_pairwise_dist(q[None, :], vecs[i : i + 1], metric)[0, 0])


def _dist_many(vecs: np.ndarray, idx: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    return _pairwise_dist(q[None, :], vecs[idx], metric)[0]


def _make_dist_kernel(vecs: np.ndarray, metric: str):
    """Per-query distance closure with cached per-node self-dots — the
    reference's dist_cache (hnsw_index.rs:136-140, 251-254). Shaves the
    generic-pairwise overhead off the per-pop hot path."""
    x2 = np.einsum("ij,ij->i", vecs, vecs)
    if metric == "l2sqr":
        def for_query(q: np.ndarray):
            q2 = float(q @ q)

            def dist(idx: np.ndarray) -> np.ndarray:
                d = x2[idx] + q2 - 2.0 * (vecs[idx] @ q)
                return np.maximum(d, 0.0, out=d)

            return dist
    else:
        norms = np.sqrt(x2)

        def for_query(q: np.ndarray):
            qn = float(np.sqrt(q @ q))

            def dist(idx: np.ndarray) -> np.ndarray:
                return 1.0 - (vecs[idx] @ q) / np.maximum(norms[idx] * qn, 1e-10)

            return dist
    return for_query


class _Graph:
    """Plain-array graph state shared by build and (broadcast) serve.

    links[level] is an (n_at_or_above_level? n, max_links) int32 array
    with -1 padding — flat arrays, not objects, so the broadcast is a
    few contiguous buffers (the Spark analogue of the reference's
    compact link vectors, hnsw_index.rs:136-147)."""

    def __init__(self, n: int, m: int):
        self.M = m
        self.max0 = 2 * m  # layer-0 degree cap, standard HNSW / reference default
        self.levels = np.zeros(n, dtype=np.int32)
        self.links: list[np.ndarray] = [np.full((n, self.max0), -1, dtype=np.int32)]
        self.counts: list[np.ndarray] = [np.zeros(n, dtype=np.int32)]
        self.entry = -1
        self.max_level = -1

    def ensure_level(self, level: int, n: int) -> None:
        while len(self.links) <= level:
            self.links.append(np.full((n, self.M), -1, dtype=np.int32))
            self.counts.append(np.zeros(n, dtype=np.int32))

    def neighbors(self, level: int, node: int) -> np.ndarray:
        return self.links[level][node, : self.counts[level][node]]

    def set_neighbors(self, level: int, node: int, neigh: Sequence[int]) -> None:
        cap = self.max0 if level == 0 else self.M
        neigh = list(neigh)[:cap]
        self.links[level][node, : len(neigh)] = neigh
        self.links[level][node, len(neigh) :] = -1
        self.counts[level][node] = len(neigh)


def _select_heuristic(
    cand: list[tuple[float, int]], m: int, vecs: np.ndarray, metric: str
) -> list[int]:
    """Diversity pruning (candidate_pair.rs:85-99): scan candidates in
    ascending distance; keep v iff its distance to the query is smaller
    than its distance to every already-kept neighbor.

    Vectorized as a running min: when p is accepted, one numpy call
    updates min-distance-to-chosen for ALL candidates; v's acceptance
    test is then a scalar compare (``min ≥ d_vq`` ⇔ ``∀p: d ≥ d_vq``).
    Same accepted set as the per-candidate loop, ~5× fewer numpy calls.
    """
    if not cand:
        return []
    cand_sorted = sorted(cand)
    ids = np.asarray([c[1] for c in cand_sorted], dtype=np.int64)
    d_q = np.asarray([c[0] for c in cand_sorted])
    min_to_chosen = np.full(len(ids), np.inf)
    chosen: list[int] = []
    for j in range(len(ids)):
        if len(chosen) >= m:
            break
        if min_to_chosen[j] >= d_q[j]:
            chosen.append(int(ids[j]))
            d_new = _dist_many(vecs, ids, vecs[ids[j]], metric)
            np.minimum(min_to_chosen, d_new, out=min_to_chosen)
    return chosen


def _beam_search(
    g: _Graph,
    dist,
    entry: int,
    ef: int,
    level: int,
    n: int,
) -> list[tuple[float, int]]:
    """Best-first beam search on one level (hnsw_index.rs:258-330):
    bounded result set of ef, early-terminate when the nearest frontier
    candidate is farther than the worst kept result. ``dist`` is a
    per-query kernel (idx array → distances)."""
    d0 = float(dist(np.asarray([entry]))[0])
    visited = np.zeros(n, dtype=bool)
    visited[entry] = True
    frontier = [(d0, entry)]  # min-heap
    results = [(-d0, entry)]  # max-heap (negated)
    links, counts = g.links[level], g.counts[level]
    while frontier:
        d, node = heapq.heappop(frontier)
        if d > -results[0][0] and len(results) >= ef:
            break  # early termination (candidate_pair.rs:55-57)
        neigh = links[node, : counts[node]]
        fresh = neigh[~visited[neigh]]
        if fresh.size == 0:
            continue
        visited[fresh] = True
        dists = dist(fresh)
        for dn, nn in zip(dists.tolist(), fresh.tolist()):
            if len(results) < ef or dn < -results[0][0]:
                heapq.heappush(results, (-dn, nn))
                if len(results) > ef:
                    heapq.heappop(results)
                heapq.heappush(frontier, (dn, nn))
    return sorted((-nd, node) for nd, node in results)


def _greedy_descent(g: _Graph, dist, from_level: int, to_level: int) -> int:
    """ef=1 greedy walk through the upper layers (hnsw_index.rs:336-350)."""
    cur = g.entry
    cur_d = float(dist(np.asarray([cur]))[0])
    for level in range(from_level, to_level, -1):
        improved = True
        while improved:
            improved = False
            neigh = g.neighbors(level, cur)
            if neigh.size == 0:
                continue
            dists = dist(neigh)
            best = int(np.argmin(dists))
            if float(dists[best]) < cur_d:
                cur_d = float(dists[best])
                cur = int(neigh[best])
                improved = True
    return cur


def _insert_node(
    g: _Graph,
    vecs: np.ndarray,
    i: int,
    node_level: int,
    metric: str,
    ef_c: int,
    dist_factory,
) -> None:
    """Standard HNSW insert (hnsw_index.rs:538-572): greedy descent to
    the node's level, then per level beam search + heuristic selection
    + bidirectional linking with shrink."""
    n = vecs.shape[0]
    dist = dist_factory(vecs[i])
    ep = g.entry
    if g.max_level > node_level:
        ep = _greedy_descent(g, dist, g.max_level, node_level)
    for level in range(min(node_level, g.max_level), -1, -1):
        cand = _beam_search(g, dist, ep, ef_c, level, n)
        cap = g.max0 if level == 0 else g.M
        chosen = _select_heuristic(cand, cap, vecs, metric)
        g.set_neighbors(level, i, chosen)
        # bidirectional links + shrink (hnsw_index.rs:443-447)
        for p in chosen:
            pn = list(g.neighbors(level, p))
            if i not in pn:
                pn.append(i)
                if len(pn) > cap:
                    d_pn = _dist_many(vecs, np.asarray(pn), vecs[p], metric)
                    pn = _select_heuristic(list(zip(d_pn.tolist(), pn)), cap, vecs, metric)
                g.set_neighbors(level, p, pn)
        ep = cand[0][1] if cand else ep
    if node_level > g.max_level:
        g.max_level = node_level
        g.entry = i


class HNSWIndex:
    """Driver-built, broadcast-served HNSW graph."""

    def __init__(
        self,
        ids: np.ndarray,
        vecs: np.ndarray,
        graph: _Graph,
        metric: str,
        base: DataFrame | None = None,
        id_col: str = "id",
        path: str | None = None,
    ) -> None:
        self.ids = ids
        self.vecs = vecs
        self.graph = graph
        self.metric = metric
        self.base = base
        self.id_col = id_col
        self.path = path
        self._dist_factory = _make_dist_kernel(vecs, metric) if len(vecs) else None

    # ---- build (A11-A12, W4) ---------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        metric: str = "l2sqr",
        vec_col: str = "vec",
        id_col: str = "id",
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
        path: str | None = None,
    ) -> "HNSWIndex":
        rows = df.select(id_col, vec_col).orderBy(id_col).collect()
        ids = np.asarray([r[0] for r in rows], dtype=np.int64)
        vecs = np.asarray([r[1] for r in rows], dtype=np.float64)
        graph = cls._build_graph(vecs, metric, m, ef_construction, seed)
        obj = cls(ids, vecs, graph, metric, base=df, id_col=id_col, path=path)
        if path is not None:
            obj.save(path)
        return obj

    @staticmethod
    def _build_graph(vecs: np.ndarray, metric: str, m: int, ef_c: int, seed: int) -> _Graph:
        n = vecs.shape[0]
        g = _Graph(n, m)
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(m)
        levels = np.floor(-np.log(rng.uniform(size=n)) * ml).astype(np.int32)
        g.levels = levels
        dist_factory = _make_dist_kernel(vecs, metric)
        for i in range(n):
            node_level = int(levels[i])
            g.ensure_level(node_level, n)
            if g.entry < 0:
                g.entry = i
                g.max_level = node_level
                continue
            _insert_node(g, vecs, i, node_level, metric, ef_c, dist_factory)
        return g

    # ---- search (Q3) ------------------------------------------------------

    def search_np(self, q: np.ndarray, k: int, ef: int | None) -> tuple[np.ndarray, np.ndarray]:
        """Pure-numpy single search (the kernel the serve path runs per
        query): greedy descent + layer-0 beam with width max(ef, k).
        Hot path — uses the cached-self-dot distance kernel and a
        visited bitmap (no per-pop set churn)."""
        g = self.graph
        q = np.asarray(q, dtype=np.float64)
        ef_ = max(int(ef) if ef is not None else 2 * k, int(k))
        dist = self._dist_factory(q)
        # greedy descent through upper layers (hnsw_index.rs:336-350)
        cur = g.entry
        cur_d = float(dist(np.asarray([cur]))[0])
        for level in range(g.max_level, 0, -1):
            improved = True
            while improved:
                improved = False
                neigh = g.neighbors(level, cur)
                if neigh.size == 0:
                    continue
                ds = dist(neigh)
                best = int(np.argmin(ds))
                if float(ds[best]) < cur_d:
                    cur_d = float(ds[best])
                    cur = int(neigh[best])
                    improved = True
        # layer-0 beam (hnsw_index.rs:258-330)
        n = self.vecs.shape[0]
        visited = np.zeros(n, dtype=bool)
        visited[cur] = True
        frontier = [(cur_d, cur)]
        results = [(-cur_d, cur)]
        links0, counts0 = g.links[0], g.counts[0]
        while frontier:
            d, node = heapq.heappop(frontier)
            if d > -results[0][0] and len(results) >= ef_:
                break
            neigh = links0[node, : counts0[node]]
            fresh = neigh[~visited[neigh]]
            if fresh.size == 0:
                continue
            visited[fresh] = True
            ds = dist(fresh)
            worst = -results[0][0]
            full = len(results) >= ef_
            for dn, nn in zip(ds.tolist(), fresh.tolist()):
                if not full or dn < worst:
                    heapq.heappush(results, (-dn, nn))
                    if len(results) > ef_:
                        heapq.heappop(results)
                    full = len(results) >= ef_
                    worst = -results[0][0]
                    heapq.heappush(frontier, (dn, nn))
        res = sorted((-nd, node) for nd, node in results)[: int(k)]
        d = np_round_half_up(np.asarray([r[0] for r in res]))
        idx = np.asarray([r[1] for r in res], dtype=np.int64)
        return self.ids[idx], d

    def search(
        self,
        query: Sequence[float],
        k: int,
        ef: int | None = None,
        metric: str | None = None,
        upper_bound: float | None = None,
    ) -> DataFrame:
        """Single-query convenience form returning a DataFrame shaped
        like the flat path (id, dist). Runs on the driver — serving a
        point query from in-memory state, exactly the reference's
        latency model; no Spark job at all."""
        spark = self.base.sparkSession if self.base is not None else SparkSession.getActiveSession()
        ids, dists = self.search_np(np.asarray(list(query)), k, ef)
        rows = [(int(i), float(d)) for i, d in zip(ids, dists)
                if upper_bound is None or d <= upper_bound]
        rows.sort(key=lambda t: (t[1], t[0]))
        return spark.createDataFrame(rows or [], f"{self.id_col} long, dist double")

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        ef: int | None = None,
        qid_col: str = "query_id",
        qvec_col: str = "vec",
        upper_bound: float | None = None,
    ) -> DataFrame:
        """Broadcast the graph, beam-search inside mapInPandas over the
        queries DataFrame — queries are the parallel axis (bench.rs:
        414-417), no shuffle of anything but the k-bounded results."""
        spark = queries.sparkSession
        payload = (self.ids, self.vecs, self.metric,
                   self.graph.levels, self.graph.links, self.graph.counts,
                   self.graph.entry, self.graph.max_level, self.graph.M)
        bc = spark.sparkContext.broadcast(payload)
        id_col = self.id_col
        k_ = int(k)
        ef_ = ef

        ub = upper_bound

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids, vecs, metric, levels, links, counts, entry, max_level, m = bc.value
            g = _Graph(1, m)
            g.levels, g.links, g.counts, g.entry, g.max_level = levels, links, counts, entry, max_level
            idx = HNSWIndex(ids, vecs, g, metric)
            for pdf in batches:
                out_q, out_i, out_d = [], [], []
                for qid, qv in zip(pdf[qid_col], pdf[qvec_col]):
                    rid, rd = idx.search_np(np.asarray(qv, dtype=np.float64), k_, ef_)
                    if ub is not None:
                        keep = rd <= ub
                        rid, rd = rid[keep], rd[keep]
                    out_q.append(np.full(len(rid), qid, dtype=np.int64))
                    out_i.append(rid)
                    out_d.append(rd)
                if out_q:
                    yield pd.DataFrame({
                        "query_id": np.concatenate(out_q),
                        id_col: np.concatenate(out_i),
                        "dist": np.concatenate(out_d),
                    })

        # each query is answered completely inside one task (the graph is
        # broadcast), so results are already exact top-k ascending per
        # query — no cross-partition merge window, no shuffle at all
        return queries.select(qid_col, qvec_col).repartition(
            max(queries.sparkSession.sparkContext.defaultParallelism, 1)
        ).mapInPandas(run, schema=f"query_id long, {id_col} long, dist double")

    # ---- persistence (S8: hnsw_index.rs:644-670 saves links w/o vectors) --

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "graph.npz"),
            ids=self.ids,
            vecs=self.vecs.astype(np.float32),
            levels=self.graph.levels,
            **{f"links{g}": arr for g, arr in enumerate(self.graph.links)},
            **{f"counts{g}": arr for g, arr in enumerate(self.graph.counts)},
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"metric": self.metric, "id_col": self.id_col, "m": self.graph.M,
                       "entry": int(self.graph.entry), "max_level": int(self.graph.max_level),
                       "n_levels": len(self.graph.links)}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str, base: DataFrame | None = None) -> "HNSWIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        npz = np.load(os.path.join(path, "graph.npz"), allow_pickle=True)
        ids = npz["ids"]
        vecs = npz["vecs"].astype(np.float64)
        g = _Graph(len(ids), meta["m"])
        g.levels = npz["levels"]
        g.links = [npz[f"links{i}"] for i in range(meta["n_levels"])]
        g.counts = [npz[f"counts{i}"] for i in range(meta["n_levels"])]
        g.entry = meta["entry"]
        g.max_level = meta["max_level"]
        return cls(ids, vecs, g, meta["metric"], base=base, id_col=meta["id_col"], path=path)

    # ---- incremental add (W4: hnsw_index.rs:538-572) ----------------------

    def add_batch(self, new_ids: np.ndarray, new_vecs: np.ndarray, seed: int = 43) -> None:
        """Incremental insert — the invariant the reference guarantees:
        adds do NOT invalidate the HNSW graph (README.md:45). Rebuilds
        the flat arrays with the new rows appended, then inserts each
        new node with the standard insert loop."""
        n_old = self.vecs.shape[0]
        vecs = np.concatenate([self.vecs, np.asarray(new_vecs, dtype=np.float64)], axis=0)
        ids = np.concatenate([self.ids, np.asarray(new_ids, dtype=np.int64)])
        n = vecs.shape[0]
        g = self.graph
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(g.M)
        new_levels = np.floor(-np.log(rng.uniform(size=n - n_old)) * ml).astype(np.int32)
        g.levels = np.concatenate([g.levels, new_levels])
        # grow link arrays
        for lv in range(len(g.links)):
            pad = np.full((n - g.links[lv].shape[0], g.links[lv].shape[1]), -1, dtype=np.int32)
            g.links[lv] = np.concatenate([g.links[lv], pad], axis=0)
            g.counts[lv] = np.concatenate(
                [g.counts[lv], np.zeros(n - g.counts[lv].shape[0], dtype=np.int32)]
            )
        self.vecs, self.ids = vecs, ids
        self._dist_factory = _make_dist_kernel(vecs, self.metric)
        for off, i in enumerate(range(n_old, n)):
            node_level = int(new_levels[off])
            while len(g.links) <= node_level:
                g.links.append(np.full((n, g.M), -1, dtype=np.int32))
                g.counts.append(np.zeros(n, dtype=np.int32))
            _insert_node(g, vecs, i, node_level, self.metric, 200, self._dist_factory)
