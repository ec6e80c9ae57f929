"""Concurrent multi-table lifecycle against ONE manager — the mirror
of the reference's signature concurrency test (database/mod.rs:543-610):
two scoped writer threads, one per table (one key with unicode/special
characters), each driving create → add → build_hnsw → batch_add →
delete → add, then the main thread creates a similarly-named table,
builds PQ, and searches with an upper bound.

What this proves on our side: the catalog lock serializes the brief's
read-modify-write + tmp-file replace (two unsynchronized writers
interleave on brief.json.tmp), reserve/commit keeps id ranges disjoint,
and force_save snapshots the index map so a concurrent writer can't
mutate it mid-iteration."""

from __future__ import annotations

import threading

import pytest

from lab_1806_vec_db_spark.db.vecdb import VecDB


def _md(name: str) -> dict[str, str]:
    return {"name": name}


def test_two_writer_threads_two_tables(spark, tmp_path):
    db = VecDB(str(tmp_path / "db"), spark=spark)
    dim = 4
    errors: list[BaseException] = []

    def worker_a():
        try:
            key = "table_a"
            db.create_table_if_not_exists(key, dim, "cosine")
            db.add(key, [1.0, 0.0, 0.0, 0.0], _md("a"))
            db.build_hnsw_index(key)
            db.add(key, [0.0, 1.0, 0.0, 0.0], _md("b"))
            db.add(key, [0.0, 0.0, 1.0, 0.0], _md("c"))
            db.force_save()
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    def worker_b():
        try:
            key = "<表:b>"  # special characters (database/mod.rs:570)
            db.create_table_if_not_exists(key, dim, "cosine")
            db.build_hnsw_index(key)
            db.batch_add(
                key,
                [[0.0, 0.0, 0.0, 0.1], [0.0, 1.0, 0.0, 0.1], [0.0, 0.0, 1.0, 0.1]],
                [_md("a'"), _md("b'"), _md("c'")],
            )
            db.delete(key, _md("a'"))
            db.add(key, [1.0, 0.0, 0.0, 0.1], _md("d"))
            db.force_save()
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ta = threading.Thread(target=worker_a)
    tb = threading.Thread(target=worker_b)
    ta.start(); tb.start()
    ta.join(300); tb.join(300)
    assert not ta.is_alive() and not tb.is_alive(), "writer thread hung"
    assert not errors, f"writer thread failed: {errors!r}"

    # sanitized-filename collision with the unicode key resolves with a
    # suffix, never a clobber (database/mod.rs:589-592)
    assert db.create_table_if_not_exists("<表_b>", dim, "cosine")

    # both tables landed complete: disjoint ids, exact lengths
    assert db.get_len("table_a") == 3
    assert db.get_len("<表:b>") == 3  # 3 added + 1 added - 1 deleted
    ids_a = [r["id"] for r in db.table_df("table_a").select("id").collect()]
    assert sorted(ids_a) == [0, 1, 2]

    # the reference's final check: PQ build + upper_bound search on
    # table_a returns exactly the 'c' row (database/mod.rs:595-608)
    len_a = db.get_len("table_a")
    db.build_pq_table("table_a")
    results = db.search("table_a", [0.0, 0.0, 1.0, 0.0], len_a,
                        ef=len_a, upper_bound=0.5)
    assert [m["name"] for m, _ in results] == ["c"]

    # the brief survived the concurrent writes intact: reopen and serve
    db.close()
    db2 = VecDB(str(tmp_path / "db"), spark=spark)
    assert sorted(db2.get_all_keys()) == sorted(["table_a", "<表:b>", "<表_b>"])
    res2 = db2.search("<表:b>", [1.0, 0.0, 0.0, 0.1], k=1)
    assert res2[0][0]["name"] == "d"
    db2.close()


def test_concurrent_appends_same_table_disjoint_ids(spark, tmp_path):
    """Two threads appending to the SAME table: the locked
    reserve/commit read-modify-write hands out disjoint id ranges, so
    every row lands exactly once with a unique id."""
    db = VecDB(str(tmp_path / "db_same"), spark=spark)
    db.create_table_if_not_exists("t", 4, "l2sqr")
    errors: list[BaseException] = []

    def writer(tag: str):
        try:
            for i in range(4):
                db.batch_add(
                    "t",
                    [[float(i), 1.0 if tag == "x" else 2.0, 0.0, 0.0]] * 2,
                    [_md(f"{tag}{i}_0"), _md(f"{tag}{i}_1")],
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("x", "y")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not any(t.is_alive() for t in ts), "writer thread hung"
    assert not errors, f"writer thread failed: {errors!r}"
    assert db.get_len("t") == 16
    rows = db.table_df("t").select("id", "metadata").collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)) == 16
    names = {r["metadata"]["name"] for r in rows}
    assert len(names) == 16
    # next_id advanced exactly once per reserved row
    assert db._brief["tables"]["t"]["next_id"] == 16
    db.close()


def test_delete_table_serializes_with_inflight_append(spark, tmp_path):
    """delete_table takes the table's per-table lock BEFORE the catalog
    mutex (the same tlock→_mu order writers use), so a drop cannot
    rmtree the parquet dir out from under an in-flight batch_add: the
    drop waits for the append to commit, and any append that starts
    after the drop refuses cleanly with KeyError. Without the ordering,
    the racing parquet write recreated an orphaned table dir and
    _commit_append blew up on the missing brief entry."""
    import os
    import time

    db = VecDB(str(tmp_path / "db_droprace"), spark=spark)
    db.create_table_if_not_exists("t", 4, "l2sqr")
    errors: list[BaseException] = []

    def writer():
        try:
            for i in range(8):
                try:
                    db.batch_add(
                        "t",
                        [[float(i), 0.0, 0.0, 0.0]] * 4,
                        [_md(f"w{i}_{j}") for j in range(4)],
                    )
                except KeyError:
                    return  # table dropped mid-loop — clean refusal
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=writer)
    t.start()
    time.sleep(0.3)  # let at least one append get in flight
    assert db.delete_table("t")
    t.join(300)
    assert not t.is_alive(), "writer thread hung"
    assert not errors, f"writer thread failed: {errors!r}"

    # no orphaned dir, no catalog entry, no pending marker
    assert not db.contains_key("t")
    tables_dir = os.path.join(db.dir, "tables")
    assert "t" not in (os.listdir(tables_dir) if os.path.isdir(tables_dir) else [])

    # the key is immediately reusable and starts empty
    assert db.create_table_if_not_exists("t", 4, "l2sqr")
    assert db.get_len("t") == 0
    db.close()


def test_ivfpq_mirror_staleness_under_concurrent_append(spark, tmp_path):
    """The driver-local IVF+PQ mirror tail-refreshes LAZILY
    (index/ivfpq.py add_batch marks _local_stale; the next serve
    pulls the tail). Race a writer thread appending batches against a
    reader thread hammering point serves: in-flight serves must never
    corrupt (the refresh swaps in a NEW state dict, readers keep the
    snapshot they captured), every serve returns a sane ascending
    result, and after the writer finishes every appended row is
    visible to the next serve."""
    import numpy as np

    db = VecDB(str(tmp_path / "db_mirror"), spark=spark)
    db.create_table_if_not_exists("t", 8, "l2sqr")
    rng = np.random.default_rng(3)
    seed = [[float(x) for x in rng.standard_normal(8)] for _ in range(48)]
    db.batch_add("t", seed, [{"i": str(i)} for i in range(48)])
    db.build_ivfpq_index("t", k_coarse=4, m=4, n_bits=8, train_size=48,
                         n_probes=4)
    # warm the mirror
    assert db.search("t", seed[0], k=1, ef=48)[0][0] == {"i": "0"}
    idx = db._get_index("t", "ivfpq")
    assert idx._local_enabled

    errors: list[BaseException] = []
    waves = 5

    def writer():
        try:
            for w in range(waves):
                vecs = [[10.0 + w, float(j), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
                        for j in range(4)]
                db.batch_add("t", vecs,
                             [{"i": f"new{w}_{j}"} for j in range(4)])
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            for _ in range(40):
                res = db.search("t", seed[7], k=3, ef=48)
                assert res and res[0][0] == {"i": "7"}
                dists = [d for _, d in res]
                assert dists == sorted(dists)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    tw, tr = threading.Thread(target=writer), threading.Thread(target=reader)
    tw.start(); tr.start()
    tw.join(300); tr.join(300)
    assert not tw.is_alive() and not tr.is_alive(), "race thread hung"
    assert not errors, f"race thread failed: {errors!r}"

    # post-append visibility: the lazy refresh serves every new row
    for w in range(waves):
        probe = [10.0 + w, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        res = db.search("t", probe, k=1, ef=64)
        assert res[0][0] == {"i": f"new{w}_2"} and res[0][1] == 0.0
    db.close()
