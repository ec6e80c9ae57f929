"""Crash-point sweep over the append protocol: kill the write path at
each step boundary, reopen the directory cold (the lock holder "died"),
and assert the invariants every repair layer promises — no duplicate
ids, exact len, exactly one IVF+PQ code row per base row, and the
appended vectors (or none of them) searchable. The targeted tests cover
each window one at a time; this sweep proves the layers COMPOSE: any
single crash leaves a state the next open fully repairs.

Windows exercised (db/vecdb.py append crash protocol + index/ivfpq.py
durability protocol):
  reserve  — ids burned, nothing written
  append   — parquet rows landed, commit never ran
  absorb   — base committed, IVF+PQ add_batch never started (the gap
             only the codes watermark can see)
  watermark— codes landed, watermark never advanced
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.db.vecdb import VecDB

DIM = 8


def _vec(rng):
    return [float(x) for x in rng.standard_normal(DIM)]


def _crash_reopen(db, spark):
    """Simulate process death: drop the fs lock WITHOUT force_save,
    then open a fresh manager on the directory."""
    d = db.dir
    db._lock_fh.close()
    return VecDB(d, spark=spark)


def _assert_invariants(db, key="t"):
    rows = db.table_df(key).select("id").collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicate ids"
    assert len(ids) == db.get_len(key), "len out of sync with parquet"
    idx = db._get_index(key, "ivfpq")
    if idx is not None:
        code_ids = [
            r["vec_id" if idx.id_col == "vec_id" else "id"]
            for r in idx.codes_clustered.select(idx.id_col).collect()
        ]
        assert sorted(code_ids) == sorted(ids), "codes != base rows"


@pytest.fixture()
def seeded(spark, tmp_path):
    db = VecDB(str(tmp_path / "db"), spark=spark)
    db.create_table_if_not_exists("t", DIM, "l2sqr")
    rng = np.random.default_rng(11)
    vecs = [_vec(rng) for _ in range(24)]
    db.batch_add("t", vecs, [{"i": str(i)} for i in range(24)])
    db.build_ivfpq_index("t", k_coarse=4, m=4, n_bits=8, train_size=24,
                         n_probes=4)
    return db, rng


@pytest.mark.parametrize("path_kind", ["list", "df"])
@pytest.mark.parametrize("crash_at", ["reserve", "append", "absorb", "watermark"])
def test_crash_point_then_reopen_repairs(spark, tmp_path, seeded, crash_at,
                                         path_kind, monkeypatch):
    db, rng = seeded
    new = [_vec(rng) for _ in range(6)]
    metas = [{"i": f"n{j}"} for j in range(6)]

    def do_append():
        if path_kind == "list":
            db.batch_add("t", new, metas)
        else:  # the DataFrame-native / streaming micro-batch path
            bdf = spark.createDataFrame(
                [(v, m["i"]) for v, m in zip(new, metas)],
                "vec array<double>, i string",
            )
            db.batch_add_df("t", bdf, vec_col="vec", meta_cols=("i",))

    if crash_at == "reserve":
        real = db._reserve_append

        def boom(key, n):
            real(key, n)
            raise RuntimeError("crash after reserve")

        monkeypatch.setattr(db, "_reserve_append", boom)
    elif crash_at == "append":
        monkeypatch.setattr(
            db, "_commit_append",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash before commit")),
        )
    elif crash_at == "absorb":
        idx = db._get_index("t", "ivfpq")
        monkeypatch.setattr(
            idx, "add_batch",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash before absorb")),
        )
    else:  # watermark: codes landed, watermark advance dies
        idx = db._get_index("t", "ivfpq")
        monkeypatch.setattr(
            idx, "_write_watermark",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash before watermark")),
        )

    with pytest.raises(RuntimeError, match="crash"):
        do_append()

    monkeypatch.undo()
    db2 = _crash_reopen(db, spark)
    try:
        _assert_invariants(db2)
        n = db2.get_len("t")
        if crash_at in ("reserve", "append"):
            assert n == 24  # batch rolled back entirely
        else:
            assert n == 30  # base committed; index repair healed codes
            res = db2.search("t", new[3], k=1, ef=64)
            assert res[0][0]["i"] == "n3"
            assert res[0][1] == pytest.approx(0.0, abs=1e-9)
        # the table keeps working after repair: one more append + search
        more = _vec(rng)
        db2.batch_add("t", [more], [{"i": "post"}])
        _assert_invariants(db2)
        res = db2.search("t", more, k=1, ef=64)
        assert res[0][0]["i"] == "post"
    finally:
        db2.close()


# ---- delete / compact rewrite-swap windows ----------------------------------
#
# delete and compact_table replace the table directory through
# _rewrite's two-rename swap. The DIRECTORY is healed by
# _recover_table_swap at the next open; the BRIEF is healed by the
# pending_rewrite marker (_settle_rewrite): a delete that crashed after
# the swap landed would otherwise leave len stale and live indexes
# serving deleted rows' ids as ghost (empty-metadata) results.

import os as _os


def _crash_swap_at(monkeypatch, target_call: int):
    """Raise on the Nth rename of the swap window (1 = live→__old,
    2 = __tmp→live); every non-swap os.replace (brief.json writes)
    passes through untouched."""
    real = _os.replace
    seen = {"n": 0}

    def boom(src, dst):
        if "__old" in str(dst) or "__tmp" in str(src):
            seen["n"] += 1
            if seen["n"] == target_call:
                raise RuntimeError("crash mid-swap")
        return real(src, dst)

    monkeypatch.setattr("lab_1806_vec_db_spark.db.vecdb.os.replace", boom)


@pytest.mark.parametrize("crash_at", ["tmp_written", "old_renamed", "pre_brief"])
def test_delete_rewrite_crash_then_reopen_repairs(spark, tmp_path, seeded,
                                                  crash_at, monkeypatch):
    db, rng = seeded
    db.build_hnsw_index("t")
    pre_len = db.get_len("t")
    victim = db.table_df("t").filter(F.col("metadata").getItem("i") == "3")
    assert victim.count() == 1

    if crash_at == "tmp_written":
        _crash_swap_at(monkeypatch, 1)   # live dir untouched → rollback
    elif crash_at == "old_renamed":
        _crash_swap_at(monkeypatch, 2)   # __tmp complete → promote
    else:  # swap landed; crash before the brief learns about it
        monkeypatch.setattr(
            db, "_clear_pq_state",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash pre-brief")),
        )

    with pytest.raises(RuntimeError, match="crash"):
        db.delete("t", {"i": "3"})

    monkeypatch.undo()
    db2 = _crash_reopen(db, spark)
    try:
        # brief len == parquet truth on whichever side the swap settled
        rows = db2.table_df("t").select("id").collect()
        assert len(rows) == len({r["id"] for r in rows}) == db2.get_len("t")
        assert db2.get_len("t") in (pre_len, pre_len - 1)
        # indexes were conservatively cleared — no artifact can serve
        # a deleted id as a ghost row
        assert not db2.has_hnsw_index("t")
        assert not db2.has_ivfpq_index("t")
        # the delete is cleanly repeatable and the table keeps working
        db2.delete("t", {"i": "3"})
        assert db2.get_len("t") == pre_len - 1
        assert all(r["metadata"]["i"] != "3"
                   for r in db2.table_df("t").select("metadata").collect())
        v = _vec(rng)
        db2.batch_add("t", [v], [{"i": "post"}])
        assert db2.search("t", v, k=1)[0][0]["i"] == "post"
    finally:
        db2.close()


@pytest.mark.parametrize("crash_at", ["tmp_written", "old_renamed"])
@pytest.mark.parametrize("via_force_save", [False, True])
def test_compact_rewrite_crash_then_reopen_repairs(spark, tmp_path, seeded,
                                                   crash_at, via_force_save,
                                                   monkeypatch):
    """Compaction through the same swap window — including the
    auto_compact policy path inside force_save — must land on a state
    with identical rows, correct len, and LIVE indexes (content is
    unchanged on both sides of the swap, so nothing needs clearing)."""
    db, rng = seeded
    pre_ids = sorted(r["id"] for r in db.table_df("t").select("id").collect())
    probe = _vec(rng)
    db.batch_add("t", [probe], [{"i": "probe"}])
    pre_len = db.get_len("t")

    _crash_swap_at(monkeypatch, 1 if crash_at == "tmp_written" else 2)
    with pytest.raises(RuntimeError, match="crash"):
        if via_force_save:
            db.auto_compact_factor = 0  # any file count trips the policy
            db.force_save()
        else:
            db.compact_table("t", rows_per_file=1_000)

    monkeypatch.undo()
    db2 = _crash_reopen(db, spark)
    try:
        _assert_invariants(db2)
        assert db2.get_len("t") == pre_len
        ids = sorted(r["id"] for r in db2.table_df("t").select("id").collect())
        assert ids == pre_ids + [pre_len - 1]
        # indexes survived and still serve (content untouched)
        assert db2.has_ivfpq_index("t")
        res = db2.search("t", probe, k=1, ef=64)
        assert res[0][0]["i"] == "probe"
        # a clean compaction completes after the crash
        db2.compact_table("t", rows_per_file=1_000)
        _assert_invariants(db2)
    finally:
        db2.close()
