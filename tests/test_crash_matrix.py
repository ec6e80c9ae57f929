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
