"""Binary source/sink roundtrips (S1-S4) and u8 typed tables (S2)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lab_1806_vec_db_spark.db.vecdb import VecDB
from lab_1806_vec_db_spark.sources.binary import (
    convert_fvecs_to_parquet,
    load_vecset_config,
    read_fvecs,
    read_raw_bin,
    read_with_config,
    write_fvecs,
    write_raw_bin,
)


def _write_fvecs_file(path, mat):
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<I", len(row)))
            f.write(np.asarray(row, dtype="<f4").tobytes())


@pytest.fixture(scope="module")
def mat():
    rng = np.random.default_rng(5)
    return rng.normal(size=(20, 6)).astype(np.float32)


def test_fvecs_roundtrip(spark, tmp_path, mat):
    src = str(tmp_path / "base.fvecs")
    _write_fvecs_file(src, mat)
    df = read_fvecs(spark, src)
    rows = {r["id"]: r["vec"] for r in df.collect()}
    assert len(rows) == 20
    assert np.allclose(rows[3], mat[3])
    # sink side
    out = str(tmp_path / "out.fvecs")
    assert write_fvecs(df, out) == 20
    back = {r["id"]: r["vec"] for r in read_fvecs(spark, out).collect()}
    assert np.allclose(back[7], mat[7])


def test_fvecs_to_parquet_converter(spark, tmp_path, mat):
    src = str(tmp_path / "c.fvecs")
    _write_fvecs_file(src, mat)
    dst = str(tmp_path / "c_parquet")
    assert convert_fvecs_to_parquet(spark, src, dst) == 20
    assert np.allclose(
        spark.read.parquet(dst).filter("id = 0").first()["vec"], mat[0]
    )


def test_raw_bin_f32_and_limit(spark, tmp_path, mat):
    src = str(tmp_path / "raw.bin")
    with open(src, "wb") as f:
        f.write(mat.astype("<f4").tobytes())
    df = read_raw_bin(spark, src, dim=6, data_type="float32")
    assert df.count() == 20
    lim = read_raw_bin(spark, src, dim=6, data_type="float32", limit=5)
    assert lim.count() == 5
    assert np.allclose(df.filter("id = 2").first()["vec"], mat[2])


def test_raw_bin_u8(spark, tmp_path):
    data = np.arange(24, dtype=np.uint8).reshape(4, 6)
    src = str(tmp_path / "raw_u8.bin")
    with open(src, "wb") as f:
        f.write(data.tobytes())
    df = read_raw_bin(spark, src, dim=6, data_type="uint8")
    rows = {r["id"]: list(r["vec"]) for r in df.collect()}
    assert rows[1] == list(range(6, 12))
    out = str(tmp_path / "sink_u8.bin")
    assert write_raw_bin(df, out, data_type="uint8") == 4
    assert open(out, "rb").read() == data.tobytes()


def test_toml_config_dispatch(spark, tmp_path, mat):
    src = str(tmp_path / "cfg.bin")
    with open(src, "wb") as f:
        f.write(mat.astype("<f4").tobytes())
    cfg = tmp_path / "vec.toml"
    cfg.write_text(
        f'[vec_data]\ndim = 6\ndata_type = "float32"\ndata_path = "{src}"\nlimit = 8\n'
    )
    parsed = load_vecset_config(str(cfg))
    assert parsed["dim"] == 6 and parsed["limit"] == 8
    df = read_with_config(spark, str(cfg))
    assert df.count() == 8
    with pytest.raises(ValueError, match="Unsupported data_type"):
        read_raw_bin(spark, src, 6, "f64")


def test_u8_vecdb_table(spark, tmp_path):
    db = VecDB(str(tmp_path / "db"), spark=spark)
    try:
        db.create_table_if_not_exists("q", 4, "l2sqr", data_type="uint8")
        assert db.get_data_type("q") == "uint8"
        # saturating NaN→0 ingest cast (scalar.rs:20-37)
        db.batch_add(
            "q",
            [[0.0, 300.0, -5.0, float("nan")], [1.5, 2.0, 3.0, 4.0]],
            [{"i": "0"}, {"i": "1"}],
        )
        data = db.extract_data("q")
        assert data[0][0] == [0.0, 255.0, 0.0, 0.0]
        assert data[1][0] == [1.0, 2.0, 3.0, 4.0]  # 1.5 truncates toward zero
        res = db.search("q", [1.0, 2.0, 3.0, 4.0], k=1)
        assert res[0][0] == {"i": "1"} and res[0][1] == 0.0
        with pytest.raises(ValueError, match="Invalid data type"):
            db.create_table_if_not_exists("bad", 4, "l2sqr", data_type="f64")
    finally:
        db.close()


def test_binary_sinks_refuse_past_row_bound(spark, tmp_path):
    """The single-file sinks are driver-side by construction: past the
    explicit bound they must raise (pointing at Parquet), not OOM the
    driver silently at scale."""
    import pytest

    from lab_1806_vec_db_spark.sources.binary import write_fvecs, write_raw_bin

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(10)],
        "id bigint, vec array<float>",
    )
    with pytest.raises(ValueError, match="Parquet"):
        write_fvecs(df, str(tmp_path / "x.fvecs"), max_rows=5)
    with pytest.raises(ValueError, match="Parquet"):
        write_raw_bin(df, str(tmp_path / "x.bin"), max_rows=5)
    # inside the bound both still produce byte-identical files
    n = write_fvecs(df, str(tmp_path / "ok.fvecs"), max_rows=10)
    assert n == 10
