"""Multimodal binary-column plumbing tests: schema, Arrow batch shape,
stubbed codec behavior, frame sampling."""

from __future__ import annotations

import numpy as np
import pytest

from lab_1806_vec_db_spark.multimodal.binary_ops import (
    DETERMINISTIC_FAKE_DECODER,
    byte_stats,
    extract_features,
    frame_sample,
    media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, bytearray(b"\x01\x02\x03\x04"), "image/fake"),
        (1, bytearray(b"\xff" * 100), "image/fake"),
        (2, bytearray(b""), "image/fake"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, mt string")
    return media_table(df, content_col="content", id_col="id", media_type="image/fake")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["id", "media", "media_type", "meta"]
    assert media.schema["media"].dataType.simpleString() == "binary"


def test_extract_features_requires_decoder(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media).collect()


def test_extract_features_fake_decoder(media):
    rows = {r["id"]: r["features"] for r in
            extract_features(media, decoder=DETERMINISTIC_FAKE_DECODER).collect()}
    assert len(rows[0]) == 10
    assert rows[0][0] == 4.0  # n_bytes
    assert rows[0][1] == pytest.approx(2.5)  # mean byte
    assert rows[0][2:6] == [1.0, 2.0, 3.0, 4.0]  # first bytes
    assert rows[1][0] == 100.0 and rows[1][1] == 255.0
    assert rows[2][0] == 0.0  # empty blob survives


def test_byte_stats(media):
    rows = {r["id"]: r for r in byte_stats(media).collect()}
    assert rows[0]["n_bytes"] == 4 and rows[0]["first_byte"] == 1
    assert rows[1]["mean_byte"] == 255.0
    assert rows[2]["first_byte"] == -1


def test_frame_sample(media):
    frames = frame_sample(media, every_n_bytes=40, frame_bytes=10).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[1]) == 3  # 100 bytes / 40 → offsets 0, 40, 80
    assert bytes(by_id[1][0]["frame"]) == b"\xff" * 10
    assert len(by_id[0]) == 1
    assert 2 not in by_id  # empty blob yields no frames


def test_resize_bytes_nearest_sampling(spark):
    from lab_1806_vec_db_spark.multimodal.binary_ops import media_table, resize_bytes

    df = spark.createDataFrame([(0, "abcdefgh"), (1, "xy")], "id long, content string")
    media = media_table(df, content_col="content", id_col="id", media_type="text/plain")
    out = {r["id"]: bytes(r["media"]) for r in resize_bytes(media, target_bytes=4).collect()}
    assert out[0] == b"aceg"   # downsample: indices 0,2,4,6
    assert out[1] == b"xxyy"   # upsample: indices 0,0,1,1
