"""Multimodal blob plumbing: schema, magic detection, Arrow-batched extract."""

from vptstools_spark.operators.multimodal import (
    _fake_decode,
    extract_features,
    with_blob_meta,
)

BLOBS = [
    (0, b"\xff\xd8\xff\xe0" + b"x" * 100),          # jpeg magic
    (1, b"\x89PNG\r\n\x1a\n" + b"y" * 50),          # png magic
    (2, b"RIFF" + b"z" * 20),                        # wav/riff magic
    (3, b"plain bytes"),
]


def _df(spark):
    return spark.createDataFrame(BLOBS, "id long, blob binary")


def test_blob_meta(spark):
    rows = {r["id"]: r["blob_meta"] for r in with_blob_meta(_df(spark), "blob").collect()}
    assert rows[0]["modality"] == "image/jpeg"
    assert rows[1]["modality"] == "image/png"
    assert rows[2]["modality"] == "audio/wav"
    assert rows[3]["modality"] == "application/octet-stream"
    assert rows[0]["n_bytes"] == 104


def test_extract_features_shape(spark):
    out = extract_features(_df(spark), dim=4)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(len(r["feature"]) == 4 for r in rows.values())
    assert rows[0]["n_bytes"] == 104


def test_fake_decode_deterministic():
    assert _fake_decode(b"abcdef", 3) == _fake_decode(b"abcdef", 3)
    assert _fake_decode(None, 3) is None
    assert _fake_decode(b"", 3) == [0.0, 0.0, 0.0]
