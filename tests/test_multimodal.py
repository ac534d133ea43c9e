"""Multimodal plumbing: binary payload columns, Arrow-batched decode
(stub codec), expression-level frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from tia_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    decode_payloads,
    fake_decode,
    resize_images,
    sample_frames,
)


def _payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello world " * 50), (2, "tiny"), (3, "")], "doc_id bigint, text string"
    )
    return attach_payload(df, "text", "doc_id")


def test_attach_payload_is_binary(spark):
    df = _payloads(spark)
    assert dict(df.dtypes)["payload"] == "binary"
    n = {r["id"]: r["n"] for r in df.select("id", F.octet_length("payload").alias("n")).collect()}
    assert n[1] == 600 and n[2] == 4 and n[3] == 0


def test_decode_payloads_stub(spark):
    out = {r["id"]: r.asDict() for r in decode_payloads(_payloads(spark)).collect()}
    assert out[1]["n_bytes"] == 600
    assert out[1]["format"] == f"fake/{ord('h'):02x}"
    assert out[3]["format"] == "empty"
    # deterministic: matches the local stub exactly
    expect = fake_decode(b"tiny")
    assert out[2]["checksum"] == expect["checksum"]
    assert out[2]["width"] == expect["width"]


def test_resize_images_stub(spark):
    out = {r["id"]: r.asDict() for r in resize_images(_payloads(spark), target_w=64, target_h=64).collect()}
    assert out[1]["width"] == 64 and out[1]["height"] == 64
    assert out[1]["n_bytes"] == (64 * 64) // 512  # area-proportional stub
    assert out[3]["n_bytes"] == 0  # empty payload stays empty
    # deterministic: same input → same bytes
    again = {r["id"]: bytes(r["resized"]) for r in resize_images(_payloads(spark), target_w=64, target_h=64).collect()}
    assert again[1] == bytes(out[1]["resized"])


def test_sample_frames_expression_level(spark):
    df = sample_frames(_payloads(spark), every_n_bytes=100, max_frames=4)
    got = {r["id"]: r["frames"] for r in df.collect()}
    assert len(got[1]) == 4  # 600 bytes → capped at 4 frames
    assert all(len(bytes(f)) == 100 for f in got[1][:4])
    assert len(got[2]) == 1  # tiny payload → 1 frame
    assert bytes(got[2][0]) == b"tiny"


def test_null_payloads_degrade_not_crash(spark):
    """Review r5: a NULL payload must take the degrade-to-NULLs path
    (empty-bytes decode), never a worker-killing bytes(None)."""
    from tia_data_pipeline_spark.operators.multimodal import (
        decode_payloads,
        extract_media_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"P6 1 1 255 abc")), (2, None)], "id bigint, payload binary"
    )
    dec = {r["id"]: r.asDict() for r in decode_payloads(df).collect()}
    assert dec[2]["format"] == "empty" and dec[2]["n_bytes"] == 0
    rs = {r["id"]: r.asDict() for r in resize_images(df, target_w=8, target_h=8).collect()}
    assert rs[2]["orig_bytes"] == 0
    feats = {r["id"]: r.asDict() for r in extract_media_features(df).collect()}
    assert feats[2]["kind"] == "unknown" and feats[2]["width"] is None
