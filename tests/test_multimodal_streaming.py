"""Multimodal plumbing + streaming encode tests."""

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark.operators import multimodal as mm
from parquet_extra_spark.streaming import encode_stream, stream_from_directory


def test_media_features_deterministic(spark):
    media = mm.synth_media(spark, n=60)
    feats = mm.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows)
    # deterministic: same input -> same features
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_media_real_decode_stubbed(spark):
    media = mm.synth_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|not installed|requires"):
        mm.extract_features(media, fake=False).collect()


def test_frame_sample_plan(spark):
    media = mm.synth_media(spark, n=30)
    plan = mm.frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert rows, "no video rows planned"
    vids = {r["media_id"] for r in media.filter("kind = 'video'").collect()}
    assert {r["media_id"] for r in rows} == vids
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["ts_ms"])
    for mid, ts in by_media.items():
        assert ts == sorted(ts)
        assert ts[0] == 0


def test_resize_stub_keeps_magic(spark):
    media = mm.synth_media(spark, n=30)
    out = mm.resize_stub(media, 128, 128).collect()
    assert out and all(r["width"] == 128 and r["height"] == 128 for r in out)
    assert all(bytes(r["payload"])[:4] == b"\x89PNG" for r in out)


def test_media_roundtrip_through_engine(spark):
    """binary payload columns survive the columnar codec engine."""
    media = mm.synth_media(spark, n=64).select(
        "media_id", "kind", "payload"
    )
    chunks = pes.encode(media, partition_cols=["kind"], chunk_rows=32, n_buckets=2, n_salts=2)
    assert pes.roundtrip_ok(media, pes.decode(chunks))


def test_streaming_encode_exactly_once(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "landing")
    src.limit(200).write.mode("overwrite").parquet(in_dir)

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    stream = stream_from_directory(spark, in_dir, schema)
    q = encode_stream(
        stream,
        out_dir=str(tmp_path / "enc"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_cols=["lang"],
        chunk_rows=64,
        n_buckets=2,
        n_salts=1,
    )
    q.awaitTermination(120)
    chunks = pes.read_chunks(spark, str(tmp_path / "enc"))
    decoded = pes.decode(chunks)
    expected = spark.read.parquet(in_dir)
    assert pes.roundtrip_ok(expected, decoded)

    # restart the stream over the same source: offsets committed -> no new work
    before = chunks.count()
    q2 = encode_stream(
        stream_from_directory(spark, in_dir, schema),
        out_dir=str(tmp_path / "enc"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_cols=["lang"],
        chunk_rows=64,
        n_buckets=2,
        n_salts=1,
    )
    q2.awaitTermination(120)
    assert pes.read_chunks(spark, str(tmp_path / "enc")).count() == before
