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


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based streaming dedup: exact content
    duplicates within the watermark are emitted once; distinct docs pass."""
    from parquet_extra_spark.streaming import dedup_stream

    src = str(tmp_path / "landing")
    docs = spark.createDataFrame(
        [
            (1, "alpha text", "2026-01-01 00:00:00"),
            (2, "alpha text", "2026-01-01 00:00:30"),   # dup of 1 (in watermark)
            (3, "beta text", "2026-01-01 00:01:00"),
            (4, "gamma text", "2026-01-01 00:01:30"),
            (5, "beta text", "2026-01-01 00:02:00"),    # dup of 3
        ],
        "doc_id bigint, text string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    docs.write.parquet(src)

    stream = stream_from_directory(
        spark, src, "doc_id bigint, text string, ts timestamp"
    )
    deduped = dedup_stream(stream, text_col="text", ts_col="ts")
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = [r["text"] for r in got.collect()]
    assert sorted(texts) == ["alpha text", "beta text", "gamma text"]


def test_streaming_ingest_stats_windows(spark, tmp_path):
    from parquet_extra_spark.streaming import ingest_stats_stream

    src = str(tmp_path / "landing2")
    rows = [
        (i, f"text {i}", ["en", "de"][i % 2], f"2026-01-01 00:{i % 50:02d}:00")
        for i in range(100)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    docs.write.parquet(src)

    stream = stream_from_directory(
        spark, src, "doc_id bigint, text string, lang string, ts timestamp"
    )
    stats = ingest_stats_stream(stream, ts_col="ts", key_col="lang", window="10 minutes")
    out = str(tmp_path / "stats_out")
    q = (
        stats.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    # watermark closes all but the last window(s); whatever is emitted
    # must be consistent per (window, lang)
    assert all(r["n_docs"] > 0 and r["n_bytes"] > 0 for r in got)
    assert {r["lang"] for r in got} <= {"en", "de"}


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState custom operator: cumulative per-key totals
    survive across micro-batches via the state store."""
    from parquet_extra_spark.streaming import running_totals_stream

    src = str(tmp_path / "landing3")
    docs = spark.createDataFrame(
        [(i, "x" * (10 + i % 5), ["en", "de"][i % 2]) for i in range(40)],
        "doc_id bigint, text string, lang string",
    )
    docs.write.parquet(src)
    stream = stream_from_directory(
        spark, src, "doc_id bigint, text string, lang string"
    )
    totals = running_totals_stream(stream, key_col="lang")
    q = (
        totals.writeStream.format("memory")
        .queryName("rt_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["key"]: (r["n_docs"], r["n_bytes"])
        for r in spark.sql(
            "SELECT key, max(n_docs) n_docs, max(n_bytes) n_bytes"
            " FROM rt_totals GROUP BY key"
        ).collect()
    }
    expect = {}
    for i in range(40):
        k = ["en", "de"][i % 2]
        n, b = expect.get(k, (0, 0))
        expect[k] = (n + 1, b + 10 + i % 5)
    assert got == expect
