"""Streaming sessionization (session_rollup_stream / session_ids_stream)
against the batch sessionize oracle on the same events."""

import time

import pandas as pd
from pyspark.sql import functions as F

from parquet_extra_spark.operators.temporal import session_windows, sessionize
from parquet_extra_spark.streaming import (
    session_ids_stream,
    session_rollup_stream,
    stream_from_directory,
)

SCHEMA = "user_id bigint, event_id bigint, ts timestamp"


def _events(spark):
    rows = []
    eid = 0
    # user 1: three sessions; user 2: two sessions
    for u, minutes in [
        (1, [0, 5, 8, 60, 62, 200, 201, 202]),
        (2, [10, 15, 300]),
    ]:
        for m in minutes:
            rows.append((u, eid, f"2026-01-01 {m // 60:02d}:{m % 60:02d}:00"))
            eid += 1
    # sentinel far in the future: pushes the watermark past every real
    # session so append-mode emits them all under availableNow
    rows.append((99, eid, "2026-01-02 12:00:00"))
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_session_rollup_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "landing")
    ev.coalesce(1).write.parquet(src)

    stream = stream_from_directory(spark, src, SCHEMA)
    sess = session_rollup_stream(
        stream, "user_id", "ts", gap="30 minutes", watermark="10 minutes",
        aggs=[F.sum("event_id").alias("sum_eid")],
    )
    out = str(tmp_path / "out")
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.read.parquet(out)
        .where(F.col("user_id") != 99)
        .select("user_id", "n_events", "sum_eid")
        .toPandas()
        .sort_values(["user_id", "sum_eid"])
        .reset_index(drop=True)
    )
    want = (
        session_windows(
            ev.where(F.col("user_id") != 99), "user_id", "ts",
            F.expr("INTERVAL 30 MINUTES"),
            aggs=[F.sum("event_id").alias("sum_eid")],
        )
        .select("user_id", "n_events", "sum_eid")
        .toPandas()
        .sort_values(["user_id", "sum_eid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_ids_match_batch_across_batches(spark, tmp_path):
    """Per-event ids from the stateful stream equal batch sessionize when
    the replay is in event-time order (even split across micro-batches)."""
    ev = _events(spark).where(F.col("user_id") != 99)
    src = str(tmp_path / "landing_ids")
    # split by time order: first half of each user's events, then second
    w_rows = ev.orderBy("ts", "event_id").collect()
    half = [r["event_id"] for r in w_rows[: len(w_rows) // 2]]
    a = ev.where(F.col("event_id").isin(half))
    b = ev.where(~F.col("event_id").isin(half))
    a.coalesce(1).write.parquet(src)
    time.sleep(1.1)
    b.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    ids = session_ids_stream(stream, "user_id", "ts", gap_seconds=1800)
    q = (
        ids.writeStream.format("memory")
        .queryName("sess_ids")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ids_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_ids")
    assert got.where(F.col("late")).count() == 0
    got_map = {
        (r["user_id"], r["t_us"]): r["session_n"] for r in got.collect()
    }
    want = sessionize(
        ev, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"), tiebreak="event_id"
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "session_n",
    )
    want_map = {
        (r["user_id"], r["t_us"]): r["session_n"] for r in want.collect()
    }
    assert got_map == want_map


def test_session_ids_flags_cross_batch_late_event(spark, tmp_path):
    """An event arriving in a later batch with an older timestamp is
    tagged late=true rather than silently renumbering history."""
    src = str(tmp_path / "landing_late")
    on_time = spark.createDataFrame(
        [(1, 0, "2026-01-01 00:00:00"), (1, 1, "2026-01-01 01:00:00")],
        "user_id bigint, event_id bigint, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    late = spark.createDataFrame(
        [(1, 2, "2026-01-01 00:30:00")],
        "user_id bigint, event_id bigint, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    on_time.coalesce(1).write.parquet(src)
    time.sleep(1.1)
    late.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    ids = session_ids_stream(stream, "user_id", "ts", gap_seconds=1800)
    q = (
        ids.writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["t_us"]: r for r in spark.sql("SELECT * FROM sess_late").collect()}
    late_us = int(
        pd.Timestamp("2026-01-01 00:30:00").value // 1000
    )
    assert rows[late_us]["late"] is True
    on_time_rows = [r for t, r in rows.items() if t != late_us]
    assert all(r["late"] is False for r in on_time_rows)
