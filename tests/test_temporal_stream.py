"""Streaming as-of enrichment vs the batch asof_join oracle."""

import time

import pandas as pd
from pyspark.sql import functions as F

from parquet_extra_spark.operators.temporal import asof_join
from parquet_extra_spark.streaming import asof_enrich_stream

L_SCHEMA = "k bigint, lt timestamp, lv bigint"
R_SCHEMA = "k bigint, rt timestamp, rv double"


def _ts(minute):
    return f"2026-01-01 {minute // 60:02d}:{minute % 60:02d}:00"


def _frames(spark):
    L = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2], "lm": [5, 10, 3, 7, 1], "lv": [10, 11, 12, 13, 14]}
    )
    R = pd.DataFrame(
        {"k": [1, 1, 2], "rm": [4, 10, 6], "rv": [100.0, None, 300.0]}
    )
    l = spark.createDataFrame(
        [(int(r.k), _ts(int(r.lm)), int(r.lv)) for r in L.itertuples()],
        "k long, lt_s string, lv long",
    ).withColumn("lt", F.col("lt_s").cast("timestamp")).drop("lt_s")
    r = spark.createDataFrame(
        [
            (int(x.k), _ts(int(x.rm)),
             None if pd.isna(x.rv) else float(x.rv))
            for x in R.itertuples()
        ],
        "k long, rt_s string, rv double",
    ).withColumn("rt", F.col("rt_s").cast("timestamp")).drop("rt_s")
    return l, r


def _run_stream(spark, tmp_path, name, l_batches, r_batches):
    lsrc = str(tmp_path / f"{name}_l")
    rsrc = str(tmp_path / f"{name}_r")
    for i, (lb, rb) in enumerate(zip(l_batches, r_batches)):
        mode = "overwrite" if i == 0 else "append"
        lb.coalesce(1).write.mode(mode).parquet(lsrc)
        rb.coalesce(1).write.mode(mode).parquet(rsrc)
        if i + 1 < len(l_batches):
            time.sleep(1.1)
    ls = spark.readStream.schema(L_SCHEMA).option("maxFilesPerTrigger", 1).parquet(lsrc)
    rs = spark.readStream.schema(R_SCHEMA).option("maxFilesPerTrigger", 1).parquet(rsrc)
    out = asof_enrich_stream(ls, rs, on="k", left_time="lt", right_time="rt")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_single_batch_matches_batch_asof(spark, tmp_path):
    l, r = _frames(spark)
    got = _run_stream(spark, tmp_path, "asof_s1", [l], [r])
    gm = {
        (row["k"], row["lt_us"]): (row["rt_us"], row["rv"], row["late"])
        for row in got.collect()
    }
    want = asof_join(l, r, "k", "lt", "rt").select(
        "k",
        F.unix_micros(F.col("lt").cast("timestamp")).alias("lt_us"),
        F.unix_micros(F.col("rt").cast("timestamp")).alias("rt_us"),
        "rv",
    )
    wm = {
        (row["k"], row["lt_us"]): (row["rt_us"], row["rv"])
        for row in want.collect()
    }
    assert set(gm) == set(wm)
    for key, (rt_us, rv, late) in gm.items():
        assert (rt_us, rv) == wm[key], key
        assert late is False


def test_state_carries_across_batches(spark, tmp_path):
    """Batch 1 delivers the right rows; batch 2's left events (all newer)
    must be served from the carried state."""
    l, r = _frames(spark)
    l_late = spark.createDataFrame(
        [(1, _ts(30), 99), (2, _ts(30), 98), (3, _ts(30), 97)],
        "k long, lt_s string, lv long",
    ).withColumn("lt", F.col("lt_s").cast("timestamp")).drop("lt_s")
    empty_r = r.limit(0)
    got = _run_stream(
        spark, tmp_path, "asof_s2", [l.limit(0), l_late], [r, empty_r]
    )
    gm = {row["k"]: (row["rt_us"], row["rv"], row["late"]) for row in got.collect()}
    # k=1: latest right is rt=10min (rv NULL — genuinely-null payload carried)
    ten_us = int(pd.Timestamp(_ts(10)).value // 1000)
    six_us = int(pd.Timestamp(_ts(6)).value // 1000)
    assert gm[1] == (ten_us, None, False)
    assert gm[2] == (six_us, 300.0, False)
    # k=3: no right state at all
    assert gm[3] == (None, None, False)


def test_old_left_event_tagged_late(spark, tmp_path):
    """A left event older than the carried right state is served from it
    but flagged (its historical truth is no longer held)."""
    l, r = _frames(spark)
    l_old = spark.createDataFrame(
        [(1, _ts(1), 50)], "k long, lt_s string, lv long",
    ).withColumn("lt", F.col("lt_s").cast("timestamp")).drop("lt_s")
    got = _run_stream(
        spark, tmp_path, "asof_s3", [l.limit(0), l_old], [r, r.limit(0)]
    )
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["late"] is True
    ten_us = int(pd.Timestamp(_ts(10)).value // 1000)
    assert rows[0]["rt_us"] == ten_us


def test_null_times_match_batch_semantics(spark, tmp_path):
    # ADVICE r4: null left times must match NOTHING (not be served stale
    # state via the NaT int64 sentinel); null right times are ignored.
    l = spark.createDataFrame(
        [(1, _ts(5), 10), (1, None, 11)], "k long, lt_s string, lv long"
    ).withColumn("lt", F.col("lt_s").cast("timestamp")).drop("lt_s")
    r = spark.createDataFrame(
        [(1, _ts(4), 100.0), (1, None, 999.0)],
        "k long, rt_s string, rv double",
    ).withColumn("rt", F.col("rt_s").cast("timestamp")).drop("rt_s")
    got = _run_stream(spark, tmp_path, "asof_nulls", [l], [r])
    rows = {row["lt_us"]: row for row in got.collect()}
    # the null-time left event: emitted, NULL match, not late
    assert None in rows
    nk = rows[None]
    assert nk["rt_us"] is None and nk["rv"] is None and not nk["late"]
    # the real event matches the real right row, never the null-time one
    real = [v for k, v in rows.items() if k is not None][0]
    assert real["rv"] == 100.0 and not real["late"]


def test_null_key_right_rows_match_nothing(spark, tmp_path):
    # batch asof_join drops null-key right rows; the stream must too —
    # groupBy(on) would otherwise group NULL keys and serve them.
    l = spark.createDataFrame(
        [(None, _ts(10), 10), (1, _ts(10), 11)],
        "k long, lt_s string, lv long",
    ).withColumn("lt", F.col("lt_s").cast("timestamp")).drop("lt_s")
    r = spark.createDataFrame(
        [(None, _ts(5), 111.0), (1, _ts(5), 222.0)],
        "k long, rt_s string, rv double",
    ).withColumn("rt", F.col("rt_s").cast("timestamp")).drop("rt_s")
    got = _run_stream(spark, tmp_path, "asof_nullkey", [l], [r])
    rows = {row["k"]: row for row in got.collect()}
    assert rows[None]["rv"] is None and rows[None]["rt_us"] is None
    assert rows[1]["rv"] == 222.0
