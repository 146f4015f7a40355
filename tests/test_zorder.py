"""Z-order multi-column clustering: box queries prune on EVERY z
dimension, where a single-column sort prunes on one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "value"
    ).cache()


_KW = dict(chunk_rows=64, n_buckets=1, n_salts=1, num_partitions=1)


@pytest.fixture(scope="module")
def zchunks(spark, events):
    ch = pes.zorder_encode(events, ["user_id", "value"], **_KW).cache()
    ch.count()
    return ch


def _kept(chunks, pred):
    s = pes.pushdown_stats_pred(chunks, pred)
    return s["chunks_kept"], s["chunks_total"]


def test_zorder_box_query_exact(spark, events, zchunks):
    pred = (
        pes.P.ge("user_id", 100) & pes.P.le("user_id", 200)
        & pes.P.ge("value", 10.0) & pes.P.le("value", 30.0)
    )
    res = pes.filter_decode_pred(
        zchunks, pred, columns=["event_id", "user_id", "value"]
    )
    expect = events.filter(
        (F.col("user_id") >= 100) & (F.col("user_id") <= 200)
        & (F.col("value") >= 10.0) & (F.col("value") <= 30.0)
    )
    assert pes.roundtrip_ok(expect, res)


def test_zorder_prunes_on_both_dimensions(spark, events, zchunks):
    # single-column clustering on user_id: value queries see full ranges
    single = pes.encode(events, sort_cols=["user_id"], unit_sort=True, **_KW).cache()
    single.count()

    lo, hi = events.approxQuantile("value", [0.4, 0.5], 0.01)
    value_band = pes.P.ge("value", lo) & pes.P.le("value", hi)
    z_kept, z_total = _kept(zchunks, value_band)
    s_kept, s_total = _kept(single, value_band)
    assert z_total == s_total > 8
    # the single-sorted table cannot prune the secondary dimension...
    assert s_kept > s_total * 0.8
    # ...the z-ordered table provably does (the margin is modest on this
    # skewed 15-chunk table — the uniform-grid test below pins the
    # geometry exactly)
    assert z_kept < s_kept

    # and the PRIMARY dimension still prunes on the z table too
    ulo, uhi = events.approxQuantile("user_id", [0.4, 0.5], 0.01)
    user_band = pes.P.ge("user_id", ulo) & pes.P.le("user_id", uhi)
    zu_kept, _ = _kept(zchunks, user_band)
    assert zu_kept < z_total
    single.unpersist()


def test_zorder_tiles_uniform_grid(spark):
    """Exact curve geometry: 64x64 uniform grid, 16 chunks of 256 rows =
    the 4x4 level-2 Morton quadrants. A band covering one quadrant row
    of a dimension must keep ~4/16 chunks on that dimension — for BOTH
    dimensions (a single sort gets one)."""
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("long").alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    ch = pes.zorder_encode(
        grid, ["x", "y"], n_bits=6,
        bounds={"x": (0.0, float(n)), "y": (0.0, float(n))},
        chunk_rows=256, n_buckets=1, n_salts=1, num_partitions=1,
    ).cache()
    ch.count()
    for dim in ("x", "y"):
        band = pes.P.ge(dim, 16) & pes.P.le(dim, 30)  # one quadrant row
        kept, total = _kept(ch, band)
        assert total == 16
        assert kept <= 6, (dim, kept)  # 4 tiles + boundary slack
    ch.unpersist()


def test_zorder_roundtrip_and_zcol(spark, events, zchunks):
    # decoded table carries the __z column; the source columns are exact
    dec = pes.decode(zchunks)
    assert "__z" in dec.columns
    assert pes.roundtrip_ok(events, dec.drop("__z"))


def test_zorder_validation(spark, events):
    with pytest.raises(ValueError, match=">= 2"):
        pes.zorder_encode(events, ["user_id"], **_KW)
    with pytest.raises(ValueError, match="unknown"):
        pes.zorder_key(events, ["user_id", "nope"])
    with pytest.raises(TypeError, match="non-orderable"):
        ev = events.withColumn("s", F.lit("x"))
        pes.zorder_key(ev, ["user_id", "s"])
    with pytest.raises(ValueError, match="63 bits"):
        pes.zorder_key(events, ["user_id", "value"], n_bits=32)
    with pytest.raises(ValueError, match="owns"):
        pes.zorder_encode(events, ["user_id", "value"], unit_sort=False, **_KW)


def test_zorder_all_null_column(spark):
    """approxQuantile returns [] for an all-NULL column; it must fall
    back to degenerate bounds (bucket 0), not crash — and the other
    dimension keeps its ordering."""
    df = spark.range(300).select(
        F.col("id"), F.lit(None).cast("double").alias("allnull")
    )
    ch = pes.zorder_encode(df, ["id", "allnull"], **_KW)
    assert pes.roundtrip_ok(df, pes.decode(ch).drop("__z"))
    kept, total = _kept(ch, pes.P.le("id", 50))
    assert kept < total


def test_zorder_nulls_and_constant_column(spark):
    df = (
        spark.range(500)
        .select(
            F.col("id"),
            F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") * 2).alias("a"),
            F.lit(5.0).alias("const"),
        )
    )
    ch = pes.zorder_encode(df, ["a", "const"], **_KW)
    assert pes.roundtrip_ok(df, pes.decode(ch).drop("__z"))


def test_zorder_composes_with_partition_and_bloom(spark, events):
    """The passthrough kwargs a real ingest would use: hash-clustered
    partition_cols for the string dimension, bloom digests for point
    lookups, z-order for the numeric box — all on one chunk table."""
    ev = events.withColumn(
        "shard", F.concat(F.lit("s"), (F.col("user_id") % 3).cast("string"))
    )
    ch = pes.zorder_encode(
        ev, ["user_id", "value"],
        partition_cols=["shard"], bloom_cols={"event_id"},
        chunk_rows=64, n_buckets=2, n_salts=1, num_partitions=2,
    ).cache()
    ch.count()
    assert pes.roundtrip_ok(ev, pes.decode(ch).drop("__z"))
    # box pruning still bites with partition clustering in front
    pred = pes.P.ge("user_id", 100) & pes.P.le("user_id", 200) \
        & pes.P.ge("value", 10.0) & pes.P.le("value", 30.0)
    s = pes.pushdown_stats_pred(ch, pred)
    assert s["chunks_kept"] < s["chunks_total"]
    # and the bloom digest prunes a point probe on the un-z'd key
    some_id = ev.select("event_id").first()[0]
    got = pes.filter_decode_pred(ch, pes.P.eq("event_id", some_id))
    assert got.count() == ev.filter(F.col("event_id") == some_id).count()
    ch.unpersist()


def test_zorder_explicit_bounds_skip_quantile_pass(spark, events):
    z1 = pes.zorder_key(
        events, ["user_id", "value"],
        bounds={"user_id": (0.0, 1000.0), "value": (0.0, 100.0)},
    )
    # no scan needed at plan-build time; expression compiles and evaluates
    n = events.select(z1.alias("z")).filter(F.col("z") >= 0).count()
    assert n == events.count()
