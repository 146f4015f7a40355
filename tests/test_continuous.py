"""ContinuousAggregate: incrementally-maintained GROUP BY over a
checkpointed chunk table, verified against full recomputes."""

import json
import os

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark import ContinuousAggregate


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10, float(i)) for i in range(lo, hi)],
        "k bigint, g string, v bigint, x double",
    )


AGGS = [
    ("count", "*", "n"),
    ("sum", "v", "sv"),
    ("min", "v", "lo"),
    ("max", "v", "hi"),
    ("avg", "x", "mx"),
]


def _want(df):
    rows = (
        df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("x").alias("mx"),
        )
        .collect()
    )
    return {
        r["g"]: (r["n"], r["sv"], r["lo"], r["hi"], round(r["mx"], 9))
        for r in rows
    }


def _got(ca, spark):
    return {
        r["g"]: (r["n"], r["sv"], r["lo"], r["hi"], round(r["mx"], 9))
        for r in ca.result(spark).collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    ca = ContinuousAggregate(src, state, ["g"], AGGS)
    batches = [(0, 50), (50, 80), (80, 130)]
    seen_hi = 0
    for lo, hi in batches:
        pes.encode_to(_mk(spark, lo, hi), src, dataset_id=f"b{lo}", **kw)
        rep = ca.refresh(spark)
        assert rep["new_runs"] >= 1
        seen_hi = hi
        assert _got(ca, spark) == _want(_mk(spark, 0, seen_hi))


def test_refresh_without_new_data_is_noop(spark, tmp_path):
    src = str(tmp_path / "src2")
    state = str(tmp_path / "state2")
    pes.encode_to(_mk(spark, 0, 40), src, dataset_id="b0",
                  chunk_rows=32, n_buckets=1, n_salts=1)
    ca = ContinuousAggregate(src, state, ["g"], AGGS)
    v1 = ca.refresh(spark)["version"]
    rep = ca.refresh(spark)
    assert rep == {"new_runs": 0, "version": v1}
    assert _got(ca, spark) == _want(_mk(spark, 0, 40))


def test_crash_between_state_write_and_pointer_is_exactly_once(
    spark, tmp_path
):
    """Simulate a crash AFTER v2 was written but BEFORE _CURRENT moved:
    the re-run must re-consume the same increment once (no double
    count), because consumption is driven by the pointer's run-id set."""
    src = str(tmp_path / "src3")
    state = str(tmp_path / "state3")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    ca = ContinuousAggregate(src, state, ["g"], AGGS)
    pes.encode_to(_mk(spark, 0, 50), src, dataset_id="b0", **kw)
    ca.refresh(spark)
    cur_v1 = json.load(open(os.path.join(state, "_CURRENT")))

    pes.encode_to(_mk(spark, 50, 90), src, dataset_id="b50", **kw)
    ca.refresh(spark)
    # roll the pointer back: as if the crash hit before os.replace
    with open(os.path.join(state, "_CURRENT"), "w") as f:
        json.dump(cur_v1, f)
    rep = ca.refresh(spark)
    assert rep["new_runs"] == 1
    assert _got(ca, spark) == _want(_mk(spark, 0, 90))


def test_result_before_first_refresh_raises(spark, tmp_path):
    ca = ContinuousAggregate(str(tmp_path / "x"), str(tmp_path / "y"),
                             ["g"], AGGS)
    with pytest.raises(ValueError, match="no state"):
        ca.result(spark)


def test_bad_specs_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        ContinuousAggregate("a", "b", ["g"], [("median", "v", "m")])
    with pytest.raises(ValueError, match="alias"):
        ContinuousAggregate("a", "b", ["g"],
                            [("sum", "v", "s"), ("min", "v", "s")])
    with pytest.raises(ValueError, match="keys"):
        ContinuousAggregate("a", "b", "g", [("sum", "v", "s")])


def test_slack_compaction_bounds_state_and_stays_exact(spark, tmp_path):
    """With offset_compact_slack, the pointer stores {frontier, recent
    ids} — bounded by commit rate x slack — and refreshes stay exact."""
    import time as _time

    src = str(tmp_path / "src4")
    state = str(tmp_path / "state4")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    ca = ContinuousAggregate(src, state, ["g"], AGGS,
                             offset_compact_slack=0.05)
    batches = [(0, 30), (30, 60), (60, 90), (90, 120)]
    for lo, hi in batches:
        pes.encode_to(_mk(spark, lo, hi), src, dataset_id=f"b{lo}", **kw)
        _time.sleep(0.12)  # push earlier commits below the frontier
        ca.refresh(spark)
        assert _got(ca, spark) == _want(_mk(spark, 0, hi))
    cur = json.load(open(os.path.join(state, "_CURRENT")))
    assert "frontier" in cur
    # every run older than the frontier got compacted out of the list
    assert len(cur["consumed_run_ids"]) < len(batches)
    # and a further no-new-data refresh remains a no-op (implicitly
    # consumed runs are not re-consumed)
    v = cur["version"]
    assert ca.refresh(spark) == {"new_runs": 0, "version": v}


def test_slack_toggle_mid_stream_is_safe(spark, tmp_path):
    """A strict state dir keeps working when slack is turned on, and a
    compacted one when slack is turned off (shared offset decoding)."""
    src = str(tmp_path / "src5")
    state = str(tmp_path / "state5")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    pes.encode_to(_mk(spark, 0, 40), src, dataset_id="b0", **kw)
    ContinuousAggregate(src, state, ["g"], AGGS).refresh(spark)
    pes.encode_to(_mk(spark, 40, 70), src, dataset_id="b40", **kw)
    ca2 = ContinuousAggregate(src, state, ["g"], AGGS,
                              offset_compact_slack=3600.0)
    assert ca2.refresh(spark)["new_runs"] == 1
    assert _got(ca2, spark) == _want(_mk(spark, 0, 70))
    pes.encode_to(_mk(spark, 70, 90), src, dataset_id="b70", **kw)
    ca3 = ContinuousAggregate(src, state, ["g"], AGGS)  # strict again
    assert ca3.refresh(spark)["new_runs"] == 1
    assert _got(ca3, spark) == _want(_mk(spark, 0, 90))


def test_consumed_run_rewrite_detected_and_rebaseline_recovers(
    spark, tmp_path
):
    """An out-of-band rewrite that drops a consumed run from the manifest
    must make refresh() REFUSE (stale folded-in partials), and
    rebaseline() must rebuild the exact aggregate from the current
    table."""
    src = str(tmp_path / "src6")
    state = str(tmp_path / "state6")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    ca = ContinuousAggregate(src, state, ["g"], AGGS)
    pes.encode_to(_mk(spark, 0, 50), src, dataset_id="b0", **kw)
    ca.refresh(spark)
    pes.encode_to(_mk(spark, 50, 80), src, dataset_id="b50", **kw)
    ca.refresh(spark)

    # rewrite the checkpoint out-of-band: drop one consumed run's
    # manifest rows (as a compaction materializing a rewritten table
    # would). pyarrow, not Spark, so no cached plan can mask the change.
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    man_dir = os.path.join(src, "manifest")
    t = pq.read_table(man_dir)
    # keep exactly dataset b0's run (run ids are random uuids)
    keep = t.filter(pc.equal(t.column("dataset_id"), "b0"))
    assert keep.num_rows > 0
    for f in os.listdir(man_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(man_dir, f))
    pq.write_table(keep, os.path.join(man_dir, "part-rewrite.parquet"))

    with pytest.raises(ValueError, match="vanished"):
        ca.refresh(spark)

    rep = ca.rebaseline(spark)
    assert rep["version"] >= 3
    # the aggregate now reflects the CURRENT table (run b0 only)
    assert _got(ca, spark) == _want(_mk(spark, 0, 50))
    # and refresh works again from the rebaselined state
    pes.encode_to(_mk(spark, 80, 100), src, dataset_id="b80", **kw)
    assert ca.refresh(spark)["new_runs"] == 1
    assert _got(ca, spark) == _want(
        _mk(spark, 0, 50).unionByName(_mk(spark, 80, 100))
    )
