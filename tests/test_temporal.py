"""Temporal operators (asof_join / range_join / sessionize) and
deterministic sampling, each checked against an independent DuckDB
computation of the same semantics on the same rows."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquet_extra_spark.operators.temporal import (
    asof_join,
    asof_join_broadcast,
    gap_fill,
    interval_join,
    range_join,
    session_windows,
    sessionize,
)
from parquet_extra_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    oracle_bucket_sql,
    stratified_hash_sample,
    weighted_hash_sample,
)


@pytest.fixture(scope="module")
def lr(spark):
    L = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2, 3], "lt": [5, 10, 3, 7, 1, 9],
         "lv": ["a", "b", "c", "d", "e", "f"]}
    )
    R = pd.DataFrame(
        {"k": [1, 1, 2, 4], "rt": [4, 10, 6, 1], "rv": [100.0, 200.0, None, 400.0]}
    )
    return L, R, spark.createDataFrame(L), spark.createDataFrame(R)


def _duck(L, R, sql):
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    return con.sql(sql).df()


class TestAsofJoin:
    def test_backward_left_matches_duckdb(self, lr):
        L, R, l, r = lr
        got = asof_join(l, r, "k", "lt", "rt").orderBy("k", "lt").toPandas()
        want = _duck(
            L, R,
            "select l.k, l.lt, l.lv, r.rt, r.rv from L l asof left join R r "
            "on l.k = r.k and l.lt >= r.rt order by l.k, l.lt",
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_inner_drops_unmatched(self, lr):
        L, R, l, r = lr
        got = asof_join(l, r, "k", "lt", "rt", how="inner")
        assert got.count() == 3  # (1,5) (1,10) (2,7)
        assert got.where(F.col("rt").isNull()).count() == 0

    def test_forward_with_tolerance(self, lr):
        L, R, l, r = lr
        got = (
            asof_join(l, r, "k", "lt", "rt", direction="forward",
                      tolerance=2, how="inner")
            .orderBy("k", "lt").toPandas()
        )
        want = _duck(
            L, R,
            "select l.k, l.lt, l.lv, r.rt, r.rv from L l asof join R r "
            "on l.k = r.k and l.lt <= r.rt where r.rt - l.lt <= 2 "
            "order by l.k, l.lt",
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_tie_at_equal_time_matches(self, spark):
        l = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [10]}))
        r = spark.createDataFrame(pd.DataFrame({"k": [1], "rt": [10], "rv": [7]}))
        row = asof_join(l, r, "k", "lt", "rt").first()
        assert row["rv"] == 7

    def test_null_payload_in_matched_row_survives(self, lr):
        # last(ignorenulls) must not skip past a matched right row whose
        # PAYLOAD is null — the struct packing guarantees this.
        L, R, l, r = lr
        row = (
            asof_join(l, r, "k", "lt", "rt")
            .where((F.col("k") == 2) & (F.col("lt") == 7)).first()
        )
        assert row["rt"] == 6 and row["rv"] is None

    def test_name_collision_suffix(self, spark):
        l = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [10], "v": [1]}))
        r = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [5], "v": [2]}))
        out = asof_join(l, r, "k", "t", "t")
        assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}
        row = out.first()
        assert row["v"] == 1 and row["v_r"] == 2 and row["t_r"] == 5

    def test_multi_key(self, spark):
        l = spark.createDataFrame(
            pd.DataFrame({"a": [1, 1], "b": ["x", "y"], "t": [10, 10]})
        )
        r = spark.createDataFrame(
            pd.DataFrame({"a": [1, 1], "b": ["x", "y"], "t": [5, 8], "v": [1, 2]})
        )
        got = {
            (row["a"], row["b"]): row["v"]
            for row in asof_join(l, r, ["a", "b"], "t", "t").collect()
        }
        assert got == {(1, "x"): 1, (1, "y"): 2}

    def test_single_shuffle_plan(self, lr):
        # union+window = one Exchange total (both sides flow into the same
        # hashpartitioning on the key); no Join node at all.
        _, _, l, r = lr
        plan = asof_join(l, r, "k", "lt", "rt")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_null_left_time_matches_nothing(self, spark, direction):
        l = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "lt": [10, pd.NA]}),
            schema="k long, lt long",
        )
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1], "rt": [10], "rv": [7]})
        )
        rows = {
            row["lt"]: row["rv"]
            for row in asof_join(l, r, "k", "lt", "rt",
                                 direction=direction).collect()
        }
        assert rows[10] == 7 and rows[None] is None

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_null_right_time_rows_ignored(self, spark, direction):
        l = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [10]}))
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "rt": [pd.NA, 10], "rv": [9, 2]}),
            schema="k long, rt long, rv long",
        )
        row = asof_join(l, r, "k", "lt", "rt", direction=direction).first()
        assert row["rt"] == 10 and row["rv"] == 2

    def test_bad_args(self, lr):
        _, _, l, r = lr
        with pytest.raises(ValueError):
            asof_join(l, r, "k", "lt", "rt", direction="sideways")
        with pytest.raises(ValueError):
            asof_join(l, r, "k", "lt", "rt", how="outer")


class TestAsofJoinBroadcast:
    @pytest.fixture(scope="class")
    def fuzz(self, spark):
        import random

        random.seed(7)
        L = pd.DataFrame(
            {"k": [random.randint(0, 9) for _ in range(400)],
             "lt": [random.randint(0, 1000) for _ in range(400)],
             "lv": list(range(400))}
        )
        pairs = random.sample(
            [(k, t) for k in range(12) for t in range(0, 1000, 7)], 300
        )
        R = pd.DataFrame(
            {"k": [p[0] for p in pairs], "rt": [p[1] for p in pairs],
             "rv": [random.choice([None, float(i)])
                    for i, _ in enumerate(pairs)]}
        )
        return spark.createDataFrame(L), spark.createDataFrame(R)

    @pytest.mark.parametrize(
        "kw",
        [dict(), dict(direction="forward"), dict(tolerance=15),
         dict(how="inner"),
         dict(direction="forward", tolerance=15, how="inner")],
        ids=["backward", "forward", "tolerance", "inner", "fwd-tol-inner"],
    )
    def test_matches_union_window_formulation(self, fuzz, kw):
        l, r = fuzz
        key = lambda df: sorted(
            map(tuple, df.toPandas().fillna(-9).values.tolist())
        )
        assert key(asof_join_broadcast(l, r, "k", "lt", "rt", **kw)) == key(
            asof_join(l, r, "k", "lt", "rt", **kw)
        )

    def test_left_side_never_shuffles(self, fuzz):
        l, r = fuzz
        plan = asof_join_broadcast(l, r, "k", "lt", "rt")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the ONE hash exchange is the dim-side groupBy; left flows
        # scan -> broadcast join with no repartitioning
        assert plan.count("Exchange hashpartitioning") == 1

    def test_null_right_time_rows_ignored(self, spark):
        l = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [10]}))
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "rt": [pd.NA, 5], "rv": [9, 2]}),
            schema="k long, rt long, rv long",
        )
        row = asof_join_broadcast(l, r, "k", "lt", "rt").first()
        assert row["rt"] == 5 and row["rv"] == 2


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def pr(self, spark):
        P = pd.DataFrame({"p": [0.5, 1.0, 7.3, 12.0, 99.0]})
        G = pd.DataFrame(
            {"lo": [0.0, 1.0, 5.0], "hi": [1.0, 10.0, 8.0], "band": ["a", "b", "c"]}
        )
        return P, G, spark.createDataFrame(P), spark.createDataFrame(G)

    def test_inner_matches_sql(self, pr):
        P, G, pts, rng = pr
        got = (
            range_join(pts, rng, "p", "lo", "hi", bucket_width=2.0)
            .orderBy("p", "band").toPandas()
        )
        con = duckdb.connect()
        con.register("P", P)
        con.register("G", G)
        want = con.sql(
            "select p.p, g.lo, g.hi, g.band from P p join G g "
            "on p.p >= g.lo and p.p <= g.hi order by p.p, g.band"
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_left_keeps_unmatched(self, pr):
        _, _, pts, rng = pr
        out = range_join(pts, rng, "p", "lo", "hi", bucket_width=2.0, how="left")
        unmatched = out.where(F.col("band").isNull()).select("p").toPandas()
        assert sorted(unmatched["p"]) == [12.0, 99.0]

    def test_closed_variants(self, spark):
        pts = spark.createDataFrame(pd.DataFrame({"p": [1.0, 2.0]}))
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [1.0], "hi": [2.0], "g": ["x"]})
        )
        n = lambda c: range_join(
            pts, rng, "p", "lo", "hi", bucket_width=1.0, closed=c
        ).count()
        assert (n("both"), n("left"), n("right"), n("neither")) == (2, 1, 1, 0)

    def test_bucket_width_invariance(self, pr):
        P, G, pts, rng = pr
        a = range_join(pts, rng, "p", "lo", "hi", bucket_width=0.7)
        b = range_join(pts, rng, "p", "lo", "hi", bucket_width=50.0)
        key = lambda df: sorted(map(tuple, df.toPandas().values.tolist()))
        assert key(a) == key(b)

    def test_explosion_guard(self, pr):
        # the guard is IN-PLAN (raise_error on the exploding rows, no
        # pre-scan action), so it surfaces at execution time
        _, _, pts, rng = pr
        with pytest.raises(Exception, match="max_buckets_per_range"):
            range_join(pts, rng, "p", "lo", "hi", bucket_width=0.001,
                       max_buckets_per_range=100).count()

    def test_inverted_interval_matches_nothing(self, spark):
        """An hi < lo range can match no point (SQL BETWEEN semantics) —
        and it must NOT bypass the replication cap: a negative bucket
        count passed `nb <= cap`, and Spark's sequence(lo, hi) with
        hi < lo generates a DESCENDING |nb|-element array, so one
        corrupt row (lo=1e9, hi=0) exploded ~1e9 rows past the guard."""
        pts = spark.createDataFrame(pd.DataFrame({"p": [5.0]}))
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [0.0, 1.0e9], "hi": [10.0, 0.0],
                          "g": ["ok", "corrupt"]})
        )
        out = range_join(pts, rng, "p", "lo", "hi", bucket_width=1.0,
                         max_buckets_per_range=64).collect()
        assert [(r["p"], r["g"]) for r in out] == [(5.0, "ok")]
        left = range_join(pts, rng, "p", "lo", "hi", bucket_width=1.0,
                          max_buckets_per_range=64, how="left")
        assert left.where(F.col("g") == "corrupt").count() == 0

    def test_int64_overflow_span_raises_not_drops(self, spark):
        """A span so large that int64 bucket subtraction would wrap
        negative (saturated casts from corrupt sentinel bounds) must hit
        the descriptive cap raise, not slip through the inverted-interval
        silent-drop branch. The guard computes the bucket count in double
        precisely so the sign survives."""
        pts = spark.createDataFrame(pd.DataFrame({"p": [5.0]}))
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [-6.0e18], "hi": [6.0e18], "g": ["corrupt"]})
        )
        with pytest.raises(Exception, match="an interval spans"):
            range_join(pts, rng, "p", "lo", "hi", bucket_width=1.0,
                       max_buckets_per_range=64).count()

    def test_keyed(self, spark):
        pts = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "p": [5.0, 5.0]})
        )
        rng = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "lo": [0.0, 6.0], "hi": [10.0, 7.0],
                          "g": ["x", "y"]})
        )
        out = range_join(pts, rng, "p", "lo", "hi", on=["k"], bucket_width=5.0)
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["k"] == 1 and rows[0]["g"] == "x"


class TestIntervalJoin:
    @pytest.fixture(scope="class")
    def ab(self, spark):
        import random

        random.seed(3)
        A = pd.DataFrame(
            {"aid": range(120),
             "alo": [random.uniform(0, 1000) for _ in range(120)]}
        )
        A["ahi"] = A.alo + [random.uniform(0, 80) for _ in range(120)]
        B = pd.DataFrame(
            {"bid": range(90),
             "blo": [random.uniform(0, 1000) for _ in range(90)]}
        )
        B["bhi"] = B.blo + [random.uniform(0, 120) for _ in range(90)]
        return A, B, spark.createDataFrame(A), spark.createDataFrame(B)

    @pytest.mark.parametrize("w", [10.0, 37.0, 500.0])
    def test_matches_sql_overlap_no_dupes(self, ab, w):
        A, B, l, r = ab
        got = sorted(
            (row["aid"], row["bid"])
            for row in interval_join(
                l, r, ("alo", "ahi"), ("blo", "bhi"), bucket_width=w
            ).collect()
        )
        con = duckdb.connect()
        con.register("A", A)
        con.register("B", B)
        want = sorted(map(tuple, con.sql(
            "select aid, bid from A join B on alo <= bhi and blo <= ahi"
        ).fetchall()))
        assert got == want
        assert len(got) == len(set(got))  # owner-bucket dedup: no dupes

    def test_touching_endpoints_overlap(self, spark):
        l = spark.createDataFrame(pd.DataFrame({"alo": [0.0], "ahi": [5.0]}))
        r = spark.createDataFrame(pd.DataFrame({"blo": [5.0], "bhi": [9.0]}))
        assert interval_join(
            l, r, ("alo", "ahi"), ("blo", "bhi"), bucket_width=3.0
        ).count() == 1

    def test_keyed_and_suffix(self, spark):
        l = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "lo": [0.0, 0.0], "hi": [9.0, 9.0]})
        )
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "lo": [5.0, 20.0], "hi": [6.0, 30.0]})
        )
        out = interval_join(
            l, r, ("lo", "hi"), ("lo", "hi"), on=["k"], bucket_width=10.0
        )
        rows = out.collect()
        assert len(rows) == 1
        assert set(out.columns) == {"k", "lo", "hi", "lo_r", "hi_r"}
        assert rows[0]["k"] == 1 and rows[0]["lo_r"] == 5.0

    def test_explosion_guard(self, ab):
        # in-plan guard: raises at execution, not plan time
        _, _, l, r = ab
        with pytest.raises(Exception, match="max_buckets_per_range"):
            interval_join(l, r, ("alo", "ahi"), ("blo", "bhi"),
                          bucket_width=0.001, max_buckets_per_range=50).count()


class TestSessionize:
    def test_sessions_match_sql(self, spark):
        E = pd.DataFrame(
            {"u": [1] * 6 + [2] * 2, "t": [0, 5, 40, 41, 90, 91, 10, 100],
             "eid": list(range(8))}
        )
        got = (
            sessionize(spark.createDataFrame(E), "u", "t", 10, tiebreak="eid")
            .orderBy("u", "t").toPandas()
        )
        con = duckdb.connect()
        con.register("E", E)
        want = con.sql(
            """with g as (select *, case when lag(t) over w is null
                 or t - lag(t) over w > 10 then 1 else 0 end as brk
               from E window w as (partition by u order by t, eid))
               select u, t, eid, sum(brk) over (partition by u order by t, eid
                 rows unbounded preceding) as session_n
               from g order by u, t"""
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_gap_boundary_is_exclusive(self, spark):
        # gap exactly equal to threshold does NOT break the session
        ev = spark.createDataFrame(pd.DataFrame({"u": [1, 1], "t": [0, 10]}))
        out = sessionize(ev, "u", "t", 10).select("session_n").toPandas()
        assert list(out["session_n"]) == [1, 1]

    def test_session_windows_aggs(self, spark):
        ev = spark.createDataFrame(
            pd.DataFrame({"u": [1, 1, 1], "t": [0, 5, 50], "v": [1.0, 2.0, 4.0]})
        )
        out = (
            session_windows(ev, "u", "t", 10, aggs=[F.sum("v").alias("sv")])
            .orderBy("session_n").toPandas()
        )
        assert list(out["n_events"]) == [2, 1]
        assert list(out["sv"]) == [3.0, 4.0]
        assert list(out["session_start"]) == [0, 50]
        assert list(out["session_end"]) == [5, 50]

    def test_single_shuffle_plan(self, spark):
        ev = spark.createDataFrame(pd.DataFrame({"u": [1], "t": [0]}))
        plan = sessionize(ev, "u", "t", 10)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestStrictAsof:
    @pytest.mark.parametrize("impl", [asof_join, asof_join_broadcast],
                             ids=["union", "broadcast"])
    def test_strict_backward_matches_duckdb(self, spark, impl):
        L = pd.DataFrame({"k": [1, 1], "lt": [10, 12]})
        R = pd.DataFrame({"k": [1, 1], "rt": [10, 11], "rv": [5, 6]})
        got = (
            impl(spark.createDataFrame(L), spark.createDataFrame(R),
                 "k", "lt", "rt", allow_exact_matches=False)
            .orderBy("lt").toPandas()
        )
        con = duckdb.connect()
        con.register("L", L)
        con.register("R", R)
        want = con.sql(
            "select l.k, l.lt, r.rt, r.rv from L l asof left join R r"
            " on l.k = r.k and l.lt > r.rt order by l.lt"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @pytest.mark.parametrize("impl", [asof_join, asof_join_broadcast],
                             ids=["union", "broadcast"])
    def test_strict_forward(self, spark, impl):
        l = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [10]}))
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "rt": [10, 15], "rv": [1, 2]})
        )
        row = impl(l, r, "k", "lt", "rt", direction="forward",
                   allow_exact_matches=False).first()
        assert row["rt"] == 15 and row["rv"] == 2


class TestGapFill:
    def test_per_key_fill(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a", "a", "b"], "t": [0, 20, 60, 40],
                          "v": [1.0, 2.0, 3.0, 4.0]})
        )
        out = gap_fill(df, "k", "t", 20, fill={"v": 0.0}).orderBy("k", "t")
        rows = [(r["k"], r["t"], r["v"]) for r in out.collect()]
        assert rows == [("a", 0, 1.0), ("a", 20, 2.0), ("a", 40, 0.0),
                        ("a", 60, 3.0), ("b", 40, 4.0)]

    def test_global_span(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "b"], "t": [0, 40], "v": [1.0, 2.0]})
        )
        out = gap_fill(df, "k", "t", 20, span="global")
        # both keys get the global [0, 40] axis: 3 buckets x 2 keys
        assert out.count() == 6
        assert out.where(F.col("v").isNull()).count() == 4

    def test_default_fill_is_null(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a"], "t": [0, 40], "v": [1.0, 2.0]})
        )
        out = gap_fill(df, "k", "t", 20)
        assert out.where(F.col("t") == 20).first()["v"] is None

    def test_locf_carries_forward_leading_gap_null(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a", "b", "b"], "t": [20, 80, 0, 40],
                          "v": [1.0, 4.0, None, 9.0]})
        )
        out = gap_fill(df, "k", "t", 20, locf=["v"], span="global")
        got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
        # a: leading bucket 0 has no prior observation -> NULL; 40/60 carry 1.0
        assert got[("a", 0)] is None
        assert got[("a", 20)] == 1.0
        assert got[("a", 40)] == 1.0 and got[("a", 60)] == 1.0
        assert got[("a", 80)] == 4.0
        # b: observed NULL at 0 stays NULL (nothing to carry), 20 still NULL
        assert got[("b", 0)] is None and got[("b", 20)] is None
        assert got[("b", 40)] == 9.0 and got[("b", 80)] == 9.0

    def test_misaligned_raises(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"], "t": [7], "v": [1.0]})
        )
        with pytest.raises(Exception, match="not aligned"):
            gap_fill(df, "k", "t", 20).count()


class TestSampling:
    def test_split_matches_duckdb(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = (
            hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
                       salt="s42")
            .groupBy("split").agg(F.count("*").alias("n"),
                                  F.sum("doc_id").alias("id_sum"))
            .orderBy("split").toPandas()
        )
        con = duckdb.connect()
        b = oracle_bucket_sql("doc_id", "s42")
        want = con.sql(
            f"""with b as (select doc_id, {b} as bk
                           from '{sf_dir}/documents.parquet')
                select case when bk < 9000 then 'train'
                            when bk < 9500 then 'val' else 'test' end as split,
                       count(*) as n, sum(doc_id) as id_sum
                from b group by 1 order by 1"""
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_split_covers_and_partitions(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5})
        assert out.where(F.col("split").isNull()).count() == 0
        assert out.count() == docs.count()

    def test_sample_nested_and_deterministic(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ten = set(r["doc_id"] for r in
                  hash_sample(docs, "doc_id", 0.10, salt="z").collect())
        one = set(r["doc_id"] for r in
                  hash_sample(docs, "doc_id", 0.01, salt="z").collect())
        again = set(r["doc_id"] for r in
                    hash_sample(docs, "doc_id", 0.10, salt="z").collect())
        assert one <= ten
        assert ten == again

    def test_bucket_range(self, spark):
        df = spark.range(1000)
        mm = df.select(
            F.min(hash_bucket("id")).alias("lo"),
            F.max(hash_bucket("id")).alias("hi"),
        ).first()
        assert 0 <= mm["lo"] and mm["hi"] < 10_000

    def test_bad_weights(self, spark):
        df = spark.range(10)
        with pytest.raises(ValueError):
            hash_split(df, "id", {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError):
            hash_sample(df, "id", 1.5)

    def test_stratified_per_stratum_and_stable(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        frac = {"en": 0.2, "de": 0.5}
        out = stratified_hash_sample(
            docs, "doc_id", "lang", frac, default=1.0, salt="st"
        )
        # per-stratum membership equals the flat sample of that stratum
        for lang, f in frac.items():
            want = set(
                r["doc_id"]
                for r in hash_sample(
                    docs.where(F.col("lang") == lang), "doc_id", f, salt="st"
                ).collect()
            )
            got = set(
                r["doc_id"]
                for r in out.where(F.col("lang") == lang).collect()
            )
            assert got == want
        # unlisted strata keep default=1.0 (everything)
        others = docs.where(~F.col("lang").isin(list(frac)))
        assert out.where(~F.col("lang").isin(list(frac))).count() == others.count()
        # a row's fate is independent of OTHER strata's fractions
        out2 = stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.2, "de": 0.9}, default=1.0,
            salt="st",
        )
        en1 = set(r["doc_id"] for r in out.where("lang = 'en'").collect())
        en2 = set(r["doc_id"] for r in out2.where("lang = 'en'").collect())
        assert en1 == en2

    def test_weighted_sample_monotone_and_matches_sql(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        w_half = (F.col("n_chars") % 100 / 100.0)
        kept = set(
            r["doc_id"]
            for r in weighted_hash_sample(docs, "doc_id", w_half,
                                          salt="w").collect()
        )
        # SQL replica
        con = duckdb.connect()
        b = oracle_bucket_sql("doc_id", "w")
        want = set(
            r[0]
            for r in con.sql(
                f"""select doc_id from '{sf_dir}/documents.parquet'
                    where {b} < round(least(greatest(
                      (n_chars % 100) / 100.0, 0.0), 1.0) * 10000)"""
            ).fetchall()
        )
        assert kept == want
        # monotone: doubling every weight only ADDS rows
        kept2 = set(
            r["doc_id"]
            for r in weighted_hash_sample(
                docs, "doc_id", F.least(w_half * 2, F.lit(1.0)), salt="w"
            ).collect()
        )
        assert kept <= kept2
        # weight 1.0 keeps everything, 0.0 keeps nothing
        assert weighted_hash_sample(docs, "doc_id", F.lit(1.0)).count() == docs.count()
        assert weighted_hash_sample(docs, "doc_id", F.lit(0.0)).count() == 0

    def test_split_is_map_only(self, spark):
        df = spark.range(10)
        plan = hash_split(df, "id", {"a": 0.5, "b": 0.5})._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestNullSemantics:
    """ADVICE round-4 regressions: NULL keys / NULL payload rows must
    behave identically across surfaces and match the SQL oracles."""

    def test_asof_null_key_matches_nothing_both_surfaces(self, spark):
        # a null-key left row must NOT inherit matches from null-key
        # right rows (Window.partitionBy groups NULLs; equi-join doesn't)
        l = spark.createDataFrame(
            pd.DataFrame({"k": [None, 1.0], "lt": [10, 10]})
        ).withColumn("k", F.col("k").cast("bigint"))
        r = spark.createDataFrame(
            pd.DataFrame({"k": [None, 1.0], "rt": [5, 5], "rv": [111, 222]})
        ).withColumn("k", F.col("k").cast("bigint"))
        a = asof_join(l, r, "k", "lt", "rt").orderBy("k").collect()
        b = asof_join_broadcast(l, r, "k", "lt", "rt").orderBy("k").collect()
        for rows in (a, b):
            nk = [x for x in rows if x["k"] is None][0]
            ok = [x for x in rows if x["k"] == 1][0]
            assert nk["rv"] is None and nk["rt"] is None
            assert ok["rv"] == 222
        assert [tuple(x) for x in a] == [tuple(x) for x in b]

    def test_range_join_left_null_payload_no_duplicate(self, spark):
        # a matched point row containing a NULL must anti-join away
        # (eqNullSafe), not be emitted twice
        pts = spark.createDataFrame(
            pd.DataFrame({"p": [5.0, 99.0], "tag": [None, "z"]})
        )
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [0.0], "hi": [10.0], "band": ["low"]})
        )
        out = range_join(pts, rng, "p", "lo", "hi",
                         bucket_width=10.0, how="left").collect()
        assert len(out) == 2
        m = [r for r in out if r["p"] == 5.0]
        assert len(m) == 1 and m[0]["band"] == "low"
        u = [r for r in out if r["p"] == 99.0]
        assert len(u) == 1 and u[0]["band"] is None

    def test_null_id_sample_matches_duckdb(self, spark):
        # NULL ids bucket to NULL (concat is NULL-propagating) and are
        # dropped by every bucket < bound predicate — on BOTH engines
        df = spark.createDataFrame(
            pd.DataFrame({"id": ["a", "b", "c", None]})
        )
        kept = hash_sample(df, "id", 1.0, salt="s").collect()
        assert sorted(r["id"] for r in kept) == ["a", "b", "c"]
        want = duckdb.sql(
            "select id from (values ('a'), ('b'), ('c'), (NULL)) t(id) "
            "where (('0x' || substr(md5(id || chr(31) || 's'), 1, 15))"
            "::BIGINT % 10000) < 10000"
        ).df()
        assert sorted(want["id"]) == ["a", "b", "c"]


class TestPlanLaziness:
    """VERDICT r4 task 4 'done' criterion: operator CONSTRUCTION runs no
    Spark job — the replication/alignment guards live in the plan
    (raise_error on the flowing rows), not in a pre-scan action."""

    def _assert_no_jobs(self, spark, build):
        sc = spark.sparkContext
        group = f"plan-only-{id(build)}"
        sc.setJobGroup(group, "plan-laziness check")
        try:
            df = build()
            # schema resolution is allowed (analysis, not execution)
            _ = df.schema
        finally:
            sc.setJobGroup(None, None)
        assert list(sc.statusTracker().getJobIdsForGroup(group)) == []

    def test_range_join_builds_without_jobs(self, spark):
        pts = spark.createDataFrame(pd.DataFrame({"p": [1.0, 5.0]}))
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [0.0], "hi": [10.0], "band": ["a"]})
        )
        self._assert_no_jobs(
            spark,
            lambda: range_join(pts, rng, "p", "lo", "hi", bucket_width=2.0,
                               how="left"),
        )

    def test_interval_join_builds_without_jobs(self, spark):
        l = spark.createDataFrame(pd.DataFrame({"alo": [0.0], "ahi": [2.0]}))
        r = spark.createDataFrame(pd.DataFrame({"blo": [1.0], "bhi": [3.0]}))
        self._assert_no_jobs(
            spark,
            lambda: interval_join(l, r, ("alo", "ahi"), ("blo", "bhi"),
                                  bucket_width=2.0),
        )

    def test_gap_fill_builds_without_jobs(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"], "t": [20], "v": [1.0]})
        )
        self._assert_no_jobs(
            spark, lambda: gap_fill(df, "k", "t", 20, locf=["v"])
        )


    def test_range_join_null_bounds_dropped_not_raised(self, spark):
        # NULL lo/hi: the in-plan guard must pass the row to
        # explode(sequence(NULL,...)) — silently dropped, like the old
        # eager max() guard (NULL-skipping) did; never raise_error
        pts = spark.createDataFrame(pd.DataFrame({"p": [5.0]}))
        rng = spark.createDataFrame(
            pd.DataFrame({"lo": [0.0, None], "hi": [10.0, None],
                          "band": ["ok", "nullrow"]})
        )
        out = range_join(pts, rng, "p", "lo", "hi", bucket_width=5.0).collect()
        assert len(out) == 1 and out[0]["band"] == "ok"

    def test_interval_join_null_bounds_dropped_not_raised(self, spark):
        l = spark.createDataFrame(
            pd.DataFrame({"alo": [0.0, None], "ahi": [4.0, None]})
        )
        r = spark.createDataFrame(pd.DataFrame({"blo": [2.0], "bhi": [6.0]}))
        out = interval_join(l, r, ("alo", "ahi"), ("blo", "bhi"),
                            bucket_width=4.0).collect()
        assert len(out) == 1 and out[0]["alo"] == 0.0
