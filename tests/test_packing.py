"""Sequence packing: partition-of-input, budget, offset, determinism,
and greedy/no-overshoot invariants."""

import pytest
from pyspark.sql import functions as F

from parquet_extra_spark.operators.packing import pack_by_cumsum, pack_greedy

BUDGET = 4096


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestCumsum:
    def test_partition_of_input(self, docs):
        out = pack_by_cumsum(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        ids = [r["doc_id"] for r in out.select("doc_id").collect()]
        src = [r["doc_id"] for r in docs.select("doc_id").collect()]
        assert sorted(ids) == sorted(src)
        assert out.columns == docs.columns + ["bucket", "seq_id", "seq_offset"]

    def test_offsets_and_overshoot_bound(self, docs):
        out = pack_by_cumsum(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        rows = out.select("seq_id", "seq_offset", "n_chars").collect()
        max_doc = docs.agg(F.max("n_chars")).first()[0]
        for r in rows:
            assert 0 <= r["seq_offset"] < BUDGET
        # per-sequence total <= budget + (the one straddling doc)
        totals = (
            out.groupBy("seq_id").agg(F.sum("n_chars").alias("t")).collect()
        )
        assert all(t["t"] <= BUDGET + max_doc for t in totals)

    def test_layout_insensitive(self, docs):
        a = pack_by_cumsum(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        b = pack_by_cumsum(
            docs.repartition(13, "lang"), size_col="n_chars",
            budget=BUDGET, n_buckets=8,
        )
        key = ("doc_id", "bucket", "seq_id", "seq_offset")
        assert _rows(a, *key) == _rows(b, *key)

    def test_seq_ids_disjoint_across_buckets(self, docs):
        out = pack_by_cumsum(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        pairs = out.select("bucket", "seq_id").distinct().collect()
        for r in pairs:
            assert r["seq_id"] >> 40 == r["bucket"]

    def test_invalid_args(self, docs):
        with pytest.raises(ValueError, match="budget"):
            pack_by_cumsum(docs, budget=0)
        with pytest.raises(ValueError, match="n_buckets"):
            pack_by_cumsum(docs, budget=10, n_buckets=0)


class TestGreedy:
    def test_partition_and_no_overshoot(self, docs):
        out = pack_greedy(
            docs, size_col="n_chars", budget=BUDGET, n_buckets=8
        ).cache()
        ids = [r["doc_id"] for r in out.select("doc_id").collect()]
        src = [r["doc_id"] for r in docs.select("doc_id").collect()]
        assert sorted(ids) == sorted(src)
        # no sequence exceeds the budget unless it is a singleton big doc
        seqs = (
            out.groupBy("seq_id")
            .agg(F.sum("n_chars").alias("t"), F.count("*").alias("n"))
            .collect()
        )
        for s in seqs:
            assert s["t"] <= BUDGET or s["n"] == 1
        # seq_tokens matches the recomputed per-sequence total
        tot = {s["seq_id"]: s["t"] for s in seqs}
        for r in out.select("seq_id", "seq_tokens").collect():
            assert r["seq_tokens"] == tot[r["seq_id"]]

    def test_oversized_doc_singleton(self, spark):
        df = spark.createDataFrame(
            [(1, 10_000), (2, 100), (3, 200)], "doc_id long, n_tokens long"
        )
        out = pack_greedy(df, budget=500, n_buckets=1)
        by_id = {r["doc_id"]: r for r in out.collect()}
        big_seq = by_id[1]["seq_id"]
        assert by_id[1]["seq_tokens"] == 10_000
        assert all(
            r["seq_id"] != big_seq for i, r in by_id.items() if i != 1
        )

    def test_layout_insensitive(self, docs):
        a = pack_greedy(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        b = pack_greedy(
            docs.repartition(13, "lang"), size_col="n_chars",
            budget=BUDGET, n_buckets=8,
        )
        key = ("doc_id", "bucket", "seq_id", "seq_tokens")
        assert _rows(a, *key) == _rows(b, *key)

    def test_sequence_count_tradeoff(self, docs):
        # cumsum packing hits the theoretical minimum ceil(total/budget)
        # per bucket by overshooting; greedy trades >= that many
        # sequences for a hard budget guarantee
        g = pack_greedy(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        c = pack_by_cumsum(docs, size_col="n_chars", budget=BUDGET, n_buckets=8)
        ng = g.select("seq_id").distinct().count()
        nc = c.select("seq_id").distinct().count()
        assert ng >= nc
        # per-bucket ceil(total/budget): cumsum sits at-or-under it (a
        # straddling final doc can absorb the last boundary), greedy's
        # hard budget means its capacity must cover the total
        lower = (
            docs.withColumn(
                "b",
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(8),
                ),
            )
            .groupBy("b")
            .agg(F.ceil(F.sum("n_chars") / BUDGET).alias("k"))
            .agg(F.sum("k"))
            .first()[0]
        )
        assert nc <= lower <= ng

    def test_invalid_budget(self, docs):
        with pytest.raises(ValueError, match="budget"):
            pack_greedy(docs, budget=-1)


class TestFixRegressions:
    def test_greedy_invalid_n_buckets(self, docs):
        with pytest.raises(ValueError, match="n_buckets"):
            pack_greedy(docs, budget=10, n_buckets=0)

    def test_cumsum_duplicate_ids_get_distinct_offsets(self, spark):
        # Duplicate ids share identical (_ord, id) order keys; a RANGE
        # cumsum frame would make them peers (same _cum including BOTH
        # sizes -> same overlapping offset). The ROWS frame gives each
        # its own running total, matching the oracle's explicit
        # ROWS UNBOUNDED PRECEDING.
        df = spark.createDataFrame(
            [(1, 300), (1, 300)], "doc_id long, n_tokens long"
        )
        out = pack_by_cumsum(df, budget=500, n_buckets=1)
        offsets = sorted(r["seq_offset"] for r in out.collect())
        assert offsets == [0, 300]

    def test_greedy_matches_naive_first_fit(self, spark):
        # The segment-tree placement must be bit-identical to the naive
        # linear-scan first-fit it replaced (same assignments, just
        # O(n log n) instead of O(n^2)).
        import hashlib

        budget, salt = 100, "pack"
        sizes = [37, 64, 12, 99, 150, 1, 50, 50, 50, 33, 200, 5, 95, 5, 95]
        rows = [(i, s) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_greedy(df, budget=budget, n_buckets=1)
        got = {
            r["doc_id"]: r["seq_id"] & ((1 << 40) - 1) for r in out.collect()
        }
        # driver-side replica: same md5 order, naive first-fit
        order = sorted(
            rows,
            key=lambda t: (
                hashlib.md5(f"{t[0]}\x1f{salt}".encode()).hexdigest(),
                t[0],
            ),
        )
        open_seqs, want = [], {}
        for doc_id, sz in order:
            placed = -1
            for i, room in enumerate(open_seqs):
                if sz <= room:
                    placed = i
                    break
            if placed < 0:
                open_seqs.append(budget)
                placed = len(open_seqs) - 1
            open_seqs[placed] -= sz
            want[doc_id] = placed
        assert got == want
