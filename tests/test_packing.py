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
