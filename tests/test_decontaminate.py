"""Eval-set decontamination: lane equivalence, NULL/short-doc edges,
bounded-collect guard, and the removal contract."""

import pytest
from pyspark.sql import functions as F

from parquet_extra_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    word_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _split(docs):
    train = docs.where(F.col("doc_id") % 17 != 0)
    ev = docs.where(F.col("doc_id") % 17 == 0)
    return train, ev


def _report_rows(df):
    return sorted(
        (r["doc_id"], r["n_hits"], r["contaminated"]) for r in df.collect()
    )


class TestLanes:
    def test_broadcast_join_set_lanes_agree(self, spark, docs):
        train, ev = _split(docs)
        ref = _report_rows(contamination_report(train, ev, n=5, method="broadcast"))
        assert ref == _report_rows(contamination_report(train, ev, n=5, method="join"))
        assert ref == _report_rows(contamination_report(train, ev, n=5, method="set"))
        # the fixture must actually exercise both outcomes
        flags = {c for (_, _, c) in ref}
        assert flags == {True, False}

    def test_unknown_method_rejected(self, docs):
        train, ev = _split(docs)
        with pytest.raises(ValueError, match="unknown method"):
            contamination_report(train, ev, method="bloom")

    def test_set_lane_bounded_collect_guard(self, spark, docs):
        train, ev = _split(docs)
        with pytest.raises(ValueError, match="max_eval_ngrams"):
            contamination_report(train, ev, n=5, method="set", max_eval_ngrams=3)


class TestSemantics:
    def test_self_contamination_full_overlap(self, spark, docs):
        # eval == train: every doc with >= n words is contaminated, and
        # n_hits equals its own distinct n-gram count
        some = docs.limit(20)
        rep = contamination_report(some, some, n=5).collect()
        own = {
            r["doc_id"]: r["k"]
            for r in some.select(
                "doc_id",
                F.size(F.array_distinct(word_ngrams(F.col("text"), 5))).alias("k"),
            ).collect()
        }
        for r in rep:
            assert r["contaminated"] == (own[r["doc_id"]] > 0)
            assert r["n_hits"] == own[r["doc_id"]]

    def test_short_docs_never_contaminated(self, spark):
        train = spark.createDataFrame(
            [(1, "only four words here"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(9, "only four words here and more")], "doc_id long, text string"
        )
        rep = {r["doc_id"]: r for r in contamination_report(train, ev, n=5).collect()}
        assert not rep[1]["contaminated"]  # 4 words < 5-gram
        assert not rep[2]["contaminated"]  # NULL text
        assert not rep[3]["contaminated"]  # empty text
        assert all(rep[i]["n_hits"] == 0 for i in (1, 2, 3))

    def test_exact_hit_counts(self, spark):
        train = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "z z z z z")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(9, "a b c d e"), (10, "b c d e f")], "doc_id long, text string"
        )
        rep = {r["doc_id"]: r for r in contamination_report(train, ev, n=5).collect()}
        assert rep[1]["n_hits"] == 2 and rep[1]["contaminated"]
        assert rep[2]["n_hits"] == 0 and not rep[2]["contaminated"]

    def test_decontaminate_removes_exactly_the_flagged(self, spark, docs):
        train, ev = _split(docs)
        rep = contamination_report(train, ev, n=5)
        bad = {r["doc_id"] for r in rep.where("contaminated").collect()}
        assert bad, "fixture should contain contaminated docs at 5-grams"
        kept = decontaminate(train, ev, n=5)
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        all_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
        assert kept_ids == all_ids - bad
        # payload columns flow through untouched
        assert kept.columns == train.columns


class TestNgrams:
    def test_word_ngrams_values(self, spark):
        df = spark.createDataFrame([("A b C",)], "t string")
        got = df.select(word_ngrams(F.col("t"), 2).alias("g")).first()["g"]
        assert got == ["a b", "b c"]
        got1 = df.select(word_ngrams(F.col("t"), 1).alias("g")).first()["g"]
        assert got1 == ["a", "b", "c"]

    def test_word_ngrams_invalid_n(self):
        with pytest.raises(ValueError, match="n must be"):
            word_ngrams(F.lit("x"), 0)


class TestFixRegressions:
    def test_set_lane_string_ids(self, spark):
        # the set lane's mapInPandas schema follows the id dtype —
        # string uuids must work, not just bigints
        train = spark.createDataFrame(
            [("a", "one two three four five six"),
             ("b", "totally novel words only here")],
            "doc_id string, text string",
        )
        ev = spark.createDataFrame(
            [("e", "one two three four five")], "doc_id string, text string"
        )
        got = {
            r["doc_id"]: (r["n_hits"], r["contaminated"])
            for r in contamination_report(train, ev, method="set").collect()
        }
        want = {
            r["doc_id"]: (r["n_hits"], r["contaminated"])
            for r in contamination_report(train, ev, method="broadcast").collect()
        }
        assert got == want
        assert got["a"][1] is True and got["b"][1] is False

    def test_eval_set_without_id_column(self, spark):
        # eval doc identity is irrelevant; a bare text column must work
        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [("alpha beta gamma delta epsilon",)], "text string"
        )
        out = contamination_report(train, ev).collect()
        assert out[0]["contaminated"] is True
