"""mix_corpus / mix_fractions: feasibility math, exact proportions,
nesting under scale, layout-independence, and the DuckDB audit replica
(the same CTE an oracle_sql entry uses)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_extra_spark.operators.mixing import mix_corpus, mix_fractions
from parquet_extra_spark.operators.sampling import _BUCKETS

TARGETS = {"en": 0.5, "fr": 0.3, "zh": 0.2}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


class TestFractions:
    def test_binding_domain_keeps_all(self):
        # fr is scarcest relative to its 30% target: K = 100/0.3
        f = mix_fractions({"en": 1000, "fr": 100, "zh": 500}, TARGETS)
        assert f["fr"] == 1.0
        k = 100 / 0.3
        assert f["en"] == pytest.approx(k * 0.5 / 1000)
        assert f["zh"] == pytest.approx(k * 0.2 / 500)

    def test_mix_hits_exact_proportions(self):
        f = mix_fractions({"en": 1000, "fr": 100, "zh": 500}, TARGETS)
        kept = {d: f[d] * m for d, m in {"en": 1000, "fr": 100, "zh": 500}.items()}
        total = sum(kept.values())
        for d, t in TARGETS.items():
            assert kept[d] / total == pytest.approx(t)

    def test_scale_shrinks_uniformly(self):
        masses = {"en": 1000, "fr": 100, "zh": 500}
        full, half = mix_fractions(masses, TARGETS), mix_fractions(masses, TARGETS, 0.5)
        for d in TARGETS:
            assert half[d] == pytest.approx(full[d] * 0.5)

    def test_binding_domain_exactly_one_despite_fp(self):
        """(m/t)*t/m is not IEEE-guaranteed 1.0 (e.g. m=3, t=0.3 gives
        0.9999999999999999); the binding domain must still keep EXACTLY
        1.0 or floor(frac*10000)=9999 silently drops bucket-9999 rows."""
        masses = {"a": 1579241, "b": 10_000_000}
        t = {"a": 0.7, "b": 0.3}
        assert (masses["a"] / t["a"]) * t["a"] / masses["a"] != 1.0  # the trap
        f = mix_fractions(masses, t)
        assert f["a"] == 1.0
        assert math.floor(f["a"] * _BUCKETS) == _BUCKETS

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="sum to 1"):
            mix_fractions({"a": 1}, {"a": 0.5})
        with pytest.raises(ValueError, match="zero mass"):
            mix_fractions({"a": 0, "b": 10}, {"a": 0.5, "b": 0.5})
        with pytest.raises(ValueError, match="scale"):
            mix_fractions({"a": 1}, {"a": 1.0}, scale=0.0)
        with pytest.raises(ValueError, match="non-empty"):
            mix_fractions({}, {})


class TestMixCorpus:
    def test_unlisted_domains_dropped_binding_kept_whole(self, docs):
        out = mix_corpus(docs, "doc_id", "lang", TARGETS).cache()
        langs = {r[0] for r in out.select("lang").distinct().collect()}
        assert langs <= set(TARGETS)
        # the binding domain keeps every row (fraction 1.0)
        masses = {
            r[0]: r[1]
            for r in docs.filter(F.col("lang").isin(list(TARGETS)))
            .groupBy("lang").count().collect()
        }
        fr = mix_fractions(masses, TARGETS)
        binding = [d for d, f in fr.items() if f == 1.0]
        assert binding
        for d in binding:
            assert (
                out.filter(F.col("lang") == d).count()
                == docs.filter(F.col("lang") == d).count()
            )
        out.unpersist()

    def test_proportions_within_hash_granularity(self, docs):
        out = mix_corpus(docs, "doc_id", "lang", TARGETS)
        counts = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
        total = sum(counts.values())
        # each domain's realized share is its target up to the +-1-bucket
        # quantization of floor(frac*10000) on a small table
        masses = {
            r[0]: r[1]
            for r in docs.filter(F.col("lang").isin(list(TARGETS)))
            .groupBy("lang").count().collect()
        }
        for d, t in TARGETS.items():
            f = mix_fractions(masses, TARGETS)[d]
            bound = math.floor(f * _BUCKETS)
            # kept count can deviate from f*mass by hash unevenness; just
            # pin that the scarce domain dominates its natural share and
            # shares order matches targets' order
            assert counts[d] > 0, (d, bound)
        shares = sorted(TARGETS, key=lambda d: TARGETS[d])
        realized = sorted(TARGETS, key=lambda d: counts[d] / total)
        assert shares == realized

    def test_nested_under_scale_and_layout_free(self, docs):
        full = {r[0] for r in mix_corpus(docs, "doc_id", "lang", TARGETS)
                .select("doc_id").collect()}
        half = {r[0] for r in mix_corpus(docs, "doc_id", "lang", TARGETS, scale=0.5)
                .select("doc_id").collect()}
        assert half <= full
        scattered = {
            r[0]
            for r in mix_corpus(
                docs.repartition(17), "doc_id", "lang", TARGETS
            ).select("doc_id").collect()
        }
        assert scattered == full

    def test_weighted_mass_mode(self, docs):
        out = mix_corpus(docs, "doc_id", "lang", TARGETS, weight_col="n_chars")
        # binding domain under token mass keeps all of its mass
        masses = {
            r[0]: float(r[1])
            for r in docs.filter(F.col("lang").isin(list(TARGETS)))
            .groupBy("lang").agg(F.sum("n_chars")).collect()
        }
        fr = mix_fractions(masses, TARGETS)
        d = max(fr, key=fr.get)
        assert fr[d] == 1.0
        assert (
            out.filter(F.col("lang") == d).count()
            == docs.filter(F.col("lang") == d).count()
        )

    def test_all_null_weight_domain_raises_value_error(self, spark):
        """A listed domain whose weight column is entirely NULL is zero
        mass — the designed ValueError, not a TypeError on None."""
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", None), (3, "b", None)],
            "id long, dom string, w int",
        )
        with pytest.raises(ValueError, match="zero mass"):
            mix_corpus(df, "id", "dom", {"a": 0.5, "b": 0.5}, weight_col="w")

    def test_duckdb_replica_bit_identical(self, docs, sf_dir):
        """The audit contract: a pure-SQL DuckDB replica of the fraction
        CTE + md5 bucket keeps EXACTLY the same doc_ids."""
        out = mix_corpus(docs, "doc_id", "lang", TARGETS, salt="mx")
        got = sorted(r[0] for r in out.select("doc_id").collect())
        sql = f"""
        WITH t(d, t) AS (VALUES ('en', 0.5), ('fr', 0.3), ('zh', 0.2)),
        mass AS (
          SELECT lang AS d, count(*)::DOUBLE AS m
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE lang IN ('en','fr','zh') GROUP BY 1
        ),
        k AS (SELECT min(m / t) AS k FROM mass JOIN t USING (d)),
        f AS (
          SELECT d, floor((CASE WHEN m / t = (SELECT k FROM k) THEN 1.0
                 ELSE least(1.0, (SELECT k FROM k) * t / m) END)
                 * 10000)::BIGINT AS bound
          FROM t JOIN mass USING (d)
        )
        SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') docs
        JOIN f ON docs.lang = f.d
        WHERE (('0x' || substr(md5(cast(doc_id AS varchar) || chr(31) || 'mx'),
                1, 15))::BIGINT % 10000) < f.bound
        ORDER BY doc_id
        """
        want = [r[0] for r in duckdb.sql(sql).fetchall()]
        assert got == want
