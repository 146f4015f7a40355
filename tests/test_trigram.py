"""Trigram digests: substring-predicate chunk pruning (pg_trgm at chunk
granularity) on both the engine and SQL surfaces."""

import os

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark import P
from parquet_extra_spark.engine.predicate import (
    filter_decode_pred,
    pushdown_stats_pred,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def tg_chunks(docs):
    c = pes.encode(
        docs, partition_cols=["source"], sort_cols=["doc_id"],
        chunk_rows=64, n_buckets=8, n_salts=1,
        trigram_cols=["source"], num_partitions=8,
    ).cache()
    c.count()
    return c


def test_digest_present_and_selective(tg_chunks):
    src_rows = tg_chunks.where(F.col("column") == "source")
    assert src_rows.where(F.col("trigram_bloom").isNotNull()).count() > 0
    rep = pushdown_stats_pred(tg_chunks, P.contains("source", "rc1"))
    assert 0 < rep["chunks_kept"] < rep["chunks_total"]


@pytest.mark.parametrize(
    "needle", ["rc1", "src0", "c17", "zqx", "no-such-sub", "s", "rc"]
)
def test_soundness_vs_plain_filter(docs, tg_chunks, needle):
    """Every needle — matching, non-matching, and too-short-to-prune —
    must return exactly the plain-filter rows."""
    got = sorted(
        r["doc_id"]
        for r in filter_decode_pred(
            tg_chunks, P.contains("source", needle), columns=["doc_id"]
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source").contains(needle))
        .select("doc_id").collect()
    )
    assert got == want


def test_endswith_prunes_and_matches(docs, tg_chunks):
    got = sorted(
        r["doc_id"]
        for r in filter_decode_pred(
            tg_chunks, P.endswith("source", "c17"), columns=["doc_id"]
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source").endswith("c17"))
        .select("doc_id").collect()
    )
    assert got == want
    rep = pushdown_stats_pred(tg_chunks, P.endswith("source", "c17"))
    assert rep["chunks_kept"] < rep["chunks_total"]


def test_pruned_chunks_never_decode(docs, tg_chunks):
    """Poison the payloads of every chunk the trigram digest skips — the
    filtered decode must still succeed and match (behavioral proof the
    skip happens before any payload touch)."""
    from parquet_extra_spark.engine.predicate import prune_chunks

    pred = P.contains("source", "rc17")
    kept = {
        r["chunk_id"]
        for r in prune_chunks(tg_chunks, pred).select("chunk_id")
        .distinct().collect()
    }
    total = tg_chunks.select("chunk_id").distinct().count()
    assert 0 < len(kept) < total
    poisoned = tg_chunks.withColumn(
        "payload",
        F.when(~F.col("chunk_id").isin(list(kept)), F.lit(b"\x00junk"))
        .otherwise(F.col("payload")),
    )
    got = sorted(
        r["doc_id"]
        for r in filter_decode_pred(
            poisoned, pred, columns=["doc_id"]
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source").contains("rc17"))
        .select("doc_id").collect()
    )
    assert got == want


def test_saturation_stores_none():
    """Above 4096 distinct trigrams the filter would be mostly-set and
    prune nothing — the digest must store None instead."""
    import pyarrow as pa

    from parquet_extra_spark.engine.stats import _trigram_digest

    import itertools
    import string

    rich = [
        "".join(t)
        for t in itertools.islice(
            itertools.product(string.ascii_letters + string.digits, repeat=3),
            6000,
        )
    ]
    assert _trigram_digest(pa.array(rich), "string") is None
    assert _trigram_digest(pa.array(rich[:100]), "string") is not None


def test_digest_on_text_column_is_sound(docs):
    """Whatever the text column's trigram density, a digest over it must
    never change results (the synthetic corpus is templated enough that
    the digest may even exist — soundness is the contract, not density)."""
    chunks = pes.encode(
        docs, partition_cols=["lang"], chunk_rows=256, n_buckets=4,
        n_salts=1, trigram_cols=["text"], num_partitions=4,
    ).cache()
    for needle in ("the", "zzqx-not-there"):
        got = filter_decode_pred(
            chunks, P.contains("text", needle), columns=["doc_id"]
        ).count()
        want = docs.where(F.col("text").contains(needle)).count()
        assert got == want, needle
    chunks.unpersist()


def test_tables_without_digest_column_still_plan(docs, tg_chunks):
    """Chunk tables persisted before trigram_bloom existed (simulated by
    dropping the column) must plan and answer exactly (sound no-prune)."""
    legacy = tg_chunks.drop("trigram_bloom")
    got = sorted(
        r["doc_id"]
        for r in filter_decode_pred(
            legacy, P.contains("source", "rc1"), columns=["doc_id"]
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source").contains("rc1"))
        .select("doc_id").collect()
    )
    assert got == want


def test_datasource_contains_prunes_files(spark, docs, tmp_path):
    """SQL surface: LIKE '%needle%' through the chunktable data source
    skips files whose trigram digests refute the needle — proven by
    poisoning every non-matching file's payloads on disk."""
    from parquet_extra_spark.sources import ChunkTableDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkTableDataSource)
    out = str(tmp_path / "tg_ct")
    pes.encode(
        docs, partition_cols=["source"], sort_cols=["doc_id"],
        chunk_rows=64, n_buckets=8, n_salts=1,
        trigram_cols=["source"], num_partitions=8,
    ).write.mode("overwrite").parquet(out)

    import pyarrow.parquet as pq
    import pyarrow as pa

    # poison payloads in files whose source stats can't contain 'rc17'
    from parquet_extra_spark.engine import stats as stats_mod

    hs = stats_mod.trigram_hashes("rc17")
    import glob

    for f in glob.glob(f"{out}/*.parquet"):
        t = pq.read_table(f)
        cols = t.column("column").to_pylist()
        tgs = t.column("trigram_bloom").to_pylist()
        hit = False
        for c, tg in zip(cols, tgs):
            if c != "source" or tg is None:
                continue
            ok = all(
                all(
                    tg[p // stats_mod._BLOOM_BITS_PER_WORD]
                    >> (p % stats_mod._BLOOM_BITS_PER_WORD) & 1
                    for p in stats_mod.bloom_positions(h)
                )
                for h in hs
            )
            hit = hit or ok
        if not hit:
            n = t.num_rows
            t = t.set_column(
                t.schema.get_field_index("payload"),
                "payload",
                pa.array([b"\x00junk"] * n, pa.binary()),
            )
            pq.write_table(t, f)

    df = (
        spark.read.format("chunktable").load(out)
        .where(F.col("source").contains("rc17"))
        .select("doc_id")
    )
    got = sorted(r["doc_id"] for r in df.collect())
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source").contains("rc17"))
        .select("doc_id").collect()
    )
    assert got == want


class TestRlikeLiterals:
    def test_spot_cases(self):
        from parquet_extra_spark.engine.predicate import rlike_literals

        assert rlike_literals("^src1.*util") == ["src1", "util"]
        assert rlike_literals("ab|cd") == []
        assert rlike_literals("(abc)def") == []
        assert rlike_literals("[abc]xyz") == ["xyz"]
        assert rlike_literals("a{2,3}bcd") == ["bcd"]
        assert rlike_literals("ab?cde") == ["cde"]
        assert rlike_literals("abc+def") == ["abc", "def"]  # c+ >= one c
        assert rlike_literals(r"foo\.bar") == ["foo.bar"]
        assert rlike_literals(r"foo\dbar") == ["foo", "bar"]

    def test_property_every_match_contains_literals(self):
        """Soundness law: s matches pattern => every extracted literal is
        a substring of s. Random patterns from a regex grammar, random
        subjects biased to match."""
        import re

        from hypothesis import given, settings, strategies as st

        atom = st.one_of(
            st.text(alphabet="abcxyz019", min_size=1, max_size=4),
            st.sampled_from([".", ".*", "a?", "b*", "c+", "[xyz]",
                             r"\d", "x{1,2}", "(qq)", "q|r", "^", "$",
                             r"\.", "[^a]"]),
        )
        patterns = st.lists(atom, min_size=1, max_size=6).map("".join)
        subjects = st.text(alphabet="abcxyz019.qr", max_size=30)

        from parquet_extra_spark.engine.predicate import rlike_literals

        @settings(max_examples=400, deadline=None)
        @given(patterns, subjects)
        def law(pattern, s):
            lits = rlike_literals(pattern)
            if not lits:
                return
            try:
                m = re.search(pattern, s)
            except re.error:
                return
            if m is not None:
                for lit in lits:
                    assert lit in s, (pattern, s, lits)

        law()

    def test_rlike_prunes_via_trigram(self, docs, tg_chunks):
        rep = pushdown_stats_pred(tg_chunks, P.rlike("source", "rc17.$"))
        assert rep["chunks_kept"] < rep["chunks_total"]
        got = sorted(
            r["doc_id"]
            for r in filter_decode_pred(
                tg_chunks, P.rlike("source", "rc17.$"), columns=["doc_id"]
            ).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in docs.where(F.col("source").rlike("rc17.$"))
            .select("doc_id").collect()
        )
        assert got == want
