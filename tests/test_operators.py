"""Training-data operator tests: dedup family, similarity search, text
analysis. Correctness is checked against brute-force/python references on
small data; LSH variants must contain the exact answers (recall checks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_extra_spark import operators as ops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    """documents with planted exact and near duplicates."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    for i in range(30):
        # genuinely distinct content — no shared template (shared 5-gram
        # shingles would make these *real* near-dups, which minhash should
        # and does find)
        words = " ".join(f"w{i}x{j}q{(i * 31 + j * 17) % 997}" for j in range(12))
        rows.append((i, words))
    rows.append((100, base))
    rows.append((101, base))                      # exact dup of 100
    rows.append((102, base + " extra"))           # near dup
    rows.append((103, base.replace("quick", "quik")))  # near dup
    rows.append((104, "completely different text about spark and arrow batches"))
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_dedup(dup_docs):
    out = ops.exact_dedup(dup_docs)
    assert out.count() == dup_docs.count() - 1  # one exact dup removed
    st = ops.exact_dup_stats(dup_docs).collect()[0]
    assert st["n_dup_rows"] == 1


def test_minhash_lsh_finds_planted_near_dups(dup_docs):
    clusters = {
        r["id"]: r["cluster_id"]
        for r in ops.minhash_lsh_dedup(
            dup_docs, jaccard_threshold=0.5, k=64, bands=16
        ).collect()
    }
    assert clusters[101] == 100  # exact dup
    assert clusters[102] == 100  # near dup clusters with base
    assert clusters[104] == 104  # unrelated stays alone
    # uniques remain their own clusters
    assert clusters[5] == 5


def test_minhash_no_threshold_buckets(dup_docs):
    out = ops.minhash_lsh_dedup(dup_docs, jaccard_threshold=None, k=32, bands=8)
    assert out.count() == dup_docs.count()


def test_simhash_exact_dups_share_hash(dup_docs):
    h = {r["id"]: r["simhash"] for r in ops.simhash(dup_docs).collect()}
    assert h[100] == h[101]
    cl = {r["id"]: r["cluster_id"] for r in ops.simhash_dedup(dup_docs).collect()}
    assert cl[101] == 100


def test_ngram_jaccard_pairs(dup_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ops.ngram_jaccard_pairs(dup_docs, threshold=0.4, k=64, bands=32).collect()
    }
    assert (100, 101) in pairs and pairs[(100, 101)] == 1.0
    assert (100, 102) in pairs


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = mat[0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    expected = set(pdf["vec_id"].values[np.argsort(-cos)[:5]].tolist())
    got = {
        r["id"]
        for r in ops.brute_force_topk(emb, q.tolist(), k=5).collect()
    }
    assert got == expected


def test_lsh_finds_planted_near_dup_vectors(spark, sf_dir):
    """Plant near-duplicate vectors (cos ~0.99) and require the LSH path to
    recover (almost) all planted pairs — the actual near-dup use case.
    (The raw fixture's max pairwise cosine is 0.48: random-hyperplane LSH
    targets high-similarity retrieval, not mid-range search.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float32)
    rng = np.random.RandomState(3)
    planted = mat[:10] + 0.03 * rng.randn(10, mat.shape[1]).astype(np.float32)
    rows = [
        (int(pdf["vec_id"][i]) + 10_000, planted[i].tolist(), 0) for i in range(10)
    ]
    extra = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    full = emb.unionByName(extra)
    clusters = {
        r["id"]: r["cluster_id"]
        for r in ops.embedding_near_dups(full, threshold=0.9, dim=mat.shape[1]).collect()
    }
    found = sum(
        1 for i in range(10) if clusters[int(pdf["vec_id"][i]) + 10_000] == int(pdf["vec_id"][i])
    )
    assert found >= 8, f"only {found}/10 planted near-dups recovered"
    # non-planted vectors stay singleton clusters
    assert clusters[int(pdf["vec_id"][50])] == int(pdf["vec_id"][50])


def test_token_counts_and_quality(docs):
    tc = ops.token_counts(docs).collect()
    assert all(r["n_ws_tokens"] > 0 for r in tc)
    q = ops.quality_scores(docs)
    rows = q.collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(r["punct_ratio"] >= 0 for r in rows)


def test_lang_id_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in that for with as"),
            (2, "der hund und die katze ist nicht mit ein von zu haus"),
            (3, "zzz qqq www eee rrr"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["id"]: r["lang_pred"] for r in ops.lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_doc_fingerprints_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "doc_id bigint, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in ops.doc_fingerprints(df).collect()}
    assert fp[1] == fp[2] != fp[3]
