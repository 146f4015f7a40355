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


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """10k identical-signature rows: without the cap every band bucket
    holds all 10k ids; with the cap candidate generation drops those
    buckets instead of funnelling 10k rows through one task, and unique
    rows still cluster to themselves."""
    from pyspark.sql import Row

    n = 10_000
    rows = [Row(doc_id=i, text="the same boilerplate text " * 4) for i in range(n)]
    rows += [
        Row(
            doc_id=n + i,
            # no shared template text — shared shingles would make these
            # genuine near-dups of each other
            text=" ".join(f"u{i}z{j}k{(i * 37 + j * 11) % 883}" for j in range(12)),
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    out = ops.minhash_lsh_dedup(df, jaccard_threshold=0.5, max_bucket_size=100)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert len(got) == n + 50
    # degenerate-bucket members fall back to self-clusters (dropped bucket)
    assert got[0] == 0 and got[1] == 1
    # unique docs are their own clusters either way
    assert all(got[n + i] == n + i for i in range(50))
    # observability: stats report the dropped buckets
    stats = ops.lsh_bucket_stats(df, max_bucket_size=100).collect()
    assert all(r["n_dropped"] >= 1 for r in stats)
    assert all(r["max_bucket"] >= n for r in stats)
    # and WITH a permissive cap the 10k duplicates do cluster together
    out2 = ops.minhash_lsh_dedup(df, jaccard_threshold=0.5, max_bucket_size=20_000)
    got2 = {r["id"]: r["cluster_id"] for r in out2.collect()}
    assert all(got2[i] == 0 for i in range(n))


def test_simhash_bucket_cap(spark):
    from pyspark.sql import Row

    rows = [Row(doc_id=i, text="identical words everywhere") for i in range(1000)]
    rows += [Row(doc_id=1000 + i, text=f"distinct sample {i} {i*13}") for i in range(20)]
    df = spark.createDataFrame(rows)
    out = ops.simhash_dedup(df, max_bucket_size=100)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert len(got) == 1020  # every id present even when its buckets drop
    assert got[0] == 0  # dropped-bucket member falls back to itself


def test_md5_hash_method_matches_xxhash_shape(docs):
    """The md5 (SQL-reproducible) method produces the same schema and the
    same planted-duplicate clustering as the default method."""
    a = ops.minhash_lsh_dedup(docs, jaccard_threshold=0.5, hash_method="md5")
    b = ops.minhash_lsh_dedup(docs, jaccard_threshold=0.5, hash_method="xxhash64")
    assert a.columns == b.columns == ["id", "cluster_id"]
    assert a.count() == b.count()


def test_ivf_topk_recall_and_exactness(spark, sf_dir):
    """nprobe == n_centroids makes IVF exhaustive (must equal brute
    force); small nprobe trades recall for scanning ~nprobe/n_centroids
    of the data."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    exact = [(r["id"], r["cosine"]) for r in ops.brute_force_topk(emb, q, k=10).collect()]
    full = [(r["id"], r["cosine"]) for r in
            ops.ivf_topk(emb, q, k=10, nprobe=16, n_centroids=16).collect()]
    assert full == exact
    # recall grows monotonically-ish with nprobe; this fixture's
    # similarities are mid-range (max cosine ~0.5) so cells spread the
    # true top-k — assert the structural contract, not a recall magic
    # number: probing half the cells beats probing a quarter
    hits = {}
    for nprobe in (4, 8):
        approx = ops.ivf_topk(emb, q, k=10, nprobe=nprobe, n_centroids=16).collect()
        assert len(approx) == 10
        cos = [r["cosine"] for r in approx]
        assert cos == sorted(cos, reverse=True)
        hits[nprobe] = len({r["id"] for r in approx} & {i for i, _ in exact})
    assert hits[8] >= hits[4] >= 1, hits


def test_ivf_assign_covers_all_cells_deterministically(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = ops.ivf_assign(emb)
    b = ops.ivf_assign(emb)
    assert a.count() == emb.count()
    ca = {r["id"]: r["cell"] for r in a.collect()}
    cb = {r["id"]: r["cell"] for r in b.collect()}
    assert ca == cb
    assert set(ca.values()) <= set(range(1, 17))


def test_ngram_jaccard_exact_quadratic_guard(dup_docs):
    # unblocked exact Jaccard is a cross join: above the row cap it must
    # refuse unless the caller opts in explicitly
    with pytest.raises(ValueError, match="cross join"):
        ops.ngram_jaccard_exact(dup_docs, max_rows_unblocked=3)
    out = ops.ngram_jaccard_exact(
        dup_docs, max_rows_unblocked=3, allow_quadratic=True, threshold=0.0
    )
    assert out.count() > 0
    # a blocking column bypasses the guard (the join is bounded per group)
    blocked = dup_docs.withColumn("blk", F.lit("one"))
    assert ops.ngram_jaccard_exact(
        blocked, group_col="blk", max_rows_unblocked=3, threshold=0.0
    ).count() == out.count()


def test_pq_encode_shape_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes = ops.pq_encode(emb)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
        assert r["vnorm"] > 0
    again = {r["id"]: r["codes"] for r in ops.pq_encode(emb).collect()}
    for r in rows:
        assert again[r["id"]] == r["codes"]


def test_pq_adc_ranks_like_exact_cosine(spark, sf_dir):
    """ADC over PQ codes is approximate: assert the structural contract
    (descending scores, deterministic, meaningful overlap with the exact
    top-k) rather than a recall magic number."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    codes = ops.pq_encode(emb)
    adc = ops.pq_topk(codes, q, k=50).collect()
    assert len(adc) == 50
    scores = [r["cosine_adc"] for r in adc]
    assert scores == sorted(scores, reverse=True)
    exact_ids = {r["id"] for r in ops.brute_force_topk(emb, q, k=10).collect()}
    adc_ids = {r["id"] for r in adc}
    # untrained data-independent codebooks measured ~0.6 recall@10-in-50
    # on this fixture; 0.2 is the conservative structural floor
    assert len(exact_ids & adc_ids) >= 2


def test_pq_dim_validation(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        ops.pq_encode(emb, m=7)


def test_ivfpq_topk_is_subset_consistent(spark, sf_dir):
    """IVF-PQ results come only from probed cells, scores descend, and
    probing ALL cells equals plain PQ-ADC (the coarse stage is a pure
    filter, never a re-ranker)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    part = ops.ivfpq_topk(emb, q, k=20, nprobe=4).collect()
    assert 0 < len(part) <= 20
    scores = [r["cosine_adc"] for r in part]
    assert scores == sorted(scores, reverse=True)
    full = [(r["id"], r["cosine_adc"])
            for r in ops.ivfpq_topk(emb, q, k=20, nprobe=16).collect()]
    adc = [(r["id"], r["cosine_adc"])
           for r in ops.pq_topk(ops.pq_encode(emb), q, k=20).collect()]
    assert full == adc
