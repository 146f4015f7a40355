"""Measured retrieval quality of the lossy PQ/IVF-PQ lanes.

VERDICT r4: "an ANN lane whose recall is unknown is not shippable."
These tests pin recall@10 on the synthetic embeddings (sf0.001, fully
deterministic: fixed data, seeded/trained codebooks, fixed queries), and
that the trained codebooks/centroids beat the data-independent seeded
ones. The full nprobe sweep lives in bench/recall_pq.py ->
BENCH/recall_pq.json.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_extra_spark.operators.similarity import (
    _ivf_centroids,
    _pq_code_cols,
    brute_force_topk,
    ivf_assign,
    pq_refine_topk,
    pq_topk,
    train_ivf_centroids,
    train_pq_codebooks,
)

K = 10
SHORTLIST = 100
N_QUERIES = 6


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q_idx = [int(i) for i in np.linspace(0, len(X) - 1, N_QUERIES).round()]
    queries = [[float(x) for x in X[i]] for i in q_idx]
    return emb, ids, X, queries


def _exact(X, ids, q, k=K):
    c = np.round((X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q)), 6)
    order = np.lexsort((ids, -c))
    return [int(i) for i in ids[order[:k]]]


def _recall(approx, exact):
    return len(set(approx) & set(exact)) / len(exact)


def _codes(emb, dim, m, cb):
    c, vn = _pq_code_cols(F.col("embedding").cast("array<double>"),
                          dim, m, 16, 11, cb)
    return emb.select(F.col("vec_id").alias("id"), c.alias("codes"),
                      vn.alias("vnorm")).cache()


def test_exact_replica_matches_brute_force(corpus):
    emb, ids, X, queries = corpus
    got = [r["id"] for r in brute_force_topk(emb, queries[0], k=K).collect()]
    assert got == _exact(X, ids, np.asarray(queries[0]))


def test_trained_pq_refine_recall_at_10(corpus):
    """Headline quality gate: trained m=16 codebooks + ADC shortlist-100
    + exact rerank reaches recall@10 >= 0.9 (measured 0.983 on this
    deterministic corpus; margin for float-kernel differences only)."""
    emb, ids, X, queries = corpus
    dim = X.shape[1]
    cb = train_pq_codebooks(emb, dim=dim, m=16)
    codes = _codes(emb, dim, 16, cb)
    rs = []
    for q in queries:
        exact = _exact(X, ids, np.asarray(q))
        got = [r["id"] for r in pq_refine_topk(
            emb, codes, q, k=K, shortlist=SHORTLIST, m=16, codebooks=cb,
        ).collect()]
        rs.append(_recall(got, exact))
    assert float(np.mean(rs)) >= 0.9, rs


def test_trained_codebooks_beat_seeded_adc(corpus):
    """Raw ADC (no rerank): trained m=16 must clearly beat the seeded
    m=8 default (measured 0.45 vs 0.18)."""
    emb, ids, X, queries = corpus
    dim = X.shape[1]
    cb16 = train_pq_codebooks(emb, dim=dim, m=16)
    seeded = _codes(emb, dim, 8, None)
    trained = _codes(emb, dim, 16, cb16)
    r_seed, r_train = [], []
    for q in queries:
        exact = _exact(X, ids, np.asarray(q))
        a = [r["id"] for r in pq_topk(seeded, q, k=K, m=8).collect()]
        b = [r["id"] for r in
             pq_topk(trained, q, k=K, m=16, codebooks=cb16).collect()]
        r_seed.append(_recall(a, exact))
        r_train.append(_recall(b, exact))
    assert float(np.mean(r_train)) >= float(np.mean(r_seed)) + 0.1, (
        r_seed, r_train,
    )


def test_trained_centroids_beat_seeded_at_low_nprobe(corpus):
    """The coarse quantizer dominates low-nprobe recall: trained cells
    must beat seeded cells at nprobe=4 with the same exact in-cell
    scoring (measured 0.63 vs 0.48 with m=16 refine)."""
    emb, ids, X, queries = corpus
    dim = X.shape[1]
    nprobe = 4
    tc = train_ivf_centroids(emb, dim=dim, n_cells=16)
    sc = _ivf_centroids(dim, 16, 7)

    def mean_recall(cents, cents_arg):
        assigned = ivf_assign(emb, "vec_id", "embedding", 16, dim, 7,
                              centroids=cents_arg).cache()
        rs = []
        for q in queries:
            qa = np.asarray(q)
            probes = (np.argsort(-(cents @ qa))[:nprobe] + 1).tolist()
            sub = assigned.filter(F.col("cell").isin(probes))
            got = [r["id"] for r in
                   brute_force_topk(sub, q, k=K, id_col="id",
                                    vec_col="v").collect()]
            rs.append(_recall(got, _exact(X, ids, qa)))
        return float(np.mean(rs))

    assert mean_recall(tc, tc) >= mean_recall(sc, None) + 0.05


def test_training_is_deterministic(corpus):
    emb, _, X, _ = corpus
    dim = X.shape[1]
    a = train_pq_codebooks(emb, dim=dim, m=8)
    b = train_pq_codebooks(emb, dim=dim, m=8)
    assert np.array_equal(a, b)
    ca = train_ivf_centroids(emb, dim=dim)
    cbn = train_ivf_centroids(emb, dim=dim)
    assert np.array_equal(ca, cbn)
