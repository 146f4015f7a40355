"""IVF persisted into the chunk table: cells assigned once at ingest
(ivf_encode), queries prune whole chunks on `cell` stats + membership
digest before any payload decode (ivf_topk_chunks). The scale path the
per-query-assignment ivf_topk only approximates."""

import numpy as np
import pytest
from pyspark.sql import Row

from parquet_extra_spark.operators.similarity import (
    ivf_encode,
    ivf_topk,
    ivf_topk_chunks,
)

DIM = 16
N_CENT = 8


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    rows = [
        Row(vec_id=f"v{i:04d}", embedding=[float(x) for x in rng.randn(DIM)])
        for i in range(400)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def ivf_chunks(vectors):
    c = ivf_encode(
        vectors, n_centroids=N_CENT, dim=DIM, chunk_rows=32, num_partitions=4
    ).cache()
    c.count()
    return c


def test_ivf_chunks_matches_query_time_assignment(vectors, ivf_chunks):
    rng = np.random.RandomState(3)
    for _ in range(3):
        q = [float(x) for x in rng.randn(DIM)]
        want = ivf_topk(vectors, q, k=7, nprobe=3, n_centroids=N_CENT).collect()
        got = ivf_topk_chunks(ivf_chunks, q, k=7, nprobe=3, n_centroids=N_CENT).collect()
        assert [(r.id, r.cosine) for r in got] == [(r.id, r.cosine) for r in want]


def test_ivf_chunk_pruning_is_selective(ivf_chunks):
    """Clustering on cell + stats/digest pruning must decode only ~nprobe
    of n_centroids cells' chunks — the whole point of persisting."""
    from parquet_extra_spark.engine.pushdown import chunk_isin_filter

    total = ivf_chunks.select("chunk_id").distinct().count()
    q = [1.0] + [0.0] * (DIM - 1)
    from parquet_extra_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(DIM, N_CENT, 7)
    probes = (np.argsort(-(cents @ np.asarray(q)))[:2] + 1).tolist()
    kept = (
        chunk_isin_filter(ivf_chunks, "cell", probes)
        .select("chunk_id").distinct().count()
    )
    # 2 of 8 cells probed; sorted-by-cell chunks straddle at most one
    # boundary, so kept should be well under half of all chunks
    assert kept < total / 2
    assert kept > 0


def test_ivf_exact_when_all_cells_probed(vectors, ivf_chunks):
    q = [0.5] * DIM
    from parquet_extra_spark.operators.similarity import brute_force_topk

    exact = brute_force_topk(vectors, q, k=5).collect()
    got = ivf_topk_chunks(
        ivf_chunks, q, k=5, nprobe=N_CENT, n_centroids=N_CENT
    ).collect()
    assert [(r.id, r.cosine) for r in got] == [(r.id, r.cosine) for r in exact]


def test_ivfpq_persisted_equals_inmemory_and_prunes(spark, sf_dir):
    """ivfpq_encode stores (cell, codes, vnorm) — queries must equal the
    in-memory ivfpq_topk composition exactly, and non-probed chunks must
    never decode (poisoned-payload proof)."""
    from pyspark.sql import functions as F

    from parquet_extra_spark.operators import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_topk_chunks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    chunks = ivfpq_encode(emb, chunk_rows=256, num_partitions=8).cache()
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    got = [(r["id"], r["cosine_adc"])
           for r in ivfpq_topk_chunks(chunks, q, k=10, nprobe=4,
                                      colocated=True).collect()]
    want = [(r["id"], r["cosine_adc"])
            for r in ivfpq_topk(emb, q, k=10, nprobe=4).collect()]
    assert got == want
    # poison payloads of every chunk the stats/digest pruning drops:
    # the query must still succeed and match (pruned chunks never decode)
    from parquet_extra_spark.engine.pushdown import chunk_isin_filter
    from parquet_extra_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(64, 16, 7)
    probes = (np.argsort(-(cents @ np.asarray(q)))[:4] + 1).tolist()
    kept = {
        r["chunk_id"]
        for r in chunk_isin_filter(chunks, "cell", probes)
        .select("chunk_id").distinct().collect()
    }
    total = chunks.select("chunk_id").distinct().count()
    assert 0 < len(kept) < total  # pruning is actually selective
    poisoned = chunks.withColumn(
        "payload",
        F.when(
            ~F.col("chunk_id").isin(list(kept)), F.lit(b"\x00garbage")
        ).otherwise(F.col("payload")),
    )
    again = [(r["id"], r["cosine_adc"])
             for r in ivfpq_topk_chunks(poisoned, q, k=10,
                                        nprobe=4).collect()]
    assert again == want
    chunks.unpersist()


def test_ivfpq_refine_chunks_equals_inmemory_refine(spark, sf_dir):
    """The full storage-side ANN query (cell-pruned ADC shortlist +
    Bloom point-lookup exact rerank into the vector chunk table) must
    equal the in-memory ivfpq_topk(refine=) composition exactly."""
    from parquet_extra_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_refine_topk_chunks,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    code_chunks = ivfpq_encode(emb, chunk_rows=64, num_partitions=4).cache()
    vec_chunks = ivf_encode(
        emb, n_centroids=16, dim=64, chunk_rows=64, num_partitions=4,
        bloom_cols=["id"],
    ).cache()
    code_chunks.count(); vec_chunks.count()

    query = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    got = ivfpq_refine_topk_chunks(
        code_chunks, vec_chunks, query, k=10, nprobe=4, shortlist=50,
    ).collect()
    want = ivfpq_topk(
        emb, query, k=10, nprobe=4, refine=50,
    ).collect()
    assert [(r["id"], r["cosine"]) for r in got] == [
        (r["id"], r["cosine"]) for r in want
    ]
    code_chunks.unpersist(); vec_chunks.unpersist()
