"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k against a query vector; the dot
  product is a JVM higher-order aggregate (F.zip_with + F.aggregate), so
  the scan whole-stage-codegens and parallelizes like any column scan.
  This is the correctness baseline.
* cosine_pairs_lsh — all-pairs near-neighbour candidates via random-
  hyperplane LSH (signed projections -> signature buckets -> bucket join),
  verified with exact cosine. The scale path: candidate generation is a
  hash join on the signature, never a cross join.
* embedding_near_dups — near-duplicate vectors (cosine >= threshold)
  clustered to min id, built on cosine_pairs_lsh.

Hyperplanes are seeded numpy — deterministic, shipped as literal arrays
(64 dims x n_planes doubles ~ trivially broadcastable).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrdered (no full sort at scale)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_quadratic: bool = False,
    max_rows_unblocked: int = 100_000,
) -> DataFrame:
    """-> (id_a, id_b, cosine): EXACT all-pairs cosine above threshold.
    The oracle baseline for cosine_pairs_lsh / embedding_near_dups — at
    corpus scale the LSH-bucketed variant replaces the quadratic join;
    this one is for verification and small reference sets. The self
    cross-join broadcasts the smaller projected side (id + vector only).

    Quadratic guard (same contract as dedup.ngram_jaccard_exact): above
    ``max_rows_unblocked`` rows the call errors unless
    ``allow_quadratic=True`` — a corpus-sized input must go through
    cosine_pairs_lsh / ivf_topk_chunks instead of silently launching an
    n^2 cross join (and broadcasting an over-limit right side)."""
    if not allow_quadratic:
        n = df.count()
        if n > max_rows_unblocked:
            raise ValueError(
                f"cosine_pairs_exact is an all-pairs cross join — quadratic"
                f" in rows ({n} rows -> ~{n * (n - 1) // 2:,} pairs)."
                " Use cosine_pairs_lsh / embedding_near_dups at scale, or"
                " set allow_quadratic=True explicitly."
            )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    left = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    right = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        left.crossJoin(F.broadcast(right))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit p = (vec . plane_p) > 0, packed to bigint."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(w)) for w in plane])) > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_tables: int = 4,
    dim: int = 64,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """-> (id_a, id_b, cosine >= threshold). n_tables independent signature
    tables boost recall; candidates are verified with exact cosine.
    The within-bucket self-join is quadratic in bucket size, so oversized
    signature buckets (e.g. all-zero embeddings) are dropped before
    pairing — the LSH skew cap."""
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    sig_tables = []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=42 + t)
        sig_tables.append(
            v.select(
                "id", F.lit(t).alias("tbl"), lsh_signature(F.col("v"), planes).alias("sig")
            )
        )
    sigs = sig_tables[0]
    for s in sig_tables[1:]:
        sigs = sigs.unionAll(s)
    if max_bucket_size is not None:
        ok = (
            sigs.groupBy("tbl", "sig")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .drop("count")
        )
        sigs = sigs.join(ok, ["tbl", "sig"], "left_semi")
    left, right = sigs.alias("l"), sigs.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _pq_codebooks(
    dim: int, m: int, n_centroids: int, seed: int = 11
) -> np.ndarray:
    """Deterministic per-subspace codebooks, shape (m, n_centroids,
    dim//m). Data-independent like _ivf_centroids: seeded gaussian
    points scaled to the expected subvector norm of unit-ish embeddings
    (sqrt(d_sub/dim)), so assignments reproduce across engines/runs with
    no training pass. A trained (k-means) codebook drops in by replacing
    this function — every downstream shape is codebook-agnostic."""
    rng = np.random.RandomState(seed)
    d_sub = dim // m
    cb = rng.randn(m, n_centroids, d_sub)
    cb /= np.linalg.norm(cb, axis=2, keepdims=True)
    return cb * np.sqrt(d_sub / dim)


def codebooks_to_json(arr: np.ndarray) -> str:
    """Serialize trained codebooks/centroids losslessly (float64 repr
    round-trips exactly) — persist this next to the index so queries
    reproduce assignments bit-identically across sessions/engines."""
    a = np.asarray(arr, dtype=np.float64)
    return json.dumps({"shape": list(a.shape), "data": a.ravel().tolist()})


def codebooks_from_json(text: str) -> np.ndarray:
    d = json.loads(text)
    return np.asarray(d["data"], dtype=np.float64).reshape(d["shape"])


def _check_codebooks(
    cb: np.ndarray, dim: int, m: int, n_centroids: int
) -> np.ndarray:
    cb = np.asarray(cb, dtype=np.float64)
    want = (m, n_centroids, dim // m)
    if cb.shape != want:
        raise ValueError(f"codebooks shape {cb.shape} != expected {want}")
    return cb


def _hash_ordered_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_rows: int
) -> np.ndarray:
    """The deterministic training sample both trainers share: the
    ``sample_rows`` vectors with the smallest ``xxhash64(id)`` — a
    TakeOrdered, not a scan-order-dependent limit, so the sample
    reproduces across runs, partitionings, and engines."""
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy(F.xxhash64(F.col("id").cast("string")), F.col("id"))
        .limit(sample_rows)
        .collect()
    )
    return np.asarray([r["v"] for r in rows], dtype=np.float64)


def _kmeans_lloyd(
    S: np.ndarray, k: int, iters: int, rng: np.random.RandomState
) -> np.ndarray:
    """Deterministic Lloyd k-means both trainers share: seeded init,
    FIXED iteration count (no data-dependent convergence test), and
    empty clusters reseeded to DISTINCT farthest points — sharing one
    point would leave permanent duplicate centroids (the duplicates
    tie, argmin picks the lowest index, the rest stay empty forever)
    and silently shrink the codebook."""
    C = S[rng.choice(len(S), size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, K) squared L2 via the expanded form — no n*K*d temp
        d2 = (
            (S * S).sum(1, keepdims=True)
            - 2.0 * (S @ C.T)
            + (C * C).sum(1)[None, :]
        )
        assign = d2.argmin(1)
        far_order = np.argsort(-d2.min(1))
        fi = 0
        for c in range(k):
            pts = S[assign == c]
            if len(pts):
                C[c] = pts.mean(0)
            else:
                C[c] = S[far_order[fi]]
                fi += 1
    return C


def train_pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """DETERMINISTIC sampled-k-means codebooks, shape (m, n_centroids,
    dim//m) — the drop-in replacement for the data-independent
    ``_pq_codebooks`` (pass the result as ``codebooks=`` to
    pq_encode/pq_topk/ivfpq_*; encode and query must share it).

    Deterministic at every step so assignments reproduce across runs and
    engines: the training sample is the ``sample_rows`` vectors with the
    smallest ``xxhash64(id)`` (a TakeOrdered, not a scan-order-dependent
    limit), k-means init is a seeded choice, Lloyd iterations are fixed
    count, and empty clusters reseed to the farthest point.  Driver-side
    numpy over a bounded sample — training cost is independent of table
    size (the standard IVF/PQ practice: Jégou TPAMI'11 trains on a
    sample, not the corpus)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    X = _hash_ordered_sample(df, id_col, vec_col, sample_rows)
    if len(X) < n_centroids:
        raise ValueError(
            f"training sample has {len(X)} rows < n_centroids={n_centroids}"
        )
    d_sub = dim // m
    books = [
        _kmeans_lloyd(
            np.ascontiguousarray(X[:, j * d_sub:(j + 1) * d_sub]),
            n_centroids,
            iters,
            np.random.RandomState(seed + 1000 * j),
        )
        for j in range(m)
    ]
    return np.stack(books)


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_centroids: int = 16,
    seed: int = 11,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Product-quantize vectors: -> (id, codes array<int> of length m,
    vnorm double). ~16x lossy compression (64 float32 -> m small codes +
    one norm), searched WITHOUT reconstruction by pq_topk.

    Each subvector takes the code of its nearest codebook entry
    (argmin L2 == argmax dot - ||c||^2/2, evaluated as literal Catalyst
    expressions — one scan, no shuffle, no Python). The true vector norm
    rides along so ADC scores can rank by approximate COSINE, not just
    inner product. Reference analogue: none (the reference is lossless-
    only); public anchor: Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011.
    """
    codes, vnorm = _pq_code_cols(
        F.col(vec_col), dim, m, n_centroids, seed, codebooks
    )
    return df.select(
        F.col(id_col).alias("id"), codes.alias("codes"), vnorm.alias("vnorm")
    )


def _pq_code_cols(
    vec: Column, dim: int, m: int, n_centroids: int, seed: int,
    codebooks: np.ndarray | None = None,
) -> tuple[Column, Column]:
    """(codes, vnorm) columns for a vector column — shared by pq_encode
    and the persisted ivfpq_encode so both lanes assign identically.
    ``codebooks`` (e.g. from train_pq_codebooks) overrides the seeded
    data-independent default; encode and query must pass the same one."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    cb = _check_codebooks(codebooks, dim, m, n_centroids) \
        if codebooks is not None else _pq_codebooks(dim, m, n_centroids, seed)
    d_sub = dim // m
    v = vec.cast("array<double>")
    codes = []
    for j in range(m):
        sub = F.slice(v, j * d_sub + 1, d_sub)
        scores = F.array(
            *[
                _dot(sub, F.array(*[F.lit(float(w)) for w in c]))
                - F.lit(float(np.dot(c, c) / 2.0))
                for c in cb[j]
            ]
        )
        codes.append(
            (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
        )
    return F.array(*codes), F.round(_norm(v), 9)


def pq_topk(
    codes_df: DataFrame,
    query: list[float],
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    seed: int = 11,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes: the
    query builds one m x n_centroids lookup table of subspace dots, each
    row's approximate cosine is m LUT gathers + a divide — the vectors
    themselves never decode.  At 100 TB this scans ~1/16th of the bytes
    of the exact path and stays pure Catalyst (one scan + TakeOrdered).
    """
    q = np.asarray(query, dtype=np.float64)
    dim = len(q)
    cb = _check_codebooks(codebooks, dim, m, n_centroids) \
        if codebooks is not None else _pq_codebooks(dim, m, n_centroids, seed)
    d_sub = dim // m
    qn = float(np.linalg.norm(q))
    lut = [
        float(np.dot(q[j * d_sub:(j + 1) * d_sub], cb[j][c]))
        for j in range(m)
        for c in range(n_centroids)
    ]
    lut_col = F.array(*[F.lit(x) for x in lut])
    ip = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(
                lut_col,
                (j * n_centroids + F.element_at(F.col("codes"), j + 1) + 1
                 ).cast("int"),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = ip / (F.lit(qn) * F.col("vnorm"))
    return (
        codes_df.where(F.col("vnorm") > 0)
        .select(
            "id", F.round(score, 6).alias("cosine_adc")
        )
        .orderBy(F.col("cosine_adc").desc(), F.col("id"))
        .limit(k)
    )


def pq_refine_topk(
    df: DataFrame,
    codes_df: DataFrame,
    query: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int = 16,
    seed: int = 11,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """ADC shortlist + EXACT rerank (the Faiss refine pattern, named as
    architecture): pq_topk picks ``shortlist`` candidates from codes
    alone (~1/16th the bytes), then only those ``shortlist`` vectors are
    fetched and scored exactly.  Output schema matches brute_force_topk
    (id, cosine).

    This is how a lossy 32–64-bit code gets production recall: the codes
    bound WHICH vectors are touched (IO ∝ codes + shortlist), the exact
    pass fixes the ORDER.  At 100 TB the shortlist join is a broadcast
    semi-join of ``shortlist`` ids against the vector table — the scan
    side prunes on the id column's chunk stats."""
    short = pq_topk(
        codes_df, query, k=shortlist, m=m, n_centroids=n_centroids,
        seed=seed, codebooks=codebooks,
    ).select(F.col("id").alias("__short_id"))
    cand = df.join(
        F.broadcast(short),
        F.col(id_col) == F.col("__short_id"),
        "left_semi",
    )
    return brute_force_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    n_centroids: int = 16,
    cell_seed: int = 7,
    pq_seed: int = 11,
    codebooks: np.ndarray | None = None,
    refine: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (the Faiss IVFADC shape): coarse IVF cells prune the
    candidate set to ~nprobe/n_cells of the rows, then ADC over PQ codes
    ranks WITHOUT reconstructing a single vector — compounding the two
    reductions (cell pruning x 16x byte compression ~ 64x less data
    touched than exact scan at nprobe=4).

    Composition of ivf_assign + pq_encode + pq_topk; with ivf_encode's
    persisted cells the pruning happens on chunk METADATA and only the
    probed chunks' code columns are read at all.
    """
    dim = len(query)
    cents = _resolve_centroids(centroids, dim, n_cells, cell_seed)
    q = np.asarray(query, dtype=np.float64)
    probes = (np.argsort(-(cents @ q))[:nprobe] + 1).tolist()
    assigned = ivf_assign(df, id_col, vec_col, n_cells, dim, cell_seed,
                          centroids=centroids)
    survivors = assigned.filter(F.col("cell").isin(probes))
    codes = pq_encode(
        survivors, id_col="id", vec_col="v", dim=dim, m=m,
        n_centroids=n_centroids, seed=pq_seed, codebooks=codebooks,
    )
    if refine is not None:
        # ADC shortlist inside the probed cells, exact rerank on the
        # shortlist's vectors only (survivors still carries v)
        return pq_refine_topk(
            survivors, codes, query, k=k, shortlist=refine,
            id_col="id", vec_col="v", m=m, n_centroids=n_centroids,
            seed=pq_seed, codebooks=codebooks,
        )
    return pq_topk(codes, query, k=k, m=m, n_centroids=n_centroids,
                   seed=pq_seed, codebooks=codebooks)


def ivfpq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    dim: int = 64,
    m: int = 8,
    n_centroids: int = 16,
    cell_seed: int = 7,
    pq_seed: int = 11,
    chunk_rows: int = 4096,
    uid_namespace: str = "ivfpq",
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
    **encode_kwargs,
) -> DataFrame:
    """Persist the full IVF-PQ index INTO the chunk table: one ingest
    scan assigns the coarse cell AND the PQ codes, rows cluster by cell
    (partition_cols=["cell"]), and the stored payload is (id, codes,
    vnorm) — NOT the vectors.  Queries via ivfpq_topk_chunks then touch
    ~nprobe/n_cells of the chunks and each chunk holds ~16x fewer vector
    bytes than an ivf_encode table: both reductions live in storage."""
    from ..engine.encoder import encode

    codes, vnorm = _pq_code_cols(
        F.col(vec_col), dim, m, n_centroids, pq_seed, codebooks
    )
    cents = _resolve_centroids(centroids, dim, n_cells, cell_seed)
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(
        *[_dot(v, F.array(*[F.lit(float(w)) for w in c])) for c in cents]
    )
    table = df.select(
        F.col(id_col).alias("id"),
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
        codes.alias("codes"),
        vnorm.alias("vnorm"),
    )
    return encode(
        table,
        partition_cols=["cell"],
        sort_cols=["id"],
        chunk_rows=chunk_rows,
        uid_namespace=uid_namespace,
        **encode_kwargs,
    )


def ivfpq_topk_chunks(
    chunks: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_cells: int = 16,
    m: int = 8,
    n_centroids: int = 16,
    cell_seed: int = 7,
    pq_seed: int = 11,
    colocated: bool = False,
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ top-k over an ivfpq_encode chunk table: non-probed cells
    prune on chunk stats + membership digest (zero payload decode), and
    the decoded survivors are CODES, not vectors — ADC ranks them from
    the query's lookup table. Must equal ivfpq_topk(df, ...) exactly on
    the same source (same centroids, codebooks, probes, tie-break)."""
    from ..engine.pushdown import filter_decode_isin

    dim = len(query)
    cents = _resolve_centroids(centroids, dim, n_cells, cell_seed)
    q = np.asarray(query, dtype=np.float64)
    probes = (np.argsort(-(cents @ q))[:nprobe] + 1).tolist()  # 1-based
    rows = filter_decode_isin(
        chunks, "cell", probes, columns=["id", "codes", "vnorm"],
        colocated=colocated,
    )
    return pq_topk(rows, query, k=k, m=m, n_centroids=n_centroids,
                   seed=pq_seed, codebooks=codebooks)


def train_ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """DETERMINISTIC sampled-k-means coarse centroids, shape (n_cells,
    dim) — the drop-in replacement for the seeded ``_ivf_centroids``
    (pass as ``centroids=`` to ivf_*/ivfpq_*; index build and query must
    share it). Same determinism contract as train_pq_codebooks: hash-
    ordered sample, seeded init, fixed Lloyd iterations, empty cells
    reseeded to the farthest point. Measured effect (bench/recall_pq.py):
    the coarse quantizer, not the code book, dominates recall at low
    nprobe — training it aligns cells with the data's clusters."""
    S = _hash_ordered_sample(df, id_col, vec_col, sample_rows)
    if len(S) < n_cells:
        raise ValueError(
            f"training sample has {len(S)} rows < n_cells={n_cells}"
        )
    C = _kmeans_lloyd(S, n_cells, iters, np.random.RandomState(seed))
    # cell assignment is max-dot (spherical); normalize like the default
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return C / norms


def _resolve_centroids(
    centroids: np.ndarray | None, dim: int, n_centroids: int, seed: int
) -> np.ndarray:
    if centroids is None:
        return _ivf_centroids(dim, n_centroids, seed)
    c = np.asarray(centroids, dtype=np.float64)
    if c.shape != (n_centroids, dim):
        raise ValueError(
            f"centroids shape {c.shape} != expected {(n_centroids, dim)}"
        )
    return c


def ivfpq_refine_topk_chunks(
    code_chunks: DataFrame,
    vector_chunks: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    n_cells: int = 16,
    m: int = 8,
    n_centroids: int = 16,
    cell_seed: int = 7,
    pq_seed: int = 11,
    id_col: str = "id",
    vec_col: str = "v",
    colocated: bool = False,
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """The full production ANN query over STORAGE, end to end: IVF cell
    pruning (chunk metadata, zero payload decode for non-probed cells)
    → ADC over the probed cells' 16×-smaller code chunks → a
    ``shortlist``-id exact rerank served by POINT LOOKUPS into the
    original vector chunk table — `filter_decode_isin` consults each
    chunk's membership/Bloom digest, so only chunks that provably may
    hold a shortlist id decode their vector payload.

    This is the IVFADC + refine architecture (Faiss ``IndexRefineFlat``
    by name) mapped onto the engine's own pruning machinery: at 100 TB
    the query touches ~nprobe/n_cells of the code bytes plus ~shortlist
    rows' worth of vector chunks. The shortlist ids cross the driver
    once (bounded by ``shortlist``) — inherent to a top-k serving call.

    ``code_chunks`` comes from :func:`ivfpq_encode` (payload = cell,
    codes, vnorm); ``vector_chunks`` from :func:`ivf_encode` or any
    chunk table storing (``id_col``, ``vec_col``). Recall for this lane
    equals pq_refine_topk at the same (nprobe, shortlist) — measured in
    BENCH/recall_pq.json."""
    from ..engine.pushdown import filter_decode_isin

    short = ivfpq_topk_chunks(
        code_chunks, query, k=shortlist, nprobe=nprobe, n_cells=n_cells,
        m=m, n_centroids=n_centroids, cell_seed=cell_seed, pq_seed=pq_seed,
        colocated=colocated, codebooks=codebooks, centroids=centroids,
    )
    ids = [r["id"] for r in short.collect()]
    if not ids:
        # schema must match the non-empty path exactly — derive the id
        # and vector dtypes from the chunk table's discovered schema
        from ..engine.decoder import discover_schema

        dts = {c: d for c, _, d in discover_schema(vector_chunks)}
        empty = vector_chunks.sparkSession.createDataFrame(
            [], f"`{id_col}` {dts[id_col]}, `{vec_col}` {dts[vec_col]}"
        )
        return brute_force_topk(empty, query, k=k, id_col=id_col,
                                vec_col=vec_col)
    cand = filter_decode_isin(
        vector_chunks, id_col, ids, columns=[id_col, vec_col],
        colocated=colocated,
    )
    return brute_force_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


def _ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Deterministic spherical centroids (seeded unit vectors). Data-
    independent on purpose: assignments are reproducible across engines
    and runs with no training pass — the IVF cell structure is a fixed
    Voronoi partition of the unit sphere, the index analogue of the
    engine's deterministic hash bucketing."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_centroids, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    dim: int = 64,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """-> (id, cell, v): each vector assigned to its max-dot-product
    centroid (1-based cell index; first occurrence wins ties). One scan,
    centroids inlined as literals — no shuffle, no training job."""
    cents = _resolve_centroids(centroids, dim, n_centroids, seed)
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(
        *[_dot(v, F.array(*[F.lit(float(w)) for w in c])) for c in cents]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_position(dots, F.array_max(dots)).cast("int").alias("cell"),
        v.alias("v"),
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe cells nearest the query,
    exact cosine inside them only.

    The scale path vs brute_force_topk: at 100 TB the assignment column
    is computed once at ingest (ivf_assign persisted alongside the
    vectors, or recovered from the chunk table), and a query scans
    ~nprobe/n_centroids of the data — partition pruning for vectors.
    Recall is tunable via nprobe (nprobe == n_centroids -> exact)."""
    dim = len(query)
    cents = _resolve_centroids(centroids, dim, n_centroids, seed)
    q = np.asarray(query, dtype=np.float64)
    probes = (np.argsort(-(cents @ q))[:nprobe] + 1).tolist()  # 1-based
    assigned = ivf_assign(df, id_col, vec_col, n_centroids, dim, seed,
                          centroids=centroids)
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        assigned.filter(F.col("cell").isin(probes))
        .select(
            "id",
            F.round(cosine(F.col("v"), qcol), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def ivf_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    dim: int = 64,
    seed: int = 7,
    chunk_rows: int = 4096,
    n_buckets: int | None = None,
    n_salts: int = 1,
    uid_namespace: str = "ivf",
    centroids: np.ndarray | None = None,
    **encode_kwargs,
) -> DataFrame:
    """Persist the IVF index INTO the chunk table: cells assigned once at
    ingest, rows clustered by cell (partition_cols=["cell"]), so queries
    prune whole chunks on the ``cell`` stats instead of recomputing the
    assignment per query. Chunk rows carry (id, cell, v) where v is the
    vector as array<double>.

    Clustering on cell means each chunk covers 1-2 cells ([min,max] on a
    sorted int column), and the membership digest (cell has <= n_centroids
    distinct values per chunk) makes isin pruning *exact* even when a
    chunk straddles a cell boundary. At 100 TB a query decodes
    ~nprobe/n_centroids of the chunks — partition pruning for vectors,
    computed from chunk metadata only."""
    from ..engine.encoder import encode

    assigned = ivf_assign(df, id_col, vec_col, n_centroids, dim, seed,
                          centroids=centroids)
    return encode(
        assigned,
        partition_cols=["cell"],
        sort_cols=["cell", "id"],
        chunk_rows=chunk_rows,
        n_buckets=n_buckets or n_centroids,
        n_salts=n_salts,
        uid_namespace=uid_namespace,
        **encode_kwargs,
    )


def ivf_topk_chunks(
    chunks: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_centroids: int = 16,
    seed: int = 7,
    colocated: bool = False,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF top-k over an ivf_encode chunk table: probe cells are computed
    driver-side from the (deterministic) centroids, non-probed chunks are
    PRUNED ON STATS (chunk_isin_filter consults min/max + the membership
    digest — zero payload decode for skipped chunks), and exact cosine
    runs only inside the decoded probe cells. Matches ivf_topk(df, ...)
    on the same source exactly (same centroids, probes, tie-break)."""
    from ..engine.pushdown import filter_decode_isin

    dim = len(query)
    cents = _resolve_centroids(centroids, dim, n_centroids, seed)
    q = np.asarray(query, dtype=np.float64)
    probes = (np.argsort(-(cents @ q))[:nprobe] + 1).tolist()  # 1-based
    rows = filter_decode_isin(
        chunks, "cell", probes, columns=["id", "v"], colocated=colocated
    )
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        rows.select("id", F.round(cosine(F.col("v"), qcol), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """-> (id, cluster_id): embedding near-duplicates clustered to min id."""
    pairs = cosine_pairs_lsh(
        df, threshold=threshold, id_col=id_col, vec_col=vec_col, dim=dim
    )
    links = pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("rep"))
    clusters = links.groupBy("id").agg(F.min("rep").alias("cluster_id"))
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(clusters, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )
