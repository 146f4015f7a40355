"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side Catalyst expressions (higher-order functions
over arrays — transform/aggregate/array_min), never per-row Python, so
they whole-stage-codegen and scale exactly like built-in operators:

* exact:    sha256 fingerprint -> hash aggregate (one shuffle)
* minhash:  char-shingles -> k minhash values (universal hashing over one
            xxhash64 per shingle) -> LSH banding -> bucket join; candidate
            verification with exact array-intersection Jaccard
* simhash:  token hashes -> 64-bit sign-aggregated fingerprint -> banded
            16-bit blocks for Hamming-near candidates

Scale notes (100 TB): every operator is a groupBy on a hash key — uniform
by construction, so no salting needed; band tables carry only (id, hash)
pairs, a tiny fraction of the corpus; candidate verification joins are
per-bucket and bounded by bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# deterministic universal-hash parameters (seeded, no runtime RNG).
# 31-bit domain: h < 2^31 and a,b < 2^31 keeps a*h+b < 2^62, safe under
# Spark ANSI long arithmetic.
_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(k)]


def _fingerprint(col: Column) -> Column:
    return F.sha2(col, 256)


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (hash-groupBy, one shuffle)."""
    w = Window.partitionBy(_fingerprint(F.col(text_col))).orderBy(*df.columns)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_rows, n_distinct, n_dup_rows) — the dedup report."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(_fingerprint(F.col(text_col))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(_fingerprint(F.col(text_col)))).alias(
            "n_dup_rows"
        ),
    )


def _shingles(col: Column, n: int) -> Column:
    """Distinct character n-grams, entirely JVM-side."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(n - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(n)),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    shingle: int = 5,
) -> DataFrame:
    """-> (id, sig: array<bigint> of k minhash values).

    One xxhash64 per shingle, then k universal hashes (a*h+b mod p) folded
    with array_min — transform/aggregate keep everything in codegen.
    """
    sh = _shingles(F.col(text_col), shingle)
    hs = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    params = _hash_params(k)

    def _universal(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P))

    sig = F.array(
        *[F.array_min(F.transform(hs, _universal(a, b))) for a, b in params]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def _bands(sig: Column, bands: int, rows: int) -> Column:
    """array of (band_idx, band_hash) structs from a minhash signature."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig, b * rows + 1, rows), lambda v: v.cast("string"))),
            ).alias("bhash"),
        ),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    shingle: int = 5,
    jaccard_threshold: float | None = 0.8,
) -> DataFrame:
    """-> (id, cluster_id): near-duplicate clusters via MinHash + LSH.

    cluster_id = min id sharing any band bucket (single-pass approximation
    of connected components — exact for the common near-dup case of tight
    clusters; chains across clusters would need iteration, documented).
    With jaccard_threshold set, bucket mates are verified with exact
    shingle-set Jaccard (array_intersect — JVM) before clustering.
    """
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle)
    exploded = sigs.select(
        "id", F.explode(_bands(F.col("sig"), bands, rows)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))

    if jaccard_threshold is None:
        buckets = exploded.groupBy("band", "bhash").agg(F.min("id").alias("rep"))
        assigned = exploded.join(buckets, ["band", "bhash"])
        return assigned.groupBy("id").agg(F.min("rep").alias("cluster_id"))

    # candidate pairs within buckets (id > rep), verified by exact jaccard
    sh = df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle).alias("sh"),
    )
    reps = exploded.groupBy("band", "bhash").agg(F.min("id").alias("rep"))
    cands = (
        exploded.join(reps, ["band", "bhash"])
        .filter(F.col("id") != F.col("rep"))
        .select("id", "rep")
        .distinct()
    )
    pairs = (
        cands.join(sh, "id")
        .join(sh.select(F.col("id").alias("rep"), F.col("sh").alias("sh_rep")), "rep")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh", "sh_rep"))
            / F.size(F.array_union("sh", "sh_rep")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id", "rep")
    )
    clusters = pairs.groupBy("id").agg(F.min("rep").alias("cluster_id"))
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(clusters, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, simhash: bigint). 64-bit SimHash over whitespace tokens:
    bit i is the sign of sum over tokens of (bit i of xxhash64(token) ? +1 : -1),
    computed as one aggregate per bit via higher-order functions (JVM)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    hs = F.transform(tokens, lambda t: F.xxhash64(t))

    def _sign_step(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    # one sign-aggregate per bit, unrolled in Python (the shift amount must
    # be a literal for shiftright); still a single projection in the plan
    fp = F.lit(0).cast("long")
    for i in range(64):
        bit_sum = F.aggregate(hs, F.lit(0).cast("long"), _sign_step(i))
        fp = fp.bitwiseOR(
            F.when(
                bit_sum > 0,
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, cluster_id): candidates share one of four 16-bit simhash
    blocks (Hamming distance <= 3 guarantees a shared block by pigeonhole),
    clustered to the min id per block bucket."""
    s = simhash(df, id_col, text_col)
    blocks = s.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("e"),
    ).select("id", F.col("e.blk").alias("blk"), F.col("e.bval").alias("bval"))
    reps = blocks.groupBy("blk", "bval").agg(F.min("id").alias("rep"))
    return (
        blocks.join(reps, ["blk", "bval"])
        .groupBy("id")
        .agg(F.min("rep").alias("cluster_id"))
    )


def ngram_jaccard_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.3,
    group_col: str | None = None,
) -> DataFrame:
    """-> (id_a, id_b, jaccard): EXACT all-pairs n-gram Jaccard, optionally
    blocked on ``group_col`` to bound the quadratic join. The oracle
    baseline for ngram_jaccard_pairs: at corpus scale you block (group) or
    LSH; this exact variant is what those approximations are judged
    against. Shuffle = one self-join on the blocking key."""
    sh = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(group_col).alias("grp")] if group_col else [] ),
        _shingles(F.col(text_col), shingle).alias("sh"),
    )
    left = sh.select(
        F.col("id").alias("id_a"),
        *( [F.col("grp")] if group_col else [] ),
        F.col("sh").alias("sh_a"),
    )
    right = sh.select(
        F.col("id").alias("id_b"),
        *( [F.col("grp")] if group_col else [] ),
        F.col("sh").alias("sh_b"),
    )
    on = [F.col("id_a") < F.col("id_b")]
    if group_col:
        joined = left.join(right, "grp").filter(*on)
    else:
        joined = left.crossJoin(right).filter(*on)
    return (
        joined.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.5,
    k: int = 32,
    bands: int = 16,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for candidate pairs above threshold.
    LSH (wide bands for recall) proposes, exact n-gram Jaccard disposes."""
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle)
    exploded = sigs.select(
        "id", F.explode(_bands(F.col("sig"), bands, rows)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), shingle).alias("sh")
    )
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
