"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side Catalyst expressions (higher-order functions
over arrays — transform/aggregate/array_min), never per-row Python, so
they whole-stage-codegen and scale exactly like built-in operators:

* exact:    sha256 fingerprint -> hash aggregate (one shuffle)
* minhash:  char-shingles -> k minhash values (universal hashing over one
            base hash per shingle) -> LSH banding -> bucket join;
            candidate verification with exact array-intersection Jaccard
* simhash:  token hashes -> sign-aggregated fingerprint -> banded
            blocks for Hamming-near candidates

Two base-hash methods, selectable per call:

* ``hash_method="xxhash64"`` — fastest (one JVM hash per shingle); the
  100-TB default.
* ``hash_method="md5"`` — bit-identical reproducible in ANSI SQL
  (``('0x' || substr(md5(s),1,15))::BIGINT`` in DuckDB equals Spark's
  ``conv(substr(md5(s),1,15),16,10)``), so minhash/simhash cluster
  assignments are value-checkable against an external oracle — the
  golden-construction standard of the reference's predicate tests
  (PredicateTest.scala:19-222) applied to sketching.

Skew safety (LSH buckets are the one non-uniform join key here): every
bucketed operator takes ``max_bucket_size``; buckets above it (empty/
boilerplate documents sharing a signature) are dropped from candidate
generation — standard LSH practice: such buckets are near-duplicates of
each other trivially, and quadratic pair generation inside them would
serialize one task. Dropped-bucket counts are observable via
``lsh_bucket_stats``.

Scale notes (100 TB): every operator is a groupBy on a hash key — uniform
by construction except LSH buckets (capped above); band tables carry only
(id, hash) pairs, a tiny fraction of the corpus; candidate verification
joins are per-bucket and bounded by the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# deterministic universal-hash parameters (seeded, no runtime RNG).
# 31-bit domain: h < 2^31 and a,b < 2^31 keeps a*h+b < 2^62, safe under
# Spark ANSI long arithmetic.
_P = (1 << 31) - 1  # Mersenne prime 2^31-1

DEFAULT_MAX_BUCKET = 10_000


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(k)]


def _fingerprint(col: Column) -> Column:
    return F.sha2(col, 256)


def _base_hash(col: Column, hash_method: str) -> Column:
    """One non-negative int64 per value. md5 variant: integer value of the
    first 15 hex chars (60 bits) — reproducible in ANSI SQL engines."""
    if hash_method == "xxhash64":
        return F.xxhash64(col)
    if hash_method == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    raise ValueError(f"unknown hash_method {hash_method!r}")


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (hash-groupBy, one shuffle).

    Tie-break among duplicates orders by a 64-char row fingerprint — a
    narrow deterministic key — never by the multi-KB payload columns
    themselves (sorting full rows inside the window was the old
    anti-pattern)."""
    order_key = _fingerprint(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("\x00")) for c in df.columns],
        )
    )
    w = Window.partitionBy(_fingerprint(F.col(f"`{text_col}`"))).orderBy(order_key)
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
    hash_method: str = "xxhash64",
) -> DataFrame:
    """-> (id, sig: array<bigint> of k minhash values).

    One base hash per shingle, then k universal hashes (a*h+b mod p)
    folded with array_min — transform/aggregate keep everything in
    codegen.
    """
    sh = _shingles(F.col(text_col), shingle)
    hs = F.transform(sh, lambda s: F.pmod(_base_hash(s, hash_method), F.lit(_P)))
    params = _hash_params(k)

    def _universal(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P))

    sig = F.array(
        *[F.array_min(F.transform(hs, _universal(a, b))) for a, b in params]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def _bands(sig: Column, bands: int, rows: int, hash_method: str = "xxhash64") -> Column:
    """array of (band_idx, band_hash) structs from a minhash signature.
    Band key: hash of the comma-joined signature slice (md5 variant keys
    are hex strings — identical construction in SQL)."""
    def _key(b):
        joined = F.concat_ws(
            ",",
            F.transform(F.slice(sig, b * rows + 1, rows), lambda v: v.cast("string")),
        )
        if hash_method == "md5":
            return F.md5(joined)
        return F.xxhash64(joined).cast("string")

    return F.array(
        *[
            F.struct(F.lit(b).alias("band"), _key(b).alias("bhash"))
            for b in range(bands)
        ]
    )


def _capped_reps(exploded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Per-bucket representative (min id), with oversized buckets dropped
    (skew cap — see module docstring)."""
    reps = exploded.groupBy("band", "bhash").agg(
        F.min("id").alias("rep"), F.count("*").alias("__bn")
    )
    if max_bucket_size is not None:
        reps = reps.filter(F.col("__bn") <= max_bucket_size)
    return reps.drop("__bn")


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    shingle: int = 5,
    hash_method: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Observability for the skew cap: one row per band with bucket-count
    / dropped-bucket facts (the 'log what was dropped' contract)."""
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle, hash_method)
    exploded = sigs.select(
        "id", F.explode(_bands(F.col("sig"), bands, rows, hash_method)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))
    per_bucket = exploded.groupBy("band", "bhash").count()
    cap = F.lit(max_bucket_size) if max_bucket_size is not None else F.lit(None)
    return per_bucket.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.sum(F.when(F.col("count") > cap, 1).otherwise(0)).alias("n_dropped"),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    shingle: int = 5,
    jaccard_threshold: float | None = 0.8,
    hash_method: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """-> (id, cluster_id): near-duplicate clusters via MinHash + LSH.

    cluster_id = min id sharing any band bucket (single-pass approximation
    of connected components — exact for the common near-dup case of tight
    clusters; chains across clusters would need iteration, documented).
    With jaccard_threshold set, bucket mates are verified with exact
    shingle-set Jaccard (array_intersect — JVM) before clustering.
    Candidate generation is LINEAR in bucket size (members pair only with
    the bucket's min-id representative, never all-pairs); the
    max_bucket_size cap additionally drops degenerate buckets.
    """
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle, hash_method)
    exploded = sigs.select(
        "id", F.explode(_bands(F.col("sig"), bands, rows, hash_method)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))
    reps = _capped_reps(exploded, max_bucket_size)

    if jaccard_threshold is None:
        assigned = exploded.join(reps, ["band", "bhash"])
        all_ids = df.select(F.col(id_col).alias("id"))
        clusters = assigned.groupBy("id").agg(F.min("rep").alias("cluster_id"))
        return all_ids.join(clusters, "id", "left").select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        )

    # candidate pairs within buckets (id != rep), verified by exact jaccard
    sh = df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle).alias("sh"),
    )
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
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """-> (id, simhash: bigint). SimHash over whitespace tokens: bit i is
    the sign of sum over tokens of (bit i of hash(token) ? +1 : -1),
    computed as one aggregate per bit via higher-order functions (JVM).
    64 bits with xxhash64; 60 with md5 (the SQL-reproducible variant)."""
    n_bits = 64 if hash_method == "xxhash64" else 60
    tokens = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    hs = F.transform(tokens, lambda t: _base_hash(t, hash_method))

    def _sign_step(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    # one sign-aggregate per bit, unrolled in Python (the shift amount must
    # be a literal for shiftright); still a single projection in the plan
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
        bit_sum = F.aggregate(hs, F.lit(0).cast("long"), _sign_step(i))
        fp = fp.bitwiseOR(
            F.when(
                bit_sum > 0,
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_method: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """-> (id, cluster_id): candidates share one of four simhash blocks
    (16-bit for xxhash64, 15-bit for md5; Hamming distance <= 3 guarantees
    a shared block by pigeonhole), clustered to the min id per block
    bucket. Oversized block buckets are dropped (skew cap)."""
    blk_bits = 16 if hash_method == "xxhash64" else 15
    blk_mask = (1 << blk_bits) - 1
    s = simhash(df, id_col, text_col, hash_method)
    blocks = s.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("simhash"), b * blk_bits)
                        .bitwiseAND(F.lit(blk_mask))
                        .alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("e"),
    ).select("id", F.col("e.blk").alias("blk"), F.col("e.bval").alias("bval"))
    reps = blocks.groupBy("blk", "bval").agg(
        F.min("id").alias("rep"), F.count("*").alias("__bn")
    )
    if max_bucket_size is not None:
        reps = reps.filter(F.col("__bn") <= max_bucket_size)
    reps = reps.drop("__bn")
    all_ids = df.select(F.col(id_col).alias("id"))
    clusters = (
        blocks.join(reps, ["blk", "bval"])
        .groupBy("id")
        .agg(F.min("rep").alias("cluster_id"))
    )
    return all_ids.join(clusters, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )


def ngram_jaccard_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.3,
    group_col: str | None = None,
    allow_quadratic: bool = False,
    max_rows_unblocked: int = 100_000,
) -> DataFrame:
    """-> (id_a, id_b, jaccard): EXACT all-pairs n-gram Jaccard, optionally
    blocked on ``group_col`` to bound the quadratic join. The oracle
    baseline for ngram_jaccard_pairs: at corpus scale you block (group) or
    LSH; this exact variant is what those approximations are judged
    against. Shuffle = one self-join on the blocking key.

    Without ``group_col`` the join is a CROSS JOIN — quadratic in the row
    count. To keep a corpus-sized call from silently launching an n^2 job,
    the unblocked form requires ``allow_quadratic=True`` once the input
    exceeds ``max_rows_unblocked`` rows (the count is one cheap action);
    use ngram_jaccard_pairs (LSH) or a blocking column instead."""
    if group_col is None and not allow_quadratic:
        n = df.count()
        if n > max_rows_unblocked:
            raise ValueError(
                f"ngram_jaccard_exact without group_col is a cross join —"
                f" quadratic in rows ({n} rows -> ~{n * (n - 1) // 2:,}"
                " pairs). Pass group_col to block, use ngram_jaccard_pairs"
                " (LSH) at scale, or set allow_quadratic=True explicitly."
            )
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
    hash_method: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for candidate pairs above threshold.
    LSH (wide bands for recall) proposes, exact n-gram Jaccard disposes.
    The within-bucket self-join IS quadratic in bucket size, so oversized
    buckets are dropped before pairing (max_bucket_size)."""
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle, hash_method)
    exploded = sigs.select(
        "id", F.explode(_bands(F.col("sig"), bands, rows, hash_method)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))
    if max_bucket_size is not None:
        ok = (
            exploded.groupBy("band", "bhash")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .drop("count")
        )
        exploded = exploded.join(ok, ["band", "bhash"], "left_semi")
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
