"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: encode/decode/verify the sf0.001 documents
                    table through the columnar-compression engine.
queries()         — one entry per implemented operator (SURVEY.md §2);
                    each callable (spark, sf_dir) -> DataFrame.
oracle_sql()      — DuckDB-equivalent ANSI SQL per query (the driver
                    compares row-count + schema + order-insensitive
                    value hash at sf0.01).

Engine-path queries (projection / roundtrip / pushdown) run the actual
encode->decode pipeline and are compared against plain SQL on the source
table — valid because a correct round trip is an identity, so any codec
or assembly bug shows up as a value-hash mismatch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

import parquet_extra_spark as pes
from parquet_extra_spark import operators as ops

_DOC_ENCODE = dict(
    partition_cols=["lang", "source"],
    sort_cols=["doc_id"],
    chunk_rows=4096,
    n_buckets=4,
    n_salts=2,
    # documents is a small table (50..5000 rows across SFs): 8 partitions
    # = one per (bucket, salt) unit; the engine default (4 tasks/core) is
    # sized for corpus-scale inputs and would pay 128 near-empty tasks here
    num_partitions=8,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_chunks(spark: SparkSession, sf_dir: str):
    """-> (cached chunk table, schema_cols). The cache stops the lazy
    encode pipeline re-running per decode action (Spark's CacheManager
    also shares it across queries on the same sf_dir within a session);
    schema_cols comes from the source's parquet footer so decode never
    pays a discover_schema action; colocated decode is then valid by
    construction (encode output partitioning is preserved by cache)."""
    docs = _docs(spark, sf_dir)
    chunks = pes.encode(docs, **_DOC_ENCODE).cache()
    return chunks, pes.schema_from_struct(docs.schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: encode -> decode -> verify."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    decoded = pes.decode(chunks, schema_cols=schema_cols, colocated=True)
    report = pes.verify_roundtrip(docs, decoded)
    sizes = chunks.agg(
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
    )
    return report.crossJoin(sizes)


# ---------------------------------------------------------------- queries


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O6/O19-O20: decode only requested columns from the chunk table."""
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    return pes.decode(
        chunks, columns=["doc_id", "lang"], schema_cols=schema_cols, colocated=True
    )


def q_roundtrip_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17+O18: full encode->decode identity over every column."""
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    return pes.decode(chunks, schema_cols=schema_cols, colocated=True)


def q_roundtrip_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule invariant: sha256(content) of decoded rows."""
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    dec = pes.decode(
        chunks, columns=["doc_id", "text"], schema_cols=schema_cols, colocated=True
    )
    return dec.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha256"))


def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7-O16: chunk-stats skip + exact re-check equals a plain filter."""
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    return pes.filter_decode(
        chunks, "n_chars", lower=150, upper=350,
        schema_cols=schema_cols, colocated=True,
    )


def q_filter_pushdown_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7-O10 composed: cross-column AND/OR/NOT/!= predicate tree pushed to
    chunk stats + exact recheck (Predicate.scala:91-95,163-171 algebra)."""
    chunks, schema_cols = _doc_chunks(spark, sf_dir)
    pred = (
        (pes.P.lt("n_chars", 300) & pes.P.eq("lang", "en"))
        | (pes.P.ne("source", "src0") & pes.P.gt("n_chars", 520))
        | ~pes.P.isin("lang", ["en", "de", "es", "fr", "zh"])
    )
    return pes.filter_decode_pred(
        chunks, pred, schema_cols=schema_cols, colocated=True
    )


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O21 schema-inference scan facts on string columns."""
    return pes.column_profile(_docs(spark, sf_dir), ["lang", "source"])


def q_infer_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O21 required/optional classification (ExampleScanner.java:77-87)."""
    return pes.infer_repetition(_docs(spark, sf_dir).select("doc_id", "text", "lang"))


def q_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O22/O25: footer-style schema read-back from the chunk table."""
    cols = pes.discover_schema(_doc_chunks(spark, sf_dir)[0])
    return spark.createDataFrame(cols, "column string, col_idx int, dtype string")


def q_codec_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27-adjacent: per-column codec/size metrics (rows-only check —
    codec choice is an engine-internal decision with no SQL analogue)."""
    return (
        _doc_chunks(spark, sf_dir)[0]
        .groupBy("column", "codec")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_values").alias("n_values"),
            F.sum("raw_bytes").alias("raw_bytes"),
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational sanity over lineitem (deterministic aggregates only)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


def q_order_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join orders x customer + aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup report (hash aggregate over sha256 fingerprints)."""
    return ops.exact_dup_stats(_docs(spark, sf_dir))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form md5 fingerprints (normalized whitespace+case)."""
    return ops.doc_fingerprints(_docs(spark, sf_dir))


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling hash per document (one Catalyst
    aggregate over the char sequence; incremental-update fingerprint)."""
    return ops.rolling_fingerprints(_docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    return ops.token_counts(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification."""
    return ops.lang_id(_docs(spark, sf_dir))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a fixed deterministic query vector."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]  # fixed query
    return ops.brute_force_topk(emb, q, k=20)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest-neighbour top-k (the index-structured scale
    path next to brute_force_topk): deterministic spherical centroids,
    probe-4-of-16 cells, exact cosine inside probed cells."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]  # same as ann_topk
    return ops.ivf_topk(emb, q, k=20, nprobe=4)


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining quality heuristics (length/punct/stopword ratios)."""
    return ops.quality_scores(_docs(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 5-gram Jaccard >= 0.3 (oracle baseline of the
    LSH-blocked scale path ngram_jaccard_pairs)."""
    return ops.ngram_jaccard_exact(_docs(spark, sf_dir), shingle=5, threshold=0.3)


def q_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-blocked SCALE path for n-gram Jaccard pairs (proposes via
    banded minhash, disposes via exact Jaccard), value-checked end-to-end
    via the md5 hash method."""
    return ops.ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.5, k=32, bands=16, hash_method="md5"
    )


def q_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-bucketed SCALE path for embedding near-neighbour pairs
    (random-hyperplane signatures -> bucket join -> exact cosine verify),
    value-checked against a full SQL replica of the same planes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 8 planes: the fixture's similarities top out near cosine 0.5, so
    # 16-bit signatures would never collide — recall targets mid-range here
    return ops.cosine_pairs_lsh(emb, threshold=0.3, n_planes=8)


def q_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding cosine >= 0.3 (oracle baseline of the
    LSH-bucketed scale path cosine_pairs_lsh)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ops.cosine_pairs_exact(emb, threshold=0.3)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup over the events table (hypertable-rollup style)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts").cast("timestamp")))
            .cast("long")
            .alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine round trip over events: timestamp/double/bigint/string
    codecs through encode->decode, projected to hash-stable columns."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    chunks = pes.encode(
        ev, partition_cols=["event_type"], sort_cols=["ts"],
        chunk_rows=4096, n_buckets=4, n_salts=2, num_partitions=8,
    )
    dec = pes.decode(
        chunks, schema_cols=pes.schema_from_struct(ev.schema), colocated=True
    )
    return dec.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 6).alias("value_r"),
        "props",
    )


def q_roundtrip_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine round trip over embeddings: array<float> list codec through
    encode->decode, vectors projected to an exact sum-of-squares."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    chunks = pes.encode(
        emb, chunk_rows=4096, n_buckets=4, n_salts=2, num_partitions=8
    )
    dec = pes.decode(
        chunks, schema_cols=pes.schema_from_struct(emb.schema), colocated=True
    )
    return dec.select(
        "vec_id",
        "label",
        F.round(
            F.aggregate(
                F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            3,
        ).alias("sumsq"),
    )


def _nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic nested fixture from the orders table: per customer an
    array<struct> of their orders plus a stats struct — the shape of the
    reference's User record (schema.avsc:12-46 accounts/address)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("key"),
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_totalprice").alias("price"),
                )
            )
        ).alias("orders"),
        F.struct(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
        ).alias("stats"),
    )


_NESTED_ENCODE = dict(chunk_rows=4096, n_buckets=4, n_salts=2, num_partitions=8)


def q_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested engine round trip: struct + array<struct> shredded to leaf
    chunks (engine/nested.py, Projection.scala:53-107 semantics) and
    reassembled losslessly; output flattened for the SQL oracle."""
    nested = _nested_orders(spark, sf_dir)
    chunks = pes.encode_nested(nested, **_NESTED_ENCODE)
    out = pes.decode_nested(chunks, nested.schema, colocated=True)
    return out.select(
        "o_custkey",
        F.col("stats.n_orders").alias("n_orders"),
        F.explode("orders").alias("o"),
    ).select(
        "o_custkey",
        "n_orders",
        F.col("o.key").alias("key"),
        F.col("o.status").alias("status"),
        F.round("o.price", 2).alias("price_r"),
    )


def q_nested_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaf-level projection through nesting: only the stats.n_orders leaf
    chunks are decoded (dotted-path pruning, O3/O5)."""
    nested = _nested_orders(spark, sf_dir)
    chunks = pes.encode_nested(nested, **_NESTED_ENCODE)
    return pes.decode_nested(
        chunks, nested.schema, paths=["o_custkey", "stats.n_orders"],
        colocated=True,
    )


def q_nested_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown THROUGH nesting (Projection.scala:53-107 composed
    with Predicate.scala:47-183): a dotted-path predicate tree is rewritten
    to shredded leaf names, pruned on chunk stats, decoded with leaf
    projection, and exactly re-checked."""
    nested = _nested_orders(spark, sf_dir)
    chunks = pes.encode_nested(nested, **_NESTED_ENCODE)
    pred = pes.P.gt("stats.n_orders", 3) & pes.P.lt("stats.min_key", 40000)
    return pes.filter_decode_nested(
        chunks, nested.schema, pred,
        paths=["o_custkey", "stats.n_orders", "stats.min_key"],
        colocated=True,
    )


def q_evolution_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19 widened-schema read (ParquetExampleTest.scala:300-318, r6/r7):
    v1 chunks written WITHOUT n_chars union v2 chunks written with it;
    decoding under the widened schema materializes the new optional
    column as null on old data instead of erroring."""
    from pyspark.sql import types as T

    docs = _docs(spark, sf_dir)
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars")
    kw = dict(sort_cols=["doc_id"], chunk_rows=4096, n_buckets=4, n_salts=1,
              num_partitions=4)
    mixed = pes.encode(v1, uid_namespace="v1", **kw).unionByName(
        pes.encode(v2, uid_namespace="v2", **kw)
    )
    widened = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ])
    return pes.decode(mixed, expected_schema=widened)


def q_ivf_topk_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF SCALE path: cells persisted into the chunk table at ingest
    (ivf_encode, partition_cols=[cell]); the query prunes non-probed
    cells on chunk stats + membership digest BEFORE any payload decode —
    no per-query assignment scan. Must equal ivf_topk exactly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    chunks = ops.ivf_encode(emb, chunk_rows=1024, num_partitions=8)
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]  # same as ann_topk
    return ops.ivf_topk_chunks(chunks, q, k=20, nprobe=4, colocated=True)


def q_chunk_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-able half of the codec metrics (O27 lineage/metrics):
    per-column value counts and logical raw bytes, checkable against
    plain SQL length sums — codec choice itself stays rows-only in
    codec_metrics (engine-internal)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return chunks.groupBy("column").agg(
        F.sum("n_values").alias("n_values"),
        F.sum("raw_bytes").alias("raw_bytes"),
    )


def q_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates (engine/aggregates.py): count / nulls /
    min / max per column answered purely from chunk statistics — zero
    payload decode, the chunk-table form of parquet footer-statistics
    aggregate pushdown. Restricted to columns whose bounds are exact by
    the storage contract (numerics + short strings; `text` minima are
    stored truncated and excluded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    prof = pes.metadata_profile(
        chunks, columns=["doc_id", "lang", "n_chars", "source"]
    )
    return prof.select("column", "n_values", "null_count", "min_val", "max_val")


def q_point_lookup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a high-cardinality key via the opt-in per-chunk
    Bloom digest (encode(bloom_cols=["doc_id"])): the chunk table is
    sorted on n_chars so doc_id [min,max] ranges straddle the probed
    keys and range stats cannot skip — only the bloom prunes. The
    parquet-mr optional-column-bloom analogue; at 100 TB this is "fetch
    three documents by id" decoding only the chunks whose bloom admits
    a key."""
    docs = _docs(spark, sf_dir)
    chunks = pes.encode(
        docs, sort_cols=["n_chars"], chunk_rows=128, n_buckets=2,
        n_salts=1, num_partitions=2, bloom_cols=["doc_id"],
    )
    return pes.filter_decode_pred(
        chunks, pes.P.isin("doc_id", [7, 123, 311])
    )


def q_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering (engine/zorder.py): events encoded
    along the Morton curve of (user_id, value), then a 2-D box query via
    filter_decode_pred. Chunk [min,max] stats are ~hyper-rectangles in z
    space, so BOTH dimensions prune — the Delta OPTIMIZE ZORDER BY
    analogue; the oracle is the plain relational filter the pruned
    decode must exactly reproduce."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    chunks = pes.zorder_encode(
        ev, ["user_id", "value"], chunk_rows=512,
        n_buckets=2, n_salts=1, num_partitions=2,
    )
    pred = (
        pes.P.ge("user_id", 2) & pes.P.le("user_id", 9)
        & pes.P.ge("value", 5.0) & pes.P.le("value", 80.0)
    )
    dec = pes.filter_decode_pred(
        chunks, pred, columns=["event_id", "user_id", "value"]
    )
    return dec.select(
        "event_id", "user_id", F.round(F.col("value"), 6).alias("value_r")
    )


def q_roundtrip_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance path (engine/compact.py): fragment-encode the table
    into tiny chunks (the shape streaming micro-batch ingest leaves
    behind), compact_chunks merges every undersized chunk into
    ~target_rows-sized ones via a METADATA-only small/big split (only
    undersized payloads decode+re-encode; at 100 TB a 1%-fragmented
    tail costs ~1 TB of work, not a rewrite), and decoding the
    compacted table returns the exact source rows."""
    docs = _docs(spark, sf_dir)
    frag = pes.encode(
        docs, chunk_rows=128, n_buckets=4, n_salts=2, num_partitions=8
    )
    compacted = pes.compact_chunks(
        frag, target_rows=4096, n_buckets=2, n_salts=1, num_partitions=2
    )
    return pes.decode(compacted, schema_cols=pes.schema_from_struct(docs.schema))


def q_roundtrip_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine round trip over exact decimals: decimal(p,s) rides the
    unscaled-int64 codec lane (FOR/delta/dict/RLE) and decodes
    bit-identical — values chosen exactly representable so the
    double->decimal cast is deterministic across engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty_dec"),
        (F.col("l_linenumber").cast("decimal(10,3)") / F.lit(8))
        .cast("decimal(10,3)")
        .alias("frac_dec"),
    )
    chunks = pes.encode(
        d, sort_cols=["l_orderkey"], chunk_rows=8192, n_buckets=4, n_salts=2,
        num_partitions=8,
    )
    dec = pes.decode(
        chunks, schema_cols=pes.schema_from_struct(d.schema), colocated=True
    )
    return dec.select(
        "l_orderkey",
        "l_linenumber",
        F.col("qty_dec").cast("string").alias("qty_str"),
        F.col("frac_dec").cast("string").alias("frac_str"),
    )


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup clusters, value-checked: hash_method="md5"
    makes every signature/band/cluster reproducible in ANSI SQL (the
    xxhash64 method remains the highest-throughput scale default)."""
    return ops.minhash_lsh_dedup(
        _docs(spark, sf_dir), jaccard_threshold=0.5, hash_method="md5"
    )


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters, value-checked via the md5 hash method
    (60-bit fingerprints, 4x15-bit blocks)."""
    return ops.simhash_dedup(_docs(spark, sf_dir), hash_method="md5")


def q_encoded_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-over-compressed: GROUP BY counts derived from dictionary
    codes / RLE run lengths — the column's values materialize only at
    dictionary scale (engine/encoded_agg.value_counts_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.value_counts_encoded(chunks, "lang")


def q_encoded_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-over-compressed: grouped int64-exact SUM where the group
    key is read as dictionary codes, never materialized per row
    (engine/encoded_agg.group_sum_encoded). colocated=True: encode output
    keeps each chunk's rows in one partition, so the only shuffle carries
    (key, partial) pairs."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_sum_encoded(chunks, "lang", "n_chars", colocated=True)


def q_encoded_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-over-compressed: grouped count/sum/min/max in ONE
    encoded-side pass (engine/encoded_agg.group_stats_encoded),
    no-shuffle colocated path."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_stats_encoded(chunks, "lang", "n_chars", colocated=True)


def q_encoded_group_sum_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded SUM's float lane: a double value column accumulates in
    float64 and returns the SQL promotion type (double). The doubles here
    are integer-valued, so the sum is order-independent and bit-exact
    against the oracle."""
    docs = _docs(spark, sf_dir).withColumn(
        "chars_f", F.col("n_chars").cast("double")
    )
    chunks = pes.encode(docs, **_DOC_ENCODE)
    return pes.group_sum_encoded(chunks, "lang", "chars_f", colocated=True)


def q_encoded_group_sum_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key compute-over-compressed: GROUP BY (lang, source) SUM via
    dictionary codes of BOTH key columns composed with np.unique over the
    stacked codes (engine/encoded_agg._key_codes) — composite keys never
    materialize per row; the only shuffle carries (lang, source, partial)
    triples."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_sum_encoded(
        chunks, ["lang", "source"], "n_chars", colocated=True
    )


def q_encoded_filtered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-over-compressed: WHERE pushed INTO the encoded GROUP BY —
    chunk stats skip impossible chunks, then the exact recheck runs in
    the dictionary domain (one Kleene verdict per dictionary entry,
    gathered through the codes; engine/encoded_filter) so the filtered
    columns never materialize row-scale values. The NOT leaf exercises
    3-valued semantics end-to-end."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    w = (
        pes.P.ge("n_chars", 100)
        & pes.P.le("n_chars", 400)
        & ~pes.P.eq("lang", "en")
    )
    return pes.group_sum_encoded(
        chunks, "lang", "n_chars", colocated=True, where=w
    )


def q_encoded_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT from codec structures: dict/RLE chunks answer
    from the dictionary alone (it IS the chunk's distinct non-null set);
    the WHERE masks codes in the dictionary domain first
    (engine/encoded_agg.distinct_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.distinct_encoded(chunks, "source", where=pes.P.eq("lang", "en"))


def q_encoded_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT a, b over encoded data: the columns' dictionary
    codes stack and compact per chunk (np.unique over code tuples), so
    combinations materialize at per-chunk-distinct scale; a Catalyst
    distinct over those tiny rows finishes."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.distinct_encoded(
        chunks, ["lang", "source"], where=pes.P.ge("n_chars", 200),
        colocated=True,
    )


def q_encoded_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped COUNT(DISTINCT ...) over encoded data: per chunk,
    np.unique over the stacked (key, value) dictionary codes emits the
    chunk-local distinct pairs; the shuffle carries pairs at
    per-chunk-distinct scale and Catalyst's count_distinct finishes
    (engine/encoded_agg.group_count_distinct_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_count_distinct_encoded(
        chunks, "lang", "source", colocated=True
    )


def q_encoded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT k with chunk-stat pruning (engine/topk): seed
    chunks by their max_val stat, decode one column of <= k chunks for
    the k-th-value threshold, then prove-skip every chunk whose max is
    below it — the top-k analogue of the reference's row-group predicate
    skipping (Predicate.scala:19-27). doc_id tie-breaks for a
    deterministic row set."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.topk_encoded(
        chunks, ["n_chars", "doc_id"], 50, columns=["doc_id", "n_chars"],
        colocated=True,
    )


def q_encoded_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles from codec structures: (value, count)
    pairs from dictionaries/RLE runs, a running-count window over the
    sorted DISTINCT values, rank max(1, ceil(q*n)) — the window runs at
    value cardinality, never row scale (engine/encoded_agg
    .quantiles_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.quantiles_encoded(
        chunks, "n_chars", [0.1, 0.25, 0.5, 0.75, 0.9], colocated=True
    )


def q_encoded_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + exact discrete quantiles from codec structures: per
    chunk the stacked (key, value) dictionary codes collapse to
    (key, value, count) partials at per-chunk-distinct scale, and one
    running-count window PARTITIONED BY key locates rank
    max(1, ceil(q*n)) per group — the grouped analogue of
    encoded_quantiles; work scales with distinct values per group, never
    rows (engine/encoded_agg.group_quantiles_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_quantiles_encoded(
        chunks, "lang", "n_chars", [0.25, 0.5, 0.9], colocated=True
    )


def q_encoded_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate GROUP BY in ONE encoded pass: count/sum/avg over
    the numeric column and min/max over BOTH lanes (decoded numeric +
    dictionary-ranked string) read every referenced column once per
    chunk and emit one combined partial row — an N-aggregate report
    costs one scan instead of N (engine/encoded_agg.group_agg_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    r = pes.group_agg_encoded(
        chunks,
        "lang",
        [
            ("count", "*", "n"),
            ("count", "source", "ns"),
            ("sum", "n_chars", "sc"),
            ("avg", "n_chars", "ac"),
            ("min", "n_chars", "mnc"),
            ("max", "n_chars", "mxc"),
            ("min", "source", "mns"),
            ("max", "source", "mxs"),
        ],
        colocated=True,
    )
    return r.select(
        "key", "n", "ns", "sc", F.round("ac", 6).alias("ac"),
        "mnc", "mxc", "mns", "mxs",
    )


def q_encoded_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (lang, source) over encoded data: ONE chunk pass builds
    finest-grain partials, Spark's native groupingSets expands them per
    set at partial scale — a multi-grain report reads the data once,
    not once per set (engine/encoded_agg.group_agg_sets_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_agg_sets_encoded(
        chunks,
        ["lang", "source"],
        [("count", "*", "n"), ("sum", "n_chars", "sc")],
        sets="rollup",
        colocated=True,
    )


def _event_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached encoded events table (ts-sorted so the timestamp column
    lands in the RLE/FOR-friendly lane)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return pes.encode(
        ev, sort_cols=["ts"], chunk_rows=4096, n_buckets=4, n_salts=2,
        num_partitions=8,
    ).cache()


def q_encoded_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup over encoded data (hypertable shape): the
    timestamp reads as dictionary codes, per-chunk partials group at
    raw-timestamp dictionary scale, and date_trunc('day') runs on those
    partial rows only — the bucket expression never touches row scale
    (engine/encoded_agg.time_rollup_encoded via group_agg_encoded's
    derive)."""
    chunks = _event_chunks(spark, sf_dir)
    r = pes.time_rollup_encoded(
        chunks,
        "ts",
        "day",
        [
            ("count", "*", "n"),
            ("sum", "value", "sv"),
            ("min", "ts", "first_ts"),
            ("max", "ts", "last_ts"),
        ],
        colocated=True,
    )
    return r.select(
        F.unix_timestamp(F.col("bucket").cast("timestamp"))
        .cast("long")
        .alias("day_epoch"),
        "n",
        F.round("sv", 4).alias("sv"),
        F.unix_micros(F.col("first_ts").cast("timestamp")).alias("first_us"),
        F.unix_micros(F.col("last_ts").cast("timestamp")).alias("last_us"),
    )


def q_encoded_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two families composing: an hourly per-type rollup computed FROM
    CODECS (group_agg_encoded, derive at partial scale) feeds gap_fill,
    which densifies each type's hour axis and zero-fills silent hours —
    a dense continuous aggregate where the raw data was never decoded
    at row scale and the dense axis is generated, not stored."""
    from parquet_extra_spark.operators.temporal import gap_fill

    chunks = _event_chunks(spark, sf_dir)
    r = pes.group_agg_encoded(
        chunks,
        ["event_type", "ts"],
        [("count", "*", "n_events"), ("sum", "value", "sv")],
        colocated=True,
        derive={
            "etype": "`event_type`",
            "hour_epoch": (
                "unix_timestamp(date_trunc('hour',"
                " cast(`ts` as timestamp)))"
            ),
        },
    ).withColumn("sv", F.round("sv", 4))
    return gap_fill(
        r, "etype", "hour_epoch", 3600, fill={"n_events": 0, "sv": 0.0}
    )


def q_trigram_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring predicate WITH chunk pruning: the opt-in trigram digest
    (encode(trigram_cols=...), pg_trgm at chunk granularity) lets
    LIKE '%rc1%' skip chunks whose trigram set provably lacks a needle
    3-gram — the skip lane [min,max] stats can never give substring
    predicates; the dictionary/row recheck stays exact."""
    docs = _docs(spark, sf_dir)
    chunks = pes.encode(
        docs, partition_cols=["source"], sort_cols=["doc_id"],
        chunk_rows=256, n_buckets=8, n_salts=1,
        trigram_cols=["source"], num_partitions=8,
    )
    return pes.filter_decode_pred(
        chunks, pes.P.contains("source", "rc1"),
        columns=["doc_id", "source", "lang"],
    )


def q_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized view maintained incrementally: two ingest batches,
    two refreshes — each refresh aggregates only the NEW manifest runs
    from their dictionary codes (group_agg_encoded) and merges
    decomposable partials into versioned state with an atomic pointer.
    The final result must equal the one-shot GROUP BY over everything."""
    import os as _os
    import shutil as _shutil

    base = f"/tmp/pes_ca_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(base, ignore_errors=True)
    src, state = f"{base}/src", f"{base}/state"
    docs = _docs(spark, sf_dir)
    kw = dict(chunk_rows=512, n_buckets=2, n_salts=1)
    ca = pes.ContinuousAggregate(
        src, state, ["lang"],
        [("count", "*", "n_docs"), ("sum", "n_chars", "char_sum"),
         ("min", "doc_id", "id_lo"), ("max", "doc_id", "id_hi"),
         ("avg", "n_chars", "mean_chars")],
    )
    for tag, part in (("b0", 0), ("b1", 1)):
        pes.encode_to(
            docs.where(F.col("doc_id") % 2 == part), src,
            dataset_id=tag, **kw,
        )
        ca.refresh(spark)
    return ca.result(spark).withColumn(
        "mean_chars", F.round("mean_chars", 6)
    )


def q_encoded_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab from codecs: doc counts per (source x lang), both keys
    at dictionary scale, the pivot spreading columns on the FINAL
    aggregate only (engine/encoded_agg.pivot_encoded). Count cells fill
    0 exactly as SQL's count FILTER does."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.pivot_encoded(
        chunks, "source", "lang", ("count", "*"),
        values=["de", "en", "es", "fr", "zh"], colocated=True,
    )


def q_encoded_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram from codecs: GROUP BY floor(n_chars/500) runs
    as group_agg_encoded's derive at PARTIAL scale — bin assignment
    touches n_chunks x distinct values, never rows; bins with no docs
    simply don't exist (SQL GROUP BY semantics, not gap-filled)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_agg_encoded(
        chunks,
        ["n_chars"],
        [("count", "*", "n_docs"), ("min", "n_chars", "lo"),
         ("max", "n_chars", "hi")],
        colocated=True,
        derive={"bin": "floor(`n_chars` / 500)"},
    )


def q_encoded_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MIN/MAX for the dtypes SUM rejects (here a string column):
    the VALUE column also stays at dictionary scale — its dictionary is
    ranked once per chunk (the same binary-collation order SQL uses) and
    per-group extremes reduce over ranks through the codes
    (engine/encoded_agg.group_minmax_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_minmax_encoded(chunks, "lang", "source", colocated=True)


def q_encoded_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ORDER BY ... LIMIT k over encoded data: each chunk
    emits its per-group top-k candidates from dictionary RANKS (one
    lexsort at chunk scale, values never materialize per row), and the
    global window runs over candidates only — the shuffle carries at
    most chunks x groups x k rows (engine/encoded_agg
    .group_topk_encoded)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    return pes.group_topk_encoded(chunks, "lang", "n_chars", 3, colocated=True)


def q_encoded_substr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE '%x%' / LIKE '%x' pushed into an encoded GROUP BY: substring
    position is order-independent so chunk [min,max] stats can't prune,
    but the exact evaluation still runs once per DICTIONARY entry —
    |distinct| substring scans instead of |rows| (engine/predicate.Substr
    + engine/encoded_filter)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    w = pes.P.contains("source", "7") & pes.P.endswith("lang", "n")
    return pes.value_counts_encoded(chunks, "lang", where=w, colocated=True)


def q_encoded_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE pushed into an encoded GROUP BY: the anchored literal head
    of the pattern ('src1') prunes chunks through the Prefix stats range
    (engine/predicate.rlike_prefix), and the full regex evaluates once
    per DICTIONARY entry, gathered through the codes — |distinct| regex
    searches instead of |rows| (engine/encoded_filter.Rlike lane)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    w = pes.P.rlike("source", "^src1[0-9]$")
    return pes.value_counts_encoded(chunks, "lang", where=w, colocated=True)


def _orders_chunks(spark: SparkSession, sf_dir: str):
    """Cached encode of the orders table (shared by the join queries)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return pes.encode(
        o, partition_cols=["o_orderstatus"], sort_cols=["o_orderkey"],
        chunk_rows=4096, n_buckets=4, n_salts=1, num_partitions=8,
    ).cache()


def q_encoded_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-over-compressed (engine/encoded_join): the dim's key set is
    pushed as chunk pruning (membership digests + min/max, data-shaped
    above 64 keys), the join key matches once per DICTIONARY entry
    (pc.index_in over distinct values, never per row), and payload
    columns decode only for surviving rows — the C-Store "invisible
    join" with a broadcast dim and a map-only fact side."""
    chunks = _orders_chunks(spark, sf_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
    )
    return pes.join_encoded(
        chunks, ("o_custkey", "c_custkey"), dim,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        where=pes.P.gt("o_totalprice", 150000.0), colocated=True,
    )


def q_encoded_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join over encoded data: every fact row survives, misses fill
    dim columns with NULL — no key pruning (all rows are needed), the
    dim still matches once per dictionary entry and ships once per
    executor as a broadcast {key: row} map."""
    chunks = _orders_chunks(spark, sf_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_mktsegment")
    )
    return pes.join_encoded(
        chunks, ("o_custkey", "c_custkey"), dim,
        columns=["o_orderkey", "o_custkey"], how="left", colocated=True,
    )


def q_encoded_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join in the dictionary domain: fact rows whose key hits the
    broadcast key set survive; nothing but the key's dictionary is
    matched, and only surviving chunks decode (how="semi" returns fact
    columns only — SQL IN/EXISTS)."""
    chunks, _ = _doc_chunks(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    dim = docs.filter(F.col("n_chars") > 400).select("doc_id")
    return pes.join_encoded(
        chunks, "doc_id", dim, columns=["doc_id", "lang", "n_chars"],
        how="semi", colocated=True,
    )


def q_datasource_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19/O20 on the SQL surface: .option("columns", ...) decodes ONLY
    the requested columns from a checkpoint-layout table whose planning
    (schema + file list) is served entirely by the manifest sidecars —
    no data file is opened before execution."""
    import os as _os
    import shutil as _shutil

    from parquet_extra_spark.sources import ChunkTableDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkTableDataSource)
    docs = _docs(spark, sf_dir)
    out = f"/tmp/pes_ckpt_proj_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(out, ignore_errors=True)
    pes.encode_to(docs, out, **_DOC_ENCODE)
    return (
        spark.read.format("chunktable")
        .option("columns", "doc_id,lang")
        .load(out)
    )


def q_datasource_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27 on the SQL surface: df.write.format("chunktable") ->
    spark.read.format("chunktable") identity — the writer commits through
    the same manifest protocol as encode_to (chunks first, manifest row +
    schema sidecar as the commit point)."""
    import os as _os
    import shutil as _shutil

    from parquet_extra_spark.sources import ChunkTableDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkTableDataSource)
    docs = _docs(spark, sf_dir)
    out = f"/tmp/pes_ckpt_write_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(out, ignore_errors=True)
    (
        docs.repartition(4, "lang")
        .write.format("chunktable")
        .mode("append")
        .option("chunk_rows", "4096")
        .option("sort_cols", "doc_id")
        .save(out)
    )
    return spark.read.format("chunktable").load(out)


def q_roundtrip_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM on the chunk table (engine/maintain.delete_where):
    certain-match chunks drop on metadata, boundary chunks rewrite,
    the rest pass through byte-identical; decoded result must equal the
    SQL anti-filter (NULL-predicate rows survive, like SQL DELETE)."""
    docs = _docs(spark, sf_dir)
    chunks = pes.encode(docs, **_DOC_ENCODE).cache()
    pred = pes.P.eq("lang", "en") | pes.P.gt("n_chars", 500)
    out = pes.delete_where(
        chunks, pred, schema_cols=pes.schema_from_struct(docs.schema),
        chunk_rows=4096, num_partitions=8,
    )
    return pes.decode(out, schema_cols=pes.schema_from_struct(docs.schema))


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (whole-row upsert, engine/maintain.merge_rows): rows of
    the batch replace same-key rows and append otherwise; only chunks
    whose stats/digests admit a batch key are rewritten."""
    docs = _docs(spark, sf_dir)
    schema_cols = pes.schema_from_struct(docs.schema)
    chunks = pes.encode(docs, **_DOC_ENCODE).cache()
    updates = docs.filter(F.col("doc_id") < 5).select(
        "doc_id",
        F.concat(F.lit("UPDATED"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    inserts = spark.createDataFrame(
        [(-1, "inserted", "xx", "srcX", 8)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = pes.merge_rows(
        chunks, updates.unionByName(inserts), "doc_id",
        schema_cols=schema_cols, chunk_rows=4096, num_partitions=8,
    )
    return pes.decode(out, schema_cols=schema_cols)


def q_datasource_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk table as a registered Spark data source (Python Data
    Source API): plain spark.read.format("chunktable") + DataFrame
    filters; pushFilters maps them onto chunk-stats pruning while Spark
    re-applies them exactly (sources/chunk_datasource.py)."""
    import os as _os

    from parquet_extra_spark.sources import ChunkTableDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkTableDataSource)
    docs = _docs(spark, sf_dir)
    out = f"/tmp/pes_chunktable_{_os.path.basename(sf_dir.rstrip('/'))}"
    pes.encode(docs, **_DOC_ENCODE).write.mode("overwrite").parquet(out)
    return (
        spark.read.format("chunktable")
        .load(out)
        .filter((F.col("lang") == "en") & (F.col("n_chars") > 200))
    )


def q_datasource_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-'p%' pushdown through the chunktable data source: Catalyst
    translates .startswith to a StringStartsWith source filter, which the
    source prunes as the [p, successor(p)) stats range — sound under the
    truncated-min / unbounded-max storage rules — while Spark re-applies
    the predicate exactly on decoded rows."""
    import os as _os

    from parquet_extra_spark.sources import ChunkTableDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkTableDataSource)
    docs = _docs(spark, sf_dir)
    out = f"/tmp/pes_ct_prefix_{_os.path.basename(sf_dir.rstrip('/'))}"
    pes.encode(docs, **_DOC_ENCODE).write.mode("overwrite").parquet(out)
    return (
        spark.read.format("chunktable")
        .load(out)
        .filter(F.col("source").startswith("src1") & (F.col("lang") == "en"))
    )


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's most recent click at-or-before
    it — the time-since-last-touch attribution shape, via the asof join
    (union+window, one shuffle). Oracled by DuckDB ASOF LEFT JOIN."""
    from parquet_extra_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        "value",
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_time="p_ts", right_time="c_ts",
        right_cols=["click_id", "value"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("p_ts").cast("timestamp")).alias("purchase_us"),
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("click_us"),
        "click_id",
        F.round("value", 4).alias("click_value"),
    )


def q_asof_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same attribution query as asof_attribution but through the
    zero-left-shuffle broadcast path (dim-sized right side collapses to
    per-key sorted arrays, BroadcastHashJoin onto left, JVM-side array
    reduce) — same DuckDB ASOF LEFT JOIN oracle proves equivalence."""
    from parquet_extra_spark.operators.temporal import asof_join_broadcast

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        "value",
    )
    out = asof_join_broadcast(
        purchases, clicks, on="user_id", left_time="p_ts", right_time="c_ts",
        right_cols=["click_id", "value"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("p_ts").cast("timestamp")).alias("purchase_us"),
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("click_us"),
        "click_id",
        F.round("value", 4).alias("click_value"),
    )


def q_asof_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward asof with tolerance: for each error event, the user's NEXT
    click within one hour (inner — error events with no near click drop)."""
    from parquet_extra_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        errors, clicks, on="user_id", left_time="e_ts", right_time="c_ts",
        right_cols=["click_id"], direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"), how="inner",
    )
    return out.select(
        "error_id",
        "user_id",
        F.unix_micros(F.col("e_ts").cast("timestamp")).alias("error_us"),
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("click_us"),
        "click_id",
    )


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join planned as a bucketed equi-join: orders
    against overlapping price bands, aggregated per band. Decimal sums
    keep the hash comparison exact (prices are 2-dp by construction)."""
    from parquet_extra_spark.operators.temporal import range_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bands = spark.createDataFrame(
        [
            (0.0, 50_000.0, "low"),
            (25_000.0, 100_000.0, "mid"),
            (75_000.0, 200_000.0, "high"),
            (150_000.0, 600_000.0, "tail"),
        ],
        schema="lo double, hi double, band string",
    )
    pts = orders.select("o_orderkey", "o_totalprice")
    out = range_join(pts, bands, "o_totalprice", "lo", "hi", bucket_width=25_000.0)
    return out.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (interval x interval) as a bucketed
    equi-join with one-owner-bucket dedup: each order's price window
    [price, price+25000] against the static bands; per-band pair count
    and key sum. Oracle is the plain overlap theta-join."""
    from parquet_extra_spark.operators.temporal import interval_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    iv = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("lo"),
        (F.col("o_totalprice") + 25_000.0).alias("hi"),
    )
    bands = spark.createDataFrame(
        [
            (0.0, 50_000.0, "low"),
            (25_000.0, 100_000.0, "mid"),
            (75_000.0, 200_000.0, "high"),
            (150_000.0, 600_000.0, "tail"),
        ],
        schema="blo double, bhi double, band string",
    )
    out = interval_join(
        iv, bands, ("lo", "hi"), ("blo", "bhi"), bucket_width=25_000.0
    )
    return out.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("o_orderkey").alias("key_sum"),
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity) of the events
    stream, one row per (user, session) with start/end/count/value."""
    from parquet_extra_spark.operators.temporal import session_windows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_windows(
        ev, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"), tiebreak="event_id",
        aggs=[
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value")
        ],
    )
    return out.select(
        "user_id",
        "session_n",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
        "n_events",
        "sum_value",
    )


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: encode embeddings to 8 codes + a norm
    (~16x lossy compression), then ADC top-20 — approximate cosine from
    LUT gathers alone, vectors never reconstructed. The oracle replays
    codebook assignment and the LUT sum with identical literals."""
    from parquet_extra_spark.operators.similarity import pq_encode, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    return pq_topk(pq_encode(emb), query, k=20)


def q_pq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN lane: ADC shortlist (top-100 from 16x-lossy
    codes, ~1/16th the bytes) + EXACT cosine rerank on the shortlist's
    vectors only (the Faiss refine pattern). Oracle: the _pq_oracle
    shortlist CTE joined back to the vectors for exact rescoring —
    measured recall@10 for this lane is pinned in tests/test_pq_recall.py
    and BENCH/recall_pq.json."""
    from parquet_extra_spark.operators.similarity import (
        pq_encode,
        pq_refine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    return pq_refine_topk(emb, pq_encode(emb), query, k=20, shortlist=100)


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (the Faiss IVFADC shape): coarse cells prune to
    nprobe/n_cells of the rows, ADC over PQ codes ranks the survivors —
    ~64x less data touched than the exact scan, no vector reconstructed."""
    from parquet_extra_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    return ivfpq_topk(emb, query, k=20, nprobe=4)


def q_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ SCALE path: cells AND PQ codes persisted into the
    chunk table at ingest (the stored payload is codes + norm, not
    vectors); the query prunes non-probed cells on chunk metadata and
    ADC-ranks the decoded codes. Same oracle as ivfpq_topk — the
    persisted path must equal the in-memory composition exactly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    chunks = ops.ivfpq_encode(emb, chunk_rows=1024, num_partitions=8)
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    return ops.ivfpq_topk_chunks(chunks, q, k=20, nprobe=4, colocated=True)


def q_ivfpq_refine_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production ANN serving query over STORAGE, end to end:
    IVF cell pruning on chunk metadata → ADC shortlist over the probed
    cells' 16x-smaller code chunks → exact cosine rerank served by
    Bloom point lookups into the original vector chunk table (the Faiss
    IVFADC + IndexRefineFlat architecture on the engine's own pruning).
    Oracle: the _ivfpq_oracle shortlist CTE joined back to the raw
    vectors for exact rescoring."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    code_chunks = ops.ivfpq_encode(emb, chunk_rows=1024, num_partitions=8)
    vec_chunks = ops.ivf_encode(
        emb, chunk_rows=1024, num_partitions=8, bloom_cols=["id"]
    )
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    return ops.ivfpq_refine_topk_chunks(
        code_chunks, vec_chunks, q, k=20, nprobe=4, shortlist=100,
        colocated=True,
    )


def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event counts per type with zero-filled silent hours —
    the time_bucket_gapfill shape: sequence() per key builds the dense
    axis, a left join attaches the sparse counts."""
    from parquet_extra_spark.operators.temporal import gap_fill

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts").cast("timestamp")))
        .cast("long")
        .alias("hour_epoch"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return gap_fill(
        hourly, "event_type", "hour_epoch", 3600, fill={"n_events": 0}
    )


def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last-observation-carried-forward: dense hourly axis
    per event type, the hour's LAST observed value carried across silent
    hours (decimal-cast so the carried values hash exactly)."""
    from parquet_extra_spark.operators.temporal import gap_fill

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts").cast("timestamp")))
        .cast("long")
        .alias("hour_epoch"),
    ).agg(
        F.max_by(F.col("value").cast("decimal(18,4)"), F.col("event_id"))
        .alias("last_value")
    )
    return gap_fill(
        hourly, "event_type", "hour_epoch", 3600, locf=["last_value"]
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by hashed doc_id —
    bit-identical in ANSI SQL (same md5 lane as the dedup sketches), so
    split membership is auditable by an external engine."""
    from parquet_extra_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    out = hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="sg4"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("char_sum"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (rebalance the language mix:
    keep 20% of en, 50% of de, all else) — same md5 lane, auditable in
    SQL; aggregated per lang so the oracle checks exact membership."""
    from parquet_extra_spark.operators.sampling import stratified_hash_sample

    docs = _docs(spark, sf_dir)
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.2, "de": 0.5}, default=1.0, salt="st4"
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional deterministic sampling (quality-weighted
    data mixing): each doc keeps with probability = its weight, but the
    decision is a pure function of (id, salt) — repeatable, partition-
    independent, monotone in the weight, SQL-auditable."""
    from parquet_extra_spark.operators.sampling import weighted_hash_sample

    docs = _docs(spark, sf_dir)
    w = (F.col("n_chars") % 100) / 100.0
    out = weighted_hash_sample(docs, "doc_id", w, salt="wq")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_pipeline_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep as ONE composed plan: exact dedup
    (deterministic fingerprint tie-break) -> quality gate -> deterministic
    90/5/5 split -> per-(split, lang) manifest. Every stage is an
    operator from the package; the oracle replays the identical pipeline
    in SQL, so the whole composition is value-checked, not just stages."""
    from parquet_extra_spark.operators.dedup import exact_dedup
    from parquet_extra_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    deduped = exact_dedup(docs, text_col="text")
    gated = deduped.where(F.col("n_chars") >= 50)
    split = hash_split(
        gated, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="pipe"
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the GPT-3-style 100-TB data-prep step):
    flag every training document sharing any word 5-gram with the held-
    out eval set (doc_id % 17 == 0 stands in for the benchmark). The
    broadcast lane never shuffles the corpus — eval n-grams broadcast-
    semi-join the map-side-exploded corpus n-grams; only (doc_id,
    partial count) pairs of the contaminated subset reach an exchange."""
    from parquet_extra_spark.operators.decontaminate import contamination_report

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 17 != 0)
    ev = docs.where(F.col("doc_id") % 17 == 0)
    return contamination_report(train, ev, n=5, method="broadcast")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic offset packing of documents into fixed-budget
    training sequences: hash-bucket the corpus, order inside each bucket
    by a salted md5 (layout-insensitive), cut sequences at running-total
    budget boundaries. ONE shuffle, two window functions, zero Python —
    and bit-identical in ANSI SQL, so the full (doc -> sequence, offset)
    assignment is value-checked externally."""
    from parquet_extra_spark.operators.packing import pack_by_cumsum

    docs = _docs(spark, sf_dir)
    out = pack_by_cumsum(
        docs, id_col="doc_id", size_col="n_chars", budget=4096, n_buckets=8,
        salt="pack",
    )
    return out.select("doc_id", "bucket", "seq_id", "seq_offset")


def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: down-sample languages to a 50/30/20
    en/fr/zh target. Fractions derive from ONE |domains|-row aggregate
    (K = min(mass/target); binding domain keeps 1.0); membership is the
    md5-bucket function of doc_id, so the whole mixture — fractions AND
    per-row keeps — is reproduced bit-identically by the DuckDB CTE
    oracle. Corpus-side the plan is one map-only filter: no shuffle."""
    from parquet_extra_spark.operators.mixing import mix_corpus

    docs = _docs(spark, sf_dir)
    out = mix_corpus(
        docs, "doc_id", "lang", {"en": 0.5, "fr": 0.3, "zh": 0.2}, salt="mx"
    )
    return out.select("doc_id", "lang")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the correctness driver checks the FIRST 50 entries
    # only.  Newest / least-verified queries go first (round-4 temporal/
    # sampling/PQ/trigram/continuous/encoded families), then a curated
    # core of north-rule surfaces (roundtrips, pushdown, datasource,
    # maintenance) re-verified every round; long-stable variants past
    # slot 50 remain covered by pytest + bench/oracle_check.py.
    # INVARIANT (tested): exactly 50 entries precede the past-the-window
    # marker — adding a query means retiring one from the curated core.
    return {
        "decontaminate_docs": q_decontaminate_docs,
        "pack_sequences": q_pack_sequences,
        "encoded_filtered_sum": q_encoded_filtered_sum,
        "encoded_distinct": q_encoded_distinct,
        "encoded_distinct_multi": q_encoded_distinct_multi,
        "encoded_count_distinct": q_encoded_count_distinct,
        "encoded_topk": q_encoded_topk,
        "encoded_quantiles": q_encoded_quantiles,
        "encoded_group_quantiles": q_encoded_group_quantiles,
        "encoded_multi_agg": q_encoded_multi_agg,
        "encoded_rollup_sets": q_encoded_rollup_sets,
        "encoded_time_rollup": q_encoded_time_rollup,
        "encoded_rollup_gapfill": q_encoded_rollup_gapfill,
        "encoded_pivot": q_encoded_pivot,
        "encoded_histogram": q_encoded_histogram,
        "trigram_pushdown": q_trigram_pushdown,
        "continuous_aggregate": q_continuous_aggregate,
        "encoded_minmax": q_encoded_minmax,
        "encoded_substr_filter": q_encoded_substr_filter,
        "encoded_regex_filter": q_encoded_regex_filter,
        "encoded_group_topk": q_encoded_group_topk,
        "encoded_dim_join": q_encoded_dim_join,
        "encoded_left_join": q_encoded_left_join,
        "encoded_semijoin": q_encoded_semijoin,
        "asof_attribution": q_asof_attribution,
        "asof_broadcast": q_asof_broadcast,
        "asof_next_click": q_asof_next_click,
        "range_join_bands": q_range_join_bands,
        "interval_overlap": q_interval_overlap,
        "sessionize_events": q_sessionize_events,
        "gap_fill_hourly": q_gap_fill_hourly,
        "gap_fill_locf": q_gap_fill_locf,
        "pq_adc_topk": q_pq_adc_topk,
        "pq_refine_topk": q_pq_refine_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "ivfpq_persisted": q_ivfpq_persisted,
        "ivfpq_refine_chunks": q_ivfpq_refine_chunks,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "mix_corpus_docs": q_mix_corpus,
        "pipeline_prepare": q_pipeline_prepare,
        # --- curated always-verified core (filling the window to 50) ---
        "roundtrip_sha": q_roundtrip_sha,
        "projection": q_projection,
        "filter_pushdown": q_filter_pushdown,
        "datasource_write_roundtrip": q_datasource_write_roundtrip,
        "datasource_filter": q_datasource_filter,
        "roundtrip_nested": q_roundtrip_nested,
        "evolution_projection": q_evolution_projection,
        "merge_upsert": q_merge_upsert,
        "roundtrip_after_delete": q_roundtrip_after_delete,
        # --- long-stable, pytest/oracle_check-covered (past the window).
        # roundtrip_full / datasource_projection / encoded_group_sum
        # rotated out with driver-green r4 rows: roundtrip_sha value-
        # checks the same full-row surface, the poisoned-payload pytest
        # pins datasource projection pruning, the encoded-group family
        # is replica+pytest covered. ---
        "roundtrip_full": q_roundtrip_full,
        "datasource_projection": q_datasource_projection,
        "encoded_group_sum": q_encoded_group_sum,
        "pricing_summary": q_pricing_summary,
        "filter_pushdown_compound": q_filter_pushdown_compound,
        "column_profile": q_column_profile,
        "infer_repetition": q_infer_repetition,
        "schema_discovery": q_schema_discovery,
        "codec_metrics": q_codec_metrics,
        "order_segments": q_order_segments,
        "dedup_stats": q_dedup_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "rolling_fingerprint": q_rolling_fingerprint,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_lsh": q_ngram_jaccard_lsh,
        "cosine_lsh": q_cosine_lsh,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "cosine_near_dups": q_cosine_near_dups,
        "events_hourly": q_events_hourly,
        "roundtrip_events": q_roundtrip_events,
        "roundtrip_embeddings": q_roundtrip_embeddings,
        "roundtrip_decimal": q_roundtrip_decimal,
        "nested_projection": q_nested_projection,
        "nested_filter": q_nested_filter,
        "ivf_topk_persisted": q_ivf_topk_persisted,
        "chunk_accounting": q_chunk_accounting,
        "metadata_agg": q_metadata_agg,
        "roundtrip_compacted": q_roundtrip_compacted,
        "zorder_box": q_zorder_box,
        "point_lookup_bloom": q_point_lookup_bloom,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "encoded_group_count": q_encoded_group_count,
        "datasource_prefix": q_datasource_prefix,
        "encoded_group_stats": q_encoded_group_stats,
        "encoded_group_sum_float": q_encoded_group_sum_float,
        "encoded_group_sum_multi": q_encoded_group_sum_multi,
        # weighted_sample rotated out for mix_corpus_docs (round 5): the
        # weighted threshold is a one-line variant of the same md5-bucket
        # membership mix_corpus_docs exercises WITH data-dependent
        # fraction derivation on top; replica+pytest keep covering it
        "weighted_sample": q_weighted_sample,
    }


_ANN_QUERY_SQL = (
    "[" + ", ".join(str(((i * 37) % 17 - 8) / 10.0) for i in range(64)) + "]::DOUBLE[]"
)


def _lang_id_oracle() -> str:
    from parquet_extra_spark.operators.textstats import LANG_STOPWORDS

    toks = (
        "list_transform(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        " x -> x <> ''), t -> lower(t))"
    )
    n_tok = f"greatest(len({toks}), 1)"
    score = {}
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        score[lang] = f"(len(list_filter({toks}, t -> list_contains({arr}, t)))::DOUBLE / {n_tok})"
    best = "greatest(" + ", ".join(score.values()) + ")"
    pred = f"CASE WHEN {best} <= 0 THEN 'und' "
    for lang in sorted(score):
        pred += f"WHEN {score[lang]} = {best} THEN '{lang}' "
    pred += "END"
    return (
        f"SELECT doc_id AS id, {pred} AS lang_pred, round({best}, 6) AS lang_score"
        " FROM documents"
    )


def _quality_oracle() -> str:
    from parquet_extra_spark.operators.textstats import LANG_STOPWORDS

    toks = (
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    )
    stop_arr = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + "]"
    n_tok = f"len({toks})"
    n_chars = "length(text)"
    punct = f"(len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE / greatest({n_chars}, 1))"
    stop_hits = f"len(list_filter({toks}, t -> list_contains({stop_arr}, lower(t))))"
    stop_ratio = f"({stop_hits}::DOUBLE / greatest({n_tok}, 1))"
    quality = (
        f"least(1.0, 0.4 * least({n_tok} / 50.0, 1.0)"
        f" + 0.3 * (1.0 - least({punct} * 4, 1.0))"
        f" + 0.3 * least({stop_ratio} * 5, 1.0))"
    )
    return (
        f"SELECT doc_id AS id, {n_chars}::BIGINT AS n_chars,"
        f" {n_tok}::BIGINT AS n_tokens,"
        f" round(CASE WHEN {n_tok} > 0 THEN {n_chars}::DOUBLE / {n_tok} ELSE 0.0 END, 6)"
        " AS mean_token_len,"
        f" round({punct}, 6) AS punct_ratio,"
        f" round({stop_ratio}, 6) AS stopword_ratio,"
        f" round({quality}, 6) AS quality"
        " FROM documents"
    )


_SHINGLES_SQL = (
    "list_distinct([substring(text, i, 5)"
    " for i in range(1, greatest(length(text) - 4, 1) + 1)])"
)




_MD5_INT = "('0x' || substr(md5({x}),1,15))::BIGINT"


def _minhash_oracle() -> str:
    """SQL replica of minhash_lsh_dedup(hash_method="md5", k=32, bands=8,
    shingle=5, jaccard_threshold=0.5) — same universal-hash params, band
    keys, bucket cap, rep-pairing and min-id clustering."""
    from parquet_extra_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET, _P, _hash_params,
    )

    k, bands, rows, thr = 32, 8, 4, 0.5
    params = _hash_params(k)
    base = _MD5_INT.format(x="x")
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, x -> ((x % {_P}) * {a} + {b}) % {_P}))"
        for a, b in params
    )
    band_selects = []
    for b in range(bands):
        key = " || ',' || ".join(
            f"sig[{b * rows + r + 1}]::VARCHAR" for r in range(rows)
        )
        band_selects.append(
            f"SELECT id, {b} AS band, md5({key}) AS bhash FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    jac = (
        "len(list_intersect(a.s, b2.s))::DOUBLE /"
        " len(list_distinct(list_concat(a.s, b2.s)))"
    )
    return f"""
WITH sh AS (SELECT doc_id AS id, {_SHINGLES_SQL} AS s FROM documents),
h AS (SELECT id, s, list_transform(s, x -> {base}) AS hs FROM sh),
sig AS (SELECT id, [{sig_exprs}] AS sig FROM h),
bands AS ({bands_sql}),
reps AS (SELECT band, bhash, min(id) AS rep FROM bands GROUP BY 1, 2
         HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
cands AS (SELECT DISTINCT b.id, r.rep FROM bands b
          JOIN reps r USING (band, bhash) WHERE b.id <> r.rep),
pairs AS (SELECT c.id, c.rep FROM cands c
          JOIN sh a ON a.id = c.id JOIN sh b2 ON b2.id = c.rep
          WHERE {jac} >= {thr}),
cl AS (SELECT id, min(rep) AS cluster_id FROM pairs GROUP BY id)
SELECT d.doc_id AS id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cl ON cl.id = d.doc_id
"""


def _simhash_oracle() -> str:
    """SQL replica of simhash_dedup(hash_method="md5"): 60-bit sign-sum
    fingerprint over whitespace tokens, 4x15-bit block banding, capped
    buckets, min-id clustering."""
    from parquet_extra_spark.operators.dedup import DEFAULT_MAX_BUCKET

    base = _MD5_INT.format(x="x")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x >> {i}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(60)
    )
    toks = (
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    )
    return f"""
WITH t AS (SELECT doc_id AS id,
           list_transform({toks}, x -> {base}) AS hs FROM documents),
fp AS (SELECT id, ({bit_terms})::BIGINT AS f FROM t),
blocks AS (SELECT id, u.b AS blk, (f >> (u.b * 15)) & 32767 AS bval
           FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) u),
reps AS (SELECT blk, bval, min(id) AS rep FROM blocks GROUP BY 1, 2
         HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
cl AS (SELECT b.id, min(r.rep) AS cluster_id FROM blocks b
       JOIN reps r USING (blk, bval) GROUP BY b.id)
SELECT d.doc_id AS id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cl ON cl.id = d.doc_id
"""




def _ngram_lsh_oracle() -> str:
    """SQL replica of ngram_jaccard_pairs(hash_method="md5", k=32,
    bands=16, shingle=5, threshold=0.5): banded minhash proposes, exact
    Jaccard disposes — identical candidate set and values."""
    from parquet_extra_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET, _P, _hash_params,
    )

    k, bands, thr = 32, 16, 0.5
    rows = k // bands
    params = _hash_params(k)
    base = _MD5_INT.format(x="x")
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, x -> ((x % {_P}) * {a} + {b}) % {_P}))"
        for a, b in params
    )
    band_selects = []
    for b in range(bands):
        key = " || ',' || ".join(
            f"sig[{b * rows + r + 1}]::VARCHAR" for r in range(rows)
        )
        band_selects.append(f"SELECT id, {b} AS band, md5({key}) AS bhash FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    jac = (
        "len(list_intersect(a.s, b2.s))::DOUBLE /"
        " len(list_distinct(list_concat(a.s, b2.s)))"
    )
    return f"""
WITH sh AS (SELECT doc_id AS id, {_SHINGLES_SQL} AS s FROM documents),
h AS (SELECT id, s, list_transform(s, x -> {base}) AS hs FROM sh),
sig AS (SELECT id, [{sig_exprs}] AS sig FROM h),
bands AS ({bands_sql}),
ok AS (SELECT band, bhash FROM bands GROUP BY 1, 2
       HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
kept AS (SELECT b.* FROM bands b JOIN ok USING (band, bhash)),
cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b FROM kept l
         JOIN kept r ON l.band = r.band AND l.bhash = r.bhash AND l.id < r.id)
SELECT c.id_a, c.id_b, round({jac}, 6) AS jaccard
FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b2 ON b2.id = c.id_b
WHERE {jac} >= {thr}
"""


def _cosine_lsh_oracle() -> str:
    """SQL replica of cosine_pairs_lsh(threshold=0.3, n_planes=16,
    n_tables=4, dim=64): the same seeded hyperplanes as SQL literals,
    sign-bit signatures, capped bucket join, exact cosine verify."""
    from parquet_extra_spark.operators.similarity import _planes

    n_planes, n_tables, dim, thr, cap = 8, 4, 64, 0.3, 10_000
    table_selects = []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=42 + t)
        bits = " + ".join(
            "(CASE WHEN list_dot_product(v, ["
            + ", ".join(repr(float(w)) for w in plane)
            + f"]) > 0 THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(planes)
        )
        table_selects.append(f"SELECT id, {t} AS tbl, ({bits})::BIGINT AS sig FROM v")
    sigs_sql = " UNION ALL ".join(table_selects)
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS ({sigs_sql}),
ok AS (SELECT tbl, sig FROM sigs GROUP BY 1, 2 HAVING count(*) <= {cap}),
kept AS (SELECT s.* FROM sigs s JOIN ok USING (tbl, sig)),
cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b FROM kept l
         JOIN kept r ON l.tbl = r.tbl AND l.sig = r.sig AND l.id < r.id)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM cand c JOIN v a ON a.id = c.id_a JOIN v b ON b.id = c.id_b
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {thr}
"""




def _ivf_oracle() -> str:
    """SQL replica of ivf_topk(k=20, nprobe=4, n_centroids=16): identical
    centroid literals, argmax cell assignment, probe set, cosine order."""
    import numpy as np

    from parquet_extra_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(64, 16, 7)
    q = np.array([((i * 37) % 17 - 8) / 10.0 for i in range(64)])
    probes = (np.argsort(-(cents @ q))[:4] + 1).tolist()
    dots = ", ".join(
        "list_dot_product(v, [" + ", ".join(repr(float(w)) for w in c) + "])"
        for c in cents
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT id, v, [{dots}] AS dots FROM v),
a AS (SELECT id, v, list_position(dots, list_max(dots)) AS cell FROM d)
SELECT id, round(list_cosine_similarity(v, {_ANN_QUERY_SQL}), 6) AS cosine
FROM a WHERE cell IN ({", ".join(str(x) for x in probes)})
ORDER BY cosine DESC, id LIMIT 20
"""


def _pq_sql_parts() -> tuple[str, str, str, float]:
    """(codes_sql, lut_sql, ip_terms, qn) — the shared literal pieces of
    the PQ oracles: codebook assignment, the query's LUT, the ADC
    gather-sum, and the query norm."""
    import numpy as np

    from parquet_extra_spark.operators.similarity import _pq_codebooks

    dim, m, K = 64, 8, 16
    d_sub = dim // m
    cb = _pq_codebooks(dim, m, K, 11)
    q = np.array([((i * 37) % 17 - 8) / 10.0 for i in range(64)])
    qn = float(np.linalg.norm(q))
    lut = [
        float(np.dot(q[j * d_sub:(j + 1) * d_sub], cb[j][c]))
        for j in range(m)
        for c in range(K)
    ]
    code_exprs = []
    for j in range(m):
        sub = f"v[{j * d_sub + 1}:{(j + 1) * d_sub}]"
        scores = ", ".join(
            f"list_dot_product({sub}, ["
            + ", ".join(repr(float(w)) for w in cb[j][c])
            + f"]) - {float(np.dot(cb[j][c], cb[j][c]) / 2.0)!r}"
            for c in range(K)
        )
        code_exprs.append(
            f"list_position([{scores}], list_max([{scores}])) - 1"
        )
    lut_sql = "[" + ", ".join(repr(x) for x in lut) + "]"
    ip_terms = " + ".join(
        f"lut[{j * K} + codes[{j + 1}] + 1]" for j in range(m)
    )
    codes_sql = "[" + ", ".join(code_exprs) + "]"
    return codes_sql, lut_sql, ip_terms, qn


def _pq_oracle() -> str:
    """SQL replica of pq_encode(m=8, n_centroids=16) + pq_topk(k=20):
    identical codebook literals, argmax code assignment per subspace,
    identical LUT gather-and-sum in the same order."""
    codes_sql, lut_sql, ip_terms, qn = _pq_sql_parts()
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT id, {codes_sql} AS codes,
      round(sqrt(list_sum(list_transform(v, x -> x * x))), 9) AS vnorm,
      {lut_sql} AS lut FROM v)
SELECT id, round(({ip_terms}) / ({qn!r} * vnorm), 6) AS cosine_adc
FROM c WHERE vnorm > 0
ORDER BY cosine_adc DESC, id LIMIT 20
"""


def _pq_refine_oracle() -> str:
    """SQL replica of pq_refine_topk(shortlist=100, k=20): the ADC
    shortlist CTE (same rounding + id tie-break as pq_topk) joined back
    to the raw vectors for exact cosine rerank — brute_force_topk's
    output shape over the shortlist only."""
    codes_sql, lut_sql, ip_terms, qn = _pq_sql_parts()
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT id, {codes_sql} AS codes,
      round(sqrt(list_sum(list_transform(v, x -> x * x))), 9) AS vnorm,
      {lut_sql} AS lut FROM v),
short AS (SELECT id FROM c WHERE vnorm > 0
          ORDER BY round(({ip_terms}) / ({qn!r} * vnorm), 6) DESC, id
          LIMIT 100)
SELECT v.id, round(list_cosine_similarity(v.v, {_ANN_QUERY_SQL}), 6) AS cosine
FROM v JOIN short ON short.id = v.id
ORDER BY cosine DESC, v.id LIMIT 20
"""


def _ivfpq_oracle() -> str:
    """SQL replica of ivfpq_topk(k=20, nprobe=4): the _ivf_oracle cell
    filter composed with the _pq_oracle assignment + LUT scoring — the
    PQ pieces come from the SAME _pq_sql_parts the pq_adc_topk /
    pq_refine_topk oracles use, so codebook math cannot drift between
    the PQ and IVF-PQ oracles."""
    import numpy as np

    from parquet_extra_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(64, 16, 7)
    q = np.array([((i * 37) % 17 - 8) / 10.0 for i in range(64)])
    probes = (np.argsort(-(cents @ q))[:4] + 1).tolist()
    dots = ", ".join(
        "list_dot_product(v, [" + ", ".join(repr(float(w)) for w in c) + "])"
        for c in cents
    )
    codes_sql, lut_sql, ip_terms, qn = _pq_sql_parts()
    return f"""
WITH v0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT id, v, [{dots}] AS dots FROM v0),
a AS (SELECT id, v, list_position(dots, list_max(dots)) AS cell FROM d),
s AS (SELECT id, v FROM a WHERE cell IN ({", ".join(str(x) for x in probes)})),
c AS (SELECT id, {codes_sql} AS codes,
      round(sqrt(list_sum(list_transform(v, x -> x * x))), 9) AS vnorm,
      {lut_sql} AS lut FROM s)
SELECT id, round(({ip_terms}) / ({qn!r} * vnorm), 6) AS cosine_adc
FROM c WHERE vnorm > 0
ORDER BY cosine_adc DESC, id LIMIT 20
"""


def _ivfpq_refine_oracle() -> str:
    """SQL replica of ivfpq_refine_topk_chunks(nprobe=4, shortlist=100,
    k=20): the _ivfpq_oracle's cell-filtered ADC ranking as a
    shortlist CTE (same rounding + id tie-break), joined back to the
    raw vectors for exact cosine rerank — the storage path must equal
    this in-memory composition exactly."""
    import numpy as np

    from parquet_extra_spark.operators.similarity import _ivf_centroids

    cents = _ivf_centroids(64, 16, 7)
    q = np.array([((i * 37) % 17 - 8) / 10.0 for i in range(64)])
    probes = (np.argsort(-(cents @ q))[:4] + 1).tolist()
    dots = ", ".join(
        "list_dot_product(v, [" + ", ".join(repr(float(w)) for w in c) + "])"
        for c in cents
    )
    codes_sql, lut_sql, ip_terms, qn = _pq_sql_parts()
    return f"""
WITH v0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT id, v, [{dots}] AS dots FROM v0),
a AS (SELECT id, v, list_position(dots, list_max(dots)) AS cell FROM d),
s AS (SELECT id, v FROM a WHERE cell IN ({", ".join(str(x) for x in probes)})),
c AS (SELECT id, {codes_sql} AS codes,
      round(sqrt(list_sum(list_transform(v, x -> x * x))), 9) AS vnorm,
      {lut_sql} AS lut FROM s),
short AS (SELECT id FROM c WHERE vnorm > 0
          ORDER BY round(({ip_terms}) / ({qn!r} * vnorm), 6) DESC, id
          LIMIT 100)
SELECT v0.id, round(list_cosine_similarity(v0.v, {_ANN_QUERY_SQL}), 6) AS cosine
FROM v0 JOIN short ON short.id = v0.id
ORDER BY cosine DESC, v0.id LIMIT 20
"""


def oracle_sql() -> dict[str, str]:
    profile_union = " UNION ALL ".join(
        f"""SELECT '{c}' AS column, 'string' AS dtype,
               count(*) AS n_rows,
               (count(*) - count({c})) AS n_nulls,
               count(distinct {c}) AS n_distinct,
               cast(min({c}) AS varchar) AS min_val,
               cast(max({c}) AS varchar) AS max_val,
               round(avg(length(cast({c} AS varchar))), 4) AS avg_len
           FROM documents"""
        for c in ("lang", "source")
    )
    rep_union = " UNION ALL ".join(
        f"""SELECT '{c}' AS column, '{t}' AS dtype,
               CASE WHEN count(*) - count({c}) = 0 THEN 'required'
                    ELSE 'optional' END AS repetition
           FROM documents"""
        for c, t in (("doc_id", "bigint"), ("text", "string"), ("lang", "string"))
    )
    schema_union = " UNION ALL ".join(
        f"SELECT '{c}' AS column, CAST({i} AS integer) AS col_idx, '{t}' AS dtype"
        for i, (c, t) in enumerate(
            [
                ("doc_id", "bigint"),
                ("text", "string"),
                ("lang", "string"),
                ("source", "string"),
                ("n_chars", "bigint"),
            ]
        )
    )
    return {
        "decontaminate_docs": (
            "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws"
            "  FROM documents),"
            " ng AS (SELECT doc_id, unnest(list_distinct("
            "  [array_to_string(ws[i:i+4], ' ')"
            "   for i in range(1, greatest(len(ws) - 4, 0) + 1)])) AS ng"
            "  FROM w),"
            " ev AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 17 = 0),"
            " hits AS (SELECT doc_id, count(*) AS n_hits"
            "  FROM ng JOIN ev USING (ng) WHERE doc_id % 17 <> 0"
            "  GROUP BY doc_id)"
            " SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,"
            "  h.doc_id IS NOT NULL AS contaminated"
            " FROM documents d LEFT JOIN hits h USING (doc_id)"
            " WHERE d.doc_id % 17 <> 0"
        ),
        "pack_sequences": (
            "WITH b AS (SELECT doc_id, n_chars,"
            "  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
            "   ::BIGINT % 8 AS INT) AS bucket,"
            "  md5(CAST(doc_id AS VARCHAR) || chr(31) || 'pack') AS ord"
            "  FROM documents),"
            " c AS (SELECT doc_id, bucket,"
            "  CAST(sum(n_chars) OVER (PARTITION BY bucket ORDER BY ord, doc_id"
            "   ROWS UNBOUNDED PRECEDING) - n_chars AS BIGINT) AS before"
            "  FROM b)"
            " SELECT doc_id, bucket,"
            "  CAST(bucket AS BIGINT) * 1099511627776 + (before // 4096)"
            "   AS seq_id,"
            "  before % 4096 AS seq_offset"
            " FROM c"
        ),
        "projection": "SELECT doc_id, lang FROM documents",
        "roundtrip_full": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_compacted": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "point_lookup_bloom": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE doc_id IN (7, 123, 311)"
        ),
        "roundtrip_sha": "SELECT doc_id, sha256(text) AS text_sha256 FROM documents",
        "filter_pushdown": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE n_chars >= 150 AND n_chars <= 350"
        ),
        "filter_pushdown_compound": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE (n_chars < 300 AND lang = 'en')"
            " OR (source <> 'src0' AND n_chars > 520)"
            " OR NOT (lang IN ('en', 'de', 'es', 'fr', 'zh'))"
        ),
        "datasource_filter": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE lang = 'en' AND n_chars > 200"
        ),
        "datasource_prefix": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE source LIKE 'src1%' AND lang = 'en'"
        ),
        "roundtrip_after_delete": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE NOT coalesce(lang = 'en' OR n_chars > 500, FALSE)"
        ),
        "merge_upsert": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
            " WHERE doc_id >= 5"
            " UNION ALL SELECT doc_id,"
            " 'UPDATED' || CAST(doc_id AS VARCHAR) AS text, lang, source,"
            " n_chars FROM documents WHERE doc_id < 5"
            " UNION ALL SELECT CAST(-1 AS BIGINT), 'inserted', 'xx', 'srcX',"
            " CAST(8 AS BIGINT)"
        ),
        "encoded_group_count": (
            "SELECT lang AS value, count(*) AS cnt FROM documents GROUP BY lang"
        ),
        "encoded_group_sum": (
            "SELECT lang AS key, CAST(sum(n_chars) AS BIGINT) AS s"
            " FROM documents GROUP BY lang"
        ),
        "encoded_group_stats": (
            "SELECT lang AS key, count(*) AS n_rows, count(n_chars) AS n_vals,"
            " CAST(sum(n_chars) AS BIGINT) AS s, min(n_chars) AS mn,"
            " max(n_chars) AS mx FROM documents GROUP BY lang"
        ),
        "encoded_group_sum_float": (
            "SELECT lang AS key, sum(CAST(n_chars AS DOUBLE)) AS s"
            " FROM documents GROUP BY lang"
        ),
        "encoded_group_sum_multi": (
            "SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS s"
            " FROM documents GROUP BY lang, source"
        ),
        "encoded_filtered_sum": (
            "SELECT lang AS key, CAST(sum(n_chars) AS BIGINT) AS s"
            " FROM documents WHERE n_chars >= 100 AND n_chars <= 400"
            " AND NOT lang = 'en' GROUP BY lang"
        ),
        "encoded_distinct": (
            "SELECT DISTINCT source AS value FROM documents WHERE lang = 'en'"
        ),
        "encoded_distinct_multi": (
            "SELECT DISTINCT lang, source FROM documents WHERE n_chars >= 200"
        ),
        "encoded_count_distinct": (
            "SELECT lang AS key, count(DISTINCT source) AS nd"
            " FROM documents GROUP BY lang"
        ),
        "encoded_topk": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL"
            " ORDER BY n_chars DESC, doc_id LIMIT 50"
        ),
        "encoded_quantiles": (
            " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q,"
                f" quantile_disc(n_chars, {q}) AS value FROM documents"
                for q in (0.1, 0.25, 0.5, 0.75, 0.9)
            )
        ),
        "encoded_group_quantiles": (
            " UNION ALL ".join(
                f"SELECT lang AS key, CAST({q} AS DOUBLE) AS q,"
                f" quantile_disc(n_chars, {q}) AS value"
                " FROM documents GROUP BY lang"
                for q in (0.25, 0.5, 0.9)
            )
        ),
        "encoded_multi_agg": (
            "SELECT lang AS key, count(*) AS n, count(source) AS ns,"
            " sum(n_chars) AS sc, round(avg(n_chars), 6) AS ac,"
            " min(n_chars) AS mnc, max(n_chars) AS mxc,"
            " min(source) AS mns, max(source) AS mxs"
            " FROM documents GROUP BY lang"
        ),
        "encoded_rollup_sets": (
            "SELECT lang, source, count(*) AS n, sum(n_chars) AS sc,"
            " (GROUPING(lang)*2 + GROUPING(source)) AS gid"
            " FROM documents GROUP BY ROLLUP (lang, source)"
        ),
        "encoded_time_rollup": (
            "SELECT epoch(date_trunc('day', ts))::BIGINT AS day_epoch,"
            " count(*) AS n, round(sum(value), 4) AS sv,"
            " epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us"
            " FROM events GROUP BY 1"
        ),
        "trigram_pushdown": (
            "SELECT doc_id, source, lang FROM documents"
            " WHERE source LIKE '%rc1%'"
        ),
        "continuous_aggregate": (
            "SELECT lang, count(*) AS n_docs,"
            " CAST(sum(n_chars) AS BIGINT) AS char_sum,"
            " min(doc_id) AS id_lo, max(doc_id) AS id_hi,"
            " round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 6)"
            " AS mean_chars"
            " FROM documents GROUP BY lang"
        ),
        "encoded_histogram": (
            "SELECT CAST(floor(n_chars / 500) AS BIGINT) AS bin,"
            " count(*) AS n_docs, min(n_chars) AS lo, max(n_chars) AS hi"
            " FROM documents GROUP BY 1"
        ),
        "encoded_pivot": (
            "SELECT source,"
            " count(*) FILTER (WHERE lang = 'de') AS de,"
            " count(*) FILTER (WHERE lang = 'en') AS en,"
            " count(*) FILTER (WHERE lang = 'es') AS es,"
            " count(*) FILTER (WHERE lang = 'fr') AS fr,"
            " count(*) FILTER (WHERE lang = 'zh') AS zh"
            " FROM documents GROUP BY source"
        ),
        "encoded_rollup_gapfill": (
            "WITH h AS (SELECT event_type AS etype,"
            " epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,"
            " count(*) AS n_events, round(sum(value), 4) AS sv"
            " FROM events GROUP BY 1, 2),"
            " b AS (SELECT etype, min(hour_epoch) AS lo,"
            " max(hour_epoch) AS hi FROM h GROUP BY 1),"
            " d AS (SELECT etype,"
            " unnest(generate_series(lo, hi, 3600)) AS hour_epoch FROM b)"
            " SELECT d.etype, d.hour_epoch,"
            " CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,"
            " coalesce(h.sv, 0.0) AS sv"
            " FROM d LEFT JOIN h USING (etype, hour_epoch)"
        ),
        "encoded_minmax": (
            "SELECT lang AS key, count(*) AS n_rows, count(source) AS n_vals,"
            " min(source) AS mn, max(source) AS mx FROM documents GROUP BY lang"
        ),
        "encoded_substr_filter": (
            "SELECT lang AS value, count(*) AS cnt FROM documents"
            " WHERE source LIKE '%7%' AND lang LIKE '%n' GROUP BY lang"
        ),
        "encoded_regex_filter": (
            "SELECT lang AS value, count(*) AS cnt FROM documents"
            " WHERE regexp_matches(source, '^src1[0-9]$') GROUP BY lang"
        ),
        "encoded_group_topk": (
            "SELECT key, value FROM (SELECT lang AS key, n_chars AS value,"
            " row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rn"
            " FROM documents WHERE n_chars IS NOT NULL) WHERE rn <= 3"
        ),
        "encoded_dim_join": (
            "SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " WHERE o_totalprice > 150000"
        ),
        "encoded_left_join": (
            "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders"
            " LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer"
            " WHERE c_acctbal > 5000) d ON o_custkey = c_custkey"
        ),
        "encoded_semijoin": (
            "SELECT doc_id, lang, n_chars FROM documents"
            " WHERE doc_id IN (SELECT doc_id FROM documents WHERE n_chars > 400)"
        ),
        "datasource_projection": "SELECT doc_id, lang FROM documents",
        "datasource_write_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "column_profile": profile_union,
        "infer_repetition": rep_union,
        "schema_discovery": schema_union,
        # codec_metrics: intentionally no oracle (engine-internal decision)
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n_items,"
            " count(distinct l_orderkey) AS n_orders,"
            " min(l_quantity) AS min_qty, max(l_quantity) AS max_qty"
            " FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "order_segments": (
            "SELECT c_mktsegment, count(*) AS n_orders,"
            " count(distinct o_custkey) AS n_customers"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " GROUP BY c_mktsegment"
        ),
        "dedup_stats": (
            "SELECT count(*) AS n_rows, count(distinct sha256(text)) AS n_distinct,"
            " count(*) - count(distinct sha256(text)) AS n_dup_rows FROM documents"
        ),
        "doc_fingerprint": (
            "SELECT doc_id AS id,"
            " md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint"
            " FROM documents"
        ),
        "rolling_fingerprint": (
            "SELECT doc_id AS id,"
            " list_reduce(list_transform(range(1, greatest(length(text), 1) + 1),"
            " i -> unicode(substring(text, i::INT, 1))::BIGINT),"
            " (acc, x) -> (acc * 131 + x) % 2147483647) AS rolling_fp"
            " FROM documents"
        ),
        "token_counts": (
            "SELECT doc_id AS id,"
            " len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,"
            " len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe_tokens,"
            " length(text)::BIGINT AS n_chars FROM documents"
        ),
        "lang_id": _lang_id_oracle(),
        "quality_scores": _quality_oracle(),
        "ngram_jaccard": (
            f"WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM documents)"
            " SELECT id_a, id_b, round(j, 6) AS jaccard FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   len(list_intersect(a.s, b.s))::DOUBLE /"
            "   len(list_distinct(list_concat(a.s, b.s))) AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)"
            " WHERE j >= 0.3"
        ),
        "cosine_near_dups": (
            "SELECT id_a, id_b, c AS cosine FROM ("
            " SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
            "  round(list_cosine_similarity(a.embedding::DOUBLE[],"
            "   b.embedding::DOUBLE[]), 6) AS c"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)"
            " WHERE c >= 0.3"
        ),
        "events_hourly": (
            "SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,"
            " event_type, count(*) AS n_events,"
            " count(distinct user_id) AS n_users,"
            " round(sum(value), 4) AS sum_value"
            " FROM events GROUP BY 1, 2"
        ),
        "roundtrip_events": (
            "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,"
            " round(value, 6) AS value_r, props FROM events"
        ),
        "zorder_box": (
            "SELECT event_id, user_id, round(value, 6) AS value_r"
            " FROM events WHERE user_id BETWEEN 2 AND 9"
            " AND value BETWEEN 5.0 AND 80.0"
        ),
        "roundtrip_nested": (
            "SELECT o_custkey,"
            " count(*) OVER (PARTITION BY o_custkey) AS n_orders,"
            " o_orderkey AS key, o_orderstatus AS status,"
            " round(o_totalprice, 2) AS price_r FROM orders"
        ),
        "nested_projection": (
            'SELECT o_custkey, count(*) AS "stats.n_orders"'
            " FROM orders GROUP BY o_custkey"
        ),
        "nested_filter": (
            'SELECT o_custkey, count(*) AS "stats.n_orders",'
            ' min(o_orderkey) AS "stats.min_key"'
            " FROM orders GROUP BY o_custkey"
            " HAVING count(*) > 3 AND min(o_orderkey) < 40000"
        ),
        "evolution_projection": (
            "SELECT doc_id, lang,"
            " CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE NULL END AS n_chars"
            " FROM documents"
        ),
        "ivf_topk_persisted": _ivf_oracle(),
        "chunk_accounting": " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*)::BIGINT AS n_values,"
            f" {expr}::BIGINT AS raw_bytes FROM documents"
            for c, expr in [
                ("doc_id", "count(*) * 8"),
                ("text", "sum(coalesce(strlen(text), 0))"),
                ("lang", "sum(coalesce(strlen(lang), 0))"),
                ("source", "sum(coalesce(strlen(source), 0))"),
                ("n_chars", "count(*) * 8"),
            ]
        ),
        "metadata_agg": " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*)::BIGINT AS n_values,"
            f" (count(*) - count({c}))::BIGINT AS null_count,"
            f" CAST(min({c}) AS VARCHAR) AS min_val,"
            f" CAST(max({c}) AS VARCHAR) AS max_val FROM documents"
            for c in ["doc_id", "lang", "n_chars", "source"]
        ),
        "roundtrip_decimal": (
            "SELECT l_orderkey, l_linenumber,"
            " CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_str,"
            " CAST(CAST(CAST(l_linenumber AS DECIMAL(10,3)) / 8 AS DECIMAL(10,3))"
            " AS VARCHAR) AS frac_str"
            " FROM lineitem"
        ),
        "roundtrip_embeddings": (
            "SELECT vec_id, label,"
            " round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 3)"
            " AS sumsq FROM embeddings"
        ),
        "ann_topk": (
            "SELECT vec_id AS id,"
            " round(list_cosine_similarity(embedding::DOUBLE[],"
            f" {_ANN_QUERY_SQL}), 6) AS cosine"
            " FROM embeddings ORDER BY cosine DESC, id LIMIT 20"
        ),
        "ivf_topk": _ivf_oracle(),
        "pq_adc_topk": _pq_oracle(),
        "pq_refine_topk": _pq_refine_oracle(),
        "ivfpq_topk": _ivfpq_oracle(),
        "ivfpq_persisted": _ivfpq_oracle(),
        "ivfpq_refine_chunks": _ivfpq_refine_oracle(),
        "ngram_jaccard_lsh": _ngram_lsh_oracle(),
        "cosine_lsh": _cosine_lsh_oracle(),
        "minhash_dedup": _minhash_oracle(),
        "simhash_dedup": _simhash_oracle(),
        "asof_attribution": (
            "WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts"
            " FROM events WHERE event_type = 'purchase'),"
            " c AS (SELECT user_id, ts AS c_ts, event_id AS click_id, value"
            " FROM events WHERE event_type = 'click')"
            " SELECT p.purchase_id, p.user_id,"
            " epoch_us(p.p_ts) AS purchase_us, epoch_us(c.c_ts) AS click_us,"
            " c.click_id, round(c.value, 4) AS click_value"
            " FROM p ASOF LEFT JOIN c"
            " ON p.user_id = c.user_id AND p.p_ts >= c.c_ts"
        ),
"asof_broadcast": (
            "WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts"
            " FROM events WHERE event_type = 'purchase'),"
            " c AS (SELECT user_id, ts AS c_ts, event_id AS click_id, value"
            " FROM events WHERE event_type = 'click')"
            " SELECT p.purchase_id, p.user_id,"
            " epoch_us(p.p_ts) AS purchase_us, epoch_us(c.c_ts) AS click_us,"
            " c.click_id, round(c.value, 4) AS click_value"
            " FROM p ASOF LEFT JOIN c"
            " ON p.user_id = c.user_id AND p.p_ts >= c.c_ts"
        ),
        "asof_next_click": (
            "WITH e AS (SELECT user_id, event_id AS error_id, ts AS e_ts"
            " FROM events WHERE event_type = 'error'),"
            " c AS (SELECT user_id, ts AS c_ts, event_id AS click_id"
            " FROM events WHERE event_type = 'click')"
            " SELECT e.error_id, e.user_id,"
            " epoch_us(e.e_ts) AS error_us, epoch_us(c.c_ts) AS click_us,"
            " c.click_id"
            " FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.e_ts <= c.c_ts"
            " WHERE c.c_ts - e.e_ts <= INTERVAL 1 HOUR"
        ),
        "range_join_bands": (
            "WITH bands(lo, hi, band) AS (VALUES"
            " (0.0, 50000.0, 'low'), (25000.0, 100000.0, 'mid'),"
            " (75000.0, 200000.0, 'high'), (150000.0, 600000.0, 'tail'))"
            " SELECT b.band, count(*) AS n_orders,"
            " CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
            " AS sum_price"
            " FROM orders o JOIN bands b"
            " ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi"
            " GROUP BY b.band"
        ),
        "interval_overlap": (
            "WITH bands(blo, bhi, band) AS (VALUES"
            " (0.0, 50000.0, 'low'), (25000.0, 100000.0, 'mid'),"
            " (75000.0, 200000.0, 'high'), (150000.0, 600000.0, 'tail')),"
            " iv AS (SELECT o_orderkey, o_totalprice AS lo,"
            " o_totalprice + 25000.0 AS hi FROM orders)"
            " SELECT b.band, count(*) AS n_pairs,"
            " CAST(sum(iv.o_orderkey) AS BIGINT) AS key_sum"
            " FROM iv JOIN bands b ON iv.lo <= b.bhi AND b.blo <= iv.hi"
            " GROUP BY b.band"
        ),
        "sessionize_events": (
            "WITH g AS (SELECT user_id, ts, event_id, value,"
            " CASE WHEN lag(ts) OVER w IS NULL"
            " OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END"
            " AS brk FROM events"
            " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
            " s AS (SELECT user_id, ts, value,"
            " CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n FROM g)"
            " SELECT user_id, session_n,"
            " epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,"
            " count(*) AS n_events,"
            " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
            " FROM s GROUP BY user_id, session_n"
        ),
        "gap_fill_hourly": (
            "WITH h AS (SELECT event_type,"
            " epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,"
            " count(*) AS n FROM events GROUP BY 1, 2),"
            " b AS (SELECT event_type, min(hour_epoch) AS lo,"
            " max(hour_epoch) AS hi FROM h GROUP BY 1),"
            " d AS (SELECT event_type,"
            " unnest(generate_series(lo, hi, 3600)) AS hour_epoch FROM b)"
            " SELECT d.event_type, d.hour_epoch,"
            " CAST(coalesce(h.n, 0) AS BIGINT) AS n_events"
            " FROM d LEFT JOIN h USING (event_type, hour_epoch)"
        ),
        "gap_fill_locf": (
            "WITH h AS (SELECT event_type,"
            " epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,"
            " arg_max(CAST(value AS DECIMAL(18,4)), event_id) AS last_value"
            " FROM events GROUP BY 1, 2),"
            " b AS (SELECT event_type, min(hour_epoch) AS lo,"
            " max(hour_epoch) AS hi FROM h GROUP BY 1),"
            " d AS (SELECT event_type,"
            " unnest(generate_series(lo, hi, 3600)) AS hour_epoch FROM b),"
            " j AS (SELECT d.event_type, d.hour_epoch, h.last_value"
            " FROM d LEFT JOIN h USING (event_type, hour_epoch))"
            " SELECT event_type, hour_epoch,"
            " last_value(last_value IGNORE NULLS) OVER"
            " (PARTITION BY event_type ORDER BY hour_epoch"
            " ROWS UNBOUNDED PRECEDING) AS last_value FROM j"
        ),
        "hash_split": (
            "WITH b AS (SELECT doc_id, n_chars,"
            " ('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31) ||"
            " 'sg4'), 1, 15))::BIGINT % 10000 AS bk FROM documents)"
            " SELECT CASE WHEN bk < 9000 THEN 'train'"
            " WHEN bk < 9500 THEN 'val' ELSE 'test' END AS split,"
            " count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,"
            " CAST(sum(n_chars) AS BIGINT) AS char_sum"
            " FROM b GROUP BY 1"
        ),
        "stratified_sample": (
            "WITH b AS (SELECT doc_id, lang,"
            " ('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31) ||"
            " 'st4'), 1, 15))::BIGINT % 10000 AS bk FROM documents)"
            " SELECT lang, count(*) AS n_docs,"
            " CAST(sum(doc_id) AS BIGINT) AS id_sum FROM b"
            " WHERE bk < (CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 5000"
            " ELSE 10000 END)"
            " GROUP BY lang"
        ),
        "weighted_sample": (
            "WITH b AS (SELECT doc_id, lang,"
            " ('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31) ||"
            " 'wq'), 1, 15))::BIGINT % 10000 AS bk FROM documents"
            " WHERE ('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31)"
            " || 'wq'), 1, 15))::BIGINT % 10000"
            " < round(least(greatest((n_chars % 100) / 100.0, 0.0), 1.0)"
            " * 10000))"
            " SELECT lang, count(*) AS n_docs,"
            " CAST(sum(doc_id) AS BIGINT) AS id_sum FROM b GROUP BY lang"
        ),
        "pipeline_prepare": (
            "WITH f AS (SELECT *, sha256(text) AS fp,"
            " sha256(concat_ws(chr(31),"
            " coalesce(cast(doc_id AS VARCHAR), chr(0)),"
            " coalesce(text, chr(0)), coalesce(lang, chr(0)),"
            " coalesce(source, chr(0)),"
            " coalesce(cast(n_chars AS VARCHAR), chr(0)))) AS ok"
            " FROM documents),"
            " d AS (SELECT * FROM (SELECT *, row_number() OVER"
            " (PARTITION BY fp ORDER BY ok) AS rn FROM f) WHERE rn = 1),"
            " q AS (SELECT * FROM d WHERE n_chars >= 50),"
            " s AS (SELECT *, ('0x' || substr(md5(cast(doc_id AS VARCHAR)"
            " || chr(31) || 'pipe'), 1, 15))::BIGINT % 10000 AS bk FROM q)"
            " SELECT CASE WHEN bk < 9000 THEN 'train'"
            " WHEN bk < 9500 THEN 'val' ELSE 'test' END AS split,"
            " lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum"
            " FROM s GROUP BY 1, 2"
        ),
        # fractions derived IN SQL with the exact expression order of
        # mix_fractions (K = min(m/t); a binding domain — m/t = K, the
        # same double comparison — keeps exactly 1.0 since (m/t)*t/m is
        # not IEEE-guaranteed 1.0; others least(1, K*t/m); bound =
        # floor(frac*10000)) so the data-dependent bounds match the
        # engine's bit-for-bit at any scale factor
        "mix_corpus_docs": (
            "WITH t(d, t) AS (VALUES ('en', 0.5), ('fr', 0.3), ('zh', 0.2)),"
            " mass AS (SELECT lang AS d, count(*)::DOUBLE AS m"
            "  FROM documents WHERE lang IN ('en','fr','zh') GROUP BY 1),"
            " k AS (SELECT min(m / t) AS k FROM mass JOIN t USING (d)),"
            " f AS (SELECT d, floor((CASE WHEN m / t = (SELECT k FROM k)"
            "  THEN 1.0 ELSE least(1.0, (SELECT k FROM k) * t / m) END)"
            "  * 10000)::BIGINT AS bound FROM t JOIN mass USING (d))"
            " SELECT doc_id, lang FROM documents docs"
            " JOIN f ON docs.lang = f.d"
            " WHERE (('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31)"
            " || 'mx'), 1, 15))::BIGINT % 10000) < f.bound"
        ),
    }
