"""Benchmark harness (driver contract): runs the headline engine queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra fields (informational, beyond the contract): encode GB/s over raw
content bytes, encoded-vs-parquet-zstd byte ratio — the north_rule's two
headline numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F


def build_spark(cpus: int) -> SparkSession:
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("parquet_extra_spark_bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle to tmpfs when present (cluster nodes shuffle to local NVMe;
    # the sandbox overlay disk would serialize the measured pipeline)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        shm = "/dev/shm/spark-graft-tmp"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    return builder.getOrCreate()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus
    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # --- corpus encode/decode (the engine's heart, at ~content-heavy scale)
    # 1M rows (~1.8 GB raw): small enough to keep the whole bench under a
    # few minutes, big enough that chunk sizes (and hence the compression
    # ratio vs the parquet-zstd reference) and fixed per-job costs are
    # representative rather than artifacts of a toy input
    n_corpus = int(os.environ.get("SPARK_GRAFT_CORPUS_ROWS", "1000000"))
    # couple chunk size to parallelism: 2*cpus work units, each one chunk-ish,
    # so every core is busy while chunks stay large enough for zstd windows
    n_units = cpus * 2
    chunk_rows = max(4096, min(65536, n_corpus // n_units))
    corpus = code_corpus(spark, n_rows=n_corpus).cache()
    content_bytes = corpus.agg(
        F.sum(F.octet_length("content"))
        + F.sum(F.octet_length("repo"))
        + F.sum(F.octet_length("path"))
        + F.sum(F.octet_length("commit"))
        + F.sum(F.octet_length("lang"))
    ).collect()[0][0]

    def encode_corpus():
        c = pes.encode(
            corpus,
            partition_cols=["repo", "lang"],
            sort_cols=["commit", "path"],
            chunk_rows=chunk_rows,
            n_buckets=cpus,
            n_salts=2,
            # one partition per (bucket, salt) unit: units cannot split
            # across tasks, so extra partitions would sit empty
            num_partitions=cpus * 2,
        ).cache()
        c.count()
        return c

    # warm-up: spin up python workers / JIT / page cache so the measured
    # number reflects steady-state throughput, not first-task overheads
    pes.encode(
        corpus.limit(10000), partition_cols=["repo", "lang"], chunk_rows=4096,
        n_buckets=cpus, n_salts=1,
    ).count()

    # INTERLEAVED best-of-2: the sandbox host shows multi-minute
    # throttling windows (identical jobs vary 2-4x), so the engine encode
    # and the parquet+zstd reference write alternate samples — both sides
    # see the same windows, keeping the throughput comparison fair (see
    # bench/scaling.py + BENCH/BASELINE.md). The reference write is what
    # the reference library produces via parquet-mr; it gives BOTH
    # north_rule baselines: compressed size (ours must be <=) and
    # single-node write throughput (ours should match or beat).
    import tempfile

    chunks = None
    with tempfile.TemporaryDirectory() as d:
        t_enc, t_ref = [], []
        for attempt in range(3):
            # unpersist BEFORE re-encoding: the identical logical plan
            # would otherwise be served from the CacheManager and the
            # "sample" would time a cache read
            if chunks is not None:
                chunks.unpersist()
            t0 = time.time()
            chunks = encode_corpus()
            t_enc.append(round(time.time() - t0, 3))
            out = f"{d}/ref{attempt}"
            t0 = time.time()
            corpus.write.mode("overwrite").option("compression", "zstd").parquet(out)
            t_ref.append(round(time.time() - t0, 3))
        timings["encode_corpus"] = min(t_enc)
        extra["parquet_zstd_write_sec"] = min(t_ref)
        extra["parquet_zstd_write_GBps"] = round(
            content_bytes / 1e9 / extra["parquet_zstd_write_sec"], 4
        )
        pq_bytes = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
    extra["encode_GBps"] = round(content_bytes / 1e9 / timings["encode_corpus"], 4)
    extra["raw_gb"] = round(content_bytes / 1e9, 3)
    enc_bytes = chunks.agg(F.sum("encoded_bytes")).collect()[0][0]
    extra["encoded_vs_parquet_zstd"] = round(enc_bytes / pq_bytes, 4)

    def decode_verify():
        # co-located no-shuffle decode: the chunk table is cached straight
        # from encode, so every chunk's rows share a partition by
        # construction — zero payload bytes cross the network
        dec = pes.decode(
            chunks, schema_cols=pes.schema_from_struct(corpus.schema),
            colocated=True,
        )
        assert pes.roundtrip_ok(corpus, dec), "round trip failed at bench scale"

    # best-of-2 like encode: a single sample can record a throttling
    # window instead of the engine
    timed("decode_verify_corpus", decode_verify)
    t_first_dec = timings["decode_verify_corpus"]
    timed("decode_verify_corpus", decode_verify)
    if timings["decode_verify_corpus"] > t_first_dec:
        timings["decode_verify_corpus"] = t_first_dec
    corpus.unpersist()

    # --- driver-table queries (same set the correctness gate runs)
    qs = entry_mod.queries()
    for name in [
        "projection",
        "roundtrip_sha",
        "filter_pushdown",
        "column_profile",
        "pricing_summary",
        "order_segments",
    ]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "engine_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
