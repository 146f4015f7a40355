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

    # warm-up at FULL size: the first full-size run of each job pays JVM
    # JIT (C2 compilation of the codegen'd exchange/scan stages), Python
    # worker spawn + numpy/pyarrow imports, and page-cache faults — on
    # this host that's a measured 31.5s first encode vs 2.5-3.0s steady
    # state (cache_cost.py run table, 2026-08-17). A 10k-row warmup does
    # NOT warm the full path (different batch shapes compile different
    # code). Both the engine and the comparator get one untimed full run.
    pes.encode(
        corpus, partition_cols=["repo", "lang"], sort_cols=["commit", "path"],
        chunk_rows=chunk_rows, n_buckets=cpus, n_salts=2,
        num_partitions=cpus * 2,
    ).count()

    # INTERLEAVED repeats, TWO parquet-zstd comparators. The sandbox host
    # shows multi-minute throttling windows (identical jobs vary 2-10x;
    # BENCH/BASELINE.md records full run tables), so a short best-of-3 can
    # sit entirely inside one slow window — round 2's committed artifact
    # did exactly that (encode 11.0s vs the same engine's 2.5-3.0s in a
    # fast window the same day). Protocol: every attempt runs the engine
    # encode AND both reference writes back-to-back, >=5 attempts, and the
    # loop extends (up to 9) until the best engine sample and the best
    # reference sample are window-consistent (pairwise ratio close to the
    # best-vs-best ratio).
    #
    # Comparators, both reported:
    #  * parquet_zstd_write: the SAME JOB via parquet-mr — clustering
    #    repartition on the (repo,lang) hash bucket + salt, sort within
    #    partitions, zstd parquet write. This is what the reference stack
    #    does to produce the clustered layout the north_rule mandates for
    #    the engine (explicit repartitioning + salting), so it is the
    #    apples-to-apples throughput baseline.
    #  * parquet_zstd_plain_write: corpus.write.parquet with NO
    #    clustering shuffle (the layout-free floor). Also the SIZE
    #    baseline: encoded_vs_parquet_zstd uses ITS bytes, the
    #    conservative choice (a clustered parquet write compresses
    #    better, i.e. comparing our clustered bytes against unclustered
    #    parquet makes the <=1.0 bound harder, not easier).
    import tempfile

    bucket = F.pmod(F.xxhash64("repo", "lang"), F.lit(cpus))
    salt = F.pmod(F.xxhash64(F.col("path")), F.lit(2))
    with tempfile.TemporaryDirectory() as warm:
        (
            corpus.repartition(cpus * 2, bucket, salt)
            .sortWithinPartitions("repo", "lang", "commit", "path")
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(f"{warm}/w")
        )
    chunks = None
    t_start = time.time()
    with tempfile.TemporaryDirectory() as d:
        t_enc, t_ref, t_plain = [], [], []
        for attempt in range(9):
            # unpersist BEFORE re-encoding: the identical logical plan
            # would otherwise be served from the CacheManager and the
            # "sample" would time a cache read
            if chunks is not None:
                chunks.unpersist()
            t0 = time.time()
            chunks = encode_corpus()
            t_enc.append(round(time.time() - t0, 3))
            t0 = time.time()
            (
                corpus.repartition(cpus * 2, bucket, salt)
                .sortWithinPartitions("repo", "lang", "commit", "path")
                .write.mode("overwrite")
                .option("compression", "zstd")
                .parquet(f"{d}/ref{attempt}")
            )
            t_ref.append(round(time.time() - t0, 3))
            out = f"{d}/plain{attempt}"
            t0 = time.time()
            corpus.write.mode("overwrite").option("compression", "zstd").parquet(out)
            t_plain.append(round(time.time() - t0, 3))
            if attempt >= 4:
                # stop once the comparison is window-consistent: some
                # single attempt ran BOTH jobs near their respective
                # bests, i.e. the two reported minima come from
                # comparable host windows and neither is a lucky outlier
                consistent = any(
                    e <= min(t_enc) * 1.3 and r <= min(t_ref) * 1.3
                    for e, r in zip(t_enc, t_ref)
                )
                if consistent or time.time() - t_start > 420:
                    break
        timings["encode_corpus"] = min(t_enc)
        extra["parquet_zstd_write_sec"] = min(t_ref)
        extra["parquet_zstd_write_GBps"] = round(
            content_bytes / 1e9 / extra["parquet_zstd_write_sec"], 4
        )
        extra["parquet_zstd_plain_write_sec"] = min(t_plain)
        extra["parquet_zstd_plain_write_GBps"] = round(
            content_bytes / 1e9 / extra["parquet_zstd_plain_write_sec"], 4
        )
        extra["encode_vs_ref_pairwise"] = round(
            min(e / r for e, r in zip(t_enc, t_ref)), 4
        )
        extra["encode_attempts"] = t_enc
        extra["parquet_zstd_attempts"] = t_ref
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
