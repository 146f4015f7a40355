"""Phase profiler for the encode path (dev tool, not part of the bench
contract). Separates: shuffle+sort+Arrow-transfer floor, forced-raw encode,
auto-selection encode, parquet-zstd reference write — then a single-chunk
CPU micro-profile of the per-chunk kernels. Run repeatedly; the host has
multi-minute throttling windows (see BENCH/BASELINE.md), so compare phases
WITHIN one run, not across runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa
    from pyspark.sql import SparkSession, functions as F

    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus
    from parquet_extra_spark.engine import encoder as enc

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_CORPUS_ROWS", "1000000"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-graft-tmp"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = code_corpus(spark, n_rows=n_rows).cache()
    raw_gb = (
        corpus.agg(
            F.sum(F.octet_length("content")) + F.sum(F.octet_length("repo"))
            + F.sum(F.octet_length("path")) + F.sum(F.octet_length("commit"))
            + F.sum(F.octet_length("lang"))
        ).collect()[0][0]
        / 1e9
    )
    print(f"raw_gb={raw_gb:.3f} rows={n_rows} cpus={cpus}")

    n_units = cpus * 2
    chunk_rows = max(4096, min(65536, n_rows // n_units))

    def timed(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{name:28s} {best:7.3f}s  {raw_gb / best:6.3f} GB/s")
        return best

    # warm-up python workers
    pes.encode(corpus.limit(10000), partition_cols=["repo", "lang"],
               chunk_rows=4096, n_buckets=cpus, n_salts=1).count()

    # --- phase 0: pure scan of the cache (floor of floors)
    timed("cache_scan_agg", lambda: corpus.agg(F.sum(F.octet_length("content"))).collect())

    # --- phase 1: shuffle + sort + Arrow->python transfer, near-no-op UDF
    def passthrough():
        cols = corpus.columns
        safe = [f"__pe_v{i}" for i in range(len(cols))]
        work = corpus.select(*[F.col(c).alias(s) for c, s in zip(cols, safe)])
        b, s = enc.unit_exprs(safe, ["__pe_v0", "__pe_v3"], cpus, 2, None)
        work = (work.withColumn(enc._BUCKET, b).withColumn(enc._SALT, s)
                .repartition(cpus * 2, enc._BUCKET, enc._SALT)
                .sortWithinPartitions(enc._BUCKET, enc._SALT))

        def fn(batches):
            total = 0
            for batch in batches:
                total += batch.num_rows
            yield pa.RecordBatch.from_pydict({"n": pa.array([total], pa.int64())})

        work.mapInArrow(fn, schema="n long").agg(F.sum("n")).collect()

    timed("shuffle_sort_transfer", passthrough)

    # --- phase 2: + in-chunk sort only (no stats/encode)
    def with_sort():
        cols = corpus.columns
        safe = [f"__pe_v{i}" for i in range(len(cols))]
        work = corpus.select(*[F.col(c).alias(s) for c, s in zip(cols, safe)])
        b, s = enc.unit_exprs(safe, ["__pe_v0", "__pe_v3"], cpus, 2, None)
        work = (work.withColumn(enc._BUCKET, b).withColumn(enc._SALT, s)
                .repartition(cpus * 2, enc._BUCKET, enc._SALT)
                .sortWithinPartitions(enc._BUCKET, enc._SALT))
        sort_cols = ["__pe_v0", "__pe_v3", "__pe_v2", "__pe_v1"]

        def fn(batches):
            buf, nbuf, total = [], 0, 0
            for batch in batches:
                buf.append(pa.Table.from_batches([batch]))
                nbuf += batch.num_rows
                if nbuf >= chunk_rows:
                    t = pa.concat_tables(buf)
                    t = enc._sort_table(t, sort_cols)
                    total += len(t)
                    buf, nbuf = [], 0
            if buf:
                t = enc._sort_table(pa.concat_tables(buf), sort_cols)
                total += len(t)
            yield pa.RecordBatch.from_pydict({"n": pa.array([total], pa.int64())})

        work.mapInArrow(fn, schema="n long").agg(F.sum("n")).collect()

    timed("shuffle_sort_chunksort", with_sort)

    # --- phase 3: forced raw encode (zstd only, no selection)
    def enc_raw():
        pes.encode(corpus, partition_cols=["repo", "lang"],
                   sort_cols=["commit", "path"], chunk_rows=chunk_rows,
                   n_buckets=cpus, n_salts=2, num_partitions=cpus * 2,
                   codec="raw").count()

    timed("encode_forced_raw", enc_raw)

    # --- phase 4: full auto-selection encode
    def enc_auto():
        pes.encode(corpus, partition_cols=["repo", "lang"],
                   sort_cols=["commit", "path"], chunk_rows=chunk_rows,
                   n_buckets=cpus, n_salts=2, num_partitions=cpus * 2).count()

    timed("encode_auto", enc_auto)

    # --- phase 5: parquet zstd reference write
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        k = [0]

        def pq():
            k[0] += 1
            corpus.write.mode("overwrite").option("compression", "zstd").parquet(f"{d}/p{k[0]}")

        timed("parquet_zstd_write", pq)

    # --- single-chunk micro-profile (driver-side, 1 core)
    from parquet_extra_spark.engine import stats as stats_mod

    sample = corpus.limit(chunk_rows).toPandas()
    tbl = pa.Table.from_pandas(sample)
    arr = tbl.column("content").combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dtype = "string"
    mb = stats_mod.raw_size(arr, dtype) / 1e6
    print(f"\nsingle-chunk content: {len(arr)} rows, {mb:.1f} MB")

    def micro(name, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"  {name:24s} {best * 1000:8.1f} ms  {mb / 1000 / best:6.3f} GB/s/core")

    st = stats_mod.compute_stats(arr, dtype)
    micro("compute_stats", lambda: stats_mod.compute_stats(arr, dtype))
    micro("canonical_sha256", lambda: stats_mod.canonical_sha256(arr, dtype))
    micro("fsst_gate", lambda: stats_mod._fsst_gate(arr))
    from parquet_extra_spark.codecs import encode_array
    micro("encode_raw_zstd", lambda: encode_array(arr, dtype, "raw"))
    micro("choose_and_encode", lambda: stats_mod.choose_and_encode(arr, dtype, st))
    # narrow columns
    for col in ["repo", "path", "commit", "lang"]:
        a = tbl.column(col).combine_chunks()
        s2 = stats_mod.compute_stats(a, "string")
        cmb = stats_mod.raw_size(a, "string") / 1e6
        t0 = time.time()
        stats_mod.choose_and_encode(a, "string", s2)
        t1 = time.time()
        stats_mod.canonical_sha256(a, "string")
        t2 = time.time()
        print(f"  {col:10s} {cmb:6.1f} MB  choose+enc {(t1-t0)*1000:7.1f} ms  sha {(t2-t1)*1000:7.1f} ms")

    spark.stop()


if __name__ == "__main__":
    main()
