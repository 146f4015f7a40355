"""Warm, interleaved decomposition of the encode path:
  A  encode (shuffle + transfer + kernels)       — the real thing
  B  shuffle+transfer only (pass-through UDF)    — no kernels
  C  transfer+kernels only (no clustering shuffle; chunks are per input
     partition, wrong layout but same bytes through the pipe)
  D  clustered parquet-zstd write (JVM only)     — the comparator
3 interleaved rounds A,B,C,D so window drift hits all phases equally.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa
    from pyspark.sql import SparkSession, functions as F

    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus

    cpus = 32
    n_rows = 1000000
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
    )
    os.makedirs("/dev/shm/spark-graft-tmp", exist_ok=True)
    b = b.config("spark.local.dir", "/dev/shm/spark-graft-tmp")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = code_corpus(spark, n_rows=n_rows).cache()
    corpus.count()
    chunk_rows = 15625
    kw = dict(partition_cols=["repo", "lang"], sort_cols=["commit", "path"],
              chunk_rows=chunk_rows, n_buckets=cpus, n_salts=2,
              num_partitions=cpus * 2)
    bucket = F.pmod(F.xxhash64("repo", "lang"), F.lit(cpus))
    salt = F.pmod(F.xxhash64(F.col("path")), F.lit(2))

    def a_encode():
        pes.encode(corpus, **kw).count()

    def passthrough(iter_batches):
        n = 0
        for batch in iter_batches:
            n += batch.num_rows
        yield pa.RecordBatch.from_pydict({"n": pa.array([n], pa.int64())})

    shuffled = corpus.repartition(cpus * 2, bucket, salt)

    def b_shuffle_transfer():
        shuffled.mapInArrow(passthrough, "n bigint").count()

    def c_noshuffle_encode():
        # internals: same encode_fn, same bytes through the pipe, but no
        # clustering exchange — chunks form per input cache partition
        from parquet_extra_spark.engine import encoder as enc

        cols = corpus.columns
        dtypes = {f.name: f.dataType.simpleString() for f in corpus.schema.fields}
        work = (corpus.withColumn(enc._BUCKET, F.spark_partition_id())
                .withColumn(enc._SALT, F.lit(0)))
        fn = enc._make_encode_fn(cols, dtypes, chunk_rows, None,
                                 sort_cols=["commit", "path"],
                                 uid_namespace="phaseC", display=cols)
        work.mapInArrow(fn, schema=enc.CHUNK_SPARK_SCHEMA).count()

    def d_parquet():
        (corpus.repartition(cpus * 2, bucket, salt)
         .sortWithinPartitions("repo", "lang", "commit", "path")
         .write.mode("overwrite").option("compression", "zstd")
         .parquet("/dev/shm/pe_phase/ref"))
        shutil.rmtree("/dev/shm/pe_phase/ref", ignore_errors=True)

    os.makedirs("/dev/shm/pe_phase", exist_ok=True)
    phases = [("A encode", a_encode), ("B shuf+xfer", b_shuffle_transfer),
              ("C xfer+kernels", c_noshuffle_encode), ("D parquet", d_parquet)]
    # warm each
    for name, fn in phases:
        try:
            fn()
        except TypeError:
            # encode() may not take cluster=False — fall back to plain
            if name.startswith("C"):
                phases = [p for p in phases if not p[0].startswith("C")]
            else:
                raise
    results = {name: [] for name, _ in phases}
    for rnd in range(3):
        for name, fn in phases:
            t0 = time.time()
            fn()
            results[name].append(round(time.time() - t0, 2))
    for name, ts in results.items():
        print(f"{name:16s} min {min(ts):5.2f}s  {ts}", flush=True)
    shutil.rmtree("/dev/shm/pe_phase", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
