"""Isolate: encode count() with vs without caching the chunk table (dev tool)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus

    cpus = 32
    n_rows = 1000000
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
    corpus.count()
    chunk_rows = max(4096, min(65536, n_rows // (cpus * 2)))

    pes.encode(corpus.limit(10000), partition_cols=["repo", "lang"],
               chunk_rows=4096, n_buckets=cpus, n_salts=1).count()

    def build():
        return pes.encode(corpus, partition_cols=["repo", "lang"],
                          sort_cols=["commit", "path"], chunk_rows=chunk_rows,
                          n_buckets=cpus, n_salts=2, num_partitions=cpus * 2)

    for attempt in range(6):
        t0 = time.time()
        build().count()
        t_plain = time.time() - t0
        c = build().cache()
        t0 = time.time()
        c.count()
        t_cache = time.time() - t0
        c.unpersist()
        print(f"attempt {attempt}: nocache {t_plain:.2f}s   cache {t_cache:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
