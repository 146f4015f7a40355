"""Phase-order flip of interference.py: parquet -> /dev/shm FIRST (no
overlay-disk writes at all), then /tmp. If shm-interleaved encode stays
fast here, the poison in run 1 was /tmp overlay writeback backlog."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

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
    shm = "/dev/shm/spark-graft-tmp"
    os.makedirs(shm, exist_ok=True)
    builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = code_corpus(spark, n_rows=n_rows).cache()
    corpus.count()
    chunk_rows = max(4096, min(65536, n_rows // (cpus * 2)))

    def enc():
        t0 = time.time()
        pes.encode(corpus, partition_cols=["repo", "lang"],
                   sort_cols=["commit", "path"], chunk_rows=chunk_rows,
                   n_buckets=cpus, n_salts=2, num_partitions=cpus * 2).count()
        return time.time() - t0

    def pq(where):
        t0 = time.time()
        corpus.write.mode("overwrite").option("compression", "zstd").parquet(where)
        return time.time() - t0

    print("warm x3 (JIT)")
    for i in range(3):
        print(f"  enc {enc():.2f}s", flush=True)
    print("C-first: interleaved, parquet -> /dev/shm, file removed per attempt")
    for i in range(4):
        t_p = pq("/dev/shm/pe_bench_p")
        shutil.rmtree("/dev/shm/pe_bench_p", ignore_errors=True)
        t_e = enc()
        print(f"  pq {t_p:.2f}s  enc {t_e:.2f}s", flush=True)
    print("A: encode only")
    for i in range(2):
        print(f"  enc {enc():.2f}s", flush=True)
    print("B: interleaved, parquet -> /tmp (overlay), file removed per attempt")
    for i in range(3):
        t_p = pq("/tmp/pe_bench_p")
        shutil.rmtree("/tmp/pe_bench_p", ignore_errors=True)
        t_e = enc()
        print(f"  pq {t_p:.2f}s  enc {t_e:.2f}s", flush=True)
    print("A2: encode only")
    for i in range(3):
        print(f"  enc {enc():.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
