"""Straggler probe: encode wall-clock vs (n_buckets, n_salts) unit count
at fixed 1M rows. Units = tasks; more/smaller units balance the tail at
the cost of per-task overhead. 3 interleaved rounds."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus

    cpus = 32
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
    spark = b.config("spark.local.dir", "/dev/shm/spark-graft-tmp").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = code_corpus(spark, n_rows=1000000).cache()
    corpus.count()

    VARIANTS = [
        ("32b x 2s ( 64u)", dict(n_buckets=32, n_salts=2, num_partitions=64)),
        ("32b x 4s (128u)", dict(n_buckets=32, n_salts=4, num_partitions=128)),
        ("64b x 2s (128u)", dict(n_buckets=64, n_salts=2, num_partitions=128)),
        ("64b x 4s (256u)", dict(n_buckets=64, n_salts=4, num_partitions=256)),
    ]

    def enc(v):
        pes.encode(corpus, partition_cols=["repo", "lang"],
                   sort_cols=["commit", "path"],
                   chunk_rows=max(4096, min(65536, 1000000 // (v["n_buckets"] * v["n_salts"]))),
                   **v).count()

    for name, v in VARIANTS:
        enc(v)  # warm
    results = {name: [] for name, _ in VARIANTS}
    for rnd in range(3):
        for name, v in VARIANTS:
            t0 = time.time()
            enc(v)
            results[name].append(round(time.time() - t0, 2))
    for name, ts in results.items():
        print(f"{name:18s} min {min(ts):5.2f}s  {ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
