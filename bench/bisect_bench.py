"""Bisect why bench.py's encode samples run 3-10x over the engine's
steady state while interference.py's identical encode does not.
Toggles the two differences one at a time, in one session:
  phase 1: plain encode (no cache), no parquet   — control
  phase 2: encode with .cache().count() + unpersist prev — bench's shape
  phase 3: cache + CLUSTERED parquet ref write to /tmp per attempt
  phase 4: cache + clustered ref + plain write (full bench loop)
"""

from __future__ import annotations

import os
import shutil
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
    shm = "/dev/shm/spark-graft-tmp"
    os.makedirs(shm, exist_ok=True)
    builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = code_corpus(spark, n_rows=n_rows).cache()
    corpus.count()
    chunk_rows = max(4096, min(65536, n_rows // (cpus * 2)))
    kw = dict(partition_cols=["repo", "lang"], sort_cols=["commit", "path"],
              chunk_rows=chunk_rows, n_buckets=cpus, n_salts=2,
              num_partitions=cpus * 2)
    bucket = F.pmod(F.xxhash64("repo", "lang"), F.lit(cpus))
    salt = F.pmod(F.xxhash64(F.col("path")), F.lit(2))

    def ref_write(where):
        (corpus.repartition(cpus * 2, bucket, salt)
         .sortWithinPartitions("repo", "lang", "commit", "path")
         .write.mode("overwrite").option("compression", "zstd").parquet(where))

    pes.encode(corpus, **kw).count()  # warm

    print("1: plain encode, no cache, no parquet")
    for i in range(3):
        t0 = time.time(); pes.encode(corpus, **kw).count()
        print(f"  enc {time.time()-t0:.2f}s", flush=True)

    print("2: cached encode (bench shape), no parquet")
    prev = None
    for i in range(3):
        if prev is not None:
            prev.unpersist()
        t0 = time.time()
        prev = pes.encode(corpus, **kw).cache(); prev.count()
        print(f"  enc {time.time()-t0:.2f}s", flush=True)

    print("3: cached encode + clustered ref write to /tmp")
    os.makedirs("/tmp/pe_bisect", exist_ok=True)
    for i in range(3):
        prev.unpersist()
        t0 = time.time()
        prev = pes.encode(corpus, **kw).cache(); prev.count()
        t_e = time.time() - t0
        t0 = time.time(); ref_write(f"/tmp/pe_bisect/r{i}")
        print(f"  enc {t_e:.2f}s  ref {time.time()-t0:.2f}s", flush=True)

    print("4: + plain write (full bench loop)")
    for i in range(3):
        prev.unpersist()
        t0 = time.time()
        prev = pes.encode(corpus, **kw).cache(); prev.count()
        t_e = time.time() - t0
        t0 = time.time(); ref_write(f"/tmp/pe_bisect/r2{i}")
        t_r = time.time() - t0
        t0 = time.time()
        corpus.write.mode("overwrite").option("compression", "zstd").parquet(
            f"/tmp/pe_bisect/p{i}")
        print(f"  enc {t_e:.2f}s  ref {t_r:.2f}s  plain {time.time()-t0:.2f}s",
              flush=True)
    shutil.rmtree("/tmp/pe_bisect", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
