"""Interleaved encode vs parquet-zstd comparators (dev tool).

Three jobs alternate within one session so every throttling window hits
all of them:
  A) engine encode (clustering repartition + salt + in-chunk sort + codecs)
  B) parquet-zstd CLUSTERED write: the same repartition(bucket)+sort job
     expressed via parquet-mr (what the reference stack does to produce a
     clustered table, e.g. a sorted Iceberg write)
  C) parquet-zstd plain write (no shuffle; the size baseline)
Prints per-attempt times and pairwise ratios.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    import parquet_extra_spark as pes
    from parquet_extra_spark.sources import code_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_CORPUS_ROWS", "1000000"))
    reps = int(os.environ.get("REPS", "4"))
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
    n_units = cpus * 2
    chunk_rows = max(4096, min(65536, n_rows // n_units))
    print(f"raw_gb={raw_gb:.3f} chunk_rows={chunk_rows}")

    pes.encode(corpus.limit(10000), partition_cols=["repo", "lang"],
               chunk_rows=4096, n_buckets=cpus, n_salts=1).count()

    chunks = [None]

    def enc():
        if chunks[0] is not None:
            chunks[0].unpersist()
        c = pes.encode(corpus, partition_cols=["repo", "lang"],
                       sort_cols=["commit", "path"], chunk_rows=chunk_rows,
                       n_buckets=cpus, n_salts=2, num_partitions=cpus * 2).cache()
        c.count()
        chunks[0] = c

    with tempfile.TemporaryDirectory() as d:
        k = [0]

        def pq_clustered():
            k[0] += 1
            (corpus
             .repartition(cpus * 2, F.pmod(F.xxhash64("repo", "lang"), F.lit(cpus)),
                          F.pmod(F.xxhash64(F.col("content").cast("string")), F.lit(2)))
             .sortWithinPartitions("repo", "lang", "commit", "path")
             .write.mode("overwrite").option("compression", "zstd")
             .parquet(f"{d}/c{k[0]}"))

        def pq_plain():
            k[0] += 1
            (corpus.write.mode("overwrite").option("compression", "zstd")
             .parquet(f"{d}/p{k[0]}"))

        rows = []
        for attempt in range(reps):
            t = {}
            for name, fn in [("enc", enc), ("pq_clu", pq_clustered), ("pq_plain", pq_plain)]:
                t0 = time.time()
                fn()
                t[name] = time.time() - t0
            rows.append(t)
            print(f"attempt {attempt}: enc {t['enc']:.2f}s  pq_clustered {t['pq_clu']:.2f}s  "
                  f"pq_plain {t['pq_plain']:.2f}s  ratio_clu {t['enc']/t['pq_clu']:.2f}  "
                  f"ratio_plain {t['enc']/t['pq_plain']:.2f}")

        best = {k2: min(r[k2] for r in rows) for k2 in rows[0]}
        print(f"best: enc {best['enc']:.2f}s ({raw_gb/best['enc']:.3f} GB/s)  "
              f"pq_clustered {best['pq_clu']:.2f}s ({raw_gb/best['pq_clu']:.3f} GB/s)  "
              f"pq_plain {best['pq_plain']:.2f}s ({raw_gb/best['pq_plain']:.3f} GB/s)")
        print(f"best-vs-best ratio: clustered {best['enc']/best['pq_clu']:.2f}  "
              f"plain {best['enc']/best['pq_plain']:.2f}")
        med = sorted(r['enc'] / r['pq_clu'] for r in rows)[len(rows) // 2]
        print(f"median pairwise ratio vs clustered: {med:.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
