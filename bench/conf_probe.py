"""Session-config sweep for the encode path: shuffle compression on/off,
Arrow batch size. Each config gets its own JVM (configs are immutable at
session build); same corpus, warm + best-of-3 per config. Interleaved
order would need one JVM per sample — instead run the sweep twice and
compare within-run ordering only."""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
from pyspark.sql import SparkSession
import parquet_extra_spark as pes
from parquet_extra_spark.sources import code_corpus

conf = eval(sys.argv[1])
cpus = 32
b = (SparkSession.builder.master(f"local[{cpus}]")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.driver.memory", "48g")
     .config("spark.ui.enabled", "false"))
os.makedirs("/dev/shm/spark-graft-tmp", exist_ok=True)
b = b.config("spark.local.dir", "/dev/shm/spark-graft-tmp")
for k, v in conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
corpus = code_corpus(spark, n_rows=1000000).cache()
corpus.count()
kw = dict(partition_cols=["repo", "lang"], sort_cols=["commit", "path"],
          chunk_rows=15625, n_buckets=cpus, n_salts=2, num_partitions=cpus * 2)
pes.encode(corpus, **kw).count()  # warm
ts = []
for i in range(3):
    t0 = time.time(); pes.encode(corpus, **kw).count(); ts.append(time.time() - t0)
print("RESULT", min(ts), [round(t, 2) for t in ts], flush=True)
spark.stop()
"""

CONFIGS = [
    ("baseline", {}),
    ("no_shuffle_compress", {"spark.shuffle.compress": "false",
                             "spark.shuffle.spill.compress": "false"}),
    ("arrow_64k", {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"}),
    ("both", {"spark.shuffle.compress": "false",
              "spark.shuffle.spill.compress": "false",
              "spark.sql.execution.arrow.maxRecordsPerBatch": "65536"}),
]


def main() -> None:
    child = CHILD % {"root": ROOT}
    for rnd in range(2):
        print(f"--- round {rnd}")
        for name, conf in CONFIGS:
            p = subprocess.run(
                [sys.executable, "-c", child, repr(conf)],
                capture_output=True, text=True, timeout=400,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
            print(f"{name:22s} {line[0] if line else 'FAIL: ' + p.stderr[-200:]}",
                  flush=True)


if __name__ == "__main__":
    main()
