"""Two-parallelism scaling benchmark (north_rule evidence).

The rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) is evidenced in this sandbox per the driver's substitution rule:
the same job at local[8] vs local[32] on identical input. Each level runs
in its own JVM/process via subprocess so nothing is shared but the OS.

Writes BENCH/BASELINE.md and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate_input(path: str, n_rows: int) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_extra_spark.sources import code_corpus

    code_corpus(spark, n_rows=n_rows).write.mode("overwrite").parquet(path)
    spark.stop()


def run_level(cpus: int, input_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "encode_job.py"),
         "--cpus", str(cpus), "--input", input_path],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "1000000"))
    levels = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
    )
    with tempfile.TemporaryDirectory() as d:
        inp = f"{d}/corpus.parquet"
        generate_input(inp, n_rows)
        results = {c: run_level(c, inp) for c in levels}

    lo, hi = results[levels[0]], results[levels[1]]
    speedup = hi["gbps"] / lo["gbps"]
    efficiency = speedup / (levels[1] / levels[0])
    summary = {
        "metric": "encode_scaling_efficiency",
        "value": round(efficiency, 4),
        "unit": "ratio",
        "levels": results,
        "speedup": round(speedup, 3),
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured engine numbers\n\n"
            f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')} on "
            f"local[{levels[0]}] vs local[{levels[1]}] "
            "(driver's substitution for N vs 4N executors; "
            "separate JVMs per level, identical parquet input, best of 2 "
            "rounds after warm-up).\n\n"
            "| level | encode GB/s | seconds | raw bytes | encoded bytes |\n"
            "|---|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {r['gbps']} | {r['seconds']} | {r['raw_bytes']} | {r['encoded_bytes']} |\n"
                for c, r in results.items()
            )
            + f"\n- speedup 8→32: **{speedup:.2f}x** (ideal 4x)\n"
            f"- scaling efficiency: **{efficiency:.3f}** (target ≥ 0.8)\n"
            f"- compression: encoded/raw = "
            f"{hi['encoded_bytes'] / hi['raw_bytes']:.4f}\n"
            f"- corpus: {n_rows} rows deterministic synthetic "
            f"(parquet_extra_spark.sources.code_corpus)\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
