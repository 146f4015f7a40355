"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

The Iceberg-style input table from BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).
Built entirely from `spark.range(n)` + hash-derived column expressions —
seed-stable, no runtime RNG, no external data, generation runs JVM-side
(whole-stage codegen) so even the 5M-row bench corpus materializes fast.

Shape engineered to exercise every codec:
* repo    — Zipf-ish skew: ~30% of rows in one mega-repo (salting test)
* path    — sorted runs within repo (RLE)
* commit  — 40-hex sha2, runs of ~50 consecutive rows (RLE)
* lang    — 7 distinct values (dictionary)
* content — templated pseudo source with sha2-derived identifiers and a
            high-entropy tail section; compressible but not trivially so
            (FSST vs raw+zstd decision is non-degenerate)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "java", "scala", "go", "rs", "js", "md"]


def code_corpus(
    spark: SparkSession,
    n_rows: int = 50_000,
    n_repos: int = 200,
    mega_share: float = 0.3,
    commit_run: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus of n_rows files."""
    n_part = partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_rows, 1, n_part).withColumnRenamed("id", "i")
    h = F.xxhash64(F.col("i").cast("string"))  # deterministic per-row hash

    mega_cut = int(mega_share * 100)
    repo = (
        F.when(
            F.pmod(h, F.lit(100)) < mega_cut, F.lit("org0/megarepo")
        ).otherwise(
            F.concat(
                F.lit("org"),
                F.pmod(h, F.lit(17)).cast("string"),
                F.lit("/repo"),
                F.pmod(F.abs(h), F.lit(n_repos)).cast("string"),
            )
        )
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (F.pmod(F.col("i"), F.lit(7)) + 1).cast("int")
    )
    # path: repo-local directories — clustering by repo then sorting by path
    # yields directory runs (RLE-friendly), like a real checkout
    path = F.concat(
        F.lit("src/dir"),
        F.pmod(F.xxhash64(F.col("i") + 7), F.lit(40)).cast("string"),
        F.lit("/file"),
        F.pmod(F.col("i"), F.lit(1024)).cast("string"),
        F.lit("."),
        lang,
    )
    # commit belongs to its repo (files of one repo share its commits), and
    # commits-per-repo scales with repo size, so repo-clustered sorting
    # restores commit runs of ~commit_run rows — matching real corpora
    mega_commits = max(2, int(n_rows * mega_share) // commit_run)
    small_commits = max(2, int(n_rows * (1 - mega_share)) // max(n_repos * 17, 1) // max(commit_run // 10, 1))
    n_commits = F.when(repo == "org0/megarepo", F.lit(mega_commits)).otherwise(
        F.lit(small_commits)
    )
    commit = F.sha2(
        F.concat(repo, F.lit("@"), F.pmod(F.xxhash64(F.col("i") + 13), n_commits).cast("string")),
        256,
    )
    # content: templated pseudo-source; identifiers derived from sha2 fragments,
    # plus a per-row high-entropy line so zstd can't trivially collapse rows
    frag = F.substring(F.sha2(F.col("i").cast("string"), 256), 1, 8)
    frag2 = F.substring(F.sha2(F.concat(F.lit("x"), F.col("i").cast("string")), 256), 1, 12)
    body_unit = F.concat(
        F.lit("def process_"), frag, F.lit("(value, config):\n"),
        F.lit("    # generated handler for "), path, F.lit("\n"),
        F.lit("    result = transform(value, key='"), frag2, F.lit("')\n"),
        F.lit("    if result is None:\n        raise ValueError('bad value: ' + str(value))\n"),
        F.lit("    return result\n\n"),
    )
    n_units = (F.pmod(F.abs(h), F.lit(12)) + 1).cast("int")  # 1..12 repetitions
    entropy_tail = F.sha2(F.concat(F.lit("t"), F.col("i").cast("string")), 512)
    content = F.concat(
        F.lit("# repo: "), repo, F.lit("\n# lang: "), lang, F.lit("\n\n"),
        F.repeat(body_unit, n_units),
        F.lit("CHECKSUM = '"), entropy_tail, F.lit("'\n"),
    )
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
