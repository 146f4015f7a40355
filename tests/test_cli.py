"""CLI (`python -m parquet_extra_spark`): encode -> verify -> decode ->
metrics/vacuum over a tmp dir, calling main() in-process (getOrCreate
reuses the test session)."""

import json
import os

import pytest

from parquet_extra_spark.__main__ import main


@pytest.fixture(scope="module")
def dirs(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    src = os.path.join(sf_dir, "documents.parquet")
    return {"src": src, "enc": str(base / "enc"), "out": str(base / "out")}


def _run(capsys, argv):
    rc = main(argv + ["--master", "local[4]", "--shuffle-partitions", "8"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(line)


def test_cli_encode_verify_decode(capsys, dirs):
    rc, enc = _run(
        capsys,
        [
            "encode", "--input", dirs["src"], "--out", dirs["enc"],
            "--partition-cols", "lang", "--sort-cols", "doc_id",
            "--chunk-rows", "256", "--n-buckets", "4",
        ],
    )
    assert rc == 0 and enc["units_total"] > 0 and enc["n_salts"] >= 1

    rc, ver = _run(capsys, ["verify", "--input", dirs["src"], "--enc", dirs["enc"]])
    assert rc == 0 and ver["roundtrip_ok"] is True

    rc, dec = _run(
        capsys,
        ["decode", "--enc", dirs["enc"], "--out", dirs["out"],
         "--columns", "doc_id,lang"],
    )
    assert rc == 0 and dec["rows"] > 0

    rc, met = _run(capsys, ["metrics", "--enc", dirs["enc"]])
    assert rc == 0 and len(met["rows"]) > 0
    assert {"part_key", "codec", "encoded_bytes"} <= set(met["rows"][0])

    rc, vac = _run(capsys, ["vacuum", "--enc", dirs["enc"], "--dry-run"])
    assert rc == 0 and vac["orphan_runs"] == []


def test_cli_profile(capsys, dirs):
    rc, pro = _run(
        capsys, ["profile", "--input", dirs["src"], "--columns", "lang,source"]
    )
    assert rc == 0 and {r["column"] for r in pro["rows"]} == {"lang", "source"}


def test_cli_agg_over_encoded(capsys, dirs, spark):
    """`agg` answers a GROUP BY report from the checkpointed chunk table
    without decoding rows; values must equal plain Spark on the source."""
    from pyspark.sql import functions as F

    rc, out = _run(
        capsys,
        ["agg", "--enc", dirs["enc"], "--keys", "lang",
         "--aggs", "count:*:n,sum:n_chars:total,min:doc_id:lo"],
    )
    assert rc == 0
    got = {r["lang"]: (r["n"], r["total"], r["lo"]) for r in out["rows"]}
    src = spark.read.parquet(dirs["src"])
    want = {
        r["lang"]: (r["n"], r["total"], r["lo"])
        for r in src.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("total"),
            F.min("doc_id").alias("lo"),
        ).collect()
    }
    assert got == want


def test_cli_agg_bad_spec(capsys, dirs):
    with pytest.raises(SystemExit):
        main(["agg", "--enc", dirs["enc"], "--keys", "lang",
              "--aggs", "count:n", "--master", "local[4]",
              "--shuffle-partitions", "8"])


def test_cli_refresh_continuous_aggregate(capsys, dirs, spark):
    """Two `refresh` invocations over a growing checkpoint: the second
    consumes only the new run; --show rows equal plain Spark."""
    import os
    from pyspark.sql import functions as F

    src = spark.read.parquet(dirs["src"])
    enc2 = dirs["enc"] + "_ca"
    state = dirs["enc"] + "_ca_state"
    import parquet_extra_spark as pes

    pes.encode_to(src.where(F.col("doc_id") % 2 == 0), enc2,
                  dataset_id="b0", chunk_rows=512, n_buckets=2, n_salts=1)
    args = ["refresh", "--enc", enc2, "--state", state, "--keys", "lang",
            "--aggs", "count:*:n,sum:n_chars:s"]
    rc, out1 = _run(capsys, args)
    assert rc == 0 and out1["new_runs"] >= 1 and out1["version"] == 1
    pes.encode_to(src.where(F.col("doc_id") % 2 == 1), enc2,
                  dataset_id="b1", chunk_rows=512, n_buckets=2, n_salts=1)
    rc, out2 = _run(capsys, args + ["--show"])
    assert rc == 0 and out2["version"] == 2
    got = {r["lang"]: (r["n"], r["s"]) for r in out2["rows"]}
    want = {
        r["lang"]: (r["n"], r["s"])
        for r in src.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
        ).collect()
    }
    assert got == want


def test_cli_encode_assume_clustered(capsys, dirs, tmp_path):
    """The zero-shuffle lane is reachable from the spark-submit CLI and
    verify passes against the original input."""
    enc2 = str(tmp_path / "enc_ac")
    rc, enc = _run(
        capsys,
        [
            "encode", "--input", dirs["src"], "--out", enc2,
            "--partition-cols", "lang", "--chunk-rows", "256",
            "--n-buckets", "4", "--n-salts", "2", "--assume-clustered",
        ],
    )
    assert rc == 0 and enc["units_total"] > 0

    rc, ver = _run(capsys, ["verify", "--input", dirs["src"], "--enc", enc2])
    assert rc == 0 and ver["roundtrip_ok"] is True
