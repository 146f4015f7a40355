"""Checkpointed encode with per-partition lineage and exact resume.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Layout under ``out_dir``:

    chunks/run_id=<id>/...   encoded chunk-table parquet, written per run
    manifest/                one row per completed (bucket, salt) work unit:
                             (part_key, salt, run_id, n_chunks, n_values,
                              raw_bytes, encoded_bytes)

Protocol (write chunks first, then the manifest rows — manifest is the
commit point):

1. A work unit = one (part_key, salt) group. ``encode_to`` lists pending
   units by anti-joining the source's unit set against the manifest
   (left_anti — no driver-side loops).
2. Chunks for pending units are appended under a fresh run_id.
3. Manifest rows for those units are appended only after the chunk write
   completes. A crash between the two leaves orphan chunk files under a
   run_id that never reaches the manifest; ``read_chunks`` joins chunks
   against the manifest on (part_key, salt, run_id), so orphans are
   invisible and the unit is re-encoded on resume — exactly-once output.

The analogue in the reference is the Hadoop OutputFormat commit protocol
it delegates to (ExampleParquetOutputFormat.java:7-14); here lineage is
explicit because the north_rule demands resumability at 10^12-file scale.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .encoder import encode, unit_exprs

_MANIFEST_SCHEMA = (
    "part_key string, salt int, run_id string, n_chunks long, n_values long,"
    " raw_bytes long, encoded_bytes long, committed_at double,"
    " dataset_id string"
)


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/manifest"


def _write_schema_sidecar(spark, out_dir: str, run_id: str, dataset_id: str,
                          cols, required: set[str]) -> None:
    """Persist this run's schema as ``manifest/_schema-<run_id>.json`` —
    the commit-time footer. The chunktable data source plans its schema
    from these sidecars alone (one tiny JSON per run, merged at read),
    matching the reference's single-footer schema read
    (ExampleParquetReader.java:65-71) instead of sweeping every data
    file. Underscore prefix keeps parquet readers of the manifest
    directory away from it. Written via the Hadoop FS API so any
    Spark-writable path works (HDFS/S3A/local)."""
    from ..sources.chunk_datasource import SCHEMA_SIDECAR_PREFIX, schema_sidecar_json

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(
        f"{_manifest_path(out_dir)}/{SCHEMA_SIDECAR_PREFIX}{run_id}.json"
    )
    fs = p.getFileSystem(hconf)
    out = fs.create(p, True)
    try:
        out.write(
            schema_sidecar_json(cols, run_id, dataset_id, required).encode("utf-8")
        )
    finally:
        out.close()


def _chunks_path(out_dir: str) -> str:
    return f"{out_dir}/chunks"


def load_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    try:
        m = spark.read.parquet(_manifest_path(out_dir))
    except Exception:
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    if "dataset_id" not in m.columns:
        # manifests written before append-batch support: one dataset ""
        m = m.withColumn("dataset_id", F.lit(""))
    return m


def encode_to(
    df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    dataset_id: str = "",
    **encode_kwargs,
) -> dict:
    """Encode ``df`` into ``out_dir``, skipping work units this DATASET
    already committed to the manifest. Returns a summary dict. Call again
    with the same ``dataset_id`` after a crash to resume: completed units
    of that dataset are never re-encoded.

    ``dataset_id`` scopes the resume contract. The default "" treats the
    whole out_dir as one logical dataset (one big encode, restartable).
    APPENDING new data must use a fresh dataset_id per batch (streaming
    micro-batches pass their batch id): unit identity is (dataset_id,
    part_key, salt), so a new batch whose rows hash into units an earlier
    batch committed is encoded normally instead of being skipped as
    "already done" — while a REPLAY of the same batch (same dataset_id)
    still resumes exactly. The dataset_id also namespaces chunk ids
    (uid_namespace) so chunks of different batches can never collide in
    the decoder's structural identity check.
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    encode_kwargs.setdefault("uid_namespace", dataset_id)

    # resume: drop source rows of units already committed BY THIS DATASET
    # before encoding — completed work is never recomputed (left_anti).
    bucket_expr, salt_expr = unit_exprs(
        df.columns,
        encode_kwargs.get("partition_cols"),
        encode_kwargs.get("n_buckets", 64),
        # the exchange-free lane forces salt 0 (encoder.encode:
        # salting only spreads the exchange it doesn't have), so the
        # resume-side unit identity must collapse the same way or a
        # replay would re-encode every row whose salt hash is nonzero
        1 if encode_kwargs.get("assume_clustered") else encode_kwargs.get("n_salts", 8),
        encode_kwargs.get("salt_col"),
    )
    manifest = (
        load_manifest(spark, out_dir)
        .filter(F.col("dataset_id") == dataset_id)
        .select("part_key", "salt")
        .distinct()
    )
    src = df.withColumn(
        "__pe_unit_pk", F.concat(F.lit("b"), bucket_expr.cast("string"))
    ).withColumn("__pe_unit_salt", salt_expr)
    done_units = manifest.withColumnRenamed(
        "part_key", "__pe_unit_pk"
    ).withColumnRenamed("salt", "__pe_unit_salt")
    pending_src = src.join(
        F.broadcast(done_units), ["__pe_unit_pk", "__pe_unit_salt"], "left_anti"
    ).drop("__pe_unit_pk", "__pe_unit_salt")

    # make resume-skipped work OBSERVABLE: an accidental append-as-resume
    # (same dataset_id, different data) silently drops rows hashing into
    # committed units — count them so the caller can detect it. The check
    # costs one extra source pass ONLY when this dataset already has
    # manifest rows (fresh encodes skip it entirely).
    rows_skipped = 0
    if not manifest.isEmpty():
        rows_skipped = src.join(
            F.broadcast(done_units), ["__pe_unit_pk", "__pe_unit_salt"], "left_semi"
        ).count()

    chunks = encode(pending_src, **encode_kwargs)

    # 1) write chunk data for pending units under this run_id
    (
        chunks.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .partitionBy("run_id")
        .parquet(_chunks_path(out_dir))
    )

    # 2) commit point: manifest rows derived from what was actually written
    written = spark.read.parquet(_chunks_path(out_dir)).filter(F.col("run_id") == run_id)
    unit_rows = (
        written.groupBy("part_key", "salt")
        .agg(
            F.countDistinct("chunk_id").alias("n_chunks"),
            F.sum(F.when(F.col("col_idx") == 0, F.col("n_values")).otherwise(0)).alias(
                "n_values"
            ),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.lit(time.time()))
        .withColumn("dataset_id", F.lit(dataset_id))
        .select(
            "part_key", "salt", "run_id", "n_chunks", "n_values",
            "raw_bytes", "encoded_bytes", "committed_at", "dataset_id",
        )
    )
    # commit-time footer FIRST: the manifest append below is the commit
    # point, so a crash between the two leaves an invisible orphan sidecar
    # — never a committed run whose schema contribution is missing
    from .schema import from_struct

    expected = encode_kwargs.get("expected_schema")
    required = (
        {f.name for f in expected.fields if not f.nullable} if expected is not None
        else set()
    )
    _write_schema_sidecar(
        spark, out_dir, run_id, dataset_id, from_struct(df.schema), required
    )
    unit_rows.write.mode("append").parquet(_manifest_path(out_dir))

    m = load_manifest(spark, out_dir)
    done = m.agg(
        F.count("*").alias("units"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
    ).collect()[0]
    return {
        "run_id": run_id,
        "units_total": done["units"],
        "raw_bytes": done["raw_bytes"],
        "encoded_bytes": done["encoded_bytes"],
        # >0 on a resume (the replayed rows of completed units) — but also
        # >0 on an accidental append-as-resume (same dataset_id, NEW data
        # hashing into committed units): callers appending new batches
        # must use a fresh dataset_id and treat a nonzero here as a bug
        "rows_skipped_resume": rows_skipped,
    }


def read_chunks(
    spark: SparkSession,
    out_dir: str,
    as_of: float | None = None,
    after: float | None = None,
) -> DataFrame:
    """Committed chunks only: join against the manifest on
    (part_key, salt, run_id) so orphans from crashed runs are invisible.

    The manifest is append-only (exactly one row per committed work
    unit), so its ``committed_at`` column is a consistent ingest
    frontier — two snapshot forms come for free, the Iceberg
    snapshot-read / incremental-scan analogue at unit granularity:

    * ``as_of=T`` — time travel: only units committed at or before T
      (the table exactly as a reader at time T saw it; an interrupted
      ingest's later resume never bleeds in).
    * ``after=T`` — incremental consumption: only units committed
      strictly after T (a downstream job processes each unit exactly
      once by remembering the max ``committed_at`` it has consumed —
      CDC-style, no full rescan).

    Both filters are metadata-only: they cut the manifest before the
    semi-join, so unread units' chunk files are never opened.

    ``committed_at`` is the writer's wall clock stamped between the chunk
    write and the manifest append, so as_of/after snapshots are exact for
    a SINGLE sequential writer per checkpoint dir. With concurrent
    writers or cross-driver clock skew, a run can become visible carrying
    a timestamp at-or-below an already-consumed frontier and an
    ``after=`` poller would skip it — poll with the chunktable STREAM
    source instead (its offsets are the order-independent set of
    committed run_ids, immune to this).
    """
    chunks = spark.read.parquet(_chunks_path(out_dir))
    manifest = load_manifest(spark, out_dir)
    if as_of is not None:
        manifest = manifest.filter(F.col("committed_at") <= as_of)
    if after is not None:
        manifest = manifest.filter(F.col("committed_at") > after)
    manifest = manifest.select("part_key", "salt", "run_id")
    return chunks.join(
        F.broadcast(manifest), ["part_key", "salt", "run_id"], "left_semi"
    ).drop("run_id")


def decode_checkpoint(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    as_of: float | None = None,
    after: float | None = None,
    **decode_kwargs,
) -> DataFrame:
    """Decode a checkpointed chunk table, using the no-shuffle co-located
    path when the file layout allows it.

    The encode tasks write whole chunks contiguously, so a checkpoint
    read is usually co-located — but Spark may split large files at
    row-group boundaries (spark.sql.files.maxPartitionBytes), breaking a
    chunk across input partitions. ``check_colocated`` verifies with a
    metadata-only aggregation (payload column pruned from that scan); on
    failure this falls back to the shuffling decode. At 100 TB the check
    costs a scan of one id column; the win is not shuffling 100 TB."""
    from .decoder import check_colocated, decode

    chunks = read_chunks(spark, out_dir, as_of=as_of, after=after)
    colocated = decode_kwargs.pop("colocated", None)
    if colocated is None:
        colocated = check_colocated(chunks)
    return decode(chunks, columns=columns, colocated=colocated, **decode_kwargs)


def vacuum_checkpoint(
    spark: SparkSession,
    out_dir: str,
    retain_seconds: float = 86400.0,
    dry_run: bool = False,
) -> dict:
    """Delete orphan chunk data left by crashed runs.

    A crash between the chunk write and the manifest append (step 1 vs
    step 2 of the commit protocol above) leaves a ``chunks/run_id=<id>``
    partition with no manifest row. ``read_chunks`` already makes those
    invisible, so correctness never needs this — but at 10^12-file scale
    the dead bytes are real money, and re-encoded units double-store
    until cleaned. Orphan detection is run-level because commit is
    run-level: a run_id either reached the manifest (all its unit rows
    append in one write) or it did not.

    Runs younger than ``retain_seconds`` are kept even when absent from
    the manifest: an in-flight ``encode_to`` has written its chunks but
    not yet its manifest rows and would otherwise be vacuumed mid-commit
    — the same retention guard as Delta VACUUM / Iceberg
    remove_orphan_files. Uses the Hadoop FileSystem API via the JVM
    gateway, so it works on HDFS / S3A / anything Spark can read, not
    just local paths; the listing is one directory status call (one
    entry per encode_to invocation, not per file).
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(_chunks_path(out_dir))
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return {"orphan_runs": [], "deleted_runs": 0, "bytes_reclaimed": 0}

    committed = {
        r["run_id"]
        for r in load_manifest(spark, out_dir).select("run_id").distinct().collect()
    }
    now_ms = time.time() * 1000.0
    orphans: list[str] = []
    reclaimed = 0
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("run_id="):
            continue
        rid = name.split("=", 1)[1]
        if rid in committed:
            continue
        if now_ms - status.getModificationTime() < retain_seconds * 1000.0:
            continue
        orphans.append(rid)
        reclaimed += fs.getContentSummary(status.getPath()).getLength()
        if not dry_run:
            fs.delete(status.getPath(), True)
    return {
        "orphan_runs": sorted(orphans),
        "deleted_runs": 0 if dry_run else len(orphans),
        "bytes_reclaimed": reclaimed,
    }


def metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-partition codec/size metrics table (north_rule lineage+metrics)."""
    return (
        read_chunks(spark, out_dir)
        .groupBy("part_key", "salt", "column", "codec")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_values").alias("n_values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
        )
    )
