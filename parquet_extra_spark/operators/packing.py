"""Deterministic sequence packing for training-data pipelines.

Packs variable-length documents into fixed-token-budget training
sequences — the step between dedup/decontamination and the trainer's
data loader.  Two lanes, same contract (every input row assigned to
exactly one ``seq_id``, deterministic for a given input set):

* ``pack_by_cumsum`` — *offset packing*: order documents by a salted
  hash inside hash-derived buckets, running-total their token counts,
  and cut sequences at budget boundaries (``seq = floor((cum - size)
  / budget)``).  A sequence can overshoot the budget by at most one
  document (the one straddling the cut), which trainers handle by
  truncation — in exchange the whole operator is two Catalyst window
  functions over a hash-partitioned order: ONE shuffle, no Python, and
  *exactly* SQL-expressible, so the registered query has a full DuckDB
  value oracle.  Buckets bound window-partition size: at 100 TB pick
  n_buckets so each bucket is a few hundred MB; the hash order inside
  a bucket makes packing insensitive to input file layout.
* ``pack_greedy`` — classic greedy first-fit over the same
  deterministic hash order, one ``applyInPandas`` per bucket: no
  overshoot (documents larger than the budget get singleton
  sequences), denser packs, at the cost of a Python hop.  Correctness
  is pinned by pytest invariants (partition of the input; no sequence
  over budget except singletons; bit-stable across runs and
  partitionings) rather than a SQL oracle — greedy bin state is not
  expressible in one SQL pass.

Global ``seq_id`` is ``bucket * 2^40 + local_seq`` — collision-free
without any cross-bucket coordination (a bucket would need 2^40
sequences to overflow its slice).

Reference anchor: the hash-bucket + intra-bucket deterministic order
is the same salt/unit_sort shape the encoder uses for chunk layout
(engine/encoder.py); sampling.py's md5 bucketing supplies the
engine-portable order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKET_SHIFT = 40  # local sequence counter fits in 40 bits per bucket


def _order_cols(id_col: str, salt: str):
    # md5 of the id (same engine-portable construction as
    # operators/sampling.py): deterministic, uniform, oracle-matching
    # via DuckDB md5(); the id disambiguates md5 ties (none in
    # practice, but the order must be total for determinism).
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("\x1f" + salt)))
    return [h.alias("_ord"), F.col(id_col)]


def pack_by_cumsum(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Offset packing: one shuffle, pure Catalyst, SQL-oracled.

    Returns the input columns plus ``bucket int, seq_id long,
    seq_offset long`` (``seq_offset`` = tokens preceding this document
    inside its sequence — the trainer's concat offset).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 1 <= n_buckets <= (1 << 20):
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    ordc = _order_cols(id_col, salt)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(n_buckets),
    ).cast("int")
    w = Window.partitionBy("_bucket").orderBy(ordc[0], F.col(id_col))
    cum = F.sum(F.col(size_col)).over(w)
    out = (
        df.withColumn("_bucket", bucket)
        .withColumn("_ord", ordc[0])
        .withColumn("_cum", cum)
        .withColumn(
            "_seq_local",
            F.floor((F.col("_cum") - F.col(size_col)) / F.lit(budget)).cast("long"),
        )
    )
    return out.select(
        *df.columns,
        F.col("_bucket").alias("bucket"),
        (
            F.col("_bucket").cast("long") * F.lit(1 << _BUCKET_SHIFT)
            + F.col("_seq_local")
        ).alias("seq_id"),
        (
            F.col("_cum")
            - F.col(size_col)
            - F.col("_seq_local") * F.lit(budget)
        ).cast("long").alias("seq_offset"),
    )


def pack_greedy(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Greedy first-fit packing per hash bucket (no overshoot).

    Documents are visited in the bucket's deterministic hash order and
    placed into the first open sequence with room; a document larger
    than the budget becomes a singleton sequence.  Output adds
    ``bucket int, seq_id long, seq_tokens long`` (``seq_tokens`` =
    final token total of the document's sequence).
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ordc = _order_cols(id_col, salt)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(n_buckets),
    ).cast("int")
    src = df.withColumn("_bucket", bucket).withColumn("_ord", ordc[0])
    fields = ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in src.schema)
    out_schema = f"{fields}, seq_local long, seq_tokens long"

    bshift = _BUCKET_SHIFT
    id_name, size_name = id_col, size_col

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", id_name], kind="mergesort").reset_index(
            drop=True
        )
        open_seqs: list[int] = []  # remaining room per open sequence
        assign: list[int] = []
        sizes = pdf[size_name].astype("int64").tolist()
        for sz in sizes:
            placed = -1
            for i, room in enumerate(open_seqs):
                if sz <= room:
                    placed = i
                    break
            if placed < 0:
                open_seqs.append(budget)
                placed = len(open_seqs) - 1
            open_seqs[placed] -= sz
            assign.append(placed)
        pdf["seq_local"] = pd.Series(assign, dtype="int64")
        totals = pdf.groupby("seq_local")[size_name].transform("sum")
        pdf["seq_tokens"] = totals.astype("int64")
        return pdf

    packed = src.groupBy("_bucket").applyInPandas(_pack, out_schema)
    return packed.select(
        *df.columns,
        F.col("_bucket").alias("bucket"),
        (
            F.col("_bucket").cast("long") * F.lit(1 << bshift) + F.col("seq_local")
        ).alias("seq_id"),
        F.col("seq_tokens"),
    )
