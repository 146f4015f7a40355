"""Z-order (Morton-curve) multi-column ingest clustering.

``unit_sort=True`` tiles chunk [min,max] ranges disjointly along ONE
sort key; a query on any other column still sees every chunk's full
range. Z-ordering interleaves the bits of several columns' bucket
ranks into one sort key, so chunks become ~hyper-rectangles in the
multi-dimensional key space and range predicates on ANY of the z
columns prune chunks — the Delta OPTIMIZE ZORDER BY / Iceberg
sort-order rewrite analogue, built from plain Catalyst expressions
(shiftright/bitwiseAND/shiftleft — no UDF in the hot path).

Bucketing is linear between per-column [p0.5, p99.5] quantile clips
(one approxQuantile pass over just the z columns — column-pruned, cheap
relative to the encode itself; at 100 TB reuse known bounds via the
``bounds`` argument instead). Linear bucketing keeps range-locality,
which is exactly what chunk min/max pruning consumes; heavy outliers
are absorbed by the clip. NULLs rank as bucket 0.

No new read path is needed: pruning falls out of the per-chunk
min/max stats every column already has — ``filter_decode_pred`` with a
box predicate simply keeps fewer chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..codecs import typemap
from .encoder import encode

_Z_NUMERIC = typemap.INT_DTYPES | typemap.FLOAT_DTYPES | {
    "date", "timestamp", "timestamp_ntz",
}


def zorder_key(
    df: DataFrame,
    zorder_cols: list[str],
    n_bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
):
    """-> Column: the interleaved Morton key for ``zorder_cols``.

    ``bounds`` maps column -> (lo, hi) clip bounds in double space;
    missing entries are estimated with one approxQuantile pass."""
    if len(zorder_cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_cols for one)")
    if n_bits * len(zorder_cols) > 63:
        raise ValueError(f"n_bits={n_bits} x {len(zorder_cols)} cols exceeds 63 bits")
    dtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in zorder_cols:
        if c not in dtypes:
            raise ValueError(f"unknown zorder column {c!r}")
        if dtypes[c] not in _Z_NUMERIC and not typemap.is_decimal(dtypes[c]):
            raise TypeError(
                f"zorder column {c!r} has non-orderable-numeric type "
                f"{dtypes[c]} (strings have no linear bucket space; hash-"
                "cluster them via partition_cols instead)"
            )
    bounds = dict(bounds or {})
    missing = [c for c in zorder_cols if c not in bounds]
    if missing:
        qs = df.select(
            *[F.col(f"`{c}`").cast("double").alias(f"q{i}") for i, c in enumerate(missing)]
        ).approxQuantile([f"q{i}" for i in range(len(missing))], [0.005, 0.995], 0.001)
        for c, q in zip(missing, qs or [[]] * len(missing)):
            # approxQuantile returns [] for an all-NULL column: no
            # ordering information — degenerate bounds put every row in
            # bucket 0 (same as a constant column)
            bounds[c] = (q[0], q[1]) if len(q) == 2 else (0.0, 0.0)

    nb = 1 << n_bits
    k = len(zorder_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(zorder_cols):
        lo, hi = bounds[c]
        x = F.col(f"`{c}`").cast("double")
        if hi > lo:
            frac = (x - F.lit(float(lo))) / F.lit(float(hi - lo))
            b = F.floor(frac * nb).cast("long")
            b = F.least(F.greatest(b, F.lit(0)), F.lit(nb - 1))
        else:
            b = F.lit(0).cast("long")
        b = F.coalesce(b, F.lit(0))  # NULL -> lowest bucket
        for i in range(n_bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_encode(
    df: DataFrame,
    zorder_cols: list[str],
    n_bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
    z_col: str = "__z",
    **encode_kwargs,
) -> DataFrame:
    """Encode ``df`` clustered along the Morton curve of ``zorder_cols``.

    The z key is materialized as column ``z_col`` and rides the chunk
    table (one heavily-RLE'd long column — negligible bytes; project it
    away at decode). ``sort_cols``/``unit_sort`` are fixed by this
    function; every other encode parameter passes through."""
    if "sort_cols" in encode_kwargs or "unit_sort" in encode_kwargs:
        raise ValueError("zorder_encode owns sort_cols/unit_sort")
    z = zorder_key(df, zorder_cols, n_bits=n_bits, bounds=bounds)
    return encode(
        df.withColumn(z_col, z),
        sort_cols=[z_col],
        unit_sort=True,
        **encode_kwargs,
    )
