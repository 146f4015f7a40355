"""Temporal relational operators: as-of join, range join, sessionization.

Spark lacks these as built-ins; each is expressed as a composition of
existing DataFrame operators so Catalyst/Tungsten keep the whole plan
JVM-side (no Python in the hot path):

* as-of join — the union+window formulation: tag both inputs, union,
  and carry the most recent right-side row forward with
  ``last(struct, ignorenulls=True)`` over ``(key ORDER BY t, side)``.
  One shuffle on the key and an in-partition sort — exactly the cost
  profile of a sort-merge join, with no row explosion and O(1) state
  per partition row.  This is the standard large-scale formulation
  (same shape as Flink's event-time temporal join); a pairwise
  ``l.t >= r.t`` theta-join would be quadratic per key.
* range join (point-in-interval) — bucketize: each interval is exploded
  to the fixed-width buckets it overlaps, each point maps to exactly
  one bucket, and the candidate pairs come from an equi-join on
  ``(bucket [, key])`` followed by the exact ``lo <= p < hi`` recheck.
  Turns an unplannable theta-join into a shuffle-partitionable
  equi-join; interval replication is bounded by ``max_buckets_per_range``.
* sessionization — gap-based session ids via ``lag`` + running sum over
  ``(key ORDER BY t, tiebreak)``: one shuffle on the key, two window
  passes over the same sort (Catalyst reuses the sort), no state beyond
  the running counter.

Reference parity note: the reference engine (nevillelyh/parquet-extra)
has no temporal operators — this module is part of the Spark-native
extension surface (SURVEY.md §2-ext), with DuckDB ``ASOF JOIN`` /
window SQL as the correctness oracle.

100-TB notes: every operator here shuffles each input exactly once on
its key (or bucket); skewed keys are AQE's problem (skew-join splitting
applies because these are plain Exchange+Sort plans). The as-of window
function is not rows-unbounded-buffering: ``last`` over
``rowsBetween(unboundedPreceding, currentRow)`` is a running
accumulator, so Tungsten's window operator streams it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "asof_join",
    "asof_join_broadcast",
    "range_join",
    "interval_join",
    "sessionize",
    "session_windows",
    "gap_fill",
]

_SIDE = "__asof_side"
_T = "__asof_t"
_MATCH = "__asof_match"


def _bounded_hi(b_lo: Column, b_hi: Column, cap: int) -> Column:
    """In-plan replication guard: the high bucket, or ``raise_error`` at
    EXECUTION time if an interval would explode to more than ``cap``
    buckets.  Runs on the rows already flowing into the explode — no
    separate validation scan of the ranges table (the pre-scan cost a
    full extra action per call at 100 TB)."""
    # Bucket count in DOUBLE, not int64: corrupt sentinel bounds (lo
    # near Long.MIN, hi near Long.MAX) would wrap an int64 subtraction
    # negative and slip through the inverted-interval branch as a
    # silent drop (or throw a raw overflow error under ANSI) instead of
    # hitting the descriptive raise. Double keeps the sign of any
    # span; its 2^53 rounding only blurs spans within a few ULPs of
    # the lo==hi boundary at astronomically large magnitudes, where
    # the BETWEEN recheck still keeps results exact.
    nb = b_hi.cast("double") - b_lo.cast("double") + F.lit(1.0)
    # NULL bounds: nb is NULL, the guard passes b_hi through, and
    # explode(sequence(NULL, ...)) drops the row — same silent-skip the
    # eager max() guard gave NULL-bounded intervals.
    # INVERTED intervals (hi < lo, nb <= 0) drop the same way: they can
    # match no point under the BETWEEN recheck, but Spark's
    # sequence(lo, hi) with hi < lo would otherwise generate a
    # DESCENDING |nb|-element array — a negative nb passes `nb <= cap`
    # and a single corrupt row (lo=1e9, hi=0) would explode ~1e9 rows
    # past the cap the guard exists to enforce.
    return F.when(nb < F.lit(1.0), F.lit(None).cast("long")).when(
        nb.isNull() | (nb <= F.lit(float(cap))), b_hi
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("an interval spans "),
                nb.cast("decimal(38,0)").cast("string"),
                F.lit(
                    f" buckets > max_buckets_per_range={cap};"
                    " raise bucket_width or the cap"
                ),
            )
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    right_on: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    how: str = "left",
    allow_exact_matches: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to the nearest right row at-or-before (backward)
    or at-or-after (forward) its timestamp, per key.

    ``allow_exact_matches=False`` makes the comparison strict
    (``r.t < l.t`` / ``r.t > l.t``), as in pandas ``merge_asof`` —
    planned by flipping the union tiebreak so left rows sort BEFORE
    right rows at equal timestamps.

    Matches DuckDB ``ASOF [LEFT] JOIN ... ON l.k = r.k AND l.t >= r.t``
    (backward) / ``l.t <= r.t`` (forward), which is the oracle used by
    the ``asof_join*`` entry queries.  Ties at equal timestamps match
    (inclusive), as in DuckDB and pandas ``merge_asof``.

    The right side must be unique per ``(on..., right_time)`` for the
    result to be well-defined; pre-aggregate (e.g. ``max_by``) if not.

    ``tolerance``: maximum allowed ``|l.t - r.t|``, same type algebra as
    the time columns (for timestamps pass e.g.
    ``F.expr("INTERVAL 1 HOUR")``); matches farther away become NULL
    (how="left") or are dropped (how="inner").

    Plan shape: Union -> Exchange(hashpartitioning(on)) -> Sort(t, side)
    -> Window(last ignorenulls) -> Filter.  One shuffle total.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_on is not None:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        if len(rkeys) != len(keys):
            raise ValueError("right_on must name one column per `on` key")
        for rk, k in zip(rkeys, keys):
            if rk != k:
                right = right.withColumnRenamed(rk, k)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")

    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    # the matched right timestamp always rides along (needed for tolerance,
    # and generally useful); payload NULLs inside the struct survive the
    # ignorenulls-last because the struct itself is non-null for right rows.
    rstruct = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias(_MATCH),
    )
    # right rows with NULL time can never match (SQL comparison is NULL);
    # drop them so their non-null match struct can't be inherited.
    # Likewise NULL join keys: equi-join semantics are null-UNSAFE
    # (NULL = NULL is NULL), but Window.partitionBy groups NULLs
    # together — dropping null-key right rows here means a null-key
    # left row's partition holds only left rows, so it inherits no
    # match, exactly matching asof_join_broadcast and the DuckDB
    # ASOF JOIN oracle.
    right = right.where(F.col(right_time).isNotNull())
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    rhs = right.select(
        *[
            (
                F.col(c).cast(left.schema[c].dataType)
                if c in keys
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left.columns
        ],
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SIDE),
        rstruct.alias(_MATCH),
    )

    unioned = lhs.unionByName(rhs)

    # nulls FIRST in both directions: a left row with NULL time sorts
    # before every right row and inherits no match (SQL: NULL time
    # matches nothing). Spark's desc default is nulls LAST — explicit.
    t_order = (
        F.col(_T).asc_nulls_first()
        if direction == "backward"
        else F.col(_T).desc_nulls_first()
    )
    # inclusive: right (side 0) sorts before left at equal t, so equal
    # timestamps match; strict: left first, so they don't
    side_order = (
        F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _MATCH, F.last(_MATCH, ignorenulls=True).over(w)
    ).where(F.col(_SIDE) == 1)

    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        dist = (
            F.col(_T) - F.col(f"{_MATCH}.__rt")
            if direction == "backward"
            else F.col(f"{_MATCH}.__rt") - F.col(_T)
        )
        matched = matched.withColumn(
            _MATCH, F.when(dist <= tol, F.col(_MATCH))
        )

    if how == "inner":
        matched = matched.where(F.col(_MATCH).isNotNull())

    taken = set(left.columns)
    out_cols = [F.col(c) for c in left.columns]
    rt_name = right_time + (suffix if right_time in taken else "")
    out_cols.append(F.col(f"{_MATCH}.__rt").alias(rt_name))
    for c in right_cols:
        out_cols.append(
            F.col(f"{_MATCH}.{c}").alias(c + (suffix if c in taken else ""))
        )
    return matched.select(*out_cols)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    right_on: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    how: str = "left",
    allow_exact_matches: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """asof_join for a dim-sized right table, with ZERO shuffle of left.

    The union+window formulation (``asof_join``) shuffles the left table
    on the key — correct at any size, but when the right side is a small
    dimension (price marks, config changelog, slowly-changing state)
    that shuffle moves the 100-TB side for nothing.  Here the right side
    collapses to one sorted ``array<struct>`` per key (a groupBy on the
    SMALL table only), broadcast-hash-joins onto left (no left Exchange),
    and the match is a JVM-side ``aggregate(filter(arr, t<=lt), ...)``
    reduce over the per-key array — O(|right rows for the key|) per left
    row, entirely inside whole-stage codegen.

    Same semantics as ``asof_join`` (inclusive ties, tolerance, how,
    direction); identical results are pinned by tests.  Use when right
    is broadcast-sized AND per-key right counts are modest (the per-row
    scan is linear in them); otherwise use ``asof_join``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_on is not None:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        if len(rkeys) != len(keys):
            raise ValueError("right_on must name one column per `on` key")
        for rk, k in zip(rkeys, keys):
            if rk != k:
                right = right.withColumnRenamed(rk, k)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]

    rstruct = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rdim = (
        right.where(F.col(right_time).isNotNull())
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(rstruct),
                # compare on time only: payload columns need not be orderable
                lambda x, y: F.when(x["__rt"] < y["__rt"], -1)
                .when(x["__rt"] > y["__rt"], 1)
                .otherwise(0),
            ).alias("__arr")
        )
    )

    joined = left.join(F.broadcast(rdim), on=keys, how="left")

    lt = F.col(left_time)
    if direction == "backward":
        cand = F.filter(
            F.col("__arr"),
            (lambda x: x["__rt"] <= lt)
            if allow_exact_matches
            else (lambda x: x["__rt"] < lt),
        )
        # candidates are time-sorted ascending: the match is the LAST
        best = F.element_at(cand, -1)
    else:
        cand = F.filter(
            F.col("__arr"),
            (lambda x: x["__rt"] >= lt)
            if allow_exact_matches
            else (lambda x: x["__rt"] > lt),
        )
        best = F.element_at(cand, 1)
    joined = joined.withColumn(
        _MATCH, F.when(F.size(cand) > 0, best)
    )

    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        dist = (
            lt - F.col(f"{_MATCH}.__rt")
            if direction == "backward"
            else F.col(f"{_MATCH}.__rt") - lt
        )
        joined = joined.withColumn(
            _MATCH, F.when(dist <= tol, F.col(_MATCH))
        )
    if how == "inner":
        joined = joined.where(F.col(_MATCH).isNotNull())

    taken = set(left.columns)
    out_cols = [F.col(c) for c in left.columns]
    rt_name = right_time + (suffix if right_time in taken else "")
    out_cols.append(F.col(f"{_MATCH}.__rt").alias(rt_name))
    for c in right_cols:
        out_cols.append(
            F.col(f"{_MATCH}.{c}").alias(c + (suffix if c in taken else ""))
        )
    return joined.select(*out_cols)


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    on: list[str] | None = None,
    bucket_width: float | int,
    how: str = "inner",
    closed: str = "both",
    max_buckets_per_range: int = 4096,
) -> DataFrame:
    """Join points to the intervals containing them (point-in-interval).

    Equivalent to ``points JOIN ranges ON p BETWEEN lo AND hi [AND keys]``
    but planned as an equi-join: intervals are exploded to the
    ``bucket_width``-wide buckets they overlap, points map to one bucket,
    and the exact bound check runs after the equi-join.  Each point falls
    in exactly one bucket, so no dedup is needed.

    ``closed``: "both" (lo <= p <= hi), "left" (lo <= p < hi),
    "right" (lo < p <= hi), "neither".

    ``bucket_width`` trades replication (each interval appears
    ceil(span/width)+1 times) against candidate-filter selectivity; pick
    it near the median interval span.  Ranges whose span would exceed
    ``max_buckets_per_range`` buckets raise rather than silently explode
    a task (same guard idiom as dedup.allow_quadratic).

    how="left" keeps match-less points with NULL range columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    keys = list(on or [])
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    b_lo = F.floor(F.col(lo_col) / w)
    b_hi = F.floor(F.col(hi_col) / w)
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(b_lo, _bounded_hi(b_lo, b_hi, max_buckets_per_range))
        ),
    )
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / w))

    lo_ok = (
        F.col(point_col) >= F.col(lo_col)
        if closed in ("both", "left")
        else F.col(point_col) > F.col(lo_col)
    )
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if closed in ("both", "right")
        else F.col(point_col) < F.col(hi_col)
    )
    cond = [p["__bucket"] == r["__bucket"]] + [p[k] == r[k] for k in keys]
    joined = p.join(r, cond, "inner").where(lo_ok & hi_ok)

    range_out = [c for c in ranges.columns if c not in keys]
    out = joined.select(
        *[p[c] for c in points.columns], *[r[c] for c in range_out]
    )
    if how == "left":
        # the anti-join must be null-SAFE per column: a matched point row
        # containing a NULL would never anti-join away under `=` (NULL = NULL
        # is NULL) and would be emitted twice — once matched, once padded.
        # EqualNullSafe is still an equi-join predicate, so this stays a
        # plain hash/sort-merge anti-join.
        matched_keys = (
            out.select(*[F.col(c) for c in points.columns])
            .distinct()
            .alias("__mk")
        )
        pts = points.alias("__pts")
        anti = None
        for c in points.columns:
            e = F.col(f"__pts.`{c}`").eqNullSafe(F.col(f"__mk.`{c}`"))
            anti = e if anti is None else (anti & e)
        unmatched = pts.join(matched_keys, anti, "left_anti")
        for c in range_out:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(ranges.schema[c].dataType)
            )
        out = out.unionByName(unmatched)
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    *,
    on: list[str] | None = None,
    bucket_width: float | int,
    suffix: str = "_r",
    max_buckets_per_range: int = 4096,
) -> DataFrame:
    """Join interval pairs that overlap: ``l.lo <= r.hi AND r.lo <= l.hi``
    (closed bounds), planned as a bucketed equi-join.

    Both sides explode to the fixed-width buckets they overlap; a
    candidate pair shares every bucket its intersection covers, so to
    emit each pair EXACTLY ONCE the pair is "owned" by the single bucket
    containing ``max(l.lo, r.lo)`` — the intersection's left edge (the
    standard one-owner dedup for symmetric spatial/interval joins; no
    distinct pass, no dedup shuffle).

    Interval replication per side is bounded by ``max_buckets_per_range``
    (raise ``bucket_width`` for long intervals).  Overlapping-key columns
    on the right get ``suffix``.
    """
    l_lo, l_hi = left_bounds
    r_lo, r_hi = right_bounds
    keys = list(on or [])
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        b_lo = F.floor(F.col(lo) / w)
        b_hi = F.floor(F.col(hi) / w)
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    b_lo, _bounded_hi(b_lo, b_hi, max_buckets_per_range)
                )
            ),
        )

    le = _explode(left, l_lo, l_hi)
    re = _explode(right, r_lo, r_hi)

    cond = [le["__bucket"] == re["__bucket"]] + [le[k] == re[k] for k in keys]
    overlap = (le[l_lo] <= re[r_hi]) & (re[r_lo] <= le[l_hi])
    owner = le["__bucket"] == F.floor(F.greatest(le[l_lo], re[r_lo]) / w)
    joined = le.join(re, cond, "inner").where(overlap & owner)

    taken = set(left.columns)
    out = [le[c] for c in left.columns]
    for c in right.columns:
        if c in keys:
            continue
        out.append(re[c].alias(c + (suffix if c in taken else "")))
    return joined.select(*out)


def sessionize(
    events: DataFrame,
    key: str | list[str],
    time_col: str,
    gap: Column | int | float,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session numbers per key.

    A new session starts at the first event per key and whenever the
    time since the previous event exceeds ``gap`` (same type algebra as
    ``time_col``: for timestamps pass ``F.expr("INTERVAL 30 MINUTES")``).
    Adds ``session_n`` (1-based, per key, in time order).

    One shuffle on the key; the lag and the running sum share one sort.
    Expressible in ANSI SQL (the oracle), unlike Spark's built-in
    ``session_window`` which only yields windowed aggregates.
    """
    keys = [key] if isinstance(key, str) else list(key)
    gap_c = gap if isinstance(gap, Column) else F.lit(gap)
    order = [F.col(time_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    is_new = (
        F.when(F.lag(time_col).over(w).isNull(), 1)
        .when(F.col(time_col) - F.lag(time_col).over(w) > gap_c, 1)
        .otherwise(0)
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_n", F.sum(is_new).over(wrun))


def gap_fill(
    df: DataFrame,
    key: str | list[str],
    bucket_col: str,
    step: int,
    *,
    fill: dict[str, float | int] | None = None,
    locf: list[str] | None = None,
    span: str = "per_key",
) -> DataFrame:
    """Densify a bucketed series: emit a row for EVERY step-spaced bucket
    between each key's min and max (``span="per_key"``) or the global
    min/max (``span="global"``), filling absent buckets with ``fill``
    values (default NULL) — the hypertable ``time_bucket_gapfill`` shape.

    ``fill`` gives constants per column; ``locf`` columns instead carry
    the last observed value forward per key (running last-ignorenulls
    over the dense axis — leading gaps stay NULL), the
    ``locf()``/``interpolate`` half of the gapfill contract.

    ``bucket_col`` must be integral and step-aligned (e.g. epoch seconds
    from ``unix_timestamp(date_trunc(...))``); alignment is validated.
    Plan: the dense axis comes from ``sequence()`` per key (one row per
    key -> explode), joined back to the sparse data — the generated side
    carries (key, bucket) only, so the shuffle is proportional to the
    DENSE bucket count, never to payload width.  Skew = a key whose span
    dwarfs the others; AQE's skew-join split applies since this is a
    plain Exchange+SortMergeJoin.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if span not in ("per_key", "global"):
        raise ValueError(f"span must be per_key|global, got {span!r}")
    if step <= 0:
        raise ValueError("step must be positive")

    # alignment is validated IN-PLAN on the rows already flowing into the
    # bounds/join (no separate pre-scan action): any misaligned non-null
    # bucket raises at execution via raise_error.
    df = df.withColumn(
        bucket_col,
        F.when(
            F.col(bucket_col).isNull() | (F.col(bucket_col) % step == 0),
            F.col(bucket_col),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"{bucket_col} values are not aligned to step="),
                    F.lit(str(step)),
                    F.lit(" (offending value: "),
                    F.col(bucket_col).cast("string"),
                    F.lit(")"),
                )
            )
        ),
    )

    if span == "per_key":
        bounds = df.groupBy(*keys).agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
    else:
        g = df.agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
        bounds = df.select(*keys).distinct().crossJoin(F.broadcast(g))

    dense = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    out = dense.join(df, on=[*keys, bucket_col], how="left")
    for c, v in (fill or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    if locf:
        wl = (
            Window.partitionBy(*keys)
            .orderBy(F.col(bucket_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in locf:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(wl))
    return out


def session_windows(
    events: DataFrame,
    key: str | list[str],
    time_col: str,
    gap: Column | int | float,
    *,
    tiebreak: str | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Collapse sessionized events to one row per (key..., session_n)
    with start/end/count plus caller aggregates."""
    keys = [key] if isinstance(key, str) else list(key)
    base = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    return (
        sessionize(events, keys, time_col, gap, tiebreak=tiebreak)
        .groupBy(*keys, "session_n")
        .agg(*base, *(aggs or []))
    )
