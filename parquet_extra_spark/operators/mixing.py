"""Deterministic corpus mixing: down-sample domains to target shares.

The step between sampling and training that every pretraining pipeline
runs: "make the mix 50% en / 30% code / 20% web" over sources whose
natural sizes are nothing like that.  ``stratified_hash_sample``
(operators/sampling.py) applies per-domain fractions the caller already
knows; this module DERIVES them from target shares and the measured
per-domain mass, then applies them with the same md5-bucket membership —
so mixture membership inherits every property of the sampling family:
stable across runs/partitionings, auditable in ANSI SQL, nested under a
``scale`` knob (a half-size mix is a subset of the full mix).

Feasibility rule (no up-sampling, no duplication): the largest total
mass K reachable at EXACT proportions is bounded by the scarcest domain,
``K = min_d(mass_d / target_d)`` — that domain keeps fraction 1.0 and
every other domain keeps ``K * target_d / mass_d < 1``.  Domains not in
``targets`` are dropped (share 0).

100-TB notes: one |domains|-row aggregate (map-side combined) is the
only action; fractions are computed at the driver from that tiny frame
and embedded as literals, so the corpus itself sees a single map-only
filter — no shuffle, whole-stage codegen, engine-portable.

Float parity with the SQL oracle: fractions are derived with the exact
IEEE-754 expression order documented in :func:`mix_fractions` and
bounds use floor (never Python's banker-rounding ``round``), so a
DuckDB oracle computing the same expressions reproduces the bounds
bit-identically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .sampling import _BUCKETS, bucket_bound_filter

__all__ = ["mix_fractions", "mix_corpus"]


def mix_fractions(
    masses: dict[str, float], targets: dict[str, float], scale: float = 1.0
) -> dict[str, float]:
    """Per-domain keep fractions hitting ``targets`` exactly (no
    up-sampling).

    ``masses``: domain -> available mass (row count or token sum).
    ``targets``: domain -> target share, each > 0, summing to 1.
    ``scale``: shrink the whole mix to ``scale`` of the feasible maximum
    (0 < scale <= 1); samples stay NESTED across scales.

    Expression order (mirrored by SQL oracles, keep in sync):
    ``K = min_d(mass_d / target_d)``; a BINDING domain (one whose
    ``mass_d / target_d == K`` — the same double comparison in SQL)
    keeps base fraction exactly 1.0, everything else
    ``min(1.0, K * target_d / mass_d)``; then ``frac_d = min(1.0,
    scale * base_d)``.  The explicit binding-domain case exists because
    ``(m/t) * t / m`` is not IEEE-guaranteed to be 1.0 — without it a
    0.9999999999999999 base would floor to bucket bound 9999 and
    silently drop ~0.01% of the scarcest domain.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total}")
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"scale must be in (0,1], got {scale}")
    missing = [d for d in targets if masses.get(d, 0) <= 0]
    if missing:
        raise ValueError(
            f"domains with zero mass cannot reach a positive share: {missing}"
        )
    for d, t in targets.items():
        if t <= 0:
            raise ValueError(f"target share for {d!r} must be > 0, got {t}")
    k = min(masses[d] / targets[d] for d in targets)
    base = {
        d: 1.0
        if masses[d] / targets[d] == k
        else min(1.0, k * targets[d] / masses[d])
        for d in targets
    }
    return {d: min(1.0, scale * base[d]) for d in targets}


def mix_corpus(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    targets: dict[str, float],
    *,
    weight_col: str | None = None,
    salt: str = "",
    scale: float = 1.0,
) -> DataFrame:
    """Down-sample ``df`` so the listed domains appear at their target
    shares; unlisted domains are dropped.

    ``weight_col=None`` balances ROW counts — proportions are then exact
    up to hash granularity (each domain's keep set is a uniform hash
    slice).  ``weight_col="n_tokens"`` balances that column's SUM
    (token-weighted mixing): the keep decision stays per-row uniform, so
    the weighted proportions hold in expectation — tight at corpus
    scale, approximate on small domains.  Use integer weight columns:
    integer sums aggregate exactly on any engine, keeping the derived
    fractions bit-reproducible for the SQL audit.

    Membership is ``hash_bucket(id) < floor(frac_d * 10000)`` — a pure
    function of (id, salt) given the corpus, auditable in DuckDB via
    ``oracle_bucket_sql`` and the CTE mirroring :func:`mix_fractions`.
    NULL ids drop (NULL-propagating bucket), NULL domains drop (no
    target row matches).
    """
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    rows = (
        df.filter(F.col(domain_col).isin(list(targets)))
        .groupBy(domain_col)
        .agg(w.cast("double").alias("m"))
        .collect()
    )
    # r[1] is None when every row of a listed domain has a NULL weight —
    # treat that as zero mass so mix_fractions raises its ValueError
    # instead of a TypeError
    masses = {r[0]: (r[1] or 0) for r in rows}
    for d in targets:
        masses.setdefault(d, 0)
    fracs = mix_fractions(masses, targets, scale)
    bounds = {d: math.floor(f * _BUCKETS) for d, f in fracs.items()}
    # default_bound=0: unlisted / NULL domains never keep (bucket >= 0)
    return bucket_bound_filter(df, id_col, domain_col, bounds, salt=salt)
