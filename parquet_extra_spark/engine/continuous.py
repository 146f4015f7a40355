"""Continuous aggregate: an incrementally-maintained GROUP BY over a
checkpointed chunk table — the materialized-view / hypertable
continuous-aggregate shape, maintained WITHOUT re-reading consumed data
and without ever decoding the value columns at row scale.

How it composes the existing pieces:

* consumption is by RUN-ID SET (the same order-independent offsets the
  chunktable stream source uses): each refresh aggregates exactly the
  manifest runs not yet consumed — immune to the wall-clock frontier
  trap (a concurrent writer committing "into the past" is still picked
  up; ADVICE round-3 item closed for streams, applied here too).
* each increment aggregates from codec structures
  (``group_agg_encoded``): dictionary codes + RLE runs produce one
  partial row per (chunk, group); the value columns never materialize
  per row.
* state is a tiny table of DECOMPOSABLE partials per group (count/sum
  re-sum, min/max re-extreme, avg = Σsum/Σcount), stored as parquet
  versions ``state_dir/v<N>`` with an atomic ``_CURRENT`` pointer:
  a new version is fully written BEFORE the pointer moves, so a crash
  mid-refresh leaves the old state intact and the re-run re-consumes
  the same increment exactly once (local-FS ``os.replace`` atomicity;
  on an object store use a conditional put for the pointer).

The merge shuffles STATE-sized data (|groups| rows), never source-sized
— at 100 TB a refresh costs the new runs' dictionaries plus a
kilobyte-scale merge.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpoint import _chunks_path, load_manifest
from .encoded_agg import group_agg_encoded

_CURRENT = "_CURRENT"

_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


class ContinuousAggregate:
    """Incrementally-maintained ``GROUP BY keys`` with
    count/sum/min/max/avg aggregates over an ``encode_to`` checkpoint.

    >>> ca = ContinuousAggregate(src_dir, state_dir, ["lang"],
    ...                          [("count", "*", "n"), ("avg", "n_chars", "m")])
    >>> ca.refresh(spark)   # consume new runs, merge partials
    >>> ca.result(spark)    # current aggregate as a DataFrame
    """

    def __init__(
        self,
        source_dir: str,
        state_dir: str,
        keys: list[str],
        aggs: list[tuple[str, str, str]],
        *,
        offset_compact_slack: float | None = None,
    ) -> None:
        if isinstance(keys, str) or not keys:
            raise ValueError("keys must be a non-empty list of column names")
        if offset_compact_slack is not None and offset_compact_slack <= 0:
            raise ValueError("offset_compact_slack must be > 0 seconds")
        self.source_dir = source_dir
        self.state_dir = state_dir
        self.keys = list(keys)
        self.aggs = list(aggs)
        # same trade as the chunktable stream source's offset compaction
        # (sources/chunk_datasource.py): with a slack, the consumed set is
        # stored as {frontier, ids newer than frontier} — state ∝ commit
        # rate × slack instead of growing one id per refresh forever. The
        # traded guarantee is identical (a run whose manifest row becomes
        # visible with committed_at already ≤ the advanced frontier is
        # treated as consumed); choose slack ≫ the longest commit stall.
        self.offset_compact_slack = offset_compact_slack
        seen = set()
        for fn, col, alias in self.aggs:
            if fn not in ("count", "sum", "min", "max", "avg"):
                raise ValueError(f"unsupported aggregate fn {fn!r}")
            if alias in seen or alias in self.keys:
                raise ValueError(f"duplicate/colliding alias {alias!r}")
            seen.add(alias)

    # ------------------------------------------------------------ state io

    def _current(self) -> dict:
        path = os.path.join(self.state_dir, _CURRENT)
        if not os.path.exists(path):
            return {"version": 0, "consumed_run_ids": []}
        with open(path) as f:
            return json.load(f)

    def _partial_specs(self) -> list[tuple[str, str, str]]:
        """Translate user aggs to decomposable partial columns."""
        specs: list[tuple[str, str, str]] = []
        for fn, col, alias in self.aggs:
            if fn == "avg":
                specs.append(("sum", col, f"__ps_{alias}"))
                specs.append(("count", col, f"__pc_{alias}"))
            else:
                specs.append((fn, col, f"__p_{alias}"))
        return specs

    # ------------------------------------------------------------- refresh

    def _run_times(self, manifest: DataFrame) -> dict[str, float]:
        """Committed run_id -> max committed_at, from the manifest."""
        return {
            r["run_id"]: r["t"]
            for r in manifest.groupBy("run_id")
            .agg(F.max("committed_at").alias("t"))
            .collect()
        }

    def _consumed_of(self, cur: dict, run_times: dict[str, float]) -> set[str]:
        """State -> the set of runs it marks consumed. Two forms, one
        rule (mirrors the stream source's offset decoding): a plain id
        list, or the compacted {frontier, ids newer than frontier} form
        where every run committed at-or-below the frontier counts as
        consumed implicitly — so state dirs survive switching the slack
        option on or off between refreshes."""
        base = set(cur["consumed_run_ids"])
        frontier = cur.get("frontier")
        if frontier is None:
            return base
        return base | {r for r, t in run_times.items() if t <= frontier}

    # ------------------------------------------------------------- refresh

    def refresh(self, spark: SparkSession) -> dict:
        """Consume every not-yet-consumed manifest run; returns
        {"new_runs": n, "version": v}. No new runs = no-op (state and
        pointer untouched).

        Raises ``ValueError`` when a LISTED consumed run has vanished from
        the manifest (an out-of-band rewrite — compaction / DELETE / MERGE
        materialized back over the checkpoint dir): the folded-in partials
        no longer describe the table, so refusing beats silently merging
        stale state — call :meth:`rebaseline` to rebuild. With slack
        compaction, rewrites of runs older than the stored frontier are
        undetectable (their ids are no longer listed); pick the slack
        accordingly or run strict.
        """
        cur = self._current()
        manifest = load_manifest(spark, self.source_dir)
        run_times = self._run_times(manifest)
        consumed = self._consumed_of(cur, run_times)
        vanished = sorted(set(cur["consumed_run_ids"]) - set(run_times))
        if vanished:
            raise ValueError(
                "consumed runs vanished from the manifest (checkpoint was "
                f"rewritten out-of-band): {vanished[:5]} — the folded-in "
                "partials are stale; call rebaseline() to rebuild the "
                "aggregate from the current table"
            )
        new_runs = sorted(set(run_times) - consumed)
        if not new_runs:
            return {"new_runs": 0, "version": cur["version"]}

        units = manifest.filter(F.col("run_id").isin(new_runs)).select(
            "part_key", "salt", "run_id"
        )
        chunks = spark.read.parquet(_chunks_path(self.source_dir))
        inc = chunks.join(
            F.broadcast(units), ["part_key", "salt", "run_id"], "left_semi"
        ).drop("run_id")

        specs = self._partial_specs()
        inc_partials = group_agg_encoded(inc, self.keys, specs)

        version = cur["version"]
        merged = inc_partials
        if version > 0:
            old = spark.read.parquet(
                os.path.join(self.state_dir, f"v{version}")
            )
            merge_aggs = []
            for fn, _, alias in self.aggs:
                if fn == "avg":
                    merge_aggs.append(F.sum(f"__ps_{alias}").alias(f"__ps_{alias}"))
                    merge_aggs.append(F.sum(f"__pc_{alias}").alias(f"__pc_{alias}"))
                else:
                    merge_aggs.append(
                        getattr(F, _MERGE[fn])(f"__p_{alias}").alias(f"__p_{alias}")
                    )
            merged = (
                old.unionByName(inc_partials)
                .groupBy(*self.keys)
                .agg(*merge_aggs)
            )

        next_v = version + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"v{next_v}")
        )
        self._write_pointer(consumed | set(new_runs), run_times, next_v)
        return {"new_runs": len(new_runs), "version": next_v}

    def _write_pointer(
        self, consumed: set[str], run_times: dict[str, float], next_v: int
    ) -> None:
        """Atomically advance ``_CURRENT`` (local-FS ``os.replace``; on an
        object store use a conditional put). With a slack, the consumed
        set compacts to {frontier, ids newer than frontier}."""
        state: dict = {
            "version": next_v,
            "updated_at": time.time(),
            "keys": self.keys,
            "aggs": self.aggs,
        }
        if self.offset_compact_slack is not None and run_times:
            frontier = max(run_times.values()) - self.offset_compact_slack
            state["frontier"] = frontier
            state["consumed_run_ids"] = sorted(
                r for r in consumed
                if run_times.get(r, float("inf")) > frontier
            )
        else:
            state["consumed_run_ids"] = sorted(consumed)
        tmp = os.path.join(self.state_dir, _CURRENT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, os.path.join(self.state_dir, _CURRENT))

    def rebaseline(self, spark: SparkSession) -> dict:
        """Rebuild the aggregate from the CURRENT table state, discarding
        every folded-in partial — the recovery path after an out-of-band
        checkpoint rewrite (compaction / DELETE / MERGE materialized over
        the source dir) that :meth:`refresh` refuses to merge across.

        Costs one full ``group_agg_encoded`` pass over the table (still
        dictionary-scale, never row-scale). The new full aggregate is
        written as the next version BEFORE the pointer moves, so a crash
        mid-rebaseline leaves the old state intact; versions stay
        monotone."""
        cur = self._current()
        manifest = load_manifest(spark, self.source_dir)
        run_times = self._run_times(manifest)
        units = manifest.select("part_key", "salt", "run_id")
        chunks = spark.read.parquet(_chunks_path(self.source_dir))
        full = chunks.join(
            F.broadcast(units), ["part_key", "salt", "run_id"], "left_semi"
        ).drop("run_id")
        merged = group_agg_encoded(full, self.keys, self._partial_specs())
        next_v = cur["version"] + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"v{next_v}")
        )
        self._write_pointer(set(run_times), run_times, next_v)
        return {"new_runs": len(run_times), "version": next_v}

    # -------------------------------------------------------------- result

    def result(self, spark: SparkSession) -> DataFrame:
        """Current aggregate. Raises ``ValueError`` before the first
        ``refresh()`` — there is no state version to read yet."""
        cur = self._current()
        if cur["version"] == 0:
            raise ValueError(
                "continuous aggregate has no state yet — call refresh()"
            )
        state = spark.read.parquet(
            os.path.join(self.state_dir, f"v{cur['version']}")
        )
        out = [F.col(f"`{k}`") for k in self.keys]
        for fn, _, alias in self.aggs:
            if fn == "avg":
                out.append(
                    F.when(
                        F.col(f"__pc_{alias}") > 0,
                        F.col(f"__ps_{alias}").cast("double")
                        / F.col(f"__pc_{alias}"),
                    ).alias(alias)
                )
            else:
                out.append(F.col(f"__p_{alias}").alias(alias))
        return state.select(*out)
