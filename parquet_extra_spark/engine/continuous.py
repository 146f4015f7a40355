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
    ) -> None:
        if isinstance(keys, str) or not keys:
            raise ValueError("keys must be a non-empty list of column names")
        self.source_dir = source_dir
        self.state_dir = state_dir
        self.keys = list(keys)
        self.aggs = list(aggs)
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

    def refresh(self, spark: SparkSession) -> dict:
        """Consume every not-yet-consumed manifest run; returns
        {"new_runs": n, "version": v}. No new runs = no-op (state and
        pointer untouched)."""
        cur = self._current()
        consumed = set(cur["consumed_run_ids"])
        manifest = load_manifest(spark, self.source_dir)
        runs = [
            r["run_id"]
            for r in manifest.select("run_id").distinct().collect()
        ]
        new_runs = sorted(set(runs) - consumed)
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
        tmp = os.path.join(self.state_dir, _CURRENT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": next_v,
                    "consumed_run_ids": sorted(consumed | set(new_runs)),
                    "updated_at": time.time(),
                    "keys": self.keys,
                    "aggs": self.aggs,
                },
                f,
            )
        os.replace(tmp, os.path.join(self.state_dir, _CURRENT))
        return {"new_runs": len(new_runs), "version": next_v}

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
