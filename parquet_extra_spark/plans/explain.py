"""Physical-plan introspection helpers.

The engine's scale story rests on claims about Catalyst plans (filters
pushed to the Parquet scan, projections pruned, small joins broadcast,
one Exchange per encode). These helpers turn executedPlan text into
checkable facts, so tests — and users tuning at 100 TB — can assert the
plan instead of eyeballing `.explain()`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the datasource scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", _plan_text(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names actually read from the datasource (post-pruning)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", _plan_text(df)):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def explain_summary(df: DataFrame) -> dict:
    plan = _plan_text(df)
    return {
        "n_exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "wholestage_codegen": "WholeStageCodegen" in plan,
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema(df),
    }
