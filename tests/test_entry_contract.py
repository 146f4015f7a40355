"""Simulate the driver's correctness gate: every queries() entry vs its
oracle_sql() via DuckDB — row count, column names, order-insensitive
value multiset (the cross-implementation oracle, SURVEY.md §5.4)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(val):
    import datetime
    import math

    if val is None:
        return "<null>"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6g}"
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    try:  # Decimal
        import decimal

        if isinstance(val, decimal.Decimal):
            return f"{float(val):.6g}"
    except Exception:
        pass
    return str(val)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for row in rows:
        key = tuple(_canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r["n_mismatched"] == 0
    assert r["n_src"] == r["n_decoded"] == r["n_matched"]


def test_every_query_has_callable_and_most_have_oracles():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
    # at most a small number of rows-only (oracle-less) queries
    assert len(set(qs) - set(os_)) <= max(2, len(qs) // 4)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(df.columns) == sorted(duck_cols), (df.columns, duck_cols)
    assert len(spark_rows) == len(duck_rows), (len(spark_rows), len(duck_rows))
    ms_s = _multiset(spark_rows, df.columns)
    ms_d = _multiset(duck_rows, duck_cols)
    if ms_s != ms_d:
        only_s = {k: v for k, v in ms_s.items() if ms_d.get(k) != v}
        only_d = {k: v for k, v in ms_d.items() if ms_s.get(k) != v}
        raise AssertionError(
            f"value multiset mismatch for {name}:\n"
            f"  spark-only (3): {list(only_s.items())[:3]}\n"
            f"  duck-only  (3): {list(only_d.items())[:3]}"
        )


def test_driver_window_contains_the_risky_queries():
    """The correctness driver checks only the FIRST 50 queries() entries.
    Pin that every newest/riskiest query AND the curated core sit inside
    that window (the round-4 failure mode: 37 queries appended past it,
    zero driver-verified rows; then a round-5 off-by-one pushed a curated
    query to slot 51). Rotated out, each holding a round-4 driver-green
    row and replica+pytest coverage: encoded_group_sum (when
    ivfpq_refine_chunks landed), roundtrip_full and datasource_projection
    (when decontaminate_docs / pack_sequences landed — roundtrip_sha
    value-checks the same rows, the poisoned-payload test pins source
    projection pruning), weighted_sample (when mix_corpus_docs landed —
    the weighted threshold is a one-line variant of the md5-bucket
    membership the mixing query exercises with derived fractions)."""
    import __spark_entry__ as e

    names = list(e.queries())
    window = set(names[:50])
    must_be_inside = [
        # round-4/5 headline surfaces
        "pq_refine_topk", "pq_adc_topk", "ivfpq_topk", "ivfpq_persisted",
        "ivfpq_refine_chunks",
        "asof_attribution", "asof_broadcast", "range_join_bands",
        "interval_overlap", "sessionize_events", "gap_fill_hourly",
        "hash_split", "stratified_sample", "mix_corpus_docs",
        "trigram_pushdown", "continuous_aggregate", "encoded_dim_join",
        "encoded_topk", "encoded_quantiles", "pipeline_prepare",
        "decontaminate_docs", "pack_sequences",
        # curated always-verified core
        "roundtrip_sha", "projection", "filter_pushdown",
        "datasource_write_roundtrip", "datasource_filter",
        "roundtrip_nested", "evolution_projection",
        "merge_upsert", "roundtrip_after_delete",
    ]
    missing = [n for n in must_be_inside if n not in window]
    assert not missing, f"queries outside the driver's 50-slot window: {missing}"
    # the registry's own invariant: the first rotated-out entry sits at
    # EXACTLY slot 51 — adding a query without retiring one shifts this
    assert names.index("roundtrip_full") == 50, names[48:52]
