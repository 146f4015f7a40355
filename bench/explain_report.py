"""Physical-plan evidence report -> BENCH/EXPLAIN.md.

Captures `explain("formatted")` output plus plans/explain.py assertions
for the engine's load-bearing plans, so plan quality (one Exchange per
encode, broadcast joins on small dims, filters/projections pushed into
the parquet scan) is recorded as an auditable artifact rather than a
claim. Run: python bench/explain_report.py
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import parquet_extra_spark as pes
    from parquet_extra_spark.plans import explain_summary

    sections: list[tuple[str, str, str]] = []

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    enc_kw = dict(partition_cols=["lang", "source"], sort_cols=["doc_id"],
                  chunk_rows=4096, n_buckets=4, n_salts=2, num_partitions=8)
    chunks = pes.encode(docs, **enc_kw)
    sections.append((
        "encode (documents)",
        "ONE Exchange (the mandated clustering repartition) feeding the "
        "Arrow encode; no extra shuffle, no JVM row sort on wide columns.",
        formatted(chunks),
    ))

    # exchange-free lane: a hive-partitioned source (the Iceberg-table
    # layout) encodes with ZERO Exchange — source splits stream straight
    # into the encode UDF
    import shutil
    import tempfile

    hive_dir = tempfile.mkdtemp(prefix="explain_hive_")
    try:
        docs.write.mode("overwrite").partitionBy("lang").parquet(hive_dir)
        hive_src = spark.read.parquet(hive_dir).select(*docs.columns)
        ac_kw = {k: v for k, v in enc_kw.items() if k != "num_partitions"}
        ac_chunks = pes.encode(hive_src, assume_clustered=True, **ac_kw)
        ac_plan = formatted(ac_chunks)
        assert "Exchange" not in ac_plan, "assume_clustered plan must not shuffle"
    finally:
        shutil.rmtree(hive_dir, ignore_errors=True)
    sections.append((
        "encode assume_clustered (hive-partitioned source)",
        "ZERO Exchange: the source layout already groups the clustering "
        "key (lang=... dirs), so the plan reads file splits straight into "
        "the Arrow encode — the 100-TB lane for partitioned Iceberg "
        "tables and engine re-encodes.",
        ac_plan,
    ))

    sections.append((
        "decode with projection (doc_id, lang)",
        "Chunk rows of unrequested columns are filtered out BEFORE decode "
        "(columnar projection = a filter on the chunk table).",
        formatted(pes.decode(pes.encode(docs, **enc_kw), columns=["doc_id", "lang"])),
    ))

    cached = pes.encode(docs, **enc_kw).cache()
    cached.count()
    schema_cols = pes.schema_from_struct(docs.schema)
    colo = pes.decode(cached, schema_cols=schema_cols, colocated=True)
    colo_plan = formatted(colo)
    above = colo_plan.split("InMemoryTableScan")[0]
    sections.append((
        "co-located decode (no payload shuffle)",
        "Decode straight off the cached encode output: Sort is WITHIN "
        "partitions only — no Exchange moves payload bytes (the round-1 "
        "full-table shuffle is gone; at 100 TB this is the difference "
        "between decoding in place and shuffling 100 TB first). "
        f"Exchange-free above the cache scan: {'Exchange' not in above}.",
        colo_plan,
    ))

    pred = (pes.P.ge("n_chars", 150) & pes.P.eq("lang", "en")) | ~pes.P.isin(
        "source", ["src0", "src1"]
    )
    pruned_chunks = pes.prune_chunks(cached, pred, schema_cols)
    sections.append((
        "compound predicate pruning (chunk-stats skip)",
        "Cross-column AND/OR/NOT tree compiled to a per-chunk "
        "possible-verdict over pivoted stats; surviving chunk ids come "
        "back via a semi-join with NO forced broadcast hint — AQE "
        "broadcasts when the survivor set is actually small and falls "
        "back to a shuffled semi-join for unselective predicates (a "
        "forced F.broadcast of billions of surviving ids at 100 TB "
        "would OOM the driver).",
        formatted(pruned_chunks),
    ))

    sorted_chunks = pes.encode(
        docs, partition_cols=[], sort_cols=["source"], chunk_rows=64,
        n_buckets=1, n_salts=1, num_partitions=1, unit_sort=True,
    ).cache()
    psrc = pes.pushdown_stats_pred(
        sorted_chunks, pes.P.startswith("source", "src19"), schema_cols
    )
    sections.append((
        "prefix predicate pruning (LIKE 'p%' as a stats range)",
        "P.startswith compiles to the half-open range [p, successor(p)) "
        "over string chunk stats — sound under the truncated-min / "
        "unbounded-max storage rules — then the exact startswith recheck "
        "runs on decoded rows. The same translation serves Spark's "
        "StringStartsWith through the chunktable data source, so plain "
        "SQL `LIKE 'src19%'` prunes chunks too. On a source-clustered "
        "ingest (unit_sort, chunk ranges tile): kept "
        f"{psrc['chunks_kept']}/{psrc['chunks_total']} chunks.",
        formatted(
            pes.filter_decode_pred(
                sorted_chunks, pes.P.startswith("source", "src19"), colocated=True
            )
        ),
    ))
    sorted_chunks.unpersist()
    cached.unpersist()

    pruned = docs.select("doc_id", "lang").filter(F.col("n_chars") > 100)
    sections.append((
        "parquet scan: pushdown + pruning",
        "Catalyst pushes the filter and prunes the read schema "
        "(PushedFilters / ReadSchema on the Scan node) — the reference's "
        "Projection/Predicate macros are built-in here.",
        formatted(pruned) + "\n\nassertions: " + json.dumps(explain_summary(pruned)),
    ))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zch = pes.zorder_encode(
        ev, ["user_id", "value"], chunk_rows=512, n_buckets=2, n_salts=1,
        num_partitions=2,
    ).cache()
    zch.count()
    box = (
        pes.P.ge("user_id", 2) & pes.P.le("user_id", 9)
        & pes.P.ge("value", 5.0) & pes.P.le("value", 80.0)
    )
    zs = pes.pushdown_stats_pred(zch, box)
    sections.append((
        "Z-order box query (2-D chunk pruning)",
        "Morton-interleaved (user_id, value) sort key: chunk [min,max] "
        "stats tile as ~hyper-rectangles, so the 2-D box prunes chunks "
        "on BOTH dimensions from metadata alone — "
        f"kept {zs['chunks_kept']}/{zs['chunks_total']} chunks. A "
        "single-column sort would only prune the leading key. The z key "
        "is pure Catalyst bit arithmetic (no UDF at ingest).",
        formatted(pes.filter_decode_pred(zch, box)),
    ))
    zch.unpersist()

    from parquet_extra_spark import operators as ops

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    ivf = ops.ivf_topk(emb, q, k=20, nprobe=4)
    sections.append((
        "IVF top-k (probe 4 of 16 cells)",
        "One scan: cell assignment and the probe filter are inline "
        "Catalyst expressions over literal centroids (no training job, "
        "no join); TakeOrderedAndProject ranks without a full sort. With "
        "the assignment persisted at ingest this becomes partition "
        "pruning over vectors.",
        formatted(ivf),
    ))

    # --- round-3 paths ---

    # nested predicate pushdown: dotted-path predicate -> leaf chunk stats
    nested = docs.select(
        "doc_id", F.struct(F.col("lang"), F.col("n_chars")).alias("meta")
    )
    nchunks = pes.encode_nested(
        nested, sort_cols=["meta.n_chars"], chunk_rows=64,
        n_buckets=4, n_salts=1, num_partitions=4, unit_sort=True,
    ).cache()
    n_total = nchunks.select("chunk_id").distinct().count()
    npred = pes.P.gt("meta.n_chars", 450)
    from parquet_extra_spark.engine.nested import _rewrite_pred_paths
    nshred = pes.shred_schema(nested.schema)
    n_kept = (
        pes.prune_chunks(nchunks, _rewrite_pred_paths(npred, nested.schema), nshred)
        .select("chunk_id").distinct().count()
    )
    nf = pes.filter_decode_nested(
        nchunks, nested.schema, npred, paths=["doc_id", "meta.lang"]
    )
    eff = f"chunks kept by stats pruning: {n_kept}/{n_total}."
    sections.append((
        "nested predicate pushdown (filter_decode_nested)",
        "A dotted-path predicate (meta.n_chars > 450) is rewritten to "
        "shredded leaf names, pruned on chunk stats BEFORE any payload "
        "decode, exactly re-checked row-wise, and reassembled to the "
        "requested nested projection. " + eff,
        formatted(nf),
    ))
    nchunks.unpersist()

    # persisted IVF: cells assigned at ingest, queries prune chunks on stats
    from parquet_extra_spark.engine.pushdown import chunk_isin_filter

    ivfc = ops.ivf_encode(
        emb, chunk_rows=64, n_salts=1, num_partitions=8
    ).cache()
    ivf_total = ivfc.select("chunk_id").distinct().count()
    import numpy as _np
    from parquet_extra_spark.operators.similarity import _ivf_centroids
    cents = _ivf_centroids(64, 16, 7)
    probes = (_np.argsort(-(cents @ _np.asarray(q)))[:4] + 1).tolist()
    ivf_kept = (
        chunk_isin_filter(ivfc, "cell", probes)
        .select("chunk_id").distinct().count()
    )
    ivf_q = ops.ivf_topk_chunks(ivfc, q, k=20, nprobe=4)
    sections.append((
        "persisted IVF top-k (ivf_encode + ivf_topk_chunks)",
        "Cells are assigned once at ingest and the table is clustered on "
        "cell, so a query prunes non-probed chunks from METADATA only "
        "(min/max + membership digest on the cell column) and decodes "
        "just the probed cells — partition pruning for vectors. "
        f"chunks decoded: {ivf_kept}/{ivf_total} "
        f"(nprobe=4 of 16 centroids).",
        formatted(ivf_q),
    ))

    # the full storage-side ANN serving query: cell-pruned ADC shortlist
    # over code chunks + Bloom point-lookup exact rerank into the vector
    # chunk table (Faiss IVFADC + IndexRefineFlat, on the engine's own
    # pruning machinery)
    codec = ops.ivfpq_encode(emb, chunk_rows=64, num_partitions=8).cache()
    vecc = ops.ivf_encode(
        emb, chunk_rows=64, n_salts=1, num_partitions=8, bloom_cols=["id"]
    ).cache()
    code_total = codec.select("chunk_id").distinct().count()
    code_kept = (
        chunk_isin_filter(codec, "cell", probes)
        .select("chunk_id").distinct().count()
    )
    short = ops.ivfpq_topk_chunks(codec, q, k=100, nprobe=4)
    short_ids = [r["id"] for r in short.collect()]
    vec_total = vecc.select("chunk_id").distinct().count()
    # chunks surviving the membership/Bloom prune for the shortlist ids
    vec_kept = (
        chunk_isin_filter(vecc, "id", short_ids)
        .select("chunk_id").distinct().count()
    )
    refined = ops.ivfpq_refine_topk_chunks(
        codec, vecc, q, k=20, nprobe=4, shortlist=100
    )
    sections.append((
        "storage-side IVF-PQ + refine (ivfpq_refine_topk_chunks)",
        "The full production serving query over STORAGE end to end: "
        "non-probed cells prune on chunk METADATA (no code payload "
        "decoded), ADC ranks the probed cells' 16x-smaller code chunks, "
        "and the exact rerank decodes only vector chunks whose "
        "membership/Bloom digest may hold a shortlist id. "
        f"code chunks decoded: {code_kept}/{code_total} (nprobe=4/16); "
        f"vector chunks decoded for the 100-id rerank: "
        f"{vec_kept}/{vec_total}.",
        formatted(refined),
    ))
    codec.unpersist(); vecc.unpersist()
    ivfc.unpersist()

    # membership-digest pruning: eq/isin beyond min-max ranges
    wide = pes.encode(
        docs, sort_cols=["doc_id"], chunk_rows=64,
        n_buckets=4, n_salts=1, num_partitions=4,
    ).cache()
    w_total = wide.select("chunk_id").distinct().count()
    w_kept = (
        chunk_isin_filter(wide, "lang", ["xx"])
        .select("chunk_id").distinct().count()
    )
    lang_rows = wide.filter(F.col("column") == "lang")
    range_kept = lang_rows.filter(
        (F.col("min_val") <= "xx") & (F.col("max_val") >= "xx")
    ).count()
    sections.append((
        "dictionary-membership digest pruning (eq/isin)",
        "Chunks sorted on doc_id have wide [min,max] lang ranges, so "
        "range stats alone cannot skip eq(lang,'xx') — the per-chunk "
        "membership digest (hashes of dictionary entries when "
        "distinct_est is small) proves 'xx' absent and skips the chunk "
        "without decoding. "
        f"range-only would keep {range_kept} chunks; digest keeps "
        f"{w_kept}/{w_total}.",
        "(metadata-only decision; no payload plan)",
    ))
    wide.unpersist()

    # bloom pruning: point lookup on a high-cardinality key
    even = docs.filter(F.col("doc_id") % 2 == 0)
    blc = pes.encode(even, sort_cols=["n_chars"], chunk_rows=128,
                     n_buckets=1, n_salts=1, num_partitions=1,
                     bloom_cols=["doc_id"]).cache()
    bl_total = blc.select("chunk_id").distinct().count()
    bl_stats = pes.pushdown_stats_pred(blc, pes.P.eq("doc_id", 3))
    sections.append((
        "bloom point-lookup pruning (bloom_cols)",
        "Chunks sorted on n_chars have doc_id [min,max] ranges that "
        "straddle any probed key, so range stats cannot skip a point "
        "lookup; the opt-in per-chunk Bloom digest (63-bit-word array, "
        "k=6 Catalyst bitwiseAND probes) proves an absent key absent "
        "and skips the chunk without decoding — no false negatives by "
        "construction, false positives only widen `possible`. "
        f"eq(doc_id, 3) (absent): range-only keeps straddling chunks; "
        f"bloom keeps {bl_stats['chunks_kept']}/{bl_total}.",
        "(metadata-only decision; no payload plan)",
    ))
    blc.unpersist()

    # trigram pruning: substring predicate chunk skip
    tgc = pes.encode(docs, partition_cols=["source"], sort_cols=["doc_id"],
                     chunk_rows=64, n_buckets=8, n_salts=1,
                     trigram_cols=["source"], num_partitions=8).cache()
    tg_total = tgc.select("chunk_id").distinct().count()
    tg_stats = pes.pushdown_stats_pred(tgc, pes.P.contains("source", "rc17"))
    sections.append((
        "trigram substring pruning (trigram_cols)",
        "Substring position is order-independent, so [min,max] stats can "
        "NEVER refute LIKE '%s%' — without a digest every chunk decodes "
        "its dictionary for the exact recheck. The opt-in trigram bloom "
        "(all 3-grams of the chunk's exact distinct set) skips a chunk "
        "the moment one needle 3-gram is provably absent. "
        f"contains(source, 'rc17') keeps {tg_stats['chunks_kept']}/"
        f"{tg_total} chunks; the same lane serves plain SQL LIKE through "
        "the chunktable data source (StringContains/StringEndsWith).",
        "(metadata-only decision; no payload plan)",
    ))
    tgc.unpersist()

    # compaction: metadata-decided partial rewrite of undersized chunks
    frag = pes.encode(
        docs, chunk_rows=64, n_buckets=4, n_salts=2, num_partitions=8
    ).unionByName(
        pes.encode(docs.limit(400), chunk_rows=4096, n_buckets=1, n_salts=1,
                   num_partitions=1, uid_namespace="full")
    ).cache()
    cstats = pes.compaction_stats(frag, target_rows=512)
    compacted = pes.compact_chunks(frag, target_rows=512, n_buckets=2,
                                   n_salts=1, num_partitions=2)
    sections.append((
        "chunk compaction (compact_chunks)",
        "The small/big split is decided on chunk METADATA only (n_values "
        "per chunk_id, AQE-decided semi/anti joins); ONLY undersized "
        "chunks' payloads decode and re-encode, full-size chunks pass "
        "through byte-identical — compacting a 100 TB table with a 1% "
        "fragmented tail costs ~1 TB of work, not a rewrite. "
        f"would rewrite {cstats['chunks_small']}/{cstats['chunks_total']} "
        f"chunks = {cstats['rows_to_rewrite']}/{cstats['rows_total']} rows.",
        formatted(compacted),
    ))
    frag.unpersist()

    # compute-over-compressed grouped aggregation: the shuffle carries
    # (value, partial-count) pairs from dictionary codes / RLE run lengths
    vc_chunks = pes.encode(docs, **enc_kw).cache()
    vc = pes.value_counts_encoded(vc_chunks, "lang")
    sections.append((
        "GROUP BY over the encoded form (value_counts_encoded)",
        "The per-chunk kernel reads dictionary codes / RLE run lengths "
        "(values materialize only at dictionary scale); the ONLY "
        "Exchange under the final agg moves (value, partial-count) "
        "pairs — ~n_chunks x distinct rows, not the column. At 100 TB a "
        "GROUP BY lang shuffles kilobytes.",
        formatted(vc),
    ))

    # colocated encoded GROUP BY: the round-3 unconditional payload
    # repartition is gone — no Exchange below the kernel
    gs = pes.group_sum_encoded(vc_chunks, "lang", "n_chars", colocated=True)
    gs_plan = formatted(gs)
    below = gs_plan.split("MapInArrow", 1)[-1].split("InMemoryTableScan", 1)[0]
    sections.append((
        "encoded GROUP BY, colocated (group_sum_encoded colocated=True)",
        "On encode-output chunk tables every chunk's rows already share a "
        "partition, so the aggregate needs only an in-partition sort below "
        "the kernel: the ONLY Exchange in the plan carries (key, partial) "
        "rows. At 100 TB this is the difference between shuffling ~8 TB of "
        "encoded bytes and shuffling kilobytes of partials. "
        f"Exchange below the kernel: {'NONE' if 'Exchange' not in below else 'PRESENT (bug)'}.",
        gs_plan,
    ))

    # WHERE pushed INTO the encoded aggregate: chunk-stat skip + exact
    # recheck in the dictionary domain (engine/encoded_filter)
    srt = pes.encode(docs, sort_cols=["n_chars"], unit_sort=True,
                     chunk_rows=64, n_buckets=1, n_salts=1,
                     num_partitions=1).cache()
    fpred = pes.P.ge("n_chars", 450)
    fstats = pes.pushdown_stats_pred(srt, fpred)
    fs = pes.group_sum_encoded(srt, "lang", "n_chars", where=fpred)
    sections.append((
        "filtered encoded GROUP BY (group_sum_encoded where=...)",
        "The WHERE clause never materializes values per row: chunk stats "
        "skip impossible chunks first, then each surviving chunk evaluates "
        "the predicate ONCE per dictionary entry (Kleene 3-valued) and "
        "gathers the verdict through the integer codes. On n_chars-sorted "
        f"chunks, ge(n_chars,450) keeps {fstats['chunks_kept']}/"
        f"{fstats['chunks_total']} chunks before any payload is read; the "
        "shuffle above the kernel still carries only (key, partial) rows.",
        formatted(fs),
    ))

    # stats-pruned ORDER BY ... LIMIT k (engine/topk)
    k20 = sorted(
        (r["n_chars"] for r in docs.select("n_chars").collect()), reverse=True
    )[19]
    tk_stats = pes.pushdown_stats_pred(srt, pes.P.ge("n_chars", k20))
    tk = pes.topk_encoded(srt, ["n_chars", "doc_id"], 20,
                          columns=["doc_id", "n_chars"])
    sections.append((
        "stats-pruned top-k (topk_encoded, k=20)",
        "Seed chunks chosen by their max_val stat cover k non-null values; "
        "decoding ONE column of <= k chunks yields the k-th-value "
        "threshold, and every chunk whose max is provably below it skips. "
        f"On n_chars-sorted chunks the threshold prune keeps "
        f"{tk_stats['chunks_kept']}/{tk_stats['chunks_total']} chunks — "
        "O(k / chunk_rows) of the table decodes, not all of it.",
        formatted(tk),
    ))
    # exact encoded quantiles: rank selection over (value, count) pairs
    qt = pes.quantiles_encoded(srt, "n_chars", [0.5, 0.95], distributed=False)
    sections.append((
        "exact encoded quantiles (quantiles_encoded)",
        "Order statistics from codec structures: (value, count) pairs "
        "come out of dictionaries/RLE runs, so the rank scan runs at "
        "VALUE CARDINALITY, never row scale. Low-cardinality columns use "
        "one tiny running-count window (this plan); above ~64k estimated "
        "distinct values (metadata-only distinct_est sum) an auto gate "
        "switches to range-partitioned rank location — P collected "
        "subtotals find each rank's partition and the window runs "
        "parallel inside only those partitions, so there is no global "
        "single-partition sort at any scale.",
        formatted(qt),
    ))
    # join-over-compressed: dim key set pushed as chunk pruning, key
    # matched once per dictionary entry (engine/encoded_join)
    dim = (
        docs.filter(F.col("n_chars") >= 450)
        .select(F.col("n_chars").alias("nv"))
        .distinct()
        .withColumn("bucket", F.col("nv") % 7)
    )
    dim_vals = [r["nv"] for r in dim.select("nv").collect()]
    j_stats = pes.pushdown_stats_pred(srt, pes.P.isin("n_chars", dim_vals))
    jn = pes.join_encoded(
        srt, ("n_chars", "nv"), dim, columns=["doc_id", "n_chars"],
        colocated=True,
    )
    sections.append((
        "join-over-compressed (join_encoded, broadcast dim)",
        "The invisible join: the dim's key set becomes a pushed IN-list "
        f"whose envelope + membership digests keep {j_stats['chunks_kept']}"
        f"/{j_stats['chunks_total']} chunks metadata-only; surviving "
        "chunks match the key ONCE per dictionary entry (pc.index_in) and "
        "gather dim row indices through the codes, so fact rows that miss "
        "never materialize. colocated=True: the fact side has no exchange "
        "at all — the dim ships as a broadcast, the join output is "
        "map-only (the one BroadcastHashJoin below is the metadata "
        "semi-join of pruning, over chunk IDs, not data).",
        formatted(jn),
    ))
    srt.unpersist()

    # single-pass multi-aggregate GROUP BY (engine/encoded_agg)
    ma = pes.group_agg_encoded(
        vc_chunks, "lang",
        [("count", "*", "n"), ("sum", "n_chars", "sc"),
         ("avg", "n_chars", "ac"), ("min", "source", "mns"),
         ("max", "source", "mxs")],
        colocated=True,
    )
    ma_plan = formatted(ma)
    ma_head = ma_plan.split("InMemoryTableScan", 1)[0]
    sections.append((
        "single-pass multi-aggregate (group_agg_encoded)",
        "count/sum/avg/min/max over BOTH lanes (decoded numeric + "
        "dictionary-ranked string) read every referenced column once per "
        "chunk and emit ONE combined partial row per (chunk, group) — an "
        "N-aggregate report costs one scan of the chunk table, not N. "
        f"kernel passes above the cache scan: "
        f"{ma_head.count('MapInArrow')} (one, for all five aggregates); "
        "colocated=True keeps the only Exchange above the kernel, "
        "carrying combined (key, partials) rows.",
        ma_plan,
    ))

    # GROUPING SETS from the same partials: Expand runs at partial scale
    rs = pes.group_agg_sets_encoded(
        vc_chunks, ["lang", "source"],
        [("count", "*", "n"), ("sum", "n_chars", "sc")],
        sets="rollup", colocated=True,
    )
    rs_plan = formatted(rs)
    rs_head = rs_plan.split("InMemoryTableScan", 1)[0]
    sections.append((
        "ROLLUP / GROUPING SETS over encoded data (group_agg_sets_encoded)",
        "One chunk pass builds finest-grain partials; Spark's native "
        "Expand node then replicates each PARTIAL row once per grouping "
        "set (partials are n_chunks x distinct-keys rows — kilobytes), so "
        "a multi-grain rollup reads the data once, not once per set. "
        f"kernel passes: {rs_head.count('MapInArrow')}; Expand above the "
        f"kernel: {'Expand' in rs_head}.",
        rs_plan,
    ))

    # time-bucket rollup: date_trunc runs on partial rows, never per row
    ev_full = spark.read.parquet(f"{SF_DIR}/events.parquet")
    evc = pes.encode(ev_full, sort_cols=["ts"], chunk_rows=4096,
                     n_buckets=2, n_salts=1, num_partitions=4).cache()
    tr = pes.time_rollup_encoded(
        evc, "ts", "day",
        [("count", "*", "n"), ("sum", "value", "sv")], colocated=True,
    )
    sections.append((
        "time-bucket rollup (time_rollup_encoded)",
        "The hypertable shape: the timestamp reads as dictionary codes, "
        "partials group at raw-timestamp dictionary scale, and "
        "date_trunc('day') is a Catalyst Project over those partial rows "
        "(n_chunks x distinct timestamps) — the bucket expression never "
        "touches row scale, and the merge re-groups partials under the "
        "bucket exactly (count/sum re-sum, avg = sum-of-sums / "
        "sum-of-counts).",
        formatted(tr),
    ))
    evc.unpersist()

    # per-group exact quantiles: rank window at distinct-value scale
    gq = pes.group_quantiles_encoded(
        vc_chunks, "lang", "n_chars", [0.25, 0.5, 0.9], colocated=True
    )
    sections.append((
        "per-group exact quantiles (group_quantiles_encoded)",
        "Grouped discrete quantiles from codec structures: stacked "
        "(key, value) dictionary codes collapse to (key, value, count) "
        "partials per chunk, Catalyst merges cross-chunk duplicates, and "
        "ONE running-count window PARTITIONED BY key locates rank "
        "max(1, ceil(q*n)) per group — the window parallelizes across "
        "groups and its input is each group's distinct-value count, "
        "never its row count.",
        formatted(gq),
    ))

    # large-set membership pruning: the plan stays O(1) expressions
    import time as _time

    big_keys = list(range(100_000))
    t0 = _time.time()
    from parquet_extra_spark.engine.predicate import prune_chunks

    big_pruned = prune_chunks(vc_chunks, pes.P.isin("doc_id", big_keys))
    big_plan = formatted(big_pruned)
    plan_ms = (_time.time() - t0) * 1000.0
    sections.append((
        "100k-key membership prune (IsIn above the expansion threshold)",
        "Above 64 values IsIn stops expanding per-value expression terms "
        "(a 100k-key merge would otherwise build a ~200k-term Catalyst "
        "tree, and merely constructing the literals costs one py4j round "
        "trip each — measured ~100 s at 100k keys) and goes data-shaped: "
        "a [min,max] envelope plus broadcast semi-joins of the hashed "
        "value set as a DataFrame against the exploded membership "
        f"digests. This 100k-key prune planned in {plan_ms:.0f} ms.",
        big_plan[:1500] + "\n... (array literals elided: plan truncated)",
    ))

    # DELETE: metadata-decided three-way split
    sorted_chunks = pes.encode(
        docs, sort_cols=["doc_id"], unit_sort=True, chunk_rows=64,
        n_buckets=1, n_salts=1, num_partitions=1,
    ).cache()
    dpred = pes.P.ge("doc_id", 100) & pes.P.lt("doc_id", 400)
    dstats = pes.delete_stats(sorted_chunks, dpred)
    deleted = pes.delete_where(sorted_chunks, dpred, chunk_rows=64)
    sections.append((
        "row-level DELETE (delete_where)",
        "(possible, certain) verdicts from chunk stats split the table "
        "three ways before any payload moves: certain-match chunks DROP "
        "on metadata, impossible chunks pass through byte-identical, "
        "only boundary chunks decode+re-encode. On doc_id-sorted chunks "
        f"the range delete drops {dstats['chunks_dropped']}, rewrites "
        f"{dstats['chunks_rewritten']}, leaves {dstats['chunks_untouched']} "
        f"of {dstats['chunks_total']} chunks untouched.",
        formatted(deleted),
    ))
    sorted_chunks.unpersist()
    vc_chunks.unpersist()

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    )
    sections.append((
        "dimension join (orders x customer)",
        "Small dim side broadcast — no shuffle of the fact table for the "
        "join; the only Exchange is the final partial-agg merge.",
        formatted(seg) + "\n\nassertions: " + json.dumps(explain_summary(seg)),
    ))

    from parquet_extra_spark.operators.temporal import (
        asof_join, range_join, sessionize,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("p_ts"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value")
    asof = asof_join(purchases, clicks, on="user_id",
                     left_time="p_ts", right_time="c_ts")
    asof_plan = formatted(asof)
    asof_exe = asof._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "as-of join (union+window)",
        "No Join node at all: both sides Union into ONE Exchange on the "
        "key + one in-partition Sort, then a running last(ignorenulls) "
        "Window — sort-merge-join cost with zero row explosion. A theta "
        "formulation (l.t >= r.t) would be a per-key quadratic "
        "BroadcastNestedLoopJoin. "
        f"Exchanges: {asof_exe.count('Exchange hashpartitioning')} "
        f"(want 1), Join nodes: {asof_exe.count('Join')} (want 0).",
        asof_plan,
    ))

    from parquet_extra_spark.operators.temporal import asof_join_broadcast

    asb = asof_join_broadcast(purchases, clicks, on="user_id",
                              left_time="p_ts", right_time="c_ts")
    asb_exe = asb._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "as-of join, broadcast variant (dim-sized right)",
        "The fact/left side never shuffles: the right table collapses to "
        "per-key time-sorted arrays (groupBy on the SMALL side only), "
        "broadcast-hash-joins onto left, and the match is a codegen'd "
        "array filter + element_at. "
        f"BroadcastHashJoin: {'BroadcastHashJoin' in asb_exe}; hash "
        f"Exchanges: {asb_exe.count('Exchange hashpartitioning')} "
        "(want 1 — the dim-side groupBy; none on the left lineage).",
        formatted(asb),
    ))

    bands = spark.createDataFrame(
        [(0.0, 50_000.0, "low"), (25_000.0, 100_000.0, "mid"),
         (75_000.0, 200_000.0, "high"), (150_000.0, 600_000.0, "tail")],
        schema="lo double, hi double, band string")
    rj = range_join(o.select("o_orderkey", "o_totalprice"), bands,
                    "o_totalprice", "lo", "hi", bucket_width=25_000.0)
    sections.append((
        "range join (bucketed interval equi-join)",
        "The BETWEEN theta-join becomes an equi-join on the bucket key: "
        "the tiny exploded bands side broadcasts, the fact side never "
        "shuffles for the join, and the exact bound check runs post-join. "
        "Interval replication bounded by max_buckets_per_range.",
        formatted(rj) + "\n\nassertions: " + json.dumps(explain_summary(rj)),
    ))

    from parquet_extra_spark.operators.temporal import interval_join

    iv = o.select("o_orderkey", F.col("o_totalprice").alias("lo"),
                  (F.col("o_totalprice") + 25_000.0).alias("hi"))
    bands2 = spark.createDataFrame(
        [(0.0, 50_000.0, "low"), (25_000.0, 100_000.0, "mid"),
         (75_000.0, 200_000.0, "high"), (150_000.0, 600_000.0, "tail")],
        schema="blo double, bhi double, band string")
    ivj = interval_join(iv, bands2, ("lo", "hi"), ("blo", "bhi"),
                        bucket_width=25_000.0)
    sections.append((
        "interval-overlap join (one-owner-bucket dedup)",
        "Interval x interval overlap as a bucketed equi-join: both sides "
        "explode to their buckets, the small side broadcasts, and each "
        "overlapping pair emits exactly once because it is owned by the "
        "single bucket containing max(l.lo, r.lo) — no distinct pass, no "
        "dedup shuffle.",
        formatted(ivj) + "\n\nassertions: " + json.dumps(explain_summary(ivj)),
    ))

    sess = sessionize(ev, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"),
                      tiebreak="event_id")
    sess_plan = formatted(sess)
    sess_exe = sess._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "sessionization (lag + running sum)",
        "One Exchange on the key; the lag and the running session counter "
        "share a single in-partition Sort (two Window ops, one sort). "
        f"Exchanges: {sess_exe.count('Exchange hashpartitioning')} "
        "(want 1).",
        sess_plan,
    ))

    from parquet_extra_spark.operators.similarity import pq_encode, pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
    pq = pq_topk(pq_encode(emb), qv, k=20)
    pq_exe = pq._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "PQ ADC top-k (search without reconstruction)",
        "One scan over the 16x-compressed codes, the approximate cosine "
        "is m lookup-table gathers per row inside codegen, and the top-k "
        "is TakeOrderedAndProject — no full sort, no shuffle. "
        f"TakeOrdered: {'TakeOrderedAndProject' in pq_exe}; hash "
        f"Exchanges: {pq_exe.count('Exchange hashpartitioning')} (want 0).",
        formatted(pq),
    ))

    from parquet_extra_spark.operators.similarity import pq_refine_topk

    pr = pq_refine_topk(emb, pq_encode(emb), qv, k=20, shortlist=100)
    pr_exe = pr._jdf.queryExecution().executedPlan().toString()
    sections.append((
        "PQ refine top-k (ADC shortlist + exact rerank)",
        "The production ANN lane: the ADC pass picks a 100-id shortlist "
        "from codes alone, the shortlist BROADCASTS into a semi-join "
        "against the vector table (the scan side prunes on id), and "
        "exact cosine reranks only those rows. "
        f"Broadcast join: {'BroadcastHashJoin' in pr_exe or 'BroadcastNestedLoop' in pr_exe}; "
        f"semi: {'LeftSemi' in pr_exe}; "
        f"TakeOrdered: {'TakeOrderedAndProject' in pr_exe}.",
        formatted(pr),
    ))

    from parquet_extra_spark.operators.sampling import hash_split

    hs = hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    hs_plan = formatted(hs)
    sections.append((
        "deterministic hash split",
        "Map-only Catalyst (md5 -> conv -> mod -> CASE) inside one "
        "WholeStageCodegen span — no Exchange, no Python. "
        f"Exchange-free: {'Exchange' not in hs_plan}.",
        hs_plan,
    ))

    from parquet_extra_spark.operators.decontaminate import contamination_report

    train = docs.where(F.col("doc_id") % 17 != 0)
    evdf = docs.where(F.col("doc_id") % 17 == 0)
    dc = contamination_report(train, evdf, n=5, method="broadcast")
    dc_plan = formatted(dc)
    # the corpus side must reach the join without an Exchange: the only
    # shuffles are the eval-distinct and the post-join hit aggregation
    corpus_side_broadcast = "BroadcastHashJoin" in dc_plan
    sections.append((
        "eval-set decontamination (broadcast lane)",
        "Corpus n-grams are generated map-side (split/transform/explode "
        "inside codegen) and probe a BroadcastHashJoin of the DISTINCT "
        "eval n-grams — the 100-TB corpus is never shuffled; the only "
        "exchanges carry the (tiny) eval n-gram set and (doc_id, partial "
        "count) pairs of the contaminated subset. "
        f"BroadcastHashJoin on the n-gram: {corpus_side_broadcast}.",
        dc_plan,
    ))

    from parquet_extra_spark.operators.packing import pack_by_cumsum

    pk = pack_by_cumsum(docs, id_col="doc_id", size_col="n_chars",
                        budget=4096, n_buckets=8)
    pk_plan = formatted(pk)
    # formatted plans print the node as "(N) Exchange" with
    # "Arguments: hashpartitioning(...)" on its own line
    n_exch = pk_plan.count("Arguments: hashpartitioning")
    sections.append((
        "sequence packing (offset lane)",
        "ONE hash Exchange on the bucket feeding a Sort + running-total "
        "Window; everything else is codegen'd projection — no Python, "
        "no global sort, window partitions bounded by n_buckets sizing. "
        f"Hash exchanges: {n_exch} (expect 1).",
        pk_plan,
    ))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "EXPLAIN.md"), "w") as f:
        f.write(
            "# BENCH/EXPLAIN — physical plans of the load-bearing paths\n\n"
            f"Generated by bench/explain_report.py over {SF_DIR}.\n"
        )
        for title, why, plan in sections:
            f.write(f"\n## {title}\n\n{why}\n\n```\n{plan}\n```\n")
    print(json.dumps({"written": "BENCH/EXPLAIN.md", "sections": len(sections)}))
    spark.stop()


if __name__ == "__main__":
    main()
