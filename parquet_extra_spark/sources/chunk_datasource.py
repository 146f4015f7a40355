"""The chunk table as a native Spark data source (Python Data Source API).

Registers format ``chunktable`` so the encoded table plugs into plain
``spark.read`` / Spark SQL — the most idiomatic integration Spark offers
a Python engine (public API: pyspark.sql.datasource, Spark 4):

    spark.dataSource.register(ChunkTableDataSource)
    df = spark.read.format("chunktable").load("/data/enc")
    df.filter("lang = 'en' AND n_chars > 100")   # prunes chunks via stats

``pushFilters`` receives Catalyst's translated filters, maps the
supported shapes (=, <, <=, >, >=, IN, IS [NOT] NULL, NOT =) onto the
engine's chunk-statistics interpretation, and RETURNS every filter as
unsupported — Spark re-applies them exactly on the decoded rows, so the
source only ever uses them to SKIP chunks (sound over-approximation, the
same dual-predicate discipline as engine/pushdown.py; ≙ the reference's
coarse-filter + exact-recheck contract, Predicate.scala:47-183).

Layouts: a checkpoint directory (``<path>/manifest`` present — only
committed chunks are visible, crashed-run orphans skipped, same rule as
engine/checkpoint.read_chunks) or a flat directory of chunk-table
parquet files. One input partition per data file: encode tasks write
whole chunks contiguously into their own file, so per-file decode needs
no shuffle at all — the scan parallelism is the file count.

Everything here runs without a SparkSession (driver planning uses
pyarrow.dataset; executors decode with the pure-Python codec kernels),
which is exactly what the Python Data Source API requires. Paths must
be visible to pyarrow on both driver and executors (local disk, NFS,
fuse mounts); object-store URIs would need a pyarrow filesystem — use
the engine API (read_chunks/decode) for those.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
)
from pyspark.sql.types import StructType

from ..codecs import decode_array, typemap
from ..engine import stats as stats_mod

_META_COLS = [
    "chunk_id", "column", "col_idx", "dtype", "codec", "n_values",
    "null_count", "min_val", "max_val", "member_hashes", "member_bloom",
]


def _chunks_root(path: str) -> tuple[str, str | None]:
    """-> (chunk data dir, manifest dir or None) for either layout."""
    manifest = os.path.join(path, "manifest")
    chunks = os.path.join(path, "chunks")
    if os.path.isdir(manifest) and os.path.isdir(chunks):
        return chunks, manifest
    return path, None


def _committed_files(path: str) -> list[str]:
    """Data files to scan, manifest-filtered for the checkpoint layout."""
    root, manifest = _chunks_root(path)
    dataset = pa_ds.dataset(root, format="parquet", partitioning="hive")
    files = [f for f in dataset.files if f.endswith(".parquet")]
    if manifest is None:
        return sorted(files)
    committed = set(
        pq.read_table(manifest, columns=["run_id"]).column("run_id").to_pylist()
    )
    out = []
    for f in files:
        rel = os.path.relpath(f, root)
        top = rel.split(os.sep)[0]
        if top.startswith("run_id=") and top.split("=", 1)[1] not in committed:
            continue  # orphan from a crashed run — invisible
        out.append(f)
    return sorted(out)


def _discover_schema(path: str) -> list[tuple[str, int, str]]:
    """[(column, col_idx, dtype)] — the footer read, in pure pyarrow."""
    files = _committed_files(path)
    if not files:
        raise ValueError(f"no committed chunk files under {path!r}")
    seen: dict[str, tuple[int, str]] = {}
    for f in files:
        t = pq.read_table(f, columns=["column", "col_idx", "dtype"])
        for c, i, d in zip(
            t.column("column").to_pylist(),
            t.column("col_idx").to_pylist(),
            t.column("dtype").to_pylist(),
        ):
            prev = seen.setdefault(c, (i, d))
            if prev != (i, d):
                raise ValueError(f"inconsistent schema for column {c!r} across chunks")
    return sorted(((c, i, d) for c, (i, d) in seen.items()), key=lambda t: t[1])


# ---------------------------------------------------------- stats pruning


def _typed(stat: str | None, dtype: str):
    """Stored stat string -> comparable python value (None = unbounded)."""
    if stat is None:
        return None
    if dtype in typemap.INT_DTYPES or dtype == "boolean":
        return int(stat)
    if dtype in typemap.FLOAT_DTYPES:
        return float(stat)
    if dtype == "string":
        return stat
    return None  # dtype outside the pruning contract


def _canon(value, dtype: str):
    """Literal -> the same comparable lane, or None (= no pruning, sound)."""
    if dtype == "boolean":
        return int(value) if isinstance(value, bool) else None
    if dtype in typemap.INT_DTYPES:
        return value if isinstance(value, int) and not isinstance(value, bool) else None
    if dtype in typemap.FLOAT_DTYPES:
        if isinstance(value, (int, float)) and not isinstance(value, bool):
            return float(value)
        return None
    if dtype == "string":
        return value if isinstance(value, str) else None
    return None


@dataclass(frozen=True)
class _Leaf:
    """One pruning leaf: op in (eq ne lt le gt ge isnull notnull), value."""
    op: str
    column: str
    value: object = None


def _leaf_possible(leaf: _Leaf, st: dict, dtype: str) -> bool:
    """Sound 'some row may match' verdict from one chunk's stats row.
    Any uncertainty returns True (keep the chunk)."""
    nc, nv = st["null_count"], st["n_values"]
    if leaf.op == "isnull":
        return nc > 0
    if leaf.op == "notnull":
        return nc < nv
    if nc >= nv:
        return False  # only null rows: no comparison matches (SQL semantics)
    v = _canon(leaf.value, dtype)
    if v is None:
        return True
    mn, mx = _typed(st["min_val"], dtype), _typed(st["max_val"], dtype)
    if leaf.op == "gt":
        return mx is None or mx > v
    if leaf.op == "ge":
        return mx is None or mx >= v
    if leaf.op == "lt":
        return mn is None or mn < v
    if leaf.op == "le":
        return mn is None or mn <= v
    if leaf.op == "eq":
        if (mn is not None and mn > v) or (mx is not None and mx < v):
            return False
        h = stats_mod.member_hash_for(leaf.value, dtype)
        if h is not None:
            members = st.get("member_hashes")
            if members is not None and h not in set(members):
                return False  # exact digest proves absence
            bloom = st.get("member_bloom")
            if bloom is not None and not all(
                bloom[p // stats_mod._BLOOM_BITS_PER_WORD]
                >> (p % stats_mod._BLOOM_BITS_PER_WORD)
                & 1
                for p in stats_mod.bloom_positions(h)
            ):
                return False  # bloom proves absence (no false negatives)
        return True
    if leaf.op == "ne":
        # impossible only when every non-null row equals v
        return not (mn is not None and mx is not None and mn == mx == v)
    return True


class _Node:
    """Tiny pruning tree: leaves + and/or (NOT handled at translation)."""

    def __init__(self, kind: str, children=None, leaf: _Leaf | None = None):
        self.kind, self.children, self.leaf = kind, children or [], leaf

    def possible(self, stats_by_col: dict, dtypes: dict) -> bool:
        if self.kind == "leaf":
            st = stats_by_col.get(self.leaf.column)
            if st is None:
                return True  # column row absent (evolution) — keep
            return _leaf_possible(self.leaf, st, dtypes[self.leaf.column])
        if self.kind == "and":
            return all(c.possible(stats_by_col, dtypes) for c in self.children)
        return any(c.possible(stats_by_col, dtypes) for c in self.children)


def _attr(f) -> str | None:
    parts = tuple(f.attribute)
    return parts[0] if len(parts) == 1 else None


def _translate(filters: list[Filter]) -> "_Node | None":
    """Spark data-source filters (implicitly ANDed) -> pruning tree.
    Unsupported shapes are simply not used for pruning (sound — Spark
    re-applies every filter on the decoded rows regardless)."""
    leaves: list[_Node] = []
    for f in filters:
        if isinstance(f, EqualTo) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("eq", _attr(f), f.value)))
        elif isinstance(f, Not) and isinstance(f.child, EqualTo) and _attr(f.child):
            leaves.append(_Node("leaf", leaf=_Leaf("ne", _attr(f.child), f.child.value)))
        elif isinstance(f, GreaterThan) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("gt", _attr(f), f.value)))
        elif isinstance(f, GreaterThanOrEqual) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("ge", _attr(f), f.value)))
        elif isinstance(f, LessThan) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("lt", _attr(f), f.value)))
        elif isinstance(f, LessThanOrEqual) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("le", _attr(f), f.value)))
        elif isinstance(f, In) and _attr(f):
            ors = [
                _Node("leaf", leaf=_Leaf("eq", _attr(f), v)) for v in f.value
            ]
            if ors:
                leaves.append(_Node("or", children=ors))
        elif isinstance(f, IsNull) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("isnull", _attr(f))))
        elif isinstance(f, IsNotNull) and _attr(f):
            leaves.append(_Node("leaf", leaf=_Leaf("notnull", _attr(f))))
        # anything else: no pruning contribution
    if not leaves:
        return None
    return _Node("and", children=leaves) if len(leaves) > 1 else leaves[0]


# ------------------------------------------------------------- the source


@dataclass
class _FilePartition(InputPartition):
    path: str


def _read_file(
    path: str,
    schema_cols: list[tuple[str, int, str]],
    prune: "_Node | None",
) -> Iterator[pa.RecordBatch]:
    """Decode one chunk-table parquet file to data record batches —
    shared by the batch and stream readers. Runs on an executor with no
    SparkSession (pure pyarrow + codec kernels)."""
    dtypes = {c: d for c, _, d in schema_cols}
    names = [c for c, _, _ in schema_cols]
    file_schema = pq.read_schema(path)
    want = [c for c in _META_COLS + ["payload"] if c in file_schema.names]
    table = pq.read_table(path, columns=want)
    n_rows = table.num_rows
    meta = {
        # chunk tables persisted before a digest column existed read
        # back without it — treat as "no digest" (sound, never prunes)
        c: (
            table.column(c).to_pylist()
            if c in file_schema.names
            else [None] * n_rows
        )
        for c in _META_COLS
    }
    payloads = table.column("payload")
    by_chunk: dict = {}
    for i, cid in enumerate(meta["chunk_id"]):
        by_chunk.setdefault(cid, []).append(i)
    arrow_schema = pa.schema(
        [(c, typemap.spark_to_arrow(dtypes[c])) for c in names]
    )
    for cid, idxs in by_chunk.items():
        rows = {meta["column"][i]: i for i in idxs}
        if prune is not None:
            stats_by_col = {
                meta["column"][i]: {
                    k: meta[k][i]
                    for k in (
                        "null_count", "n_values", "min_val", "max_val",
                        "member_hashes", "member_bloom",
                    )
                }
                for i in idxs
            }
            if not prune.possible(stats_by_col, dtypes):
                continue  # chunk skipped from stats alone
        missing = [c for c in names if c not in rows]
        if missing:
            raise ValueError(
                f"chunk {cid} in {path} is missing column rows"
                f" {missing} — chunktable files must keep whole chunks"
                " together (encode/checkpoint output does; an arbitrary"
                " repartition-then-write may not)"
            )
        arrays = []
        for c in names:
            i = rows[c]
            arrays.append(
                decode_array(payloads[i].as_py(), dtypes[c], meta["codec"][i])
            )
        yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class ChunkTableReader(DataSourceReader):
    def __init__(self, path: str, schema_cols: list[tuple[str, int, str]]):
        self._path = path
        self._schema_cols = schema_cols
        self._dtypes = {c: d for c, _, d in schema_cols}
        self._prune: _Node | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self._prune = _translate(filters)
        # return EVERYTHING: Spark re-applies each filter exactly on the
        # decoded rows; this source uses them only to skip chunks
        return iter(filters)

    def partitions(self):
        return [_FilePartition(f) for f in _committed_files(self._path)]

    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        return _read_file(partition.path, self._schema_cols, self._prune)


class ChunkTableStreamReader(DataSourceStreamReader):
    """Structured-streaming read of a CHECKPOINT-layout chunk directory:
    the append-only manifest's ``committed_at`` frontier is the stream
    offset, so every committed ingest run is consumed exactly once —
    Spark's streaming checkpoint persists the frontier, the engine's
    manifest defines it (the composition the batch `after=` read does by
    hand). Each micro-batch's partitions are the data files of runs
    committed inside the (start, end] window; crashed-run orphans have no
    manifest row and are never read. ``committed_at`` is one constant per
    encode_to call (checkpoint.py), so windows select whole runs."""

    def __init__(self, path: str, schema_cols: list[tuple[str, int, str]]):
        root, manifest = _chunks_root(path)
        if manifest is None:
            raise ValueError(
                "chunktable streaming needs the checkpoint layout"
                " (<path>/manifest): the manifest frontier is the offset"
            )
        self._root, self._manifest = root, manifest
        self._schema_cols = schema_cols

    def initialOffset(self) -> dict:
        return {"frontier": 0.0}

    def latestOffset(self) -> dict:
        try:
            t = pq.read_table(self._manifest, columns=["committed_at"])
        except Exception:
            return {"frontier": 0.0}
        col = t.column("committed_at").to_pylist()
        return {"frontier": max(col) if col else 0.0}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["frontier"], end["frontier"]
        t = pq.read_table(self._manifest, columns=["run_id", "committed_at"])
        runs = {
            r
            for r, c in zip(
                t.column("run_id").to_pylist(),
                t.column("committed_at").to_pylist(),
            )
            if lo < c <= hi
        }
        files = []
        for run in sorted(runs):
            run_dir = os.path.join(self._root, f"run_id={run}")
            if os.path.isdir(run_dir):
                for f in sorted(os.listdir(run_dir)):
                    if f.endswith(".parquet"):
                        files.append(os.path.join(run_dir, f))
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        return _read_file(partition.path, self._schema_cols, None)

    def commit(self, end: dict) -> None:
        pass  # the manifest is immutable; Spark's checkpoint owns the frontier


class ChunkTableDataSource(DataSource):
    """spark.dataSource.register(ChunkTableDataSource); then
    spark.read.format("chunktable").load(path) for batch or
    spark.readStream.format("chunktable").load(path) for incremental
    consumption of a checkpoint directory."""

    @classmethod
    def name(cls) -> str:
        return "chunktable"

    def schema(self) -> "StructType | str":
        path = self.options.get("path")
        if not path:
            raise ValueError("chunktable needs a path: .load('/dir')")
        cols = _discover_schema(path)
        # DDL string, parsed JVM-side: this method runs in a worker Python
        # process with no SparkContext, so StructType parsing is unavailable
        return ", ".join(f"`{c}` {d}" for c, _, d in cols)

    def reader(self, schema: StructType) -> ChunkTableReader:
        path = self.options["path"]
        return ChunkTableReader(path, _discover_schema(path))

    def streamReader(self, schema: StructType) -> ChunkTableStreamReader:
        path = self.options["path"]
        # the resolved schema (user-supplied or from self.schema()) drives
        # decode: a stream may start before the first commit, when file-
        # based discovery has nothing to read yet
        cols = [
            (f.name, i, f.dataType.simpleString())
            for i, f in enumerate(schema.fields)
        ]
        return ChunkTableStreamReader(path, cols)
