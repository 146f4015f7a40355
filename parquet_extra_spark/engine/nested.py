"""Dremel-style shredding: nested rows <-> flat leaf columns.

The reference's core data model is nested records — the User fixture
(parquet-schema src/main/avro/schema.avsc:12-46: ``accounts:
array<Account>``, ``address: Address``) — and its Avro module exists to
project and filter through RECORD / UNION / ARRAY nodes
(parquet-avro Projection.scala:53-107, Common.scala:41-48). Here the
same data model rides the flat chunk engine by *shredding* to leaf
columns with path-encoded names (how Parquet itself stores nesting,
via the Dremel column-striping idea), so nested projection prunes at
the leaf level: ``decode_nested(chunks, schema, ["address.zip"])``
reads exactly one column chunk per chunk, nothing else.

Shredding and reassembly are pure Catalyst expressions (getField /
transform / element_at / when / struct) — whole-stage-codegen'd JVM
work, no Python per row, identical plan shape at 100 TB.

Leaf-name grammar (collision-free: '.', '[]', '#' cannot appear in
Avro/Spark field names):

    a.b         field b of struct a                    (leaf dtype of b)
    a#def       struct a presence (null tracking)      boolean
    a[].b       field b of each element of array a     array<dtype of b>
    a[]#def     element presence per slot of array a   array<boolean>
    m#keys      keys of map m                          array<key dtype>
    m#vals      values of map m                        array<value dtype>

Null semantics preserved exactly (the reference's union-[T,null]
projection, Projection.scala:75-84 / O4): a null struct, a null array,
an empty array, a null map, a null element, and a null field are all
distinct and round-trip losslessly — presence leaves carry the definition levels,
the null-ness of lifted leaf arrays carries array null-ness (transform
propagates null). Maps shred to parallel key/value arrays. Unsupported
shapes (containers nested inside array/map elements) raise TypeError at
shred time, mirroring the reference's unsupported-schema errors
(Schema.java:82-93 rejects nested groups it cannot type).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..codecs import typemap

_DEF = "#def"
_ARR = "[]"
_KEYS = "#keys"
_VALS = "#vals"


def _q(name: str) -> Column:
    return F.col(f"`{name}`")


def _prim_dtype(dt: T.DataType, where: str) -> str:
    s = dt.simpleString()
    if not typemap.is_supported(s):
        raise TypeError(f"unsupported leaf type {s} at {where!r}")
    return s


def _lifted_dtype(dt: T.DataType, where: str) -> str:
    s = f"array<{dt.simpleString()}>"
    if s not in typemap.SPARK_TO_ARROW:
        raise TypeError(
            f"unsupported array element type {dt.simpleString()} at {where!r}"
        )
    return s


# ---------------------------------------------------------------- shred


def _walk_scalar(expr: Column, dt: T.DataType, name: str, out: list) -> None:
    if isinstance(dt, T.StructType):
        out.append((name + _DEF, "boolean", expr.isNotNull()))
        for f in dt.fields:
            _walk_scalar(expr.getField(f.name), f.dataType, f"{name}.{f.name}", out)
    elif isinstance(dt, T.MapType):
        # map -> parallel (keys, vals) lifted arrays; map_keys/map_values
        # share iteration order, map_from_arrays restores it. Primitive
        # keys/values only (the engine's array element lanes).
        _lifted_dtype(dt.keyType, name + _KEYS)
        _lifted_dtype(dt.valueType, name + _VALS)
        out.append((name + _KEYS, f"array<{dt.keyType.simpleString()}>",
                    F.map_keys(expr)))
        out.append((name + _VALS, f"array<{dt.valueType.simpleString()}>",
                    F.map_values(expr)))
    elif isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, T.StructType):
            out.append(
                (name + _ARR + _DEF, "array<boolean>",
                 F.transform(expr, lambda x: x.isNotNull()))
            )
            for f in et.fields:
                _walk_array(
                    expr,
                    (lambda fn: lambda x: x.getField(fn))(f.name),
                    f.dataType,
                    f"{name}{_ARR}.{f.name}",
                    out,
                )
        elif isinstance(et, (T.ArrayType, T.MapType)):
            raise TypeError(
                f"array<{et.simpleString()}> (nested containers) not supported at {name!r}"
            )
        else:
            out.append((name, _lifted_dtype(et, name), expr))
    else:
        out.append((name, _prim_dtype(dt, name), expr))


def _walk_array(arr: Column, elem_fn, dt: T.DataType, name: str, out: list) -> None:
    """Leaves of a field *inside array elements*: every leaf lifts to an
    array (one slot per element) via one Catalyst transform."""
    if isinstance(dt, T.MapType):
        raise TypeError(f"map nested inside array elements not supported at {name!r}")
    if isinstance(dt, T.StructType):
        out.append(
            (name + _DEF, "array<boolean>",
             F.transform(arr, lambda x: elem_fn(x).isNotNull()))
        )
        for f in dt.fields:
            _walk_array(
                arr,
                (lambda fn, g: lambda x: g(x).getField(fn))(f.name, elem_fn),
                f.dataType,
                f"{name}.{f.name}",
                out,
            )
    elif isinstance(dt, T.ArrayType):
        raise TypeError(f"array nested inside array elements not supported at {name!r}")
    else:
        out.append(
            (name, _lifted_dtype(dt, name), F.transform(arr, elem_fn))
        )


def shred_plan(schema: T.StructType) -> list[tuple[str, str, Column]]:
    """-> [(leaf_name, dtype, expr)] in deterministic traversal order."""
    out: list = []
    for f in schema.fields:
        _walk_scalar(F.col(f"`{f.name}`"), f.dataType, f.name, out)
    return out


def shred(df: DataFrame) -> DataFrame:
    """Nested DataFrame -> flat leaf-column DataFrame (encode-ready)."""
    plan = shred_plan(df.schema)
    return df.select(*[e.alias(n) for n, _, e in plan])


def shred_schema(schema: T.StructType) -> list[tuple[str, int, str]]:
    """The flat schema_cols of the shredded form (no data needed)."""
    plan = shred_plan(schema)
    return [(n, i, d) for i, (n, d, _) in enumerate(plan)]


# ---------------------------------------------------------------- unshred


def _rebuild_scalar(dt: T.DataType, name: str) -> Column:
    if isinstance(dt, T.MapType):
        return F.map_from_arrays(_q(name + _KEYS), _q(name + _VALS))
    if isinstance(dt, T.StructType):
        st = F.struct(
            *[
                _rebuild_scalar(f.dataType, f"{name}.{f.name}").alias(f.name)
                for f in dt.fields
            ]
        )
        return F.when(_q(name + _DEF), st)  # otherwise NULL struct
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        spine = _q(name + _ARR + _DEF)
        et = dt.elementType
        return F.transform(
            spine,
            lambda pres, i: F.when(pres, _rebuild_elem(et, name + _ARR, i)),
        )
    return _q(name)


def _rebuild_elem(st: T.StructType, prefix: str, i: Column) -> Column:
    fields = []
    for f in st.fields:
        nm = f"{prefix}.{f.name}"
        if isinstance(f.dataType, T.StructType):
            pres = F.element_at(_q(nm + _DEF), i + 1)
            sub = F.when(pres, _rebuild_elem(f.dataType, nm, i))
            fields.append(sub.alias(f.name))
        else:
            fields.append(F.element_at(_q(nm), i + 1).alias(f.name))
    return F.struct(*fields)


def unshred(flat: DataFrame, schema: T.StructType) -> DataFrame:
    """Shredded leaf columns -> original nested shape."""
    return flat.select(
        *[_rebuild_scalar(f.dataType, f.name).alias(f.name) for f in schema.fields]
    )


# ---------------------------------------------------------------- paths


def _resolve(schema: T.StructType, path: str) -> T.DataType:
    """Dotted path -> subtree DataType; unknown segments raise
    (the Projection fail-fast contract, Projection.scala:58-72)."""
    dt: T.DataType = schema
    for seg in path.split("."):
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
        if not isinstance(dt, T.StructType) or seg not in dt.fieldNames():
            raise ValueError(f"projection references unknown field path {path!r}")
        dt = dt[seg].dataType
    return dt


def _subtree_prefix(schema: T.StructType, path: str) -> str:
    """Leaf-name prefix of a dotted path: array descents insert '[]'."""
    out: list[str] = []
    dt: T.DataType = schema
    for seg in path.split("."):
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
            out[-1] = out[-1] + _ARR
        dt = dt[seg].dataType
        out.append(seg)
    return ".".join(out)


def leaves_for(schema: T.StructType, path: str) -> list[str]:
    """All leaf columns needed to materialize ``path`` (incl. presence)."""
    dt = _resolve(schema, path)
    prefix = _subtree_prefix(schema, path)
    # reuse the shred walkers on a dummy expr purely for names/dtypes
    tmp: list = []
    if isinstance(dt, (T.StructType, T.MapType)) or (
        isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType)
    ):
        _walk_scalar(F.lit(None), dt, prefix, tmp)
    else:
        return [prefix]
    return [n for n, _, _ in tmp]


def project_nested(flat: DataFrame, schema: T.StructType, paths: list[str]) -> DataFrame:
    """Rebuild only the requested dotted paths from a (possibly pruned)
    shredded DataFrame. Each output column is named by its path."""
    cols = []
    for p in paths:
        dt = _resolve(schema, p)
        prefix = _subtree_prefix(schema, p)
        cols.append(_rebuild_scalar(dt, prefix).alias(p))
    return flat.select(*cols)


# ---------------------------------------------------------------- engine


def encode_nested(df: DataFrame, **encode_kwargs) -> DataFrame:
    """shred + encode. partition_cols/sort_cols refer to leaf names."""
    from .encoder import encode

    return encode(shred(df), **encode_kwargs)


def decode_nested(
    chunks: DataFrame,
    schema: T.StructType,
    paths: list[str] | None = None,
    colocated: bool = False,
) -> DataFrame:
    """Decode a shredded chunk table back to nested rows.

    paths: optional nested projection (dotted, e.g. ["address.zip",
    "accounts"]). Only the leaf chunks under the requested paths are
    decoded — leaf-level pruning through nesting, the chunk-engine form
    of Projection.scala:53-107. None = full reassembly.
    """
    from .decoder import decode

    schema_cols = shred_schema(schema)
    if paths is None:
        flat = decode(chunks, schema_cols=schema_cols, colocated=colocated)
        return unshred(flat, schema)
    need: list[str] = []
    for p in paths:
        need.extend(leaves_for(schema, p))
    need = list(dict.fromkeys(need))
    flat = decode(chunks, columns=need, schema_cols=schema_cols, colocated=colocated)
    return project_nested(flat, schema, paths)


def _rewrite_pred_paths(pred, schema: T.StructType) -> "object":
    """Predicate over dotted user paths -> predicate over shredded leaf
    names. Only scalar leaves NOT inside arrays are comparable row-wise
    (an array-lifted leaf holds one array per row, not one value), so
    paths whose leaf name carries an '[]' marker, or that resolve to a
    container, are rejected — the same shape restriction the reference's
    Avro predicates have (Predicate.scala compiles comparisons on scalar
    fields reached through records, Predicate.scala:47-183)."""
    from dataclasses import replace

    from .predicate import (
        And, Cmp, IsIn, IsNull, Not, NotNull, Or, Prefix, Rlike, Substr,
    )

    def leaf_of(path: str) -> str:
        dt = _resolve(schema, path)
        if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
            raise ValueError(
                f"predicate path {path!r} resolves to a container"
                f" ({dt.simpleString()}) — predicates apply to scalar leaves"
            )
        leaf = _subtree_prefix(schema, path)
        if _ARR in leaf:
            raise ValueError(
                f"predicate path {path!r} descends through an array —"
                " per-element predicates are not expressible as a chunk"
                " filter (one row holds many element values)"
            )
        return leaf

    def walk(p):
        if isinstance(p, (Cmp, IsIn, IsNull, NotNull, Prefix, Substr, Rlike)):
            return replace(p, column=leaf_of(p.column))
        if isinstance(p, (And, Or)):
            return replace(p, left=walk(p.left), right=walk(p.right))
        if isinstance(p, Not):
            return replace(p, child=walk(p.child))
        raise TypeError(f"not a Pred: {p!r}")

    return walk(pred)


def filter_decode_nested(
    chunks: DataFrame,
    schema: T.StructType,
    pred,
    paths: list[str] | None = None,
    colocated: bool = False,
) -> DataFrame:
    """Predicate pushdown THROUGH nesting + nested projection in one call
    — the chunk-engine composition of the reference's Avro projection and
    predicate modules (Projection.scala:53-107 + Predicate.scala:47-183,
    which compose over nested records via dotted getter paths).

    ``pred`` is a ``P`` tree whose column names are dotted user paths
    (e.g. ``P.gt("stats.n_orders", 3)``); they are rewritten to shredded
    leaf names, pushed down to chunk stats (prune), decoded with leaf
    projection, exactly re-checked row-wise, and reassembled to the
    requested ``paths`` (None = the full nested shape).
    """
    from .decoder import decode
    from .predicate import prune_chunks, referenced_columns, to_spark

    leaf_pred = _rewrite_pred_paths(pred, schema)
    schema_cols = shred_schema(schema)
    pruned = prune_chunks(chunks, leaf_pred, schema_cols)
    pred_leaves = sorted(referenced_columns(leaf_pred))
    if paths is None:
        flat = decode(pruned, schema_cols=schema_cols, colocated=colocated)
        flat = flat.filter(to_spark(leaf_pred))
        return unshred(flat, schema)
    need: list[str] = []
    for p in paths:
        need.extend(leaves_for(schema, p))
    need = list(dict.fromkeys(need + pred_leaves))
    flat = decode(pruned, columns=need, schema_cols=schema_cols, colocated=colocated)
    flat = flat.filter(to_spark(leaf_pred))
    return project_nested(flat, schema, paths)
